"""Continuous adjoint-sensitivity reverse mode for the ODE solvers.

The reference's --use_adjoint flag selects torchdiffeq's odeint_adjoint
(reference flow.py:3,76), which works with ANY of its solvers including
dopri5 (reference main.py:85): O(1)-memory gradients by integrating the
adjoint ODE backwards in time. The lax.scan solvers in this framework
already get O(T)-memory exact gradients via rematerialisation, which is
usually the better trade on TPU - but the continuous adjoint is part of
the reference capability surface and is the right tool for very long
horizons, so it is provided as a first-class option for every solver.

Augmented backward system over each output interval (integrated in
reversed time):

    dz/ds   = -f(theta, t, z)
    da/ds   =  a^T df/dz          (vjp)
    dgth/ds =  a^T df/dtheta      (vjp)

with a += cotangent(z_i) injected at each saved output time.

Three backward integrators:
  * euler/midpoint/rk4: hand-rolled fixed-step over the augmented pytree
    (cheapest; same solver as the forward pass, torchdiffeq semantics).
  * bdf: semi-implicit BDF2 exploiting the augmented structure - implicit
    batched Newton on z only, a per-sample (D, D) LINEAR solve for a
    (whose dynamics are linear given z), trapezoidal quadrature for gth.
  * everything else (dopri5, adams family): explicit/adaptive, so the
    augmented state is ravelled to one flat vector and integrated per
    interval with the SAME solver via dynamics.solvers.odeint.

Gradients w.r.t. ts are not produced (returned as zeros) - time grids in
this framework are dt * arange(T).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from vae_gp_ode_tpu.core import linalg
from vae_gp_ode_tpu.dynamics.solvers import odeint

_FIXED = ('euler', 'midpoint', 'rk4')


def _tree_axpy(a, x, y):
    """y + a * x over pytrees."""
    return jax.tree.map(lambda xi, yi: yi + a * xi, x, y)


def _step_tree(method, rhs, t, state, h):
    if method == 'euler':
        return _tree_axpy(h, rhs(t, state), state)
    if method == 'midpoint':
        k1 = rhs(t, state)
        mid = _tree_axpy(0.5 * h, k1, state)
        k2 = rhs(t + 0.5 * h, mid)
        return _tree_axpy(h, k2, state)
    if method == 'rk4':
        k1 = rhs(t, state)
        k2 = rhs(t + 0.5 * h, _tree_axpy(0.5 * h, k1, state))
        k3 = rhs(t + 0.5 * h, _tree_axpy(0.5 * h, k2, state))
        k4 = rhs(t + h, _tree_axpy(h, k3, state))
        acc = jax.tree.map(
            lambda a, b, c, d: a + 2 * b + 2 * c + d, k1, k2, k3, k4)
        return _tree_axpy(h / 6.0, acc, state)
    raise ValueError(f'fixed-step adjoint supports {_FIXED}, '
                     f'got {method!r}')


@partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6, 7, 8))
def odeint_adjoint(f, theta, z0, ts, method='euler', dense=1,
                   rtol=1e-6, atol=1e-6, max_steps=256):
    """Integrate dz/dt = f(theta, t, z); reverse mode via adjoint ODE.

    @param f: RHS (theta, t, z) -> dz, pure in theta (a pytree of params)
    @param theta: parameter pytree (cotangents flow through the adjoint)
    @param method: any solver in dynamics.solvers.SOLVERS; the backward
        pass uses the same method (adaptive for dopri5)
    @return: (zs (T, *z0.shape), nfe) - nfe is the forward solve's actual
        RHS-evaluation count (exact for adaptive solvers too; it gets a
        zero cotangent in the backward pass)
    """
    sol = odeint(lambda t, z: f(theta, t, z), z0, ts, method=method,
                 dense=dense, rtol=rtol, atol=atol, max_steps=max_steps,
                 remat=False)
    return sol.zs, sol.nfe


def _adj_fwd(f, theta, z0, ts, method, dense, rtol, atol, max_steps):
    zs, nfe = odeint_adjoint(f, theta, z0, ts, method, dense, rtol, atol,
                             max_steps)
    return (zs, nfe), (theta, zs, ts)


def _adj_bwd(f, method, dense, rtol, atol, max_steps, res, bars):
    zs_bar, _ = bars                      # nfe is an integer count: no grad
    theta, zs, ts = res
    gth0 = jax.tree.map(jnp.zeros_like, theta)

    def aug_rhs(t, aug):
        z, a, gth = aug
        fz, vjp_fn = jax.vjp(lambda th, zz: f(th, t, zz), theta, z)
        gth_dot, a_dot = vjp_fn(a)
        # reversed-time signs: s = -t
        return (jax.tree.map(jnp.negative, fz), a_dot, gth_dot)

    if method in _FIXED:
        def solve_interval(aug, t0, t1):
            """Fixed-step backward integration t1 -> t0 over the pytree."""
            h = (t1 - t0) / dense

            def substep(i, aug_):
                # integrate in the reversed-time variable s (t = t1 - s) so
                # the solver's intermediate stages at s + c*h evaluate the
                # RHS at t1 - s - c*h (moving toward t0)
                s = i * h

                def rhs_s(s_, a_):
                    return aug_rhs(t1 - s_, a_)

                return _step_tree(method, rhs_s, s, aug_, h)

            return jax.lax.fori_loop(0, dense, substep, aug)
    elif method == 'bdf':
        def solve_interval(aug, t0, t1):
            """Semi-implicit BDF2 backward, exploiting the augmented
            system's structure instead of ravelling it (a Newton over the
            full (z, a, gth) flat vector would build a dense (P, P)
            Jacobian over ALL parameters - round-3 review finding):

              * z: implicit BDF2/BE with the same per-sample (D, D)
                batched Newton as the forward solver;
              * a: its dynamics da/ds = J(s)^T a are LINEAR given z, so
                the implicit step is one per-sample (D, D) linear solve
                (I - c h J^T) a_new = rhs - no Newton at all;
              * gth: pure quadrature (no feedback), trapezoidal rule on
                the vjp evaluated at the solved endpoints.

            History resets per output interval (BE bootstrap), mirroring
            the forward driver's order at interval starts."""
            from vae_gp_ode_tpu.dynamics.solvers import _newton_solve
            z0_, a0_, gth0_ = aug
            h = (t1 - t0) / dense
            eye = jnp.eye(z0_.shape[-1], dtype=z0_.dtype)

            def fwd_f(t, zz):
                return f(theta, t, zz)

            def q_theta(t, zz, aa):
                _, vjp_fn = jax.vjp(lambda th: f(th, t, zz), theta)
                return vjp_fn(aa)[0]

            def substep(i, c):
                z, a, gth, z_prev, a_prev, hp = c
                s1 = (i + 1.0) * h
                t_old, t_new = t1 - i * h, t1 - s1
                c_f = jnp.where(hp, 2.0 / 3.0, 1.0)

                def g(zn):
                    fn_ = -fwd_f(t_new, zn)          # dz/ds = -f
                    r2 = (zn - (4.0 / 3.0) * z + (1.0 / 3.0) * z_prev
                          - (2.0 / 3.0) * h * fn_)
                    rbe = zn - z - h * fn_
                    return jnp.where(hp, r2, rbe)

                z_new = _newton_solve(g, z - h * fwd_f(t_old, z))

                # linear implicit step for a: (I - c_f h J^T) a_new = rhs
                J = jax.vmap(jax.jacrev(
                    lambda zi: fwd_f(t_new, zi[None])[0]))(z_new)
                M = eye[None] - c_f * h * jnp.swapaxes(J, -1, -2)
                rhs_a = jnp.where(hp, (4.0 / 3.0) * a
                                  - (1.0 / 3.0) * a_prev, a)
                a_new = linalg.solve(M, rhs_a[..., None])[..., 0]

                # trapezoidal quadrature for the parameter cotangent
                q0 = q_theta(t_old, z, a)
                q1 = q_theta(t_new, z_new, a_new)
                gth_new = jax.tree.map(
                    lambda g_, q0_, q1_: g_ + 0.5 * h * (q0_ + q1_),
                    gth, q0, q1)
                return (z_new, a_new, gth_new, z, a, jnp.asarray(True))

            z_f, a_f, gth_f, _, _, _ = jax.lax.fori_loop(
                0, dense, substep,
                (z0_, a0_, gth0_, z0_, a0_, jnp.asarray(False)))
            return z_f, a_f, gth_f
    else:
        def solve_interval(aug, t0, t1):
            """Backward integration with the forward solver itself on the
            ravelled augmented state, carried as (1, size) - explicit
            methods only (dopri5 adaptive backward included); bdf has its
            structured branch above."""
            flat, unravel = ravel_pytree(aug)

            def rhs_flat(s_, y):
                d = aug_rhs(t1 - s_, unravel(y[0]))
                return ravel_pytree(d)[0][None]

            span = jnp.stack([jnp.zeros_like(t1), t1 - t0])
            sol = odeint(rhs_flat, flat[None], span, method=method,
                         dense=dense, rtol=rtol, atol=atol,
                         max_steps=max_steps, remat=False)
            return unravel(sol.zs[-1][0])

    def interval(carry, inp):
        a, gth = carry
        z_end, zbar_end, t0, t1 = inp           # integrate t1 -> t0
        a = a + zbar_end
        z, a, gth = solve_interval((z_end, a, gth), t0, t1)
        return (a, gth), None

    a0 = jnp.zeros_like(zs[0])
    inputs = (zs[1:][::-1], zs_bar[1:][::-1], ts[:-1][::-1], ts[1:][::-1])
    (a_final, gth), _ = jax.lax.scan(interval, (a0, gth0), inputs)
    a_final = a_final + zs_bar[0]
    return gth, a_final, jnp.zeros_like(ts)


odeint_adjoint.defvjp(_adj_fwd, _adj_bwd)


def flow_forward_adjoint(gp, sample, z0, ts, order=1, solver='euler',
                         dense=1, rtol=1e-6, atol=1e-6, max_steps=256):
    """flow_forward variant using the continuous adjoint: gradients w.r.t.
    (gp, sample) flow through the backward ODE solve; the sample's own
    construction (Cholesky etc.) is differentiated by the outer graph.

    Works with every solver (reference flow.py:76-85 semantics: torchdiffeq
    odeint_adjoint accepts any method incl. dopri5)."""
    from vae_gp_ode_tpu.gp.svgp import fn_eval

    def f(theta, t, z):
        gp_, sample_ = theta
        if order == 2:
            q = z.shape[1] // 2
            return jnp.concatenate([z[:, q:], fn_eval(gp_, sample_, z)],
                                   axis=1)
        return fn_eval(gp_, sample_, z)

    zs, nfe = odeint_adjoint(f, (gp, sample), z0, ts, method=solver,
                             dense=dense, rtol=rtol, atol=atol,
                             max_steps=max_steps)
    return jnp.transpose(zs, (1, 0, 2)), nfe
