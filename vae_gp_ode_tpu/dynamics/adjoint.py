"""Continuous adjoint-sensitivity reverse mode for fixed-step solvers.

The reference's --use_adjoint flag selects torchdiffeq's odeint_adjoint
(reference flow.py:3,76): O(1)-memory gradients by integrating the adjoint
ODE backwards in time. The lax.scan solvers in this framework already get
O(T)-memory exact gradients via rematerialisation, which is usually the
better trade on TPU - but the continuous adjoint is part of the reference
capability surface and is the right tool for very long horizons, so it is
provided as a first-class option.

Augmented backward system over each output interval (integrated in
reversed time with the same fixed-step solver as the forward pass):

    dz/ds   = -f(theta, t, z)
    da/ds   =  a^T df/dz          (vjp)
    dgth/ds =  a^T df/dtheta      (vjp)

with a += cotangent(z_i) injected at each saved output time. Gradients
w.r.t. ts are not produced (returned as zeros) - time grids in this
framework are dt * arange(T).
"""

from functools import partial

import jax
import jax.numpy as jnp

from vae_gp_ode_tpu.dynamics.solvers import ODESolution, odeint

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
    raise ValueError(f'adjoint supports {_FIXED}, got {method!r}')


@partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5))
def odeint_adjoint(f, theta, z0, ts, method='euler', dense=1):
    """Integrate dz/dt = f(theta, t, z); reverse mode via adjoint ODE.

    @param f: RHS (theta, t, z) -> dz, pure in theta (a pytree of params)
    @param theta: parameter pytree (cotangents flow through the adjoint)
    @return: zs (T, *z0.shape)
    """
    sol = odeint(lambda t, z: f(theta, t, z), z0, ts, method=method,
                 dense=dense, remat=False)
    return sol.zs


def _adj_fwd(f, theta, z0, ts, method, dense):
    zs = odeint_adjoint(f, theta, z0, ts, method, dense)
    return zs, (theta, zs, ts)


def _adj_bwd(f, method, dense, res, zs_bar):
    theta, zs, ts = res
    T = ts.shape[0]
    gth0 = jax.tree.map(jnp.zeros_like, theta)

    def aug_rhs(t, aug):
        z, a, gth = aug
        fz, vjp_fn = jax.vjp(lambda th, zz: f(th, t, zz), theta, z)
        gth_dot, a_dot = vjp_fn(a)
        # reversed-time signs: s = -t
        return (jax.tree.map(jnp.negative, fz), a_dot, gth_dot)

    def interval(carry, inp):
        a, gth = carry
        z_end, zbar_end, t0, t1 = inp           # integrate t1 -> t0
        a = a + zbar_end
        h = (t1 - t0) / dense

        def substep(i, aug):
            # integrate in the reversed-time variable s (t = t1 - s) so the
            # solver's intermediate stages at s + c*h correctly evaluate the
            # RHS at t1 - s - c*h (moving toward t0)
            s = i * h

            def rhs_s(s_, aug_):
                return aug_rhs(t1 - s_, aug_)

            return _step_tree(method, rhs_s, s, aug, h)

        z, a, gth = jax.lax.fori_loop(0, dense, substep, (z_end, a, gth))
        return (a, gth), None

    a0 = jnp.zeros_like(zs[0])
    inputs = (zs[1:][::-1], zs_bar[1:][::-1], ts[:-1][::-1], ts[1:][::-1])
    (a_final, gth), _ = jax.lax.scan(interval, (a0, gth0), inputs)
    a_final = a_final + zs_bar[0]
    return gth, a_final, jnp.zeros_like(ts)


odeint_adjoint.defvjp(_adj_fwd, _adj_bwd)


def flow_forward_adjoint(gp, sample, z0, ts, order=1, solver='euler',
                         dense=1):
    """flow_forward variant using the continuous adjoint: gradients w.r.t.
    (gp, sample) flow through the backward ODE solve; the sample's own
    construction (Cholesky etc.) is differentiated by the outer graph."""
    from vae_gp_ode_tpu.gp.svgp import fn_eval

    def f(theta, t, z):
        gp_, sample_ = theta
        if order == 2:
            q = z.shape[1] // 2
            return jnp.concatenate([z[:, q:], fn_eval(gp_, sample_, z)],
                                   axis=1)
        return fn_eval(gp_, sample_, z)

    zs = odeint_adjoint(f, (gp, sample), z0, ts, method=solver,
                        dense=dense)
    nfe = jnp.asarray((ts.shape[0] - 1) * dense
                      * {'euler': 1, 'midpoint': 2, 'rk4': 4}[solver])
    return jnp.transpose(zs, (1, 0, 2)), nfe
