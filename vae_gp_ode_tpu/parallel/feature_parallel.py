"""Feature-parallel (tensor-parallel analog) GP evaluation via shard_map.

The SVGP posterior sample is f(x) = Phi(x) w + K(x, Z) nu. Both terms are
sums over an independent axis - S Fourier features for the prior, M
inducing points for the pathwise update - so they shard naturally over a
'model' mesh axis: each device evaluates its feature/inducing shard and a
single psum over ICI produces the full f(x). This is the model-parallel
dimension of this framework (the reference has no parallelism at all);
composes with data parallel on a 2D ('data', 'model') mesh.

RBF kernels only (the DF kernel's (M*D, M*D) coupling does not shard over
M without a distributed Cholesky; its nu is computed replicated).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vae_gp_ode_tpu.parallel.mesh import shard_map

from vae_gp_ode_tpu.gp.svgp import (SVGPParams, FnSample, draw_fn_sample,
                                    sample_inducing)
from vae_gp_ode_tpu.kernels import rbf as rbfk


def _check_rbf(gp: SVGPParams):
    if gp.kernel_name != 'RBF':
        raise ValueError(
            f'feature parallelism supports the RBF kernel only (got '
            f'{gp.kernel_name!r}): the DF kernel couples outputs through '
            f'its (M*D, M*D) gram and ORFF weights, which do not shard '
            f'over the feature axis without a distributed Cholesky')


def _prior_partial(kernel, omega, phase, weights, xs, S_global):
    """One device's partial prior term Phi_shard(xs) w_shard, with the
    quirk-preserving sqrt(var / S_global) scaling (the scale must use the
    GLOBAL feature count so the psum of partials equals the full-S eval)."""
    var = rbfk.rbf_variance(kernel)
    if kernel.dimwise:
        xo = jnp.einsum('nd,dfk->nfk', xs, omega)
        phi = jnp.cos(xo + phase) * jnp.sqrt(var / S_global)
        return jnp.einsum('nfk,fk->nk', phi, weights)
    xo = xs @ omega
    phi = jnp.cos(xo + phase) * jnp.sqrt(var / S_global)
    return phi @ weights


def fp_draw_fn_sample(gp: SVGPParams, key, S, mesh, axis='model',
                      local_draws=True):
    """Draw a pathwise sample whose RFF state is sharded over `axis`.

    With `local_draws=True` (default) the draw itself is SHARDED: each
    device folds its mesh index into the RFF key and draws only its
    S/n_devices feature slice inside shard_map, so the full (D_in, S,
    D_out) omega is never materialised on any device - per-device memory
    is O(S / n_devices), which is what makes S in the tens of thousands
    feasible (VERDICT r2 #8; tools/fp_large_s_bench.py measures it).
    The per-device slices are iid N(0, diag(1/ls^2)) exactly like the
    single-key draw, so the sample is distributionally identical (but not
    bit-identical) to `draw_fn_sample`; the inducing draw u ~ q(u) uses
    the same key on every device (replicated-deterministic), the prior
    at Z is psum'd from the per-device partials, and the tiny (M, D)
    Cholesky solve for nu stays replicated by design.

    `local_draws=False` keeps the replicate-then-shard behaviour (draw
    the full sample with the single key, then lay the feature axis out
    over the mesh) - bit-identical to the single-device sample, used by
    the exact-equivalence tests; O(S) memory at draw time.
    """
    _check_rbf(gp)
    dimwise = gp.kernel.dimwise
    if dimwise:
        spec_om = P(None, axis, None)    # (D_in, S, D_out)
        spec_ph = P(None, axis, None)    # (1, S, D_out)
    else:
        spec_om = P(None, axis)          # (D_in, S)
        spec_ph = P(None, axis)          # (1, S)
    spec_w = P(axis, None)               # (S, D_out)

    if not local_draws:
        sample = draw_fn_sample(gp, key, S)
        rff = sample.rff
        sharded_rff = rbfk.RFFState(
            omega=jax.device_put(rff.omega,
                                 jax.sharding.NamedSharding(mesh, spec_om)),
            phase=jax.device_put(rff.phase,
                                 jax.sharding.NamedSharding(mesh, spec_ph)),
            weights=jax.device_put(rff.weights,
                                   jax.sharding.NamedSharding(mesh, spec_w)),
        )
        return FnSample(rff=sharded_rff, nu=sample.nu)

    ndev = mesh.shape[axis]
    if S % ndev != 0:
        raise ValueError(f'sharded draw needs S % n_devices == 0 '
                         f'(got S={S}, n_devices={ndev})')
    S_local = S // ndev
    Z = gp.inducing_loc

    def draw_shard(k):
        i = jax.lax.axis_index(axis)
        k_rff, _ = jax.random.split(k[0])
        rff = rbfk.rbf_sample_rff(gp.kernel, jax.random.fold_in(k_rff, i),
                                  S_local, gp.D_in, gp.D_out)
        part = _prior_partial(gp.kernel, rff.omega, rff.phase,
                              rff.weights, Z, S)
        u_prior = jax.lax.psum(part, axis)
        return rff.omega, rff.phase, rff.weights, u_prior

    omega, phase, weights, u_prior = shard_map(
        draw_shard, mesh=mesh, in_specs=(P(),),
        out_specs=(spec_om, spec_ph, spec_w, P()),
        check_vma=False)(key[None])
    _, k_u = jax.random.split(key)
    u = sample_inducing(gp, k_u)
    Ku = rbfk.rbf_gram(gp.kernel, Z)
    nu = rbfk.rbf_compute_nu(gp.kernel, Ku, u_prior, u)
    return FnSample(rff=rbfk.RFFState(omega=omega, phase=phase,
                                      weights=weights), nu=nu)


def fp_fn_eval(gp: SVGPParams, sample: FnSample, x, mesh, axis='model'):
    """Evaluate f(x) with the RFF feature axis sharded over `axis`.

    Each device computes its partial Phi_shard(x) w_shard; one psum over
    ICI yields the full prior term. The quirk-preserving sqrt(var/S) uses
    the *global* S. The pathwise update runs replicated (M is tiny).
    """
    S_global = sample.rff.weights.shape[0]
    dimwise = gp.kernel.dimwise
    if dimwise:
        specs_in = (P(None, axis, None), P(None, axis, None), P(axis, None),
                    P())
    else:
        specs_in = (P(None, axis), P(None, axis), P(axis, None), P())

    def prior_shard(omega, phase, weights, xs):
        part = _prior_partial(gp.kernel, omega, phase, weights, xs,
                              S_global)
        return jax.lax.psum(part, axis)

    f_prior = shard_map(
        prior_shard, mesh=mesh, in_specs=specs_in, out_specs=P(),
        check_vma=False)(sample.rff.omega, sample.rff.phase,
                         sample.rff.weights, x)
    f_up = rbfk.rbf_f_update(gp.kernel, sample.nu, x, gp.inducing_loc)
    return f_prior + f_up


def fp_flow_forward(gp: SVGPParams, sample: FnSample, z0, ts, mesh,
                    order=1, solver='euler', dense=1, axis='model',
                    rtol=1e-6, atol=1e-6, max_steps=256):
    """Latent-trajectory integration with feature-parallel GP evaluation:
    every solver step's f(x) shards the S Fourier features over the mesh
    axis (one psum per step over ICI).

    This is the scale-out path for LARGE feature counts (S in the tens of
    thousands, where one device's VMEM/FLOPs no longer hold the feature
    map) - at the reference's S=256 a single chip is faster. Use for
    inference/rollouts or as the inner solve of a large-S config; training
    at reference sizes uses data parallelism (data_parallel.py).

    Same signature semantics as dynamics.flow.flow_forward — rtol/atol/
    max_steps reach the adaptive solvers — except remat, which is pinned
    False (recomputing the shard_map'd psum inside the backward pass
    re-issues collectives; storing residuals is the right trade here).
    Returns (zt (N, T, D), nfe)."""
    from vae_gp_ode_tpu.dynamics.solvers import odeint

    def rhs(t, z):
        if order == 2:
            q = z.shape[1] // 2
            return jnp.concatenate(
                [z[:, q:], fp_fn_eval(gp, sample, z, mesh, axis)], axis=1)
        return fp_fn_eval(gp, sample, z, mesh, axis)

    sol = odeint(rhs, z0, ts, method=solver, dense=dense, rtol=rtol,
                 atol=atol, max_steps=max_steps, remat=False)
    return jnp.transpose(sol.zs, (1, 0, 2)), sol.nfe
