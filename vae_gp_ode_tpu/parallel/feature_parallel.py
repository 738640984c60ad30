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
from jax import shard_map

from vae_gp_ode_tpu.gp.svgp import SVGPParams, FnSample, draw_fn_sample
from vae_gp_ode_tpu.kernels import rbf as rbfk


def fp_draw_fn_sample(gp: SVGPParams, key, S, mesh, axis='model'):
    """Draw a pathwise sample whose RFF state is sharded over `axis`.

    The draw itself is replicated-deterministic (same key on every device);
    we draw the full sample and then shard the feature axis of (omega,
    phase, weights). nu (M x D) stays replicated - M=100 is tiny and its
    Cholesky is a single-device op by design.
    """
    if gp.kernel_name != 'RBF':
        raise ValueError(
            f'feature parallelism supports the RBF kernel only (got '
            f'{gp.kernel_name!r}): the DF kernel couples outputs through '
            f'its (M*D, M*D) gram and ORFF weights, which do not shard '
            f'over the feature axis without a distributed Cholesky')
    sample = draw_fn_sample(gp, key, S)
    rff = sample.rff
    if gp.kernel.dimwise:
        spec_om = P(None, axis, None)    # (D_in, S, D_out)
        spec_ph = P(None, axis, None)    # (1, S, D_out)
    else:
        spec_om = P(None, axis)          # (D_in, S)
        spec_ph = P(None, axis)          # (1, S)
    spec_w = P(axis, None)               # (S, D_out)
    sharded_rff = rbfk.RFFState(
        omega=jax.device_put(rff.omega,
                             jax.sharding.NamedSharding(mesh, spec_om)),
        phase=jax.device_put(rff.phase,
                             jax.sharding.NamedSharding(mesh, spec_ph)),
        weights=jax.device_put(rff.weights,
                               jax.sharding.NamedSharding(mesh, spec_w)),
    )
    return FnSample(rff=sharded_rff, nu=sample.nu)


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
        var = rbfk.rbf_variance(gp.kernel)
        if dimwise:
            xo = jnp.einsum('nd,dfk->nfk', xs, omega)
            phi = jnp.cos(xo + phase) * jnp.sqrt(var / S_global)
            part = jnp.einsum('nfk,fk->nk', phi, weights)
        else:
            xo = xs @ omega
            phi = jnp.cos(xo + phase) * jnp.sqrt(var / S_global)
            part = phi @ weights
        return jax.lax.psum(part, axis)

    f_prior = shard_map(
        prior_shard, mesh=mesh, in_specs=specs_in, out_specs=P(),
        check_vma=False)(sample.rff.omega, sample.rff.phase,
                         sample.rff.weights, x)
    f_up = rbfk.rbf_f_update(gp.kernel, sample.nu, x, gp.inducing_loc)
    return f_prior + f_up


def fp_flow_forward(gp: SVGPParams, sample: FnSample, z0, ts, mesh,
                    order=1, solver='euler', dense=1, axis='model'):
    """Latent-trajectory integration with feature-parallel GP evaluation:
    every solver step's f(x) shards the S Fourier features over the mesh
    axis (one psum per step over ICI).

    This is the scale-out path for LARGE feature counts (S in the tens of
    thousands, where one device's VMEM/FLOPs no longer hold the feature
    map) - at the reference's S=256 a single chip is faster. Use for
    inference/rollouts or as the inner solve of a large-S config; training
    at reference sizes uses data parallelism (data_parallel.py).

    Same signature semantics as dynamics.flow.flow_forward: returns
    (zt (N, T, D), nfe)."""
    from vae_gp_ode_tpu.dynamics.solvers import odeint

    def rhs(t, z):
        if order == 2:
            q = z.shape[1] // 2
            return jnp.concatenate(
                [z[:, q:], fp_fn_eval(gp, sample, z, mesh, axis)], axis=1)
        return fp_fn_eval(gp, sample, z, mesh, axis)

    sol = odeint(rhs, z0, ts, method=solver, dense=dense, remat=False)
    return jnp.transpose(sol.zs, (1, 0, 2)), sol.nfe
