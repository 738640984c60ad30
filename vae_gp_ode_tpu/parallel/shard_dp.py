"""shard_map data-parallel training that KEEPS the Pallas kernels.

The GSPMD data-parallel path (parallel.data_parallel) pins force_jnp=True
because the XLA partitioner cannot shard a pallas_call over the mesh.
This module is the per-shard alternative (VERDICT r2 #2): the step body
runs INSIDE jax.shard_map, so each device traces its own single-device
program - fused Pallas trajectory kernels included - and the cross-device
semantics are explicit:

  * BatchNorm statistics psum over the 'data' axis (the model is cloned
    with bn_axis=axis; flax BatchNorm(axis_name=...)), reproducing the
    single-device global-batch BN exactly.
  * The encoder reparameterisation noise is drawn as the GLOBAL (N, q)
    array on every shard (same key, deterministic threefry) and each
    shard slices its rows - bit-identical to the single-device draw.
    The GP function draws use the whole key on every shard, so all
    shards integrate the same L function samples (as one device would).
  * The per-shard ELBO terms are pmean'd to the global loss BEFORE
    value_and_grad, and the per-shard gradients are pmean'd after it
    (the collective transposes route the cross-shard cotangents -
    including through the BN stat psums - such that the across-shard
    mean IS the global gradient). Every shard then applies the identical
    Adam update, keeping state replicated.

Equivalence with the single-device step (Pallas ON) is pinned by
tests/test_parallel.py on the 8-device CPU mesh.
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from vae_gp_ode_tpu.parallel.mesh import shard_map
from vae_gp_ode_tpu.kernels.rbf import rbf_variance
from vae_gp_ode_tpu.training.objectives import compute_loss
from vae_gp_ode_tpu.training.trainer import (_make_epoch_fn,
                                              _make_segment_fn,
                                              _merge_collections)


def _reparam_noise_full(model, key, n_global):
    """The global (N, q) standard-normal encoder draws for `key`.

    MIRRORS the key-split structure of ODEGPVAE.__call__ -> encode
    (k_enc, k_traj = split(key); k_s, k_v = split(k_enc)); the pair is
    pinned together by the test_parallel equivalence tests."""
    k_enc, _ = jax.random.split(key)
    k_s, k_v = jax.random.split(k_enc)
    q = model.latent_dim
    noise_s = jax.random.normal(k_s, (n_global, q))
    noise_v = (jax.random.normal(k_v, (n_global, q))
               if model.order == 2 else None)
    return noise_s, noise_v


def _make_sharded_step(model, tx, num_observations, mesh, eps_guard,
                       axis, freeze_vae):
    """Per-shard step body (runs inside shard_map)."""
    model_l = model.clone(bn_axis=axis)
    ndev = mesh.shape[axis]

    def sharded_step(state, batch, key, L: int):
        n_local = batch.shape[0]
        idx = jax.lax.axis_index(axis)
        noise_s, noise_v = _reparam_noise_full(model, key, n_local * ndev)

        def _slice(a):
            if a is None:
                return None
            return jax.lax.dynamic_slice_in_dim(a, idx * n_local,
                                                n_local, 0)

        noise = (_slice(noise_s), _slice(noise_v))

        def loss_fn(params):
            vae_params, gp = params
            if freeze_vae:
                # same reference-exact semantics as the single-device
                # step: encoder/decoder eval-mode, encoder_v train-mode
                # (its BN stats psum over the data axis like any other)
                (Xrec, s_stats, v_stats, nfe), updates = model_l.apply(
                    {'params': vae_params,
                     'batch_stats': state.batch_stats},
                    batch, gp, key, L=L, train=False, train_v=True,
                    mutable=['batch_stats'], reparam_noise=noise)
                new_bs = _merge_collections(
                    state.batch_stats, updates.get('batch_stats', {}))
            else:
                (Xrec, s_stats, v_stats, nfe), updates = model_l.apply(
                    {'params': vae_params,
                     'batch_stats': state.batch_stats},
                    batch, gp, key, L=L, train=True,
                    mutable=['batch_stats'], reparam_noise=noise)
                new_bs = updates['batch_stats']
            loss, nll, kl_reg, kl_u = compute_loss(
                batch, Xrec, s_stats, v_stats, gp, num_observations,
                eps_guard=eps_guard)
            # per-shard means over local rows -> global means (the lhood
            # and kl_reg are per-sequence means; shards are equal-sized)
            loss = jax.lax.pmean(loss, axis)
            nll = jax.lax.pmean(nll, axis)
            kl_reg = jax.lax.pmean(kl_reg, axis)
            return loss, (nll, kl_reg, kl_u, nfe, new_bs)

        params = (state.vae_params, state.gp)
        (loss, (nll, kl_reg, kl_u, nfe, new_bs)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        # differentiating the pmean'd loss leaves each shard with a
        # DEVICE-VARYING gradient whose across-shard MEAN is the global
        # gradient (the psum/pmean transposes route the cross-shard
        # cotangents, incl. through the BN stat psums, such that the
        # shard SUM equals n_devices x the global grad - verified
        # empirically on the 8-CPU mesh); pmean completes + replicates it
        grads = jax.lax.pmean(grads, axis)
        updates, new_opt = tx.update(grads, state.opt_state, params)
        new_vae, new_gp = optax.apply_updates(params, updates)
        new_state = state.replace(
            step=state.step + 1, vae_params=new_vae, gp=new_gp,
            batch_stats=new_bs, opt_state=new_opt)
        metrics = {'loss': loss, 'nll': nll, 'kl_reg': kl_reg,
                   'kl_u': kl_u, 'nfe': nfe,
                   'kernel_var': rbf_variance(new_gp.kernel)}
        return new_state, metrics

    return sharded_step


def _shard_mapped(sharded_step, mesh, axis, L):
    return shard_map(
        partial(sharded_step, L=L), mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_rep=False)


def make_shardmap_train_step(model, tx, num_observations, mesh,
                             eps_guard=False, axis='data',
                             freeze_vae=False):
    """Data-parallel train step with per-shard Pallas kernels.

    Returns train_step(state, batch, key, L) - same signature/semantics
    as training.trainer.make_train_step; `state` replicated, `batch`
    sharded on its leading axis (batch % n_devices == 0 required)."""
    sharded = _make_sharded_step(model, tx, num_observations, mesh,
                                 eps_guard, axis, freeze_vae)

    def train_step(state, batch, key, L: int):
        return _shard_mapped(sharded, mesh, axis, L)(state, batch, key)

    return partial(jax.jit, static_argnums=(3,))(train_step)


def make_shardmap_train_epoch(model, tx, num_observations, mesh,
                              eps_guard=False, axis='data',
                              freeze_vae=False):
    """Whole-epoch scan over shard_map'd steps: one dispatch per epoch
    (the remote-link lever, CLAUDE.md) AND per-shard Pallas kernels.
    `batches` is the stacked (I, B, ...) epoch, B sharded over `axis`.
    Shares the scan body (incl. NaN-guard semantics) with the
    single-device path via training.trainer._make_epoch_fn."""
    sharded = _make_sharded_step(model, tx, num_observations, mesh,
                                 eps_guard, axis, freeze_vae)

    def step(state, batch, key, L: int):
        return _shard_mapped(sharded, mesh, axis, L)(state, batch, key)

    return partial(jax.jit, static_argnums=(3,))(_make_epoch_fn(step))


def make_shardmap_train_segment(model, tx, num_observations, mesh,
                                eps_guard=False, axis='data',
                                freeze_vae=False):
    """E whole epochs + the per-epoch monitoring eval as ONE dispatch,
    data-parallel with per-shard Pallas kernels: the segment body
    (training.trainer._make_segment_fn - same key-split order and
    permutation-stream contract as the single-device
    make_train_segment) scans epochs of shard_map'd steps. X/Xte stay
    replicated; each step's gathered (B, ...) batch is resharded over
    `axis` by shard_map's in_specs (B %% n_devices == 0 required). The
    monitoring eval runs replicated - identical to the per-epoch DP
    driver, which evals with the plain single-device step on the
    replicated state."""
    sharded = _make_sharded_step(model, tx, num_observations, mesh,
                                 eps_guard, axis, freeze_vae)

    def step(state, batch, key, L: int):
        return _shard_mapped(sharded, mesh, axis, L)(state, batch, key)

    return partial(jax.jit, static_argnums=(7,))(
        _make_segment_fn(step, model, freeze_vae))
