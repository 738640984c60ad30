"""Jitted end-to-end train/eval steps.

The reference trains with a Python loop calling .backward() through the
solver unroll (reference main.py:199-220). Here one `train_step` is a
single jitted function: forward (encode -> L vmapped GP solves -> decode),
ELBO, grads for (vae params, gp params) jointly, Adam update, batch-stats
update - everything fused by XLA on-device. The MC sample count L is a
static argument (the reference switches L 1 -> 5 at half training,
main.py:200, which simply selects between two compiled variants).
"""

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vae_gp_ode_tpu.gp.svgp import SVGPParams
from vae_gp_ode_tpu.kernels.rbf import rbf_variance
from vae_gp_ode_tpu.ops import config as ops_config
from vae_gp_ode_tpu.training.objectives import compute_loss, compute_test_error


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    vae_params: Any
    batch_stats: Any
    gp: SVGPParams
    opt_state: Any


def create_train_state(model, variables, gp: SVGPParams, lr=1e-3,
                       optimizer: Optional[optax.GradientTransformation] = None,
                       freeze_vae: bool = False, fix_kernel: bool = False):
    """Build TrainState + optimizer over (vae_params, gp) jointly
    (reference main.py:194: single Adam param group, lr 1e-3).

    freeze_vae replicates the pretrained-VAE path (reference
    main.py:157-171): VAE gradients are zeroed, GP still trains.

    fix_kernel freezes the kernel hyperparameters (lengthscales +
    variance) during optimisation - the reference's
    `initialize_and_fix_kernel_parameters(..., fix=True)`
    (initialization.py:19-21 sets requires_grad_(False); its active
    call site passes fix=False, but the capability is part of the
    surface and the paper's fixed-hyperparameter DF runs use it, e.g.
    plots_dynamics_extended.ipynb's `odegpvae_ode1_df_fixed`). The
    incoming kernel-leaf gradients are zeroed BEFORE the optimizer, so
    Adam's moments stay exactly zero for those leaves - the same
    trajectory torch produces with requires_grad=False."""
    tx = optimizer if optimizer is not None else optax.adam(lr)
    if fix_kernel:
        def _kernel_mask(params):
            vae_p, gp_p = params
            gp_m = jax.tree.map(lambda _: False, gp_p)
            gp_m = gp_m.replace(kernel=gp_m.kernel.replace(
                unconstrained_lengthscales=True,
                unconstrained_variance=True))
            return (jax.tree.map(lambda _: False, vae_p), gp_m)
        tx = optax.chain(optax.masked(optax.set_to_zero(), _kernel_mask),
                         tx)
    if freeze_vae:
        tx = optax.multi_transform(
            {'vae': optax.set_to_zero(), 'gp': tx},
            param_labels=('vae', 'gp'))
    params = (variables['params'], gp)
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.asarray(0),
        vae_params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        gp=gp,
        opt_state=opt_state,
    ), tx


def _merge_collections(base, updates):
    """Overlay a PARTIAL mutated flax collection onto the full one (flax
    `mutable=` returns only entries actually written during apply - BN
    layers running with use_running_average=True write nothing)."""
    if not isinstance(base, dict):
        return updates
    out = dict(base)
    for k, v in updates.items():
        out[k] = _merge_collections(base.get(k, {}), v) \
            if isinstance(v, dict) else v
    return out


def _make_step_fn(model, tx, num_observations: float,
                  eps_guard: bool = False, force_jnp: bool = False,
                  freeze_vae: bool = False):
    """The un-jitted train step (shared by per-step and per-epoch paths).

    `force_jnp=True` pins the jnp compute path for the dynamic extent of
    the step body's trace (thread-local, see ops.config.forced_jnp) - the
    data-parallel factories use it because GSPMD cannot shard a
    pallas_call over the mesh.

    `freeze_vae=True` replicates the reference's pretrained-VAE step
    exactly (reference main.py:163-164 sets encoder/decoder to eval()):
    BatchNorm in encoder/decoder normalises with the pretrained RUNNING
    statistics and their batch_stats are never updated - but encoder_v is
    NOT eval()'d by the reference, so in order-2 runs the velocity
    encoder keeps train-mode BN (batch statistics + running-stat
    updates; its weights stay frozen like the rest). The optimizer-side
    freeze (zeroed VAE updates, create_train_state) handles the weights;
    this handles the statistics."""

    def train_step(state: TrainState, batch, key, L: int):
        if force_jnp:
            with ops_config.forced_jnp():
                return _body(state, batch, key, L)
        return _body(state, batch, key, L)

    def _body(state: TrainState, batch, key, L: int):
        def loss_fn(params):
            vae_params, gp = params
            if freeze_vae:
                # train_v=True: only encoder_v's BN runs train-mode, so
                # the mutated batch_stats differ from state.batch_stats
                # only in its subtree (empty diff for order-1 models)
                (Xrec, s_stats, v_stats, nfe), updates = model.apply(
                    {'params': vae_params,
                     'batch_stats': state.batch_stats},
                    batch, gp, key, L=L, train=False, train_v=True,
                    mutable=['batch_stats'])
                new_bs = _merge_collections(
                    state.batch_stats, updates.get('batch_stats', {}))
            else:
                (Xrec, s_stats, v_stats, nfe), updates = model.apply(
                    {'params': vae_params,
                     'batch_stats': state.batch_stats},
                    batch, gp, key, L=L, train=True,
                    mutable=['batch_stats'])
                new_bs = updates['batch_stats']
            loss, nll, kl_reg, kl_u = compute_loss(
                batch, Xrec, s_stats, v_stats, gp, num_observations,
                eps_guard=eps_guard)
            return loss, (nll, kl_reg, kl_u, nfe, new_bs)

        params = (state.vae_params, state.gp)
        (loss, (nll, kl_reg, kl_u, nfe, new_bs)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, state.opt_state, params)
        new_vae, new_gp = optax.apply_updates(params, updates)
        new_state = state.replace(
            step=state.step + 1, vae_params=new_vae, gp=new_gp,
            batch_stats=new_bs, opt_state=new_opt)
        metrics = {'loss': loss, 'nll': nll, 'kl_reg': kl_reg,
                   'kl_u': kl_u, 'nfe': nfe,
                   # post-update kernel variance, so the scanned-epoch
                   # path can log the LIVE per-iteration trace exactly
                   # like the per-step loop (reference main.py:219)
                   'kernel_var': rbf_variance(new_gp.kernel)}
        return new_state, metrics

    return train_step


def make_train_step(model, tx, num_observations: float,
                    eps_guard: bool = False, freeze_vae: bool = False):
    """Returns train_step(state, batch, key, L) jitted with static L."""
    return partial(jax.jit, static_argnums=(3,))(
        _make_step_fn(model, tx, num_observations, eps_guard,
                      freeze_vae=freeze_vae))


def _make_epoch_fn(step):
    """Scan `step` over an epoch's stacked batches (shared by the
    single-device and data-parallel epoch paths).

    NaN guard semantics: if a step produces a non-finite loss, that step's
    update is discarded (state carried through unchanged) and the metric
    row reports the non-finite loss so the host-side bailout (reference
    main.py:205-207) still fires after the epoch.
    """

    def train_epoch(state: TrainState, batches, key, L: int):
        def body(carry, batch):
            st, k = carry
            k, k_step = jax.random.split(k)
            new_st, metrics = step(st, batch, k_step, L)
            ok = jnp.isfinite(metrics['loss'])
            new_st = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_st, st)
            return (new_st, k), metrics

        (state, _), metrics = jax.lax.scan(body, (state, key), batches)
        return state, metrics

    return train_epoch


def make_train_epoch(model, tx, num_observations: float,
                     eps_guard: bool = False, freeze_vae: bool = False):
    """Whole-epoch training as one device dispatch.

    The reference (and the per-step path) fetches every metric scalar to
    the host each iteration; over a remote TPU link those round-trips
    dominate wall-clock (~190x the compute at reference sizes). This
    variant lax.scans the train step over the epoch's stacked batches and
    returns per-iteration metric ARRAYS, fetched once per epoch.

    Returns train_epoch(state, batches (I,B,T,1,d,d), key, L). The
    data-parallel variant is parallel.make_parallel_train_epoch.
    """
    step = _make_step_fn(model, tx, num_observations, eps_guard,
                         freeze_vae=freeze_vae)
    return partial(jax.jit, static_argnums=(3,))(_make_epoch_fn(step))


def make_train_segment(model, tx, num_observations: float,
                       eps_guard: bool = False, freeze_vae: bool = False):
    """E whole TRAINING EPOCHS - train scan, ragged-tail step, and the
    reference's per-epoch first-test-batch monitoring eval (reference
    main.py:236-246) - as ONE device dispatch.

    The per-epoch scanned path still pays one dispatch for the train
    epoch plus one for the eval every epoch; over a remote-TPU link those
    round-trips bound wall-clock long before compute does. This segment
    lax.scans whole epochs, gathering each epoch's batches on device from
    host-precomputed permutation indices (Loader.epoch_index_batches /
    first_index - the SAME permutation stream the per-epoch path
    consumes) and splitting the PRNG key in exactly the per-epoch
    driver's order, so the training trajectory sees identical batches
    and randomness as E iterations of run_epoch_with_tail + the
    monitoring eval; being a separate XLA compilation it may differ by
    fusion rounding (~1e-6 relative, pinned in test_model.py), and the
    host fetch cadence coarsens to the segment.

    Returns segment(state, X, heads, tails, Xte, test_idx, key, L) ->
    (state, metrics (E, I[+1]) arrays, mses (E,), key') with static L.
    `tails` is None when Ndata % batch == 0 (its None-ness is baked into
    the trace). The frozen-VAE weight assert stays with the driver: one
    equality check on the segment-final params covers every epoch in it
    (weights only change through optimizer updates).
    """
    step = _make_step_fn(model, tx, num_observations, eps_guard,
                         freeze_vae=freeze_vae)
    return partial(jax.jit, static_argnums=(7,))(
        _make_segment_fn(step, model, freeze_vae))


def _make_segment_fn(step, model, freeze_vae):
    """The un-jitted E-epoch segment body over an arbitrary `step`
    (single-device _make_step_fn or the shard_map DP step - the epoch
    scan, tail handling, key-split order and monitoring eval are
    identical; the DP eval runs replicated, which equals the
    single-device eval bit-for-bit since state and test batch are
    replicated). See make_train_segment for the full contract."""
    epoch = _make_epoch_fn(step)

    def segment(state: TrainState, X, heads, tails, Xte, test_idx, key,
                L: int):
        def body(carry, idx):
            st, k = carry
            if tails is None:
                head_idx, te_idx = idx
            else:
                head_idx, tail_idx, te_idx = idx
            # -- train epoch (driver order: key, k_ep = split(key); the
            # shared helper owns the k_scan/k_tail split and the tail
            # NaN-guard, so segment and per-epoch semantics cannot drift)
            k, k_ep = jax.random.split(k)
            st, metrics = run_epoch_with_tail(
                epoch, step, st, X[head_idx],
                None if tails is None else X[tail_idx], k_ep, L)
            # -- monitoring eval on the epoch's first test batch
            k, k_ev = jax.random.split(k)
            test_batch = Xte[te_idx]
            if freeze_vae:
                # frozen VAE: eval-mode BN, stats untouched (the
                # reference eval()s the pretrained encoder/decoder)
                Xrec, _, _, _ = model.apply(
                    {'params': st.vae_params,
                     'batch_stats': st.batch_stats},
                    test_batch, st.gp, k_ev, L=1, train=False)
            else:
                # reference main.py:236-246 never leaves train mode:
                # batch-stat BN + running-stat updates folded back
                (Xrec, _, _, _), updates = model.apply(
                    {'params': st.vae_params,
                     'batch_stats': st.batch_stats},
                    test_batch, st.gp, k_ev, L=1, train=True,
                    mutable=['batch_stats'])
                st = st.replace(batch_stats=updates['batch_stats'])
            mse = compute_test_error(test_batch, jnp.mean(Xrec, axis=0))
            return (st, k), (metrics, mse)

        xs = ((heads, test_idx) if tails is None
              else (heads, tails, test_idx))
        (state, key), (metrics, mses) = jax.lax.scan(body, (state, key),
                                                     xs)
        return state, metrics, mses, key

    return segment


def run_epoch_with_tail(train_epoch, train_step, state, batches, tail,
                        key, L: int):
    """One full epoch over a possibly-non-divisor split: the scanned
    whole-epoch path over the (I, B, ...) stacked batches plus ONE extra
    per-step dispatch for the ragged tail batch (Ndata % batch != 0), so
    the scanned regime trains on every sequence the reference DataLoader
    would yield (drop_last=False) instead of silently dropping the tail.

    The tail step gets the same NaN-guard semantics as the scan body
    (non-finite loss -> update discarded, metric row kept) and its
    metrics are appended as one extra row to the epoch's metric arrays.
    """
    k_scan, k_tail = jax.random.split(key)
    state, metrics = train_epoch(state, batches, k_scan, L)
    if tail is None:
        return state, metrics
    new_state, tmetrics = train_step(state, tail, k_tail, L)
    ok = jnp.isfinite(tmetrics['loss'])
    state = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state,
                         state)
    metrics = {k: jnp.concatenate([v, tmetrics[k][None]])
               for k, v in metrics.items()}
    return state, metrics


def make_eval_step(model, T_custom: Optional[int] = None):
    """Returns eval_step(state, batch, key, L) -> (Xrec, mse), with
    eval-mode BatchNorm (running statistics).

    This is the PUBLISHED-NUMBER protocol: the reference notebooks call
    model.eval() before compute_mse_std (plots_dynamics.ipynb cell 8).
    The reference's per-epoch monitoring eval is different - it never
    leaves train mode (main.py:236-246 uses only no_grad) - see
    make_epoch_eval_step for that variant.
    """

    @partial(jax.jit, static_argnums=(3,))
    def eval_step(state: TrainState, batch, key, L: int = 1):
        Xrec, _, _, nfe = model.apply(
            {'params': state.vae_params, 'batch_stats': state.batch_stats},
            batch, state.gp, key, L=L, T_custom=T_custom, train=False)
        if T_custom is None:
            mse = compute_test_error(batch, jnp.mean(Xrec, axis=0))
        else:
            mse = jnp.asarray(0.0)
        return Xrec, mse

    return eval_step


def make_epoch_eval_step(model):
    """The reference's PER-EPOCH monitoring eval, exactly: the model
    never leaves train mode (reference main.py:236-246 wraps only
    torch.no_grad()), so BatchNorm normalises the test batch with its own
    statistics AND updates the running statistics - torch BN in train
    mode updates running stats even under no_grad. Returns
    eval_step(state, batch, key, L) -> (Xrec, mse, new_batch_stats);
    fold new_batch_stats back into the TrainState to keep the checkpoint
    trajectory reference-faithful. For frozen-VAE (--pretrained) runs use
    make_eval_step instead (the reference sets the VAE to eval() there,
    main.py:163-164)."""

    @partial(jax.jit, static_argnums=(3,))
    def eval_step(state: TrainState, batch, key, L: int = 1):
        (Xrec, _, _, nfe), updates = model.apply(
            {'params': state.vae_params, 'batch_stats': state.batch_stats},
            batch, state.gp, key, L=L, train=True,
            mutable=['batch_stats'])
        mse = compute_test_error(batch, jnp.mean(Xrec, axis=0))
        return Xrec, mse, updates['batch_stats']

    return eval_step
