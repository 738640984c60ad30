"""Data-parallel training over a device mesh.

TPU-native scaling strategy for this model family (the whole model is
<1 M parameters; batch is the only large axis): parameters and optimizer
state are replicated, the batch is sharded over the 'data' mesh axis, and
XLA turns the batch-mean gradient reduction into an ICI all-reduce from the
sharding annotations alone. BatchNorm statistics are computed over the
*global* batch (GSPMD lowers the mean to a cross-device reduction), which
is exact - stronger than per-device BN.

This replaces nothing in the reference (which is single-device); it is the
framework's scale-out path.
"""

from functools import partial

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from vae_gp_ode_tpu.training.trainer import _make_step_fn, _make_epoch_fn


# The Pallas fast-path kernels are single-device programs; the GSPMD
# partitioner cannot shard a pallas_call over the mesh (it would
# all-gather the batch and replicate the solve, silently serialising the
# hot loop - or reject the lowering outright on real multi-chip
# hardware). The XLA graph partitions cleanly and fuses well, so the
# data-parallel factories build their step with force_jnp=True: the pin
# is scoped to the traced step body (thread-local, ops.config.forced_jnp)
# rather than toggling process-global state around the call. (Per-shard
# Pallas via shard_map is the eventual upgrade path; it needs
# axis_name-aware BatchNorm and explicit grad psums.)


def replicate(tree, mesh):
    """Place every leaf replicated over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch, mesh, axis='data'):
    """Shard the leading (batch) dimension over the given mesh axis."""
    s = NamedSharding(mesh, P(axis))
    return jax.device_put(batch, s)


def make_parallel_train_step(model, tx, num_observations, mesh,
                             eps_guard=False, axis='data',
                             freeze_vae=False):
    """Data-parallel train step: exactly the single-device step body
    (training.trainer._make_step_fn - one source of truth for the math),
    jitted with explicit shardings over `mesh`.

    Returns train_step(state, batch, key, L). `state` must be replicated
    (see `replicate`), `batch` sharded on its leading axis
    (see `shard_batch`). XLA inserts the gradient all-reduce and the
    global-batch BatchNorm reductions from the annotations alone.
    """
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(axis))
    step = _make_step_fn(model, tx, num_observations, eps_guard,
                         force_jnp=True, freeze_vae=freeze_vae)
    return partial(jax.jit, static_argnums=(3,),
                   in_shardings=(repl, data_sh, repl),
                   out_shardings=(repl, repl))(step)


def make_parallel_train_epoch(model, tx, num_observations, mesh,
                              eps_guard=False, axis='data',
                              freeze_vae=False):
    """Data-parallel whole-epoch training: the single-device epoch scan
    (training.trainer._make_epoch_fn - one source of truth) jitted with
    mesh shardings, so multi-chip training keeps the one-dispatch-per-epoch
    property (the per-step path is host-round-trip-bound over a remote
    link; CLAUDE.md measured ~190x).

    `batches` is the stacked (I, B, ...) epoch from Loader.epoch_batches,
    sharded on the PER-BATCH axis B (P(None, 'data')): each scan iteration
    trains on one global batch split across devices, identical math to the
    single-device epoch. Returns train_epoch(state, batches, key, L).
    """
    repl = NamedSharding(mesh, P())
    batches_sh = NamedSharding(mesh, P(None, axis))
    step = _make_step_fn(model, tx, num_observations, eps_guard,
                         force_jnp=True, freeze_vae=freeze_vae)
    return partial(jax.jit, static_argnums=(3,),
                   in_shardings=(repl, batches_sh, repl),
                   out_shardings=(repl, repl))(_make_epoch_fn(step))


def shard_epoch(batches, mesh, axis='data'):
    """Place stacked epoch batches (I, B, ...) with B sharded over the
    mesh axis (the layout make_parallel_train_epoch expects)."""
    s = NamedSharding(mesh, P(None, axis))
    return jax.device_put(batches, s)
