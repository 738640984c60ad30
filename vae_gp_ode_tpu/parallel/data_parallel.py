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

from vae_gp_ode_tpu.training.trainer import _make_step_fn


def replicate(tree, mesh):
    """Place every leaf replicated over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch, mesh, axis='data'):
    """Shard the leading (batch) dimension over the given mesh axis."""
    s = NamedSharding(mesh, P(axis))
    return jax.device_put(batch, s)


def make_parallel_train_step(model, tx, num_observations, mesh,
                             eps_guard=False, axis='data'):
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
    step = _make_step_fn(model, tx, num_observations, eps_guard)
    return partial(jax.jit, static_argnums=(3,),
                   in_shardings=(repl, data_sh, repl),
                   out_shardings=(repl, repl))(step)
