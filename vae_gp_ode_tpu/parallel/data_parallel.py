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

from vae_gp_ode_tpu.training.trainer import TrainState  # noqa: F401 (doc)
from vae_gp_ode_tpu.training.objectives import compute_loss


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
    """Data-parallel version of training.trainer.make_train_step:
    identical math, jitted with explicit shardings over `mesh`.

    Returns train_step(state, batch, key, L). `state` must be replicated
    (see `replicate`), `batch` sharded on its leading axis
    (see `shard_batch`).
    """
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(axis))

    @partial(jax.jit, static_argnums=(3,),
             in_shardings=(repl, data_sh, repl),
             out_shardings=(repl, repl))
    def train_step(state, batch, key, L: int):
        def loss_fn(params):
            vae_params, gp = params
            (Xrec, s_stats, v_stats, nfe), updates = model.apply(
                {'params': vae_params, 'batch_stats': state.batch_stats},
                batch, gp, key, L=L, train=True, mutable=['batch_stats'])
            loss, nll, kl_reg, kl_u = compute_loss(
                batch, Xrec, s_stats, v_stats, gp, num_observations,
                eps_guard=eps_guard)
            return loss, (nll, kl_reg, kl_u, nfe, updates['batch_stats'])

        params = (state.vae_params, state.gp)
        (loss, (nll, kl_reg, kl_u, nfe, new_bs)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        import optax
        updates, new_opt = tx.update(grads, state.opt_state, params)
        new_vae, new_gp = optax.apply_updates(params, updates)
        new_state = state.replace(
            step=state.step + 1, vae_params=new_vae, gp=new_gp,
            batch_stats=new_bs, opt_state=new_opt)
        metrics = {'loss': loss, 'nll': nll, 'kl_reg': kl_reg,
                   'kl_u': kl_u, 'nfe': nfe}
        return new_state, metrics

    return train_step
