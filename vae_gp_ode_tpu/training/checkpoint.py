"""Checkpoint save/restore.

The reference dumps raw state_dicts every epoch and never saves optimizer
state (reference main.py:244; torch_utils.py:42-46 helper unused, so resume
restarts Adam moments - quirk documented, fixed here). We checkpoint the
full TrainState (params, batch stats, GP pytree, opt state, step) with
Orbax when available, falling back to a plain msgpack/npz blob.
"""

import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(state, path):
    """Serialise a TrainState pytree to `path` (single file)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host = _to_host(state)
    with open(path, 'wb') as f:
        pickle.dump(host, f)


def restore_checkpoint(path, like=None):
    """Restore a TrainState. If `like` is given, leaves are cast onto the
    same structure (guards against dataclass/version drift)."""
    with open(path, 'rb') as f:
        host = pickle.load(f)
    if like is None:
        return host
    leaves = jax.tree_util.tree_leaves(host)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves)


def save_checkpoint_orbax(state, path, step=None):
    """Orbax-backed checkpointing (the idiomatic JAX ecosystem path):
    versioned, async-capable, atomic. `path` is a directory."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    step = int(state.step) if step is None else int(step)
    ckptr.save(os.path.join(path, f'step_{step}'), _to_host(state),
               force=True)
    ckptr.wait_until_finished()


def restore_checkpoint_orbax(path, like, step=None):
    """Restore the latest (or given) step from an Orbax directory."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if step is None:
        steps = [int(d.split('_')[1]) for d in os.listdir(path)
                 if d.startswith('step_')]
        step = max(steps)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(path, f'step_{step}'),
                         target=_to_host(like))


def save_vae_weights(vae_params, batch_stats, encoder_path, decoder_path):
    """Save encoder/decoder separately, mirroring the reference VAE.save
    (reference vae.py:32-35) so pretraining and coupled training stay
    decoupled."""
    enc = {'params': vae_params['encoder'],
           'batch_stats': batch_stats.get('encoder', {})}
    dec = {'params': vae_params['decoder'],
           'batch_stats': batch_stats.get('decoder', {})}
    with open(encoder_path, 'wb') as f:
        pickle.dump(_to_host(enc), f)
    with open(decoder_path, 'wb') as f:
        pickle.dump(_to_host(dec), f)


def load_vae_weights(encoder_path, decoder_path):
    with open(encoder_path, 'rb') as f:
        enc = pickle.load(f)
    with open(decoder_path, 'rb') as f:
        dec = pickle.load(f)
    return enc, dec
