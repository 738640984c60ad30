"""Checkpoint save/restore.

The reference dumps raw state_dicts every epoch and never saves optimizer
state (reference main.py:244; torch_utils.py:42-46 helper unused, so resume
restarts Adam moments - quirk documented, fixed here). We checkpoint the
full TrainState (params, batch stats, GP pytree, opt state, step).

Formats:
  * default single-file format is **npz** (flattened leaves + a treedef
    fingerprint): loading it executes no code, so checkpoints from
    untrusted sources are safe to open.
  * legacy **pickle** checkpoints are still readable (restore falls back
    with a warning) - pickle executes arbitrary code on load, so only
    resume trusted local files.
  * Orbax directory checkpoints for the idiomatic JAX ecosystem path
    (versioned, async-capable, atomic).

Restoring onto a `like` pytree validates leaf count and per-leaf
shape/dtype before reattaching, so a checkpoint whose structure drifted
cannot silently mis-assign parameters.
"""

import io
import os
import pickle
import warnings

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _treedef_fingerprint(tree):
    return str(jax.tree_util.tree_structure(tree))


def _validate_like(leaves, like, src_fingerprint=None):
    """Raise if `leaves` cannot safely be reattached to `like`'s treedef.

    Returns the leaves, with integer leaves cast to the target's integer
    width when the values round-trip losslessly (int64 step counters
    saved on another numpy/platform must still restore into an int32
    target); genuine float/int kind mismatches and lossy casts refuse.
    """
    like_leaves = jax.tree_util.tree_leaves(like)
    if len(leaves) != len(like_leaves):
        raise ValueError(
            f'checkpoint/model structure mismatch: checkpoint has '
            f'{len(leaves)} leaves, target has {len(like_leaves)}')
    out = []
    for i, (a, b) in enumerate(zip(leaves, like_leaves)):
        a_shape = np.shape(a)
        b_shape = np.shape(b)
        if a_shape != b_shape:
            raise ValueError(
                f'checkpoint/model structure mismatch at leaf {i}: '
                f'checkpoint shape {a_shape} vs target shape {b_shape} - '
                f'refusing to reattach by flat order')
        a_arr = np.asarray(a)
        a_dt = a_arr.dtype
        b_dt = np.asarray(b).dtype
        if a_dt != b_dt:
            if a_dt.kind in 'iu' and b_dt.kind in 'iu':
                cast = a_arr.astype(b_dt)
                if not np.array_equal(cast.astype(a_dt), a_arr):
                    raise ValueError(
                        f'checkpoint leaf {i}: integer value does not fit '
                        f'target dtype {b_dt} (saved as {a_dt})')
                out.append(cast)
                continue
            raise ValueError(
                f'checkpoint/model structure mismatch at leaf {i}: '
                f'checkpoint dtype {a_dt} vs target dtype {b_dt} - '
                f'refusing to reattach by flat order')
        out.append(a)
    if src_fingerprint is not None:
        tgt = _treedef_fingerprint(like)
        if src_fingerprint != tgt:
            warnings.warn(
                'checkpoint treedef differs from the target (leaf '
                'count/shapes match, so this is probably benign '
                'dataclass-version drift); verify the restored state',
                stacklevel=3)
    return out


def save_checkpoint(state, path):
    """Serialise a TrainState pytree to `path` (single npz file; loading
    executes no code, unlike pickle)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host = _to_host(state)
    leaves = jax.tree_util.tree_leaves(host)
    payload = {f'leaf_{i}': np.asarray(v) for i, v in enumerate(leaves)}
    payload['__treedef__'] = np.asarray(_treedef_fingerprint(host))
    buf = io.BytesIO()
    np.savez(buf, **payload)
    with open(path, 'wb') as f:
        f.write(buf.getvalue())


def restore_checkpoint(path, like=None):
    """Restore a TrainState saved by save_checkpoint.

    npz checkpoints (the default format) load without executing code and
    require `like` (the treedef donor); structure is validated leaf by
    leaf. Legacy pickle checkpoints still load, with a warning - pickle
    runs arbitrary code, so only restore trusted local files that way.
    """
    # npz files are zip archives; sniff the magic bytes instead of
    # classifying any np.load failure as "legacy pickle" (a corrupt or
    # truncated npz must error, not fall through to code-executing pickle)
    with open(path, 'rb') as f:
        magic = f.read(2)
    if magic == b'PK':
        data = np.load(path, allow_pickle=False)
        if like is None:
            raise ValueError('npz checkpoints need `like=` (treedef donor)')
        n = sum(1 for k in data.files if k.startswith('leaf_'))
        leaves = [data[f'leaf_{i}'] for i in range(n)]
        fp = str(data['__treedef__']) if '__treedef__' in data.files \
            else None
        leaves = _validate_like(leaves, like, fp)
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(like), leaves)
    warnings.warn(
        f'{path} is a legacy pickle checkpoint (loading executes code; '
        f'only restore trusted local files). Re-save to get the npz '
        f'format.', stacklevel=2)
    with open(path, 'rb') as f:
        host = pickle.load(f)
    if like is None:
        return host
    leaves = jax.tree_util.tree_leaves(host)
    leaves = _validate_like(leaves, like, _treedef_fingerprint(host))
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
        # only exact step_<int> entries: an interrupted save leaves Orbax
        # temp dirs like 'step_100.orbax-checkpoint-tmp-123' which must
        # not crash (or win) the latest-step scan
        steps = [int(d[5:]) for d in os.listdir(path)
                 if d.startswith('step_') and d[5:].isdigit()]
        if not steps:
            raise FileNotFoundError(
                f'no complete step_<n> checkpoints under {path}')
        step = max(steps)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(path, f'step_{step}'),
                         target=_to_host(like))


def save_vae_weights(vae_params, batch_stats, encoder_path, decoder_path):
    """Save encoder/decoder separately, mirroring the reference VAE.save
    (reference vae.py:32-35) so pretraining and coupled training stay
    decoupled. npz format: param and batch-stat leaves with path keys."""
    from flax import traverse_util

    def _save(params, stats, path):
        flat = {'p/' + '/'.join(k): np.asarray(v)
                for k, v in traverse_util.flatten_dict(params).items()}
        flat.update({'s/' + '/'.join(k): np.asarray(v)
                     for k, v in traverse_util.flatten_dict(stats).items()})
        buf = io.BytesIO()
        np.savez(buf, **flat)
        with open(path, 'wb') as f:
            f.write(buf.getvalue())

    _save(vae_params['encoder'], batch_stats.get('encoder', {}),
          encoder_path)
    _save(vae_params['decoder'], batch_stats.get('decoder', {}),
          decoder_path)


def load_vae_weights(encoder_path, decoder_path):
    """Load encoder/decoder weight files saved by save_vae_weights (npz) or
    by older versions (pickle; warns - see restore_checkpoint)."""
    from flax import traverse_util

    def _load(path):
        # same magic-byte discrimination as restore_checkpoint: a corrupt
        # or hostile npz must error, never fall through to pickle
        with open(path, 'rb') as f:
            magic = f.read(2)
        if magic == b'PK':
            data = np.load(path, allow_pickle=False)
        else:
            warnings.warn(
                f'{path} is a legacy pickle VAE checkpoint (loading '
                f'executes code; only load trusted local files)',
                stacklevel=3)
            with open(path, 'rb') as f:
                return pickle.load(f)
        params = {tuple(k[2:].split('/')): data[k] for k in data.files
                  if k.startswith('p/')}
        stats = {tuple(k[2:].split('/')): data[k] for k in data.files
                 if k.startswith('s/')}
        return {'params': traverse_util.unflatten_dict(params),
                'batch_stats': traverse_util.unflatten_dict(stats)}

    return _load(encoder_path), _load(decoder_path)
