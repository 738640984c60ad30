"""Device mesh construction.

The reference is single-process single-device with no distributed layer at
all (SURVEY.md section 2: no torch.distributed / NCCL / MPI anywhere); this
module is the TPU-native *addition*: a jax.sharding.Mesh over ICI with
named axes, consumed by jit shardings (data parallel) and shard_map
(feature parallel). Collectives are inserted by XLA from sharding
annotations - there is no explicit communication library to port.
"""

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_shapes=None, n_devices=None):
    """Build a Mesh.

    @param axis_shapes: dict name -> size, e.g. {'data': 4, 'model': 2};
        defaults to {'data': <all devices>}.
    @param n_devices: cap on devices used (defaults to all available).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if axis_shapes is None:
        axis_shapes = {'data': len(devices)}
    names = tuple(axis_shapes.keys())
    shape = tuple(axis_shapes.values())
    total = int(np.prod(shape))
    if total != len(devices):
        raise ValueError(
            f'mesh shape {axis_shapes} needs {total} devices, '
            f'have {len(devices)}')
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


# ---- shard_map compatibility (single source for the parallel package) --
# jax >= 0.7 exports shard_map at top level; older jax spells it
# jax.experimental.shard_map. jax >= 0.8 renamed the replication-tracking
# kwarg check_rep -> check_vma; the custom_vjp boundary of the Pallas
# kernels defeats the tracking either way, so callers disable it under
# whichever name this jax spells it.
try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

import inspect as _inspect
_CHECK_KW = ('check_vma' if 'check_vma'
             in _inspect.signature(_shard_map).parameters else 'check_rep')


def shard_map(f, **kw):
    """`jax.shard_map` with version-portable replication-check kwarg
    (accepts either check_rep or check_vma and translates)."""
    for name in ('check_rep', 'check_vma'):
        if name in kw and name != _CHECK_KW:
            kw[_CHECK_KW] = kw.pop(name)
    return _shard_map(f, **kw)
