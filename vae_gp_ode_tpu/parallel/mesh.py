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
