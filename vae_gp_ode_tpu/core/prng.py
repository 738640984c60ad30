"""Explicit PRNG-key plumbing helpers.

The reference draws randomness from hidden global numpy/torch state inside
the forward pass (reference kernels.py:13-26, svpy.py:12-27, vae.py:77).
In JAX every random draw takes an explicit key; these helpers keep the key
bookkeeping tidy and give tests a hook to inject exact noise.
"""

import jax
import jax.numpy as jnp


def split_dict(key, names):
    """Split `key` into a dict of named subkeys (order-stable)."""
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))


def normal(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


def uniform(key, shape, dtype=jnp.float32, minval=0.0, maxval=1.0):
    return jax.random.uniform(key, shape, dtype=dtype, minval=minval, maxval=maxval)


def seed_everything(seed):
    """Seed every host-side RNG and return the root JAX key.

    Counterpart of the reference's seed_everything (torch_utils.py:64-73,
    which seeds random/numpy/torch/cuda and sets cudnn deterministic).
    JAX device randomness is fully determined by the returned key.
    """
    import random as _random
    import numpy as _np
    _random.seed(seed)
    _np.random.seed(seed)
    return jax.random.PRNGKey(seed)
