"""Constrained <-> unconstrained parameter transforms.

The reference keeps GPflow-style Param objects with transform classes
(reference: experiments/model/misc/transforms.py, param.py,
constraint_utils.py). Here parameters are plain pytree leaves stored in
unconstrained space; these pure functions map them to/from the constrained
space. The lower-triangular packing is fully vectorised (`.at[...].set`)
instead of the reference's per-matrix numpy loops (transforms.py:59-81).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vae_gp_ode_tpu.core.settings import SOFTPLUS_LOWER


def softplus(x):
    """Positive constraint: softplus(x) + 1e-12.

    Parity with reference constraint_utils.py:5-7.
    """
    return jax.nn.softplus(x) + SOFTPLUS_LOWER


def invsoftplus(y):
    """Inverse of :func:`softplus` (reference constraint_utils.py:10-13)."""
    y = jnp.asarray(y)
    eps = jnp.finfo(y.dtype).eps
    ys = jnp.maximum(y - SOFTPLUS_LOWER, eps)
    return ys + jnp.log(-jnp.expm1(-ys))


def tril_indices(n):
    """Row/col indices of the lower triangle (static numpy, for traceability)."""
    rows, cols = np.tril_indices(n)
    return rows, cols


def tril_size(n):
    return n * (n + 1) // 2


@partial(jax.jit, static_argnums=(1,))
def unpack_tril(v, n):
    """Unpack `(..., n(n+1)/2)` packed vectors into `(..., n, n)` lower-tri
    matrices.

    Replaces the reference's LowerTriangular.forward_tensor loop
    (transforms.py:71-77) with a single vectorised scatter.
    """
    rows, cols = tril_indices(n)
    out_shape = v.shape[:-1] + (n, n)
    out = jnp.zeros(out_shape, dtype=v.dtype)
    return out.at[..., rows, cols].set(v)


def pack_tril(m):
    """Pack `(..., n, n)` lower-tri matrices into `(..., n(n+1)/2)` vectors."""
    n = m.shape[-1]
    rows, cols = tril_indices(n)
    return m[..., rows, cols]
