"""Dense linear algebra with a portable (pure-HLO) lowering mode.

By default `cholesky` / `solve_triangular` dispatch to the XLA-native
primitives (`jnp.linalg.cholesky`, `jax.scipy.linalg.solve_triangular`) -
the right choice on every backend for training and live inference.

On the CPU backend those primitives lower to LAPACK *custom calls*
(lapack_potrf / trsm), and this jaxlib build SEGFAULTS when such a custom
call is executed from a **deserialized** `jax.export` artifact in a fresh
process (measured: `exported.call` works in the exporting process, any
fresh process dies in the custom call; TPU lowerings are pure HLO and
unaffected). Serving artifacts must be runnable anywhere, so
`serving.export_forecaster` traces under `portable_lowering()`, which
swaps in unblocked scan-based implementations built ONLY from portable
HLO ops (scan, scatter, matmul). At the model's sizes (one M=100 - or
MD=600 DF - factorisation per GP function draw, once per trajectory) the
sequential-scan cost is irrelevant next to the ODE integration.

The portable implementations are exact algorithm twins of the reference
semantics (same f32 arithmetic order as the textbook left-looking
factorisation) and are parity-tested against the LAPACK path.
"""

import contextlib
import threading

import jax
import jax.numpy as jnp

_tls = threading.local()


def portable_mode():
    """True while tracing under `portable_lowering()` in this thread."""
    return bool(getattr(_tls, 'portable', 0))


@contextlib.contextmanager
def portable_lowering():
    """Pin the pure-HLO linalg lowerings for the dynamic extent of the
    context (thread-local, nestable) - used when tracing `jax.export`
    serving artifacts.

    The mode is read at TRACE time: jit caches traces per function
    object, so a callable already traced OUTSIDE the context keeps its
    native lowering - trace a fresh closure inside the context (as
    serving.export_forecaster does)."""
    _tls.portable = getattr(_tls, 'portable', 0) + 1
    try:
        yield
    finally:
        _tls.portable -= 1


_F32_EPS = 1.1920929e-07  # np.finfo(np.float32).eps


def _blocked_vecmat(v, Mat, bs=32):
    """(K,) @ (K, R) with two-level (block + tree) summation.

    A naive length-K f32 sum accumulates ~K*eps error; the trained DF
    gram's smallest Cholesky pivots (~2e-5 relative at MD=600) are
    SMALLER than that, so the Gram-update subtraction in the portable
    factorisation must use a lower-error reduction: per-32-block sums
    then a block-tree sum give ~(bs + K/bs)*eps - an order of magnitude
    tighter, matching what SIMD-lane LAPACK/Eigen reductions achieve.
    XLA keeps the two explicit reduces (no float reassociation)."""
    K, R = Mat.shape
    nb = -(-K // bs)
    pad = nb * bs - K
    if pad:
        Mat = jnp.pad(Mat, ((0, pad), (0, 0)))
        v = jnp.pad(v, (0, pad))
    return (Mat.reshape(nb, bs, R) * v.reshape(nb, bs, 1)).sum(1).sum(0)


def _chol_unblocked(A):
    """Left-looking unblocked Cholesky of an SPD matrix, pure HLO.

    scan over columns: column j needs only columns < j (already written;
    columns >= j of the carry are still zero, so the full contraction
    with L[j, :] sums exactly the k < j terms). The input is symmetrised
    (LAPACK reads one triangle; callers pass gram + jitter matrices that
    can carry ~1e-4 asymmetry) and the pivot is floored at eps*|A_jj| so
    a numerically-semidefinite direction degrades gracefully instead of
    propagating NaNs."""
    if A.ndim > 2:
        return jax.vmap(_chol_unblocked)(A)
    A = 0.5 * (A + A.T)
    M = A.shape[-1]
    idx = jnp.arange(M)

    def step(L, j):
        row_j = jnp.take(L, j, axis=0)           # (M,) cols < j live
        col_a = jnp.take(A, j, axis=1)           # (M,)
        s = col_a - _blocked_vecmat(row_j, L.T)  # (M,)
        piv = jnp.take(s, j, axis=0)
        floor = _F32_EPS * jnp.abs(jnp.take(col_a, j, axis=0))
        d = jnp.sqrt(jnp.maximum(piv, floor))
        col = jnp.where(idx > j, s / d, jnp.zeros_like(s))
        col = jnp.where(idx == j, d, col)
        return L.at[:, j].set(col), None

    L, _ = jax.lax.scan(step, jnp.zeros_like(A), idx)
    return L


def _solve_tri_unblocked(T, b, lower):
    """Forward/back substitution, pure HLO. T (M, M) triangular,
    b (M, K). Rows not yet solved are zero in the carry, so the full
    row-contraction sums exactly the already-solved terms."""
    if T.ndim > 2:
        return jax.vmap(lambda t, c: _solve_tri_unblocked(t, c, lower))(T, b)
    M = T.shape[-1]
    order = jnp.arange(M) if lower else jnp.arange(M - 1, -1, -1)

    def step(x, j):
        t_row = jnp.take(T, j, axis=0)                 # (M,)
        rhs = jnp.take(b, j, axis=0) - _blocked_vecmat(t_row, x)   # (K,)
        xj = rhs / jnp.take(t_row, j, axis=0)
        return x.at[j].set(xj), None

    x, _ = jax.lax.scan(step, jnp.zeros_like(b), order)
    return x


def cholesky(A):
    """Lower Cholesky factor; portable scan lowering under
    `portable_lowering()`, XLA-native otherwise. Batched like
    jnp.linalg.cholesky."""
    if portable_mode():
        return _chol_unblocked(A)
    return jnp.linalg.cholesky(A)


def solve_triangular(T, b, lower=True):
    """Triangular solve T x = b; portable substitution under
    `portable_lowering()`, LAPACK/XLA-native otherwise."""
    if portable_mode():
        return _solve_tri_unblocked(T, b, lower)
    return jax.scipy.linalg.solve_triangular(T, b, lower=lower)
