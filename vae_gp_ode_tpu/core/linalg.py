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
lowers per platform (`lax.platform_dependent`): the TPU branch keeps the
XLA-native primitives (already pure HLO there), every other platform
gets unblocked scan-based implementations built ONLY from portable HLO
ops (scan, scatter, matmul). At the model's sizes (one M=100 - or MD=600
DF - factorisation per GP function draw, once per trajectory) the
sequential-scan cost on CPU is irrelevant next to the ODE integration.

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
def portable_lowering(tpu_native=True):
    """Pin the portable linalg lowerings for the dynamic extent of the
    context (thread-local, nestable) - used when tracing `jax.export`
    serving artifacts.

    tpu_native=True (default, for SINGLE-platform exports): each wrapper
    lowers per platform via `lax.platform_dependent` - the TPU branch
    keeps the XLA-native primitive (pure HLO there, zero portability
    tax on the serving chip), everything else gets the scan
    implementation; single-platform lowering resolves the branch
    statically so the unused one is never emitted.

    tpu_native=False (for MULTI-platform artifacts): the scan
    implementations lower unconditionally on every platform. In a
    multi-platform module a native cholesky expands into per-platform
    sub-branches that EMBED the CPU LAPACK custom call alongside the
    TPU one; a fresh CPU process was verified to skip the dead branch
    fine, but TPU-side compilation of a module carrying a lapack custom
    call is unverifiable while the chip is tunnelled - all-scan is the
    conservative arrangement that contains no custom call anywhere.

    The mode is read at TRACE time: jit caches traces per function
    object, so a callable already traced OUTSIDE the context keeps its
    native lowering - trace a fresh closure inside the context (as
    serving.export_forecaster does)."""
    _tls.portable = getattr(_tls, 'portable', 0) + 1
    prev_native = getattr(_tls, 'tpu_native', True)
    _tls.tpu_native = bool(tpu_native) and prev_native
    try:
        yield
    finally:
        _tls.portable -= 1
        _tls.tpu_native = prev_native


_F32_EPS = 1.1920929e-07   # np.finfo(np.float32).eps
_F32_TINY = 1.1754944e-38  # np.finfo(np.float32).tiny (smallest normal)


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
        # relative floor, with an absolute floor under it: eps*|A_jj| is 0
        # when the diagonal entry is exactly 0 (a PSD matrix with a zero
        # row/col) and d = 0 would turn the 0/0 below-diagonal entries
        # into NaNs; tiny keeps them 0/sqrt(tiny) = 0
        floor = jnp.maximum(_F32_EPS * jnp.abs(jnp.take(col_a, j, axis=0)),
                            jnp.asarray(_F32_TINY, A.dtype))
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


def _per_platform(native_fn, portable_fn, *args):
    """Portable-mode lowering rule: TPU keeps the XLA-native primitive
    (its lowering is pure HLO - no LAPACK exists there, so a serialized
    artifact pays ZERO portability tax on the serving chip), every other
    platform gets the scan implementation (on CPU the native primitive
    is a LAPACK custom call, the segfault class; 'default' also covers
    unknown plugin platforms safely). `lax.platform_dependent` resolves
    the branch AT LOWERING TIME for single-platform exports (the dead
    branch is not even emitted) and via an unbatched platform index for
    multi-platform artifacts - verified: a deserialized cpu+tpu artifact
    executes the scan branch on a fresh CPU process without touching the
    tpu branch's custom call, and vmap preserves the cond (it only
    converts cond->select for BATCHED predicates)."""
    if not getattr(_tls, 'tpu_native', True):
        return portable_fn(*args)
    return jax.lax.platform_dependent(*args, tpu=native_fn,
                                      default=portable_fn)


def cholesky(A):
    """Lower Cholesky factor; portable per-platform lowering under
    `portable_lowering()` (TPU native / scan elsewhere), XLA-native
    otherwise. Batched like jnp.linalg.cholesky."""
    if portable_mode():
        return _per_platform(jnp.linalg.cholesky, _chol_unblocked, A)
    return jnp.linalg.cholesky(A)


def solve_triangular(T, b, lower=True):
    """Triangular solve T x = b; portable per-platform lowering under
    `portable_lowering()` (TPU native / substitution elsewhere),
    LAPACK/XLA-native otherwise."""
    if portable_mode():
        return _per_platform(
            lambda t, c: jax.scipy.linalg.solve_triangular(t, c,
                                                           lower=lower),
            lambda t, c: _solve_tri_unblocked(t, c, lower), T, b)
    return jax.scipy.linalg.solve_triangular(T, b, lower=lower)


def _solve_gj(A, b):
    """General square solve via Gauss-Jordan elimination with partial
    pivoting, pure HLO (scan + gather/scatter). A (..., M, M),
    b (..., M) or (..., M, K), batched like jnp.linalg.solve.

    Used for the (D, D) Newton systems in the implicit solvers
    (dynamics/solvers.py `_newton_solve`): those Jacobians are not SPD,
    so the Cholesky path above does not apply, and `jnp.linalg.solve`
    lowers to LAPACK getrf/trsm custom calls on CPU - the exact class
    that segfaults from a deserialized export."""
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    if A.ndim > 2:
        bshape = jnp.broadcast_shapes(A.shape[:-2], b.shape[:-2])
        A2 = jnp.broadcast_to(A, bshape + A.shape[-2:])
        b2 = jnp.broadcast_to(b, bshape + b.shape[-2:])
        A2 = A2.reshape((-1,) + A.shape[-2:])
        b2 = b2.reshape((-1,) + b.shape[-2:])
        out = jax.vmap(_solve_gj)(A2, b2)
        out = out.reshape(bshape + out.shape[-2:])
        return out[..., 0] if vec else out
    M = A.shape[-1]
    Ab = jnp.concatenate([A, b.astype(A.dtype)], axis=1)   # (M, M+K)
    rows = jnp.arange(M)

    def step(Ab, j):
        col = jnp.take(Ab, j, axis=1)                      # (M,)
        mag = jnp.where(rows >= j, jnp.abs(col), -jnp.inf)
        p = jnp.argmax(mag)                                # pivot row
        row_j = jnp.take(Ab, j, axis=0)
        row_p = jnp.take(Ab, p, axis=0)
        Ab = Ab.at[j].set(row_p).at[p].set(row_j)          # swap (p==j ok)
        piv = jnp.take(row_p, j, axis=0)
        piv = jnp.where(piv == 0, jnp.asarray(_F32_TINY, Ab.dtype), piv)
        pivot_row = row_p / piv                            # (M+K,)
        factors = jnp.where(rows == j, 0.0, jnp.take(Ab, j, axis=1))
        Ab = Ab - factors[:, None] * pivot_row[None, :]
        Ab = Ab.at[j].set(pivot_row)
        return Ab, None

    Ab, _ = jax.lax.scan(step, Ab, rows)
    x = Ab[:, M:]
    return x[..., 0] if vec else x


def solve(A, b):
    """General square solve A x = b; pure-HLO Gauss-Jordan with partial
    pivoting under `portable_lowering()`, jnp.linalg.solve (LAPACK
    getrf/trsm custom calls on CPU) otherwise. Batched like
    jnp.linalg.solve, plus the batched-vector form b (..., M) with
    matching batch dims (treated as a stack of 1-D solves on both
    paths; jax >= 0.5 rejects it as ambiguous in jnp.linalg.solve)."""
    if b.ndim == A.ndim - 1 and A.ndim > 2:
        return solve(A, b[..., None])[..., 0]
    if portable_mode():
        return _per_platform(jnp.linalg.solve, _solve_gj, A, b)
    return jnp.linalg.solve(A, b)
