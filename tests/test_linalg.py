"""core.linalg: portable pure-HLO Cholesky/triangular solves.

The portable lowerings exist because LAPACK custom calls segfault when
executed from a DESERIALIZED jax.export artifact in a fresh process on
this jaxlib's CPU backend (the exporting process works - its in-process
executable cache masks the bug). Parity against the LAPACK path here;
the fresh-process regression lives in test_serving.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_gp_ode_tpu.core.linalg import (
    cholesky, solve, solve_triangular, portable_lowering, portable_mode,
    _chol_unblocked, _solve_gj, _solve_tri_unblocked)


def _lapack_custom_calls(mlir):
    """LAPACK custom-call OPS - not a plain substring search: MLIR
    location metadata can carry 'lapack' from Python function names
    (this file's own test names) traced earlier in the process."""
    return [l for l in mlir.splitlines()
            if 'custom_call' in l and 'lapack' in l.lower()]


def _spd(key, m, batch=()):
    a = jax.random.normal(key, batch + (m, m))
    return a @ jnp.swapaxes(a, -1, -2) + m * jnp.eye(m)


def test_portable_cholesky_matches_lapack():
    A = _spd(jax.random.PRNGKey(0), 24)
    np.testing.assert_allclose(np.asarray(_chol_unblocked(A)),
                               np.asarray(jnp.linalg.cholesky(A)),
                               rtol=1e-5, atol=1e-5)
    # batched (the dimwise-RBF path factorises (D, M, M) at once)
    Ab = _spd(jax.random.PRNGKey(1), 12, batch=(3,))
    np.testing.assert_allclose(np.asarray(_chol_unblocked(Ab)),
                               np.asarray(jnp.linalg.cholesky(Ab)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('lower', [True, False])
def test_portable_solve_matches_lapack(lower):
    key = jax.random.PRNGKey(2)
    L = jnp.linalg.cholesky(_spd(key, 16))
    T = L if lower else L.T
    b = jax.random.normal(jax.random.PRNGKey(3), (16, 5))
    got = _solve_tri_unblocked(T, b, lower)
    want = jax.scipy.linalg.solve_triangular(T, b, lower=lower)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_dispatch_follows_context():
    """Outside the context the wrappers are the XLA-native primitives;
    inside they are the scan lowerings (checked via the lowering text:
    no lapack custom calls)."""
    A = _spd(jax.random.PRNGKey(4), 8)
    assert not portable_mode()
    np.testing.assert_allclose(np.asarray(cholesky(A)),
                               np.asarray(jnp.linalg.cholesky(A)),
                               rtol=1e-6)
    # positive control: the native CPU lowering DOES carry lapack custom
    # calls (that is exactly what the portable mode exists to avoid).
    # NOTE fresh lambdas: the mode is read at TRACE time, and jit caches
    # traces per function object - re-jitting the same callable inside
    # the context would reuse the cached non-portable trace.
    hlo_native = jax.jit(lambda a: cholesky(a)).lower(A).as_text()
    assert _lapack_custom_calls(hlo_native)
    with portable_lowering():
        assert portable_mode()
        hlo = jax.jit(lambda a: cholesky(a)).lower(A).as_text()
        assert not _lapack_custom_calls(hlo)
        b = jnp.ones((8, 2))
        hlo_s = jax.jit(
            lambda t, c: solve_triangular(t, c, lower=True)).lower(
                A, b).as_text()
        assert not _lapack_custom_calls(hlo_s)
        assert not [l for l in hlo_s.splitlines()
                    if 'custom_call' in l and 'trsm' in l.lower()]
    assert not portable_mode()


def test_portable_cholesky_near_singular():
    """REGRESSION: the trained DF gram (MD=600, jitter 1e-5) has pivots
    around 2e-5 relative - smaller than a naive length-600 f32 summation
    error - and the first portable implementation NaN'd on it where
    LAPACK survived. The blocked two-level reduction + eps pivot floor
    must factorise a rank-deficient-plus-jitter matrix without NaNs and
    with a small residual."""
    key = jax.random.PRNGKey(7)
    B = jax.random.normal(key, (200, 40))
    # rank 40 + jitter: pivots ~2.5e-5 relative, the DF-checkpoint
    # conditioning class (at 1e-5 jitter/2.5e-7 relative even LAPACK
    # fails - that regime is genuinely indefinite in f32)
    A = B @ B.T + 1e-3 * jnp.eye(200)
    L = _chol_unblocked(A)
    assert np.isfinite(np.asarray(L)).all()
    res = np.abs(np.asarray(L @ L.T - 0.5 * (A + A.T))).max()
    res_native = np.abs(
        np.asarray(jnp.linalg.cholesky(A) @ jnp.linalg.cholesky(A).T - A)
    ).max()
    # the blocked reduction must stay in LAPACK's error class (same
    # order of magnitude; exact ordering flips with the configured
    # matmul precision)
    assert res <= res_native * 5, (res, res_native)
    assert res < 1e-6 * float(jnp.abs(A).max()) * 200, res
    # and the solves stay finite through the factor
    x = _solve_tri_unblocked(L, jnp.ones((200, 2)), True)
    assert np.isfinite(np.asarray(x)).all()


def test_portable_general_solve_matches_lapack():
    """The Gauss-Jordan solve (used by _newton_solve's non-SPD Jacobian
    systems when tracing exports) matches jnp.linalg.solve, including
    matrices that REQUIRE row pivoting (zero leading pivot)."""
    A = jax.random.normal(jax.random.PRNGKey(8), (12, 12))
    b = jax.random.normal(jax.random.PRNGKey(9), (12, 3))
    np.testing.assert_allclose(np.asarray(_solve_gj(A, b)),
                               np.asarray(jnp.linalg.solve(A, b)),
                               rtol=1e-4, atol=1e-5)
    # pivoting required: A[0, 0] == 0 (plain elimination would divide by 0)
    Ap = A.at[0, 0].set(0.0)
    np.testing.assert_allclose(np.asarray(_solve_gj(Ap, b)),
                               np.asarray(jnp.linalg.solve(Ap, b)),
                               rtol=1e-4, atol=1e-4)
    # batched + vector rhs (the _newton_solve shape class: (N, D, D);
    # jax >= 0.5 jnp.linalg.solve requires the explicit [..., None] form)
    Ab = jax.random.normal(jax.random.PRNGKey(10), (5, 6, 6)) \
        + 3.0 * jnp.eye(6)
    bb = jax.random.normal(jax.random.PRNGKey(11), (5, 6))
    got = _solve_gj(Ab, bb)
    want = jnp.linalg.solve(Ab, bb[..., None])[..., 0]
    assert got.shape == want.shape == (5, 6)
    with portable_lowering():
        np.testing.assert_allclose(np.asarray(solve(Ab, bb)),
                                   np.asarray(want), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(solve(Ab, bb)), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # dispatch: native outside the context, pure HLO inside
    assert _lapack_custom_calls(
        jax.jit(lambda a, c: solve(a, c)).lower(A, b).as_text())
    with portable_lowering():
        hlo = jax.jit(lambda a, c: solve(a, c)).lower(A, b).as_text()
        assert not _lapack_custom_calls(hlo)


def test_portable_cholesky_zero_diagonal_stays_finite():
    """A PSD matrix with an exactly-zero row/col has A_jj = 0, where the
    relative pivot floor eps*|A_jj| alone is 0 and the column scaling
    0/0 would produce NaNs; the absolute tiny floor keeps the factor
    finite (and exact on the nonzero block)."""
    A = _spd(jax.random.PRNGKey(12), 6)
    A = A.at[2, :].set(0.0).at[:, 2].set(0.0)
    L = _chol_unblocked(A)
    assert np.isfinite(np.asarray(L)).all()
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(A),
                               rtol=1e-5, atol=1e-5)


def test_portable_compute_nu_parity():
    """The kernel pathwise-update solves give the same nu either way."""
    from vae_gp_ode_tpu.gp.svgp import init_svgp_params, draw_fn_sample
    key = jax.random.PRNGKey(5)
    for kern in ('RBF', 'DF'):
        gp = init_svgp_params(key, D_in=3, D_out=3, M=8, kernel=kern)
        s_native = draw_fn_sample(gp, key, 16)
        with portable_lowering():
            s_portable = draw_fn_sample(gp, key, 16)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            s_native, s_portable)
