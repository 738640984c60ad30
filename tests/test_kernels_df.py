"""Divergence-free kernel tests: closed-form parity and the divergence-free
property of sampled fields."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_gp_ode_tpu.kernels import rbf as rbfk
from vae_gp_ode_tpu.kernels import divfree as dfk


@pytest.fixture
def params():
    # DF kernel reuses the dimwise layout: lengthscales (D, D), variance (D,)
    return rbfk.init_rbf_params(3, 3, dimwise=True, lengthscale=1.4,
                                variance=0.9)


def np_df_gram(X, X2, ls, var):
    """Independent numpy transcription of the DF gram closed form
    (envelope x Hessian-structure term), matching the reference semantics:
    unscaled distances, (D, D) lengthscale broadcast, interleaved reshape."""
    N, D = X.shape
    M = X2.shape[0]
    ls2 = ls * ls                                        # (D, D)
    sq = ((X[:, None, :] - X2[None, :, :]) ** 2).sum(-1)  # (N, M)
    sq4 = sq[:, :, None, None]
    rbf_term = var * np.exp(-sq4 / (2 * ls2))            # (N, M, D, D)
    diff = X2.T[:, None, :] - X.T[:, :, None]            # (D, N, M)
    outer = np.transpose(diff[:, None] * diff[None], (2, 3, 0, 1))
    term1 = outer / ls2
    term2 = ((D - 1.0) - sq4 / ls2) * np.eye(D)[None, None]
    K = rbf_term * (term1 + term2) / ls2
    return np.transpose(K, (0, 2, 1, 3)).reshape(N * D, M * D)


def test_gram_matches_numpy(params):
    rng = np.random.RandomState(3)
    X = rng.randn(5, 3).astype(np.float32)
    X2 = rng.randn(4, 3).astype(np.float32)
    ls = np.asarray(rbfk.rbf_lengthscales(params))
    var = np.asarray(rbfk.rbf_variance(params))
    K = dfk.df_gram(params, jnp.asarray(X), jnp.asarray(X2))
    ref = np_df_gram(X, X2, ls, var)
    assert K.shape == (15, 12)
    np.testing.assert_allclose(K, ref, rtol=1e-4, atol=1e-5)


def test_gram_diag_closed_form(params):
    # df_gram_diag must equal the diagonal of the full self-gram (it is
    # what _svgp_conditional_df uses instead of materialising (ND, ND))
    rng = np.random.RandomState(5)
    X = jnp.asarray(rng.randn(7, 3).astype(np.float32))
    full = jnp.diagonal(dfk.df_gram(params, X))
    closed = dfk.df_gram_diag(params, X)
    assert closed.shape == (21,)
    np.testing.assert_allclose(closed, full, rtol=1e-5, atol=1e-6)


def test_self_gram_symmetric_psd(params):
    rng = np.random.RandomState(4)
    X = jnp.asarray(rng.randn(6, 3).astype(np.float32))
    K = np.asarray(dfk.df_gram(params, X))
    np.testing.assert_allclose(K, K.T, atol=1e-5)
    w = np.linalg.eigvalsh(K + 1e-5 * np.eye(K.shape[0]))
    assert (w > 0).all()


def np_df_rff_eval(x, omega, phase, weights, var):
    """Independent numpy transcription of the reference ORFF evaluation
    (reference kernels.py:319-351). Note: as written in the reference, the
    per-output-dim frequency indexing means the *prior* sample is NOT
    exactly divergence-free (verified numerically against the PyTorch
    reference); only the pathwise-update term built from kernel columns is.
    We preserve the reference behaviour bit-for-bit."""
    D = x.shape[1]
    S = omega.shape[1]
    om1 = np.transpose(omega, (1, 0, 2))        # (S, D, D)
    om2 = np.transpose(omega, (1, 2, 0))        # (S, D, D)
    norm = np.sqrt((omega ** 2).sum(0))[:, None]  # (S, 1, D)
    ww = np.einsum('sab,sbc->sac', om1, om2)
    b = norm * np.eye(D)[None, :] - ww / norm
    B = np.concatenate([b, b], 0)               # (2S, D, D)
    xo = np.einsum('nd,dfk->nfk', x, omega)
    phi = np.concatenate([np.cos(xo + phase), np.sin(xo + phase)], 1)
    phi = phi[..., None] * B[None] * np.sqrt(var / S)
    return (phi * weights[None, :, :, None]).sum((1, 2))


def test_rff_eval_matches_reference_transcription(params):
    key = jax.random.PRNGKey(0)
    S = 16
    rff = dfk.df_sample_rff(params, key, S, 3, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 3))
    out = dfk.df_rff_eval(params, rff, x)
    expect = np_df_rff_eval(
        np.asarray(x), np.asarray(rff.omega), np.asarray(rff.phase),
        np.asarray(rff.weights), np.asarray(
            __import__('vae_gp_ode_tpu.kernels.rbf', fromlist=['rbf_variance']
                       ).rbf_variance(params)))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_pathwise_sample_field_is_divergence_free(params):
    """prior + pathwise update: the full posterior sample stays div-free
    (the update is a combination of divergence-free kernel columns)."""
    rng = np.random.RandomState(5)
    M = 8
    Z = jnp.asarray(rng.randn(M, 3).astype(np.float32))
    nu = jnp.asarray(rng.randn(M * 3, 1).astype(np.float32))

    def field(x):
        return dfk.df_f_update(params, nu, x[None], Z)[0]

    xs = jax.random.normal(jax.random.PRNGKey(2), (10, 3))
    for x in xs:
        J = jax.jacfwd(field)(x)
        div = jnp.trace(J)
        mag = jnp.abs(J).max()
        assert abs(float(div)) < 1e-3 * max(1.0, float(mag))


def test_compute_nu_solves_system(params):
    rng = np.random.RandomState(6)
    M = 7
    Z = jnp.asarray(rng.randn(M, 3).astype(np.float32))
    u = jnp.asarray(rng.randn(M, 3).astype(np.float32))
    up = jnp.asarray(rng.randn(M, 3).astype(np.float32))
    Ku = dfk.df_gram(params, Z)
    nu = dfk.df_compute_nu(params, Ku, up, u)
    MD = M * 3
    A = np.asarray(Ku) + 1e-5 * np.eye(MD)
    L = np.linalg.cholesky(A)
    a = np.linalg.solve(L, np.asarray(up).reshape(MD))
    expect = np.linalg.solve(L.T, np.asarray(u).reshape(MD) - a)
    np.testing.assert_allclose(nu[:, 0], expect, rtol=1e-3, atol=1e-4)


def test_f_update_shape_and_value(params):
    rng = np.random.RandomState(7)
    M, N = 6, 4
    Z = jnp.asarray(rng.randn(M, 3).astype(np.float32))
    x = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    nu = jnp.asarray(rng.randn(M * 3, 1).astype(np.float32))
    out = dfk.df_f_update(params, nu, x, Z)
    assert out.shape == (N, 3)
    Kuf = np.asarray(dfk.df_gram(params, Z, x))   # (M*3, N*3)
    expect = (Kuf.T @ np.asarray(nu)).reshape(N, 3)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_grads_finite(params):
    rng = np.random.RandomState(8)
    Z = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    u = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    up = jnp.asarray(rng.randn(5, 3).astype(np.float32))

    def loss(p):
        Ku = dfk.df_gram(p, Z)
        nu = dfk.df_compute_nu(p, Ku, up, u)
        return jnp.sum(nu ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g.unconstrained_lengthscales)).all()
