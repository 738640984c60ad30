"""RBF kernel unit tests against independent numpy closed forms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_gp_ode_tpu.core.transforms import softplus, invsoftplus
from vae_gp_ode_tpu.kernels import rbf as rbfk


def np_softplus(x):
    return np.logaddexp(0.0, x) + 1e-12


def np_rbf_gram_shared(X, X2, ls, var):
    d = (X[:, None, :] / ls - X2[None, :, :] / ls)
    sq = np.sum(d * d, axis=-1)
    return var * np.exp(-0.5 * sq)


def np_rbf_gram_dimwise(X, X2, ls, var):
    # ls (D, D_in), var (D,)
    out = []
    for k in range(ls.shape[0]):
        out.append(np_rbf_gram_shared(X, X2, ls[k], var[k]))
    return np.stack(out)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_softplus_roundtrip():
    x = jnp.linspace(-5.0, 5.0, 11)
    y = softplus(x)
    assert jnp.all(y > 0)
    np.testing.assert_allclose(invsoftplus(y), x, rtol=1e-4, atol=2e-4)


def test_init_values():
    p = rbfk.init_rbf_params(4, 3, dimwise=True, lengthscale=2.0,
                             variance=0.7)
    np.testing.assert_allclose(rbfk.rbf_lengthscales(p), 2.0, rtol=1e-4)
    np.testing.assert_allclose(rbfk.rbf_variance(p), 0.7, rtol=1e-4)
    assert p.unconstrained_lengthscales.shape == (3, 4)
    assert p.unconstrained_variance.shape == (3,)


@pytest.mark.parametrize('dimwise', [False, True])
def test_gram_matches_numpy(rng, dimwise):
    D_in, D_out, N, M = 4, 3, 7, 5
    p = rbfk.init_rbf_params(D_in, D_out, dimwise=dimwise,
                             lengthscale=1.3, variance=0.8)
    X = rng.randn(N, D_in).astype(np.float32)
    X2 = rng.randn(M, D_in).astype(np.float32)
    ls = np.asarray(rbfk.rbf_lengthscales(p))
    var = np.asarray(rbfk.rbf_variance(p))

    K = rbfk.rbf_gram(p, jnp.asarray(X), jnp.asarray(X2))
    if dimwise:
        ref = np_rbf_gram_dimwise(X, X2, ls, var)
        assert K.shape == (D_out, N, M)
    else:
        ref = np_rbf_gram_shared(X, X2, ls, var[0])
        assert K.shape == (N, M)
    np.testing.assert_allclose(K, ref, rtol=1e-5, atol=1e-6)

    # symmetric self-gram, PSD
    Kself = np.asarray(rbfk.rbf_gram(p, jnp.asarray(X)))
    np.testing.assert_allclose(Kself, np.swapaxes(Kself, -1, -2), atol=1e-6)
    w = np.linalg.eigvalsh(Kself + 1e-5 * np.eye(N))
    assert (w > 0).all()


@pytest.mark.slow
@pytest.mark.parametrize('dimwise', [False, True])
def test_rff_covariance_converges_to_kernel(dimwise):
    """E[f(x) f(x')] approximates K(x, x') / 2 for many features.

    The factor 1/2 is a preserved reference quirk: cos-only features with
    sqrt(var/S) scaling halve the prior covariance (see rbf_rff_eval).
    """
    D_in, D_out, N = 2, 2, 6
    p = rbfk.init_rbf_params(D_in, D_out, dimwise=dimwise,
                             lengthscale=1.0, variance=1.0)
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(jax.random.PRNGKey(1), (N, D_in))
    S = 65536
    # marginalise the N(0, I) weights analytically:
    # E[f(x) f(x')] = sum_s phi_s(x) phi_s(x') for output dim 0
    rff = rbfk.rbf_sample_rff(p, key, S, D_in, D_out)
    var = rbfk.rbf_variance(p)
    if dimwise:
        xo = jnp.einsum('nd,dfk->nfk', X, rff.omega)
        phi = jnp.cos(xo + rff.phase) * jnp.sqrt(var / S)
        phi = phi[:, :, 0]
    else:
        phi = jnp.cos(X @ rff.omega + rff.phase) * jnp.sqrt(var / S)
    emp = np.asarray(phi @ phi.T)
    K = np.asarray(rbfk.rbf_gram(p, X))
    K0 = K[0] if dimwise else K
    np.testing.assert_allclose(emp, K0 / 2.0, atol=0.08)


@pytest.mark.parametrize('dimwise', [False, True])
def test_compute_nu_solves_system(rng, dimwise):
    """nu satisfies (K + jitter I) nu = u - f_prior(Z) componentwise."""
    D_in, D_out, M = 3, 3, 10
    p = rbfk.init_rbf_params(D_in, D_out, dimwise=dimwise,
                             lengthscale=1.5, variance=0.9)
    Z = jnp.asarray(rng.randn(M, D_in).astype(np.float32))
    u = jnp.asarray(rng.randn(M, D_out).astype(np.float32))
    up = jnp.asarray(rng.randn(M, D_out).astype(np.float32))

    Ku = rbfk.rbf_gram(p, Z)
    nu = rbfk.rbf_compute_nu(p, Ku, up, u)

    jit = 1e-5
    if dimwise:
        for d in range(D_out):
            A = np.asarray(Ku[d]) + jit * np.eye(M)
            # reference applies L^{-1} to u_prior and L^{-T} to (u - .)
            L = np.linalg.cholesky(A)
            a = np.linalg.solve(L, np.asarray(up)[:, d])
            expect = np.linalg.solve(L.T, np.asarray(u)[:, d] - a)
            np.testing.assert_allclose(np.asarray(nu)[d, :, 0], expect,
                                       rtol=1e-4, atol=1e-5)
    else:
        A = np.asarray(Ku) + jit * np.eye(M)
        L = np.linalg.cholesky(A)
        a = np.linalg.solve(L, np.asarray(up))
        expect = np.linalg.solve(L.T, np.asarray(u) - a)
        np.testing.assert_allclose(np.asarray(nu), expect, rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize('dimwise', [False, True])
def test_f_update_matches_direct_contraction(rng, dimwise):
    D_in, D_out, M, N = 3, 3, 8, 5
    p = rbfk.init_rbf_params(D_in, D_out, dimwise=dimwise)
    Z = jnp.asarray(rng.randn(M, D_in).astype(np.float32))
    x = jnp.asarray(rng.randn(N, D_in).astype(np.float32))
    if dimwise:
        nu = jnp.asarray(rng.randn(D_out, M, 1).astype(np.float32))
        K = np.asarray(rbfk.rbf_gram(p, Z, x))    # (D, M, N)
        expect = np.einsum('dm,dmn->nd', np.asarray(nu)[..., 0], K)
    else:
        nu = jnp.asarray(rng.randn(M, D_out).astype(np.float32))
        K = np.asarray(rbfk.rbf_gram(p, Z, x))    # (M, N)
        expect = K.T @ np.asarray(nu)
    out = rbfk.rbf_f_update(p, nu, x, Z)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_grads_flow_through_everything(rng):
    """Hyperparameter gradients propagate through gram/Cholesky/solves."""
    D, M = 3, 6
    p = rbfk.init_rbf_params(D, D, dimwise=True)
    Z = jnp.asarray(rng.randn(M, D).astype(np.float32))
    u = jnp.asarray(rng.randn(M, D).astype(np.float32))
    up = jnp.asarray(rng.randn(M, D).astype(np.float32))

    def loss(params):
        Ku = rbfk.rbf_gram(params, Z)
        nu = rbfk.rbf_compute_nu(params, Ku, up, u)
        return jnp.sum(nu ** 2)

    g = jax.grad(loss)(p)
    assert np.isfinite(np.asarray(g.unconstrained_lengthscales)).all()
    assert np.abs(np.asarray(g.unconstrained_lengthscales)).sum() > 0
