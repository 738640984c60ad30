"""SVGP layer tests: whitened KL closed form, inducing sampling,
pathwise sample consistency, exact conditional sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_gp_ode_tpu.core.transforms import unpack_tril, pack_tril, softplus
from vae_gp_ode_tpu.gp import svgp


@pytest.fixture
def params():
    return svgp.init_svgp_params(jax.random.PRNGKey(0), D_in=4, D_out=4,
                                 M=12, kernel='RBF', dimwise=True)


def np_whitened_kl(Um, L_stack):
    """KL(N(m, LL^T) || N(0, I)) summed over output dims."""
    D = L_stack.shape[0]
    M = Um.shape[0]
    total = 0.0
    for d in range(D):
        L = np.tril(L_stack[d])
        m = Um[:, d]
        trace = np.sum(L * L)
        mah = m @ m
        logdet = 2.0 * np.sum(np.log(np.abs(np.diag(L))))
        total += 0.5 * (trace + mah - M - logdet)
    return total


def test_kl_matches_closed_form(params):
    rng = np.random.RandomState(0)
    M, D = params.M, params.D_out
    # random well-conditioned scales + means
    Ls = np.stack([np.tril(rng.randn(M, M) * 0.1) + np.eye(M)
                   for _ in range(D)]).astype(np.float32)
    Um = rng.randn(M, D).astype(np.float32) * 0.5
    p = params.replace(Um=jnp.asarray(Um),
                       Us_sqrt=pack_tril(jnp.asarray(Ls)))
    kl = float(svgp.svgp_kl(p))
    expect = np_whitened_kl(Um, Ls)
    np.testing.assert_allclose(kl, expect, rtol=1e-4)


def test_kl_zero_at_standard_normal(params):
    M, D = params.M, params.D_out
    eye = jnp.broadcast_to(jnp.eye(M), (D, M, M))
    p = params.replace(Um=jnp.zeros((M, D)), Us_sqrt=pack_tril(eye))
    assert abs(float(svgp.svgp_kl(p))) < 1e-5


def test_kl_diag_branch():
    p = svgp.init_svgp_params(jax.random.PRNGKey(1), D_in=3, D_out=3,
                              M=8, kernel='RBF', q_diag=True)
    rng = np.random.RandomState(1)
    us = rng.randn(8, 3).astype(np.float32)
    Um = rng.randn(8, 3).astype(np.float32) * 0.3
    p = p.replace(Um=jnp.asarray(Um), Us_sqrt=jnp.asarray(us))
    sd = np.asarray(softplus(jnp.asarray(us)))
    expect = 0.0
    for d in range(3):
        expect += 0.5 * np.sum(sd[:, d] ** 2 + Um[:, d] ** 2 - 1.0
                               - np.log(sd[:, d] ** 2))
    np.testing.assert_allclose(float(svgp.svgp_kl(p)), expect, rtol=1e-4)


@pytest.mark.slow
def test_sample_inducing_moments(params):
    """Mean/cov of u ~ q(u) match m and L L^T."""
    rng = np.random.RandomState(2)
    M, D = params.M, params.D_out
    Ls = np.stack([np.tril(rng.randn(M, M) * 0.05) + 0.3 * np.eye(M)
                   for _ in range(D)]).astype(np.float32)
    Um = rng.randn(M, D).astype(np.float32)
    p = params.replace(Um=jnp.asarray(Um), Us_sqrt=pack_tril(jnp.asarray(Ls)))

    n = 20000
    eps = jax.random.normal(jax.random.PRNGKey(3), (n, M, D))
    us = jax.vmap(lambda e: svgp.sample_inducing(p, epsilon=e))(eps)
    us = np.asarray(us)
    np.testing.assert_allclose(us.mean(0), Um, atol=0.02)
    # covariance of output dim 0 across samples
    c = np.cov((us[:, :, 0] - Um[:, 0]).T)
    expect = Ls[0] @ Ls[0].T
    np.testing.assert_allclose(c, expect, atol=0.02)


def test_draw_fn_sample_and_eval_shapes(params):
    s = svgp.draw_fn_sample(params, jax.random.PRNGKey(4), S=32)
    x = jax.random.normal(jax.random.PRNGKey(5), (9, params.D_in))
    f = svgp.fn_eval(params, s, x)
    assert f.shape == (9, params.D_out)
    assert np.isfinite(np.asarray(f)).all()


def test_fn_sample_interpolates_whitened_inducing_values():
    """In the whitened parameterisation the pathwise sample satisfies
    f(Z) ~= L u at the inducing locations, where L = chol(K + jitter I)
    and u ~ q(u) is the whitened inducing sample:
    f(Z) = prior(Z) + K L^{-T}(u - L^{-1} prior(Z)) -> L u as jitter -> 0."""
    key = jax.random.PRNGKey(6)
    p = svgp.init_svgp_params(key, D_in=2, D_out=2, M=6, kernel='RBF')
    Um = jax.random.normal(jax.random.PRNGKey(7), (6, 2)) * 0.5
    p = p.replace(Um=Um)

    noise = {
        'omega': jax.random.normal(jax.random.PRNGKey(8), (2, 64, 2)),
        'phase_u': jax.random.uniform(jax.random.PRNGKey(9), (1, 64, 2)),
        'weights': jax.random.normal(jax.random.PRNGKey(10), (64, 2)),
        'epsilon': jnp.zeros((6, 2)),  # u = Um exactly
    }
    s = svgp.draw_fn_sample(p, None, S=64, noise=noise)
    fZ = np.asarray(svgp.fn_eval(p, s, p.inducing_loc))

    from vae_gp_ode_tpu.kernels.rbf import rbf_gram
    K = np.asarray(rbf_gram(p.kernel, p.inducing_loc))   # (D, M, M)
    expect = np.zeros_like(fZ)
    for d in range(2):
        L = np.linalg.cholesky(K[d] + 1e-5 * np.eye(6))
        expect[:, d] = L @ np.asarray(Um)[:, d]
    np.testing.assert_allclose(fZ, expect, atol=5e-3)


def test_df_fn_sample_shapes():
    p = svgp.init_svgp_params(jax.random.PRNGKey(11), D_in=3, D_out=3,
                              M=5, kernel='DF')
    s = svgp.draw_fn_sample(p, jax.random.PRNGKey(12), S=16)
    assert s.nu.shape == (15, 1)
    x = jax.random.normal(jax.random.PRNGKey(13), (4, 3))
    f = svgp.fn_eval(p, s, x)
    assert f.shape == (4, 3)
    assert np.isfinite(np.asarray(f)).all()


@pytest.mark.slow
def test_conditional_mean_matches_mc(params):
    """Exact conditional mean ~= MC average of pathwise samples."""
    x = jax.random.normal(jax.random.PRNGKey(14), (5, params.D_in))
    mean, var = svgp.svgp_conditional(params, x)
    assert mean.shape == (5, params.D_out)
    assert var.shape == (5, params.D_out)

    keys = jax.random.split(jax.random.PRNGKey(15), 512)
    fs = jax.vmap(
        lambda k: svgp.fn_eval(params, svgp.draw_fn_sample(params, k, S=256),
                               x))(keys)
    mc_mean = np.asarray(fs).mean(0)
    # init scale is 1e-3 and Um ~ 0.1: conditional mean is small; MC noise
    # is dominated by the prior (variance ~ var/2); use a loose tolerance
    np.testing.assert_allclose(mc_mean, np.asarray(mean), atol=0.05)


def test_conditional_q_diag_matches_full_chol():
    """A q_diag posterior and the equivalent full-Cholesky posterior
    (Us_sqrt = diag embedding of the same scales) must give the SAME
    conditional mean and variance - the round-3 review found the q_diag
    branch built S as the rank-1 outer product s s^T instead of
    diag(s^2), inflating/deflating variances for M > 1."""
    key = jax.random.PRNGKey(3)
    pd = svgp.init_svgp_params(key, D_in=3, D_out=3, M=8, kernel='RBF',
                               dimwise=True, q_diag=True)
    # give the diagonal scales a non-trivial spread
    new_us = jax.random.normal(jax.random.PRNGKey(4), pd.Us_sqrt.shape)
    pd = pd.replace(Us_sqrt=new_us)

    # equivalent full-Cholesky parameterisation: L = diag(softplus(us))
    s = softplus(new_us.T)                                 # (D, M)
    L_stack = jax.vmap(jnp.diag)(s)                        # (D, M, M)
    packed = jnp.stack([pack_tril(L) for L in L_stack]).T
    pf = svgp.init_svgp_params(key, D_in=3, D_out=3, M=8, kernel='RBF',
                               dimwise=True, q_diag=False)
    pf = pf.replace(Um=pd.Um, Us_sqrt=packed.T,
                    inducing_loc=pd.inducing_loc, kernel=pd.kernel)

    x = jax.random.normal(jax.random.PRNGKey(5), (6, 3))
    md, vd = svgp.svgp_conditional(pd, x)
    mf, vf = svgp.svgp_conditional(pf, x)
    np.testing.assert_allclose(np.asarray(md), np.asarray(mf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vf),
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(vd) > 0).all()


@pytest.mark.slow
def test_df_conditional_matches_mc_and_oracle():
    """DF exact conditional (the (M*D, M*D)-solve branch, VERDICT r3 #8).

    Two checks. (1) MC mean consistency like the RBF test: the pathwise
    prior has mean 0, so E[f(x)] over pathwise samples is the exact
    conditional mean up to the whitening convention (kept whitened to
    match the RBF branch and the reference formula; at init scales the
    conventions differ well inside tolerance). The kernel variance is
    shrunk so prior-dominated MC noise fits the tolerance; per-sample
    std is still ~1.3 (the ORFF 5.5x inflation below), so at n=4096 the
    MC se is ~0.02 and the 0.1 tolerance sits at ~5 se. (2) A dense
    float64 oracle for mean AND variance - sharp, and what actually pins
    the flattened (m*D + d) block layout.

    MC *variance* consistency is NOT asserted: the reference's ORFF
    feature map and its analytic DF gram are mutually inconsistent (the
    prior draws have ~5.5x the gram's marginal variance - reference
    kernels.py:319-374 vs :265-303; transcription parity is pinned in
    test_kernels_df.py), so pathwise samples do not follow the exact
    conditional's variance by the reference's own construction.
    """
    from vae_gp_ode_tpu.kernels import divfree as dfk
    from vae_gp_ode_tpu.kernels import rbf as rbfk
    p = svgp.init_svgp_params(jax.random.PRNGKey(20), D_in=3, D_out=3,
                              M=6, kernel='DF')
    p = p.replace(kernel=rbfk.init_rbf_params(
        3, 3, dimwise=True, lengthscale=1.0, variance=0.1))
    x = jax.random.normal(jax.random.PRNGKey(21), (4, 3)) * 0.5
    mean, var = svgp.svgp_conditional(p, x)
    assert mean.shape == (4, 3) and var.shape == (4, 3)
    assert (np.asarray(var) > 0).all()

    keys = jax.random.split(jax.random.PRNGKey(22), 4096)
    fs = jax.jit(jax.vmap(
        lambda k: svgp.fn_eval(p, svgp.draw_fn_sample(p, k, S=256), x)))(keys)
    np.testing.assert_allclose(np.asarray(fs).mean(0), np.asarray(mean),
                               atol=0.1)

    # dense f64 oracle: whitened mean/var from the raw grams
    Ku = np.asarray(dfk.df_gram(p.kernel, p.inducing_loc), np.float64)
    Kuf = np.asarray(dfk.df_gram(p.kernel, p.inducing_loc, x), np.float64)
    MD = Ku.shape[0]
    Lu = np.linalg.cholesky(Ku + np.eye(MD) * 1e-5)
    A = np.linalg.solve(Lu, Kuf)
    m_vec = np.asarray(p.Um, np.float64).reshape(MD)
    L_blk = np.zeros((MD, MD))
    Ls = np.asarray(unpack_tril(p.Us_sqrt, p.M), np.float64)  # (D, M, M)
    for d in range(3):
        idx = np.arange(6) * 3 + d
        L_blk[np.ix_(idx, idx)] = Ls[d]
    S_w = L_blk @ L_blk.T
    oracle_mean = (A.T @ m_vec).reshape(4, 3)
    Kff = np.asarray(dfk.df_gram(p.kernel, x), np.float64)
    oracle_var = (np.diagonal(Kff)
                  + np.einsum('mn,mk,kn->n', A, S_w - np.eye(MD), A)
                  ).reshape(4, 3)
    np.testing.assert_allclose(np.asarray(mean), oracle_mean,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), oracle_var,
                               rtol=1e-4, atol=1e-6)

    # full covariance: diagonal equals the marginals; symmetric PSD
    _, cov = svgp.svgp_conditional(p, x, full_cov=True)
    assert cov.shape == (12, 12)
    np.testing.assert_allclose(np.diagonal(np.asarray(cov)),
                               np.asarray(var).reshape(-1), rtol=1e-4,
                               atol=1e-6)
    c = np.asarray(cov, dtype=np.float64)
    np.testing.assert_allclose(c, c.T, atol=1e-5)
    assert np.linalg.eigvalsh((c + c.T) / 2).min() > -1e-5


def test_df_conditional_q_diag_matches_full_chol():
    """DF conditional: a q_diag posterior and the equivalent full-Cholesky
    posterior (diag embedding of the same scales) must agree - pins the
    (S - I) A block application against the flattened layout."""
    key = jax.random.PRNGKey(23)
    pd = svgp.init_svgp_params(key, D_in=3, D_out=3, M=5, kernel='DF',
                               q_diag=True)
    new_us = jax.random.normal(jax.random.PRNGKey(24), pd.Us_sqrt.shape)
    pd = pd.replace(Us_sqrt=new_us)

    s = softplus(new_us.T)                                 # (D, M)
    L_stack = jax.vmap(jnp.diag)(s)                        # (D, M, M)
    packed = jnp.stack([pack_tril(L) for L in L_stack])
    pf = svgp.init_svgp_params(key, D_in=3, D_out=3, M=5, kernel='DF',
                               q_diag=False)
    pf = pf.replace(Um=pd.Um, Us_sqrt=packed,
                    inducing_loc=pd.inducing_loc, kernel=pd.kernel)

    x = jax.random.normal(jax.random.PRNGKey(25), (4, 3))
    md, vd = svgp.svgp_conditional(pd, x)
    mf, vf = svgp.svgp_conditional(pf, x)
    np.testing.assert_allclose(np.asarray(md), np.asarray(mf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vf),
                               rtol=1e-5, atol=1e-6)
