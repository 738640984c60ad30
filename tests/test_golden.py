"""Golden-value regression tests.

Frozen numeric outputs of the core math at fixed seeds/noise (generated on
the CPU backend at highest matmul precision). These catch silent numeric
drift across refactors without requiring torch: if a change legitimately
alters semantics, regenerate the constants and say why in the commit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_gp_ode_tpu.kernels.rbf import init_rbf_params, rbf_gram
from vae_gp_ode_tpu.gp.svgp import (
    init_svgp_params, draw_fn_sample, fn_eval, svgp_kl,
)
from vae_gp_ode_tpu.models.odegpvae import init_model
from vae_gp_ode_tpu.training.objectives import compute_loss


def test_gram_golden():
    p = init_rbf_params(4, 3, dimwise=True, lengthscale=1.5, variance=0.8)
    X = jnp.asarray(np.random.RandomState(7).randn(6, 4).astype(np.float32))
    K = rbf_gram(p, X)
    np.testing.assert_allclose(float(jnp.sum(K)), 41.690914, rtol=1e-5)
    np.testing.assert_allclose(float(jnp.trace(K[1])), 4.8, rtol=1e-5)


def test_fn_eval_golden():
    gp = init_svgp_params(jax.random.PRNGKey(3), D_in=3, D_out=3, M=5,
                          kernel='RBF')
    rng = np.random.RandomState(11)
    noise = {'omega': jnp.asarray(rng.randn(3, 8, 3).astype(np.float32)),
             'phase_u': jnp.asarray(rng.rand(1, 8, 3).astype(np.float32)),
             'weights': jnp.asarray(rng.randn(8, 3).astype(np.float32)),
             'epsilon': jnp.asarray(rng.randn(5, 3).astype(np.float32))}
    s = draw_fn_sample(gp, None, 8, noise=noise)
    x = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    f = np.asarray(fn_eval(gp, s, x)).ravel()
    expect = np.array([-0.144542, 0.168682, 0.034548, 0.314844, 0.432364,
                       -0.180865, -0.216083, 0.029272, -0.278405,
                       0.162622, 0.163327, 0.186449], np.float32)
    np.testing.assert_allclose(f, expect, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(svgp_kl(gp)), 96.185394, rtol=1e-5)


@pytest.mark.slow
def test_full_model_loss_golden():
    model, variables, gp = init_model(
        jax.random.PRNGKey(0), latent_dim=3, n_filt=4, order=1,
        num_features=16, num_inducing=8, batch=3, T=5)
    X = (jax.random.uniform(jax.random.PRNGKey(1), (3, 5, 1, 28, 28))
         - 0.1307) / 0.3081
    Xrec, ss, vs, nfe = model.apply(variables, X, gp, jax.random.PRNGKey(2),
                                    L=2, train=False)
    loss, nll, kr, ku = compute_loss(X, Xrec, ss, vs, gp, 360.0,
                                     eps_guard=True)
    # golden values are precision-sensitive through the conv stack: keep
    # a modest relative tolerance
    np.testing.assert_allclose(float(loss), 1001147.125, rtol=1e-3)
    np.testing.assert_allclose(float(nll), 2779.905, rtol=1e-3)
    np.testing.assert_allclose(float(kr), 0.6318254, rtol=1e-3)
    np.testing.assert_allclose(float(ku), 153.89006, rtol=1e-4)
    assert int(nfe) == 8
