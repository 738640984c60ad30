"""VAE encoder/decoder tests: shape parity with the reference topology
(cross-checked against torch conv arithmetic), log-prob and KL math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_gp_ode_tpu.models.vae import (
    Encoder, Decoder, bernoulli_log_prob, gaussian_kl_standard,
    reparam_sample,
)


def test_encoder_shapes():
    enc = Encoder(latent_dim=6, n_filt=8)
    x = jnp.zeros((4, 28, 28, 1))
    vars_ = enc.init(jax.random.PRNGKey(0), x, train=False)
    mu, logv = enc.apply(vars_, x, train=False)
    assert mu.shape == (4, 6) and logv.shape == (4, 6)
    # feature size before the dense layer must be n_filt*4^3 = 512
    dense_kernel = vars_['params']['Dense_0']['kernel']
    assert dense_kernel.shape == (512, 12)


def test_encoder_velocity_frames():
    enc = Encoder(latent_dim=3, n_filt=8, frames=5)
    x = jnp.zeros((4, 28, 28, 5))
    vars_ = enc.init(jax.random.PRNGKey(0), x, train=False)
    mu, logv = enc.apply(vars_, x, train=False)
    assert mu.shape == (4, 3)


def test_decoder_shapes():
    dec = Decoder(latent_dim=6, n_filt=8)
    z = jnp.zeros((7, 6))
    vars_ = dec.init(jax.random.PRNGKey(0), z, train=False)
    out = dec.apply(vars_, z, train=False)
    assert out.shape == (7, 28, 28, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_conv_stack_matches_torch_arithmetic():
    """The deconv chain must hit exactly the same intermediate spatial sizes
    as the reference torch stack: 4 -> 6 -> 13 -> 28 -> 28."""
    torch = pytest.importorskip('torch')
    tnn = torch.nn
    # torch transcription of the reference decoder conv sizes only
    x = torch.zeros(1, 32, 4, 4)
    c1 = tnn.ConvTranspose2d(32, 64, 3, 1, 0)(x)
    assert c1.shape[-1] == 6
    c2 = tnn.ConvTranspose2d(64, 32, 5, 2, 1)(c1)
    assert c2.shape[-1] == 13
    c3 = tnn.ConvTranspose2d(32, 16, 5, 2, 1, output_padding=1)(c2)
    assert c3.shape[-1] == 28
    c4 = tnn.ConvTranspose2d(16, 1, 5, 1, 2)(c3)
    assert c4.shape[-1] == 28

    # and the encoder chain 28 -> 14 -> 7 -> 4
    e = torch.zeros(1, 1, 28, 28)
    e1 = tnn.Conv2d(1, 8, 5, 2, 2)(e)
    assert e1.shape[-1] == 14
    e2 = tnn.Conv2d(8, 16, 5, 2, 2)(e1)
    assert e2.shape[-1] == 7
    e3 = tnn.Conv2d(16, 32, 5, 2, 2)(e2)
    assert e3.shape[-1] == 4


def test_conv_values_match_torch():
    """Numeric parity of one strided conv layer vs torch.nn.functional,
    weights transplanted (layout HWIO <-> OIHW)."""
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    from flax import linen as nn

    rng = np.random.RandomState(0)
    w = rng.randn(5, 5, 1, 8).astype(np.float32) * 0.1    # HWIO
    b = rng.randn(8).astype(np.float32) * 0.1
    x = rng.randn(2, 28, 28, 1).astype(np.float32)

    conv = nn.Conv(8, (5, 5), strides=2, padding=((2, 2), (2, 2)))
    vars_ = {'params': {'kernel': jnp.asarray(w), 'bias': jnp.asarray(b)}}
    out = conv.apply(vars_, jnp.asarray(x))               # NHWC

    xt = torch.tensor(x).permute(0, 3, 1, 2)              # NCHW
    wt = torch.tensor(w).permute(3, 2, 0, 1)              # OIHW
    out_t = F.conv2d(xt, wt, torch.tensor(b), stride=2, padding=2)
    out_t = out_t.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), out_t, rtol=1e-4, atol=1e-5)


def test_conv_transpose_values_match_torch():
    """Numeric parity of a strided ConvTranspose vs torch (output_padding)."""
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    from flax import linen as nn

    rng = np.random.RandomState(1)
    cin, cout, k, s, p, op = 4, 3, 5, 2, 1, 1
    w = rng.randn(k, k, cin, cout).astype(np.float32) * 0.1   # HWIO
    b = rng.randn(cout).astype(np.float32) * 0.1
    x = rng.randn(2, 13, 13, cin).astype(np.float32)

    pad = ((k - 1 - p, k - 1 - p + op),) * 2
    convt = nn.ConvTranspose(cout, (k, k), strides=(s, s), padding=pad)
    vars_ = {'params': {'kernel': jnp.asarray(w), 'bias': jnp.asarray(b)}}
    out = convt.apply(vars_, jnp.asarray(x))

    xt = torch.tensor(x).permute(0, 3, 1, 2)
    # torch ConvTranspose2d weight is (in, out, kH, kW), and correlates with
    # a *flipped* kernel relative to lax.conv_transpose(transpose_kernel=
    # False); flax's ConvTranspose does not flip, so flip spatially here.
    wt = torch.tensor(w[::-1, ::-1].copy()).permute(2, 3, 0, 1)
    out_t = F.conv_transpose2d(xt, wt, torch.tensor(b), stride=s,
                               padding=p, output_padding=op)
    out_t = out_t.permute(0, 2, 3, 1).numpy()
    assert out.shape == out_t.shape == (2, 28, 28, cout)
    np.testing.assert_allclose(np.asarray(out), out_t, rtol=1e-4, atol=1e-5)


def test_bernoulli_log_prob_matches_formula():
    rng = np.random.RandomState(2)
    x = rng.rand(2, 3, 1, 4, 4).astype(np.float32)
    z = np.clip(rng.rand(5, 2, 3, 1, 4, 4).astype(np.float32), 1e-4,
                1 - 1e-4)
    lp = bernoulli_log_prob(jnp.asarray(x)[None], jnp.asarray(z))
    expect = np.log(z) * x[None] + np.log(1 - z) * (1 - x[None])
    np.testing.assert_allclose(np.asarray(lp), expect, rtol=2e-3, atol=1e-4)

    lp_g = bernoulli_log_prob(jnp.asarray(x)[None], jnp.asarray(z),
                              eps_guard=True)
    expect_g = np.log(1e-3 + z) * x[None] + np.log(1e-3 + 1 - z) * (1 - x[None])
    np.testing.assert_allclose(np.asarray(lp_g), expect_g, rtol=2e-3,
                               atol=1e-4)


def test_gaussian_kl_matches_torch_distributions():
    torch = pytest.importorskip('torch')
    from torch.distributions import Normal, kl_divergence
    rng = np.random.RandomState(3)
    mu = rng.randn(6, 4).astype(np.float32)
    logv = rng.randn(6, 4).astype(np.float32)
    ours = gaussian_kl_standard(jnp.asarray(mu), jnp.asarray(logv))
    q = Normal(torch.tensor(mu), torch.tensor(np.exp(0.5 * logv)))
    p = Normal(torch.zeros(4), torch.ones(4))
    expect = kl_divergence(q, p).sum(-1).numpy()
    np.testing.assert_allclose(np.asarray(ours), expect, rtol=1e-4,
                               atol=1e-4)


def test_reparam_sample_stats():
    mu = jnp.ones((2000, 3)) * 2.0
    logv = jnp.zeros((2000, 3)) + np.log(0.25)
    z = reparam_sample(jax.random.PRNGKey(0), mu, logv)
    assert abs(float(z.mean()) - 2.0) < 0.05
    assert abs(float(z.std()) - 0.5) < 0.05


def test_batchnorm_train_eval_modes():
    enc = Encoder(latent_dim=4, n_filt=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 28, 28, 1))
    vars_ = enc.init(jax.random.PRNGKey(1), x, train=True)
    assert 'batch_stats' in vars_
    (_, _), updates = enc.apply(vars_, x, train=True,
                                mutable=['batch_stats'])
    # running stats must move after a train-mode pass
    before = jax.tree_util.tree_leaves(vars_['batch_stats'])
    after = jax.tree_util.tree_leaves(updates['batch_stats'])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
    # eval mode must not require mutability
    enc.apply(vars_, x, train=False)


def test_vae_wrapper_test_helper():
    """VAE.test (reference vae.py:37-45): eval-mode encode -> sample ->
    decode. Deterministic given the key, BN running stats (not batch
    stats) used, output in (0, 1)."""
    from vae_gp_ode_tpu.models.vae import VAE

    m = VAE(latent_dim=8, n_filt=4)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 28, 28, 1))
    variables = m.init(k, x, k, train=True)
    y1 = m.apply(variables, x, jax.random.PRNGKey(2), method=VAE.test)
    y2 = m.apply(variables, x, jax.random.PRNGKey(2), method=VAE.test)
    assert y1.shape == (3, 28, 28, 1)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert float(y1.min()) > 0.0 and float(y1.max()) < 1.0
    # eval mode must NOT mutate batch_stats (reference sets .eval())
    y3, ups = m.apply(variables, x, jax.random.PRNGKey(2),
                      method=VAE.test, mutable=['batch_stats'])
    for a, b in zip(jax.tree_util.tree_leaves(ups['batch_stats']),
                    jax.tree_util.tree_leaves(variables['batch_stats'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
