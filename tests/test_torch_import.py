"""Torch checkpoint import: a randomly-initialised reference-topology torch
model converted to flax must produce identical outputs."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vae_gp_ode_tpu.models.vae import Encoder, Decoder  # noqa: E402
from vae_gp_ode_tpu.utils import torch_import as ti  # noqa: E402


def make_torch_encoder(q=6, nf=8, frames=1):
    """Reference encoder topology (vae.py:53-66)."""
    m = tnn.Module()
    m.cnn = tnn.Sequential(
        tnn.Conv2d(frames, nf, 5, 2, 2), tnn.BatchNorm2d(nf), tnn.ReLU(),
        tnn.Conv2d(nf, nf * 2, 5, 2, 2), tnn.BatchNorm2d(nf * 2),
        tnn.ReLU(),
        tnn.Conv2d(nf * 2, nf * 4, 5, 2, 2), tnn.ReLU(), tnn.Flatten())
    m.fc = tnn.Linear(nf * 64, 2 * q)
    return m


def make_torch_decoder(q=6, nf=8):
    """Reference decoder topology (vae.py:107-123), including the UnFlatten
    at decnn index 0."""
    m = tnn.Module()
    m.fc = tnn.Linear(q, nf * 64)
    m.decnn = tnn.Sequential(
        tnn.Identity(),    # stands in for UnFlatten at index 0
        tnn.ConvTranspose2d(nf * 4, nf * 8, 3, 1, 0),
        tnn.BatchNorm2d(nf * 8), tnn.ReLU(),
        tnn.ConvTranspose2d(nf * 8, nf * 4, 5, 2, 1),
        tnn.BatchNorm2d(nf * 4), tnn.ReLU(),
        tnn.ConvTranspose2d(nf * 4, nf * 2, 5, 2, 1, output_padding=1),
        tnn.BatchNorm2d(nf * 2), tnn.ReLU(),
        tnn.ConvTranspose2d(nf * 2, 1, 5, 1, 2), tnn.Sigmoid())
    return m


def _randomize_bn_stats(m, rng):
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.copy_(
                torch.tensor(rng.randn(mod.num_features) * 0.1,
                             dtype=torch.float32))
            mod.running_var.copy_(
                torch.tensor(0.5 + rng.rand(mod.num_features),
                             dtype=torch.float32))


def test_encoder_import_matches_torch():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    enc_t = make_torch_encoder()
    with torch.no_grad():
        _randomize_bn_stats(enc_t, rng)
    enc_t.eval()

    params, stats = ti.encoder_from_torch(enc_t.state_dict())
    enc_j = Encoder(latent_dim=6, n_filt=8)
    x = rng.randn(4, 1, 28, 28).astype(np.float32)
    with torch.no_grad():
        mu_t, lv_t = enc_t.fc(enc_t.cnn(torch.tensor(x))).chunk(2, -1)
    mu_j, lv_j = enc_j.apply({'params': params, 'batch_stats': stats},
                             jnp.asarray(x.transpose(0, 2, 3, 1)),
                             train=False)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_decoder_import_matches_torch():
    torch.manual_seed(1)
    rng = np.random.RandomState(1)
    dec_t = make_torch_decoder()
    with torch.no_grad():
        _randomize_bn_stats(dec_t, rng)
    dec_t.eval()

    params, stats = ti.decoder_from_torch(dec_t.state_dict())
    dec_j = Decoder(latent_dim=6, n_filt=8)
    z = rng.randn(5, 6).astype(np.float32)
    with torch.no_grad():
        h = dec_t.fc(torch.tensor(z)).view(-1, 32, 4, 4)
        y_t = dec_t.decnn(h)
    y_j = dec_j.apply({'params': params, 'batch_stats': stats},
                      jnp.asarray(z), train=False)
    np.testing.assert_allclose(np.asarray(y_j),
                               y_t.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-5)


def test_svgp_import():
    from vae_gp_ode_tpu.gp.svgp import init_svgp_params
    gp = init_svgp_params(jax.random.PRNGKey(0), D_in=6, D_out=6, M=10,
                          kernel='RBF')
    rng = np.random.RandomState(2)
    sd = {
        'flow.odefunc.diffeq.kern.unconstrained_lengthscales':
            rng.randn(6, 6).astype(np.float32),
        'flow.odefunc.diffeq.kern.unconstrained_variance':
            rng.randn(6).astype(np.float32),
        'flow.odefunc.diffeq.inducing_loc.optvar':
            rng.randn(10, 6).astype(np.float32),
        'flow.odefunc.diffeq.Um.optvar':
            rng.randn(10, 6).astype(np.float32),
        'flow.odefunc.diffeq.Us_sqrt.optvar':
            rng.randn(6, 55).astype(np.float32),
    }
    gp2 = ti.svgp_from_torch(sd, gp)
    np.testing.assert_array_equal(
        np.asarray(gp2.inducing_loc),
        sd['flow.odefunc.diffeq.inducing_loc.optvar'])
    np.testing.assert_array_equal(
        np.asarray(gp2.kernel.unconstrained_variance),
        sd['flow.odefunc.diffeq.kern.unconstrained_variance'])
    assert gp2.Us_sqrt.shape == (6, 55)


def test_full_odegpvae_import():
    """Full state_dict with reference key prefixes feeds variables + gp."""
    from vae_gp_ode_tpu.models.odegpvae import init_model
    torch.manual_seed(3)
    rng = np.random.RandomState(3)
    enc_t, dec_t = make_torch_encoder(), make_torch_decoder()
    sd = {}
    for k, v in enc_t.state_dict().items():
        sd[f'vae.encoder.{k}'] = v
    for k, v in dec_t.state_dict().items():
        sd[f'vae.decoder.{k}'] = v
    sd.update({
        'flow.odefunc.diffeq.kern.unconstrained_lengthscales':
            rng.randn(6, 6).astype(np.float32),
        'flow.odefunc.diffeq.kern.unconstrained_variance':
            rng.randn(6).astype(np.float32),
        'flow.odefunc.diffeq.inducing_loc.optvar':
            rng.randn(16, 6).astype(np.float32),
        'flow.odefunc.diffeq.Um.optvar':
            rng.randn(16, 6).astype(np.float32),
        'flow.odefunc.diffeq.Us_sqrt.optvar':
            rng.randn(6, 136).astype(np.float32),
    })

    model, variables, gp = init_model(
        jax.random.PRNGKey(0), latent_dim=6, n_filt=8, order=1,
        num_features=16, num_inducing=16, batch=2, T=4)
    new_vars, new_gp = ti.odegpvae_from_torch(sd, variables, gp)

    X = jnp.asarray(rng.rand(2, 4, 1, 28, 28).astype(np.float32))
    Xrec, _, _, _ = model.apply(new_vars, X, new_gp, jax.random.PRNGKey(1),
                                L=1, train=False)
    assert Xrec.shape == (1, 2, 4, 1, 28, 28)
    assert np.isfinite(np.asarray(Xrec)).all()
