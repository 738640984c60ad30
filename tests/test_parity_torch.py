"""End-to-end numerical parity vs a PyTorch transcription of the reference.

BASELINE.json demands ELBO/MSE parity with the PyTorch reference to 1e-4.
The reference cannot run here (torchdiffeq is not installed), so this
harness transcribes its exact computation in torch (same module topology,
same formulas: reference vae.py / kernels.py / svpy.py / odegpvae.py /
create_model.py), transplants the JAX model's weights into it, injects
IDENTICAL noise into both (z0 reparam eps, RFF omega/phase/weights,
inducing eps), and compares every stage: encoder stats, GP function
sample, euler trajectory, decoded reconstructions, and all three ELBO
terms.

Weight-layout notes: flax convs are HWIO / NHWC, torch OIHW / NCHW; the
flatten between conv and dense differs in channel order, handled by
permuting the dense kernel rows (encoder) / columns (decoder fc).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vae_gp_ode_tpu.models.odegpvae import init_model  # noqa: E402
from vae_gp_ode_tpu.models.vae import gaussian_kl_standard  # noqa: E402
from vae_gp_ode_tpu.gp import svgp  # noqa: E402
from vae_gp_ode_tpu.kernels.rbf import (  # noqa: E402
    rbf_lengthscales, rbf_variance,
)
from vae_gp_ode_tpu.dynamics.flow import flow_forward  # noqa: E402
from vae_gp_ode_tpu.core.transforms import unpack_tril  # noqa: E402
from vae_gp_ode_tpu.training.objectives import elbo_terms  # noqa: E402

Q, NF, M, S, N, T = 6, 8, 16, 32, 5, 8
DT = 0.1


# ---------------------------------------------------------------------------
# torch transcription of the reference modules (topology from vae.py:47-129)
# ---------------------------------------------------------------------------

class TorchEncoder(tnn.Module):
    def __init__(self, q=Q, nf=NF):
        super().__init__()
        self.cnn = tnn.Sequential(
            tnn.Conv2d(1, nf, 5, 2, 2), tnn.BatchNorm2d(nf), tnn.ReLU(),
            tnn.Conv2d(nf, nf * 2, 5, 2, 2), tnn.BatchNorm2d(nf * 2),
            tnn.ReLU(),
            tnn.Conv2d(nf * 2, nf * 4, 5, 2, 2), tnn.ReLU(), tnn.Flatten())
        self.fc = tnn.Linear(nf * 64, 2 * q)

    def forward(self, x):
        return self.fc(self.cnn(x)).chunk(2, dim=-1)


class TorchDecoder(tnn.Module):
    def __init__(self, q=Q, nf=NF):
        super().__init__()
        self.fc = tnn.Linear(q, nf * 64)
        self.decnn = tnn.Sequential(
            tnn.ConvTranspose2d(nf * 4, nf * 8, 3, 1, 0),
            tnn.BatchNorm2d(nf * 8), tnn.ReLU(),
            tnn.ConvTranspose2d(nf * 8, nf * 4, 5, 2, 1),
            tnn.BatchNorm2d(nf * 4), tnn.ReLU(),
            tnn.ConvTranspose2d(nf * 4, nf * 2, 5, 2, 1, output_padding=1),
            tnn.BatchNorm2d(nf * 2), tnn.ReLU(),
            tnn.ConvTranspose2d(nf * 2, 1, 5, 1, 2), tnn.Sigmoid())

    def forward(self, z):
        return self.decnn(self.fc(z).view(-1, 32, 4, 4))


def torch_rbf_gram_dimwise(X, X2, ls, var):
    """reference kernels.py:64-110 (dimwise)."""
    Xd = X.unsqueeze(0) / ls.unsqueeze(1)
    X2d = X2.unsqueeze(0) / ls.unsqueeze(1)
    xs = Xd.pow(2).sum(2)
    x2s = X2d.pow(2).sum(2)
    sq = -2 * torch.einsum('dnk,dmk->dnm', Xd, X2d) \
        + xs.unsqueeze(-1) + x2s.unsqueeze(1)
    return var[:, None, None] * torch.exp(-0.5 * sq)


def torch_pathwise(x, omega, phase, w, Z, nu, ls, var, Sn):
    """reference kernels.py:140-181: rff_forward + f_update."""
    xo = torch.einsum('nd,dfk->nfk', x, omega)
    phi = torch.cos(xo + phase) * torch.sqrt(var / Sn)
    f_prior = torch.einsum('nfk,fk->nk', phi, w)
    Kuf = torch_rbf_gram_dimwise(Z, x, ls, var)
    f_up = torch.einsum('dm,dmn->nd', nu.squeeze(2), Kuf)
    return f_prior + f_up


def torch_compute_nu(Ku, u_prior, u):
    """reference kernels.py:155-172 (dimwise branch)."""
    Mn = Ku.shape[-1]
    Lu = torch.linalg.cholesky(Ku + torch.eye(Mn) * 1e-5)
    a = torch.linalg.solve_triangular(Lu, u_prior.T.unsqueeze(2),
                                      upper=False)
    nu = torch.linalg.solve_triangular(Lu.transpose(1, 2),
                                       u.T.unsqueeze(2) - a, upper=True)
    return nu


# ---------------------------------------------------------------------------
# weight transplantation (jax -> torch)
# ---------------------------------------------------------------------------

def _t(a):
    return torch.tensor(np.asarray(a))


def _conv_w(k):
    return _t(np.transpose(np.asarray(k), (3, 2, 0, 1)))   # HWIO -> OIHW


def _convT_w(k):
    # flax ConvTranspose (no kernel flip) HWIO -> torch (in,out,kh,kw)
    kn = np.asarray(k)[::-1, ::-1].copy()
    return _t(np.transpose(kn, (2, 3, 0, 1)))


def transplant_encoder(enc_t: TorchEncoder, p, bs):
    sd = enc_t.state_dict()
    for i, (cv, bn) in enumerate([('Conv_0', 'BatchNorm_0'),
                                  ('Conv_1', 'BatchNorm_1')]):
        sd[f'cnn.{3 * i}.weight'] = _conv_w(p[cv]['kernel'])
        sd[f'cnn.{3 * i}.bias'] = _t(p[cv]['bias'])
        sd[f'cnn.{3 * i + 1}.weight'] = _t(p[bn]['scale'])
        sd[f'cnn.{3 * i + 1}.bias'] = _t(p[bn]['bias'])
        sd[f'cnn.{3 * i + 1}.running_mean'] = _t(bs[bn]['mean'])
        sd[f'cnn.{3 * i + 1}.running_var'] = _t(bs[bn]['var'])
    sd['cnn.6.weight'] = _conv_w(p['Conv_2']['kernel'])
    sd['cnn.6.bias'] = _t(p['Conv_2']['bias'])
    # dense: flax flattens (4,4,32) NHWC, torch flattens (32,4,4): permute
    kf = np.asarray(p['Dense_0']['kernel'])          # (512, 2q)
    kf = kf.reshape(4, 4, 32, -1).transpose(2, 0, 1, 3).reshape(512, -1)
    sd['fc.weight'] = _t(kf.T)
    sd['fc.bias'] = _t(p['Dense_0']['bias'])
    enc_t.load_state_dict(sd)
    enc_t.eval()


def transplant_decoder(dec_t: TorchDecoder, p, bs):
    sd = dec_t.state_dict()
    # fc output reshaped to (32,4,4) in torch vs (4,4,32) in flax
    kf = np.asarray(p['Dense_0']['kernel'])          # (q, 512)
    kf = kf.reshape(-1, 4, 4, 32).transpose(0, 3, 1, 2).reshape(-1, 512)
    sd['fc.weight'] = _t(kf.T)
    bf = np.asarray(p['Dense_0']['bias']).reshape(4, 4, 32)
    sd['fc.bias'] = _t(bf.transpose(2, 0, 1).reshape(512))
    convs = ['ConvTranspose_0', 'ConvTranspose_1', 'ConvTranspose_2',
             'ConvTranspose_3']
    bns = ['BatchNorm_0', 'BatchNorm_1', 'BatchNorm_2']
    idx = [0, 3, 6, 9]
    for i, cv in enumerate(convs):
        sd[f'decnn.{idx[i]}.weight'] = _convT_w(p[cv]['kernel'])
        sd[f'decnn.{idx[i]}.bias'] = _t(p[cv]['bias'])
    for i, bn in enumerate(bns):
        sd[f'decnn.{idx[i] + 1}.weight'] = _t(p[bn]['scale'])
        sd[f'decnn.{idx[i] + 1}.bias'] = _t(p[bn]['bias'])
        sd[f'decnn.{idx[i] + 1}.running_mean'] = _t(bs[bn]['mean'])
        sd[f'decnn.{idx[i] + 1}.running_var'] = _t(bs[bn]['var'])
    dec_t.load_state_dict(sd)
    dec_t.eval()


# ---------------------------------------------------------------------------
# the parity test
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def setup():
    model, variables, gp = init_model(
        jax.random.PRNGKey(0), latent_dim=Q, n_filt=NF, order=1,
        num_features=S, num_inducing=M, batch=N, T=T, dt=DT,
        solver='euler')
    # make posterior scale non-trivial so the update term matters
    rng = np.random.RandomState(0)
    Ls = np.stack([np.tril(rng.randn(M, M) * 0.05) + 0.3 * np.eye(M)
                   for _ in range(Q)]).astype(np.float32)
    from vae_gp_ode_tpu.core.transforms import pack_tril
    gp = gp.replace(Um=jnp.asarray(rng.randn(M, Q).astype(np.float32) * .3),
                    Us_sqrt=pack_tril(jnp.asarray(Ls)))

    noise = {
        'omega': rng.randn(Q, S, Q).astype(np.float32),
        'phase_u': rng.rand(1, S, Q).astype(np.float32),
        'weights': rng.randn(S, Q).astype(np.float32),
        'epsilon': rng.randn(M, Q).astype(np.float32),
        'z0_eps': rng.randn(N, Q).astype(np.float32),
    }
    X = ((rng.rand(N, T, 1, 28, 28).astype(np.float32)) - 0.1307) / 0.3081
    return model, variables, gp, noise, X


def jax_forward(model, variables, gp, noise, X):
    """Reproduce the model forward in eval mode with injected noise."""
    x0 = jnp.transpose(jnp.asarray(X[:, 0]), (0, 2, 3, 1))
    enc = model.bind(variables)
    s0_mu, s0_logv = enc.encoder(x0, train=False)
    z0 = s0_mu + jnp.exp(0.5 * s0_logv) * jnp.asarray(noise['z0_eps'])

    jnoise = {k: jnp.asarray(v) for k, v in noise.items()
              if k != 'z0_eps'}
    sample = svgp.draw_fn_sample(gp, None, S, noise=jnoise)
    ts = DT * jnp.arange(T)
    zt, _ = flow_forward(gp, sample, z0, ts, order=1, solver='euler')

    flat = zt.reshape(N * T, Q)
    imgs = enc.decoder(flat, train=False)
    Xrec = jnp.transpose(imgs, (0, 3, 1, 2)).reshape(1, N, T, 1, 28, 28)

    lhood, kl_reg, kl_u = elbo_terms(
        jnp.asarray(X), Xrec, (s0_mu, s0_logv), (None, None), gp,
        eps_guard=True)
    return dict(mu=s0_mu, logv=s0_logv, z0=z0, zt=zt, Xrec=Xrec,
                lhood=lhood, kl_reg=kl_reg, kl_u=kl_u, sample=sample)


def torch_forward(model, variables, gp, noise, X):
    p = variables['params']
    bs = variables['batch_stats']
    enc_t, dec_t = TorchEncoder(), TorchDecoder()
    transplant_encoder(enc_t, p['encoder'], bs['encoder'])
    transplant_decoder(dec_t, p['decoder'], bs['decoder'])

    with torch.no_grad():
        x0 = _t(X[:, 0])
        mu, logv = enc_t(x0)
        z0 = mu + torch.exp(0.5 * logv) * _t(noise['z0_eps'])

        ls = _t(rbf_lengthscales(gp.kernel))
        var = _t(rbf_variance(gp.kernel))
        Z = _t(gp.inducing_loc)
        omega = _t(noise['omega']) / ls.T.unsqueeze(1)
        phase = _t(noise['phase_u']) * 2 * np.pi
        w = _t(noise['weights'])

        # inducing sample (reference svpy.py:88-101, full-Cholesky branch)
        Lq = _t(unpack_tril(gp.Us_sqrt, M))
        u = torch.einsum('dnm,md->nd', Lq, _t(noise['epsilon'])) \
            + _t(gp.Um)
        Ku = torch_rbf_gram_dimwise(Z, Z, ls, var)
        xo = torch.einsum('nd,dfk->nfk', Z, omega)
        u_prior = torch.einsum(
            'nfk,fk->nk', torch.cos(xo + phase) * torch.sqrt(var / S), w)
        nu = torch_compute_nu(Ku, u_prior, u)

        # euler integration (reference flow.py:78-85 with euler + dt grid)
        zs = [z0]
        z = z0
        for _ in range(T - 1):
            z = z + DT * torch_pathwise(z, omega, phase, w, Z, nu, ls,
                                        var, S)
            zs.append(z)
        zt = torch.stack(zs, 1)

        xrec = dec_t(zt.reshape(-1, Q)).view(1, N, T, 1, 28, 28)

        # elbo terms (reference create_model.py:37-58, eps-guarded log)
        Xt = _t(X)
        lp = torch.log(1e-3 + xrec) * Xt.unsqueeze(0) \
            + torch.log(1e-3 + 1 - xrec) * (1 - Xt.unsqueeze(0))
        lhood = lp.sum(dim=(2, 3, 4, 5)).mean(0).mean()
        std = torch.exp(0.5 * logv)
        kl_reg = (0.5 * (std ** 2 + mu ** 2 - 1) - torch.log(std)
                  ).sum(-1).mean()
        Lq_diag = torch.diagonal(Lq, dim1=1, dim2=2).T
        two_kl = (-torch.log(Lq_diag ** 2).sum(0)
                  + (_t(gp.Um) ** 2).sum(0)
                  + (torch.tril(Lq) ** 2).sum(dim=(1, 2)) - M)
        kl_u = 0.5 * two_kl.sum()

    return dict(mu=mu.numpy(), logv=logv.numpy(), z0=z0.numpy(),
                zt=zt.numpy(), Xrec=xrec.numpy(), lhood=float(lhood),
                kl_reg=float(kl_reg), kl_u=float(kl_u))


def test_full_forward_and_elbo_parity(setup):
    model, variables, gp, noise, X = setup
    jx = jax_forward(model, variables, gp, noise, X)
    th = torch_forward(model, variables, gp, noise, X)

    np.testing.assert_allclose(np.asarray(jx['mu']), th['mu'],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jx['logv']), th['logv'],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jx['z0']), th['z0'],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jx['zt']), th['zt'],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jx['Xrec']), th['Xrec'],
                               rtol=1e-3, atol=5e-4)
    # ELBO terms to 1e-4 relative (BASELINE.json requirement)
    np.testing.assert_allclose(float(jx['lhood']), th['lhood'], rtol=1e-4)
    np.testing.assert_allclose(float(jx['kl_reg']), th['kl_reg'],
                               rtol=1e-4)
    np.testing.assert_allclose(float(jx['kl_u']), th['kl_u'], rtol=1e-4)


def test_gp_sample_parity(setup):
    """The pathwise sample f(x) itself matches at arbitrary inputs."""
    model, variables, gp, noise, X = setup
    jnoise = {k: jnp.asarray(v) for k, v in noise.items() if k != 'z0_eps'}
    sample = svgp.draw_fn_sample(gp, None, S, noise=jnoise)
    rng = np.random.RandomState(42)
    x = rng.randn(7, Q).astype(np.float32)
    f_jax = svgp.fn_eval(gp, sample, jnp.asarray(x))

    ls = _t(rbf_lengthscales(gp.kernel))
    var = _t(rbf_variance(gp.kernel))
    Z = _t(gp.inducing_loc)
    omega = _t(noise['omega']) / ls.T.unsqueeze(1)
    phase = _t(noise['phase_u']) * 2 * np.pi
    w = _t(noise['weights'])
    with torch.no_grad():
        Lq = _t(unpack_tril(gp.Us_sqrt, M))
        u = torch.einsum('dnm,md->nd', Lq, _t(noise['epsilon'])) \
            + _t(gp.Um)
        Ku = torch_rbf_gram_dimwise(Z, Z, ls, var)
        xo = torch.einsum('nd,dfk->nfk', Z, omega)
        u_prior = torch.einsum(
            'nfk,fk->nk', torch.cos(xo + phase) * torch.sqrt(var / S), w)
        nu = torch_compute_nu(Ku, u_prior, u)
        f_t = torch_pathwise(_t(x), omega, phase, w, Z, nu, ls, var, S)
    np.testing.assert_allclose(np.asarray(f_jax), f_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_train_mode_batchnorm_parity(setup):
    """Encoder forward in TRAIN mode (batch statistics) must also match
    torch - the mode actually used during optimisation."""
    model, variables, gp, noise, X = setup
    p = variables['params']
    bs = variables['batch_stats']
    enc_t = TorchEncoder()
    transplant_encoder(enc_t, p['encoder'], bs['encoder'])
    enc_t.train()

    with torch.no_grad():
        mu_t, lv_t = enc_t(_t(X[:, 0]))

    enc_j = model.bind(variables)
    x0 = jnp.transpose(jnp.asarray(X[:, 0]), (0, 2, 3, 1))
    (mu_j, lv_j), _ = model.apply(
        variables, x0, True, method=lambda m, x, tr: m.encoder(x, tr),
        mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), rtol=2e-3,
                               atol=2e-4)
