"""PyTorch-CPU baseline for bench.py.

A minimal torch implementation of the same computation the reference
performs per training step (conv VAE encode -> decoupled-sampling SVGP
vector field -> euler integration -> deconv decode -> ELBO -> backward ->
Adam), written fresh for benchmarking apples-to-apples against the JAX/TPU
train step. Shapes follow the reference envelope: batch 20, T=16, dt=0.1,
euler (15 steps), M=100 inducing, S=256 features, q=6, L=1.

This is a *throughput harness*, not a port: no data pipeline, no logging.
"""

import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class _Enc(nn.Module):
    def __init__(self, q=6, nf=8):
        super().__init__()
        self.net = nn.Sequential(
            nn.Conv2d(1, nf, 5, 2, 2), nn.BatchNorm2d(nf), nn.ReLU(),
            nn.Conv2d(nf, nf * 2, 5, 2, 2), nn.BatchNorm2d(nf * 2),
            nn.ReLU(),
            nn.Conv2d(nf * 2, nf * 4, 5, 2, 2), nn.ReLU(), nn.Flatten())
        self.fc = nn.Linear(nf * 64, 2 * q)

    def forward(self, x):
        return self.fc(self.net(x)).chunk(2, -1)


class _Dec(nn.Module):
    def __init__(self, q=6, nf=8):
        super().__init__()
        self.fc = nn.Linear(q, nf * 64)
        self.net = nn.Sequential(
            nn.ConvTranspose2d(nf * 4, nf * 8, 3, 1, 0),
            nn.BatchNorm2d(nf * 8), nn.ReLU(),
            nn.ConvTranspose2d(nf * 8, nf * 4, 5, 2, 1),
            nn.BatchNorm2d(nf * 4), nn.ReLU(),
            nn.ConvTranspose2d(nf * 4, nf * 2, 5, 2, 1, output_padding=1),
            nn.BatchNorm2d(nf * 2), nn.ReLU(),
            nn.ConvTranspose2d(nf * 2, 1, 5, 1, 2), nn.Sigmoid())

    def forward(self, z):
        h = self.fc(z).view(-1, 32, 4, 4)
        return self.net(h)


class _GP(nn.Module):
    """Dimwise-RBF SVGP with decoupled pathwise sampling (same linear
    algebra as the reference per build_cache + per-step eval)."""

    def __init__(self, q=6, M=100, S=256):
        super().__init__()
        self.q, self.M, self.S = q, M, S
        self.Z = nn.Parameter(torch.randn(M, q))
        self.Um = nn.Parameter(torch.randn(M, q) * 0.1)
        self.Us = nn.Parameter(torch.eye(M).repeat(q, 1, 1) * 1e-3)
        self.log_ls = nn.Parameter(torch.zeros(q, q))
        self.log_var = nn.Parameter(torch.zeros(q))

    def gram(self, X, X2):
        ls = F.softplus(self.log_ls)                     # (q, q)
        Xd = X[None] / ls[:, None, :]
        X2d = X2[None] / ls[:, None, :]
        d = (Xd ** 2).sum(-1)[:, :, None] + (X2d ** 2).sum(-1)[:, None, :] \
            - 2 * torch.einsum('dnk,dmk->dnm', Xd, X2d)
        return F.softplus(self.log_var)[:, None, None] * torch.exp(-0.5 * d)

    def build_cache(self):
        q, M, S = self.q, self.M, self.S
        ls = F.softplus(self.log_ls)
        self.omega = torch.randn(q, S, q) / ls.T[:, None, :]
        self.phase = torch.rand(1, S, q) * 2 * np.pi
        self.w = torch.randn(S, q)
        eps = torch.randn(M, q)
        u = torch.einsum('dnm,md->nd', torch.tril(self.Us), eps) + self.Um
        Ku = self.gram(self.Z, self.Z)
        Lu = torch.linalg.cholesky(Ku + torch.eye(M) * 1e-5)
        up = self.rff(self.Z)
        a = torch.linalg.solve_triangular(
            Lu, up.T[:, :, None], upper=False)
        self.nu = torch.linalg.solve_triangular(
            Lu.transpose(1, 2), u.T[:, :, None] - a, upper=True)

    def rff(self, x):
        var = F.softplus(self.log_var)
        xo = torch.einsum('nd,dfk->nfk', x, self.omega)
        phi = torch.cos(xo + self.phase) * torch.sqrt(var / self.S)
        return torch.einsum('nfk,fk->nk', phi, self.w)

    def forward(self, x):
        Kuf = self.gram(self.Z, x)
        return self.rff(x) + torch.einsum(
            'dm,dmn->nd', self.nu[..., 0], Kuf)


def measure_torch_cpu_steps_per_sec(batch=20, T=16, q=6, M=100, S=256,
                                    steps=3, warmup=1, seed=0):
    """Time full training steps (forward+backward+Adam) of the reference
    computation on torch CPU; returns steps/sec."""
    torch.manual_seed(seed)
    enc, dec, gp = _Enc(q), _Dec(q), _GP(q, M, S)
    params = (list(enc.parameters()) + list(dec.parameters())
              + list(gp.parameters()))
    # tiny lr: this harness measures throughput, and the raw objective is
    # numerically fragile at the 1e-3 inducing-scale init (the reference
    # ships a NaN-bailout handler for the same reason, main.py:205-207)
    opt = torch.optim.Adam(params, lr=1e-5)
    X = (torch.rand(batch, T, 1, 28, 28) - 0.1307) / 0.3081

    def step():
        opt.zero_grad()
        mu, logv = enc(X[:, 0])
        z0 = mu + torch.exp(0.5 * logv) * torch.randn_like(mu)
        gp.build_cache()
        zs = [z0]
        z = z0
        for _ in range(T - 1):
            z = z + 0.1 * gp(z)
            zs.append(z)
        zt = torch.stack(zs, 1)                         # (N, T, q)
        xr = dec(zt.reshape(-1, q)).view(batch, T, 1, 28, 28)
        lp = torch.log(1e-3 + xr) * X + torch.log(1e-3 + 1 - xr) * (1 - X)
        lhood = lp.sum((1, 2, 3, 4)).mean()
        kl_reg = 0.5 * (torch.exp(logv) + mu ** 2 - 1 - logv).sum(-1).mean()
        Lq = torch.tril(gp.Us)
        kl_u = 0.5 * ((gp.Um ** 2).sum() + (Lq ** 2).sum() - q * M
                      - torch.log(torch.diagonal(Lq, dim1=1, dim2=2) ** 2
                                  + 1e-12).sum())
        loss = -(lhood * 360 - kl_reg * 360 - kl_u)
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return steps / dt


if __name__ == '__main__':
    sps = measure_torch_cpu_steps_per_sec()
    print(f'torch-cpu: {sps:.3f} steps/s  ({sps * 20:.1f} seqs/s)')
