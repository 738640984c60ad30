"""Convolutional VAE encoder/decoder (flax.linen).

Exact topology parity with the reference (reference:
experiments/model/core/vae.py:47-129):

Encoder: 3x Conv 5x5 stride 2 pad 2 (channels frames -> nf -> 2nf -> 4nf),
BatchNorm+ReLU after the first two convs, ReLU only after the third,
flatten to nf*4^3 = 512 features, Linear -> 2*latent_dim, chunked into
(mu, logvar).   28 -> 14 -> 7 -> 4 spatial.

Decoder: Linear latent -> 512, unflatten to (4, 4, 32), then
ConvT(64, k3, s1, p0) -> 6, ConvT(32, k5, s2, p1) -> 13,
ConvT(16, k5, s2, p1, output_padding 1) -> 28, ConvT(1, k5, s1, p2) -> 28,
sigmoid; BatchNorm+ReLU between deconvs.

Layout is TPU-native NHWC (the reference is NCHW); torch ConvTranspose2d
padding p / output_padding op maps to lax padding (k-1-p, k-1-p+op).
BatchNorm momentum/eps match torch defaults (0.1 -> flax momentum 0.9,
eps 1e-5).
"""

import jax.numpy as jnp
from flax import linen as nn

from vae_gp_ode_tpu.core.settings import BERNOULLI_EPS


class Encoder(nn.Module):
    latent_dim: int = 16
    n_filt: int = 8
    frames: int = 1   # input channels (velocity encoder stacks frames)
    bn_axis: 'str | None' = None  # shard_map axis for global-batch BN
    dtype: 'jnp.dtype | None' = None  # compute dtype (params stay f32);
    # None = flax default (promote from inputs+params) - bit-identical
    # to the pre-dtype behavior. bf16 serving sets jnp.bfloat16.

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (N, 28, 28, frames) NHWC -> (mu, logvar), each (N, latent_dim).

        reference vae.py:53-73
        """
        nf = self.n_filt
        pad = ((2, 2), (2, 2))
        x = nn.Conv(nf, (5, 5), strides=2, padding=pad,
                    dtype=self.dtype)(x)                            # 14x14
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.bn_axis,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(nf * 2, (5, 5), strides=2, padding=pad,
                    dtype=self.dtype)(x)                            # 7x7
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.bn_axis,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(nf * 4, (5, 5), strides=2, padding=pad,
                    dtype=self.dtype)(x)                            # 4x4
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))                             # (N, 512)
        z = nn.Dense(2 * self.latent_dim, dtype=self.dtype)(x)
        mu, logvar = jnp.split(z, 2, axis=-1)
        return mu, logvar


class Decoder(nn.Module):
    latent_dim: int = 16
    n_filt: int = 8
    bn_axis: 'str | None' = None  # shard_map axis for global-batch BN
    dtype: 'jnp.dtype | None' = None  # compute dtype (see Encoder.dtype)

    @nn.compact
    def __call__(self, z, train: bool = True):
        """z: (B, latent_dim) -> (B, 28, 28, 1) sigmoid images.

        reference vae.py:101-129
        """
        nf = self.n_filt
        h_dim = nf * 4 ** 3
        s = nn.Dense(h_dim, dtype=self.dtype)(z)
        s = s.reshape((-1, 4, 4, h_dim // 16))                      # (B,4,4,32)

        def tpad(k, p, op=0):
            return ((k - 1 - p, k - 1 - p + op),) * 2

        s = nn.ConvTranspose(nf * 8, (3, 3), strides=(1, 1),
                             padding=tpad(3, 0), dtype=self.dtype)(s)  # 6x6
        s = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.bn_axis,
                         dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.ConvTranspose(nf * 4, (5, 5), strides=(2, 2),
                             padding=tpad(5, 1), dtype=self.dtype)(s)  # 13
        s = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.bn_axis,
                         dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.ConvTranspose(nf * 2, (5, 5), strides=(2, 2),
                             padding=tpad(5, 1, op=1),
                             dtype=self.dtype)(s)                   # 28x28
        s = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.bn_axis,
                         dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.ConvTranspose(1, (5, 5), strides=(1, 1),
                             padding=tpad(5, 2), dtype=self.dtype)(s)  # 28
        return nn.sigmoid(s)


def bernoulli_log_prob(x, xrec, eps_guard: bool = False):
    """Elementwise Bernoulli log-likelihood log(z)x + log(1-z)(1-x).

    Parity with the live branch of the reference (vae.py:145-149: the
    try/except around torch.log never actually raises, so the EPSILON
    branch is dead; `eps_guard=True` reproduces it anyway). Note the
    reference evaluates this on *normalised* pixels (quirk preserved -
    see data pipeline), so this is the training objective, not a proper
    likelihood.
    """
    if eps_guard:
        return (jnp.log(BERNOULLI_EPS + xrec) * x
                + jnp.log(BERNOULLI_EPS + 1.0 - xrec) * (1.0 - x))
    return jnp.log(xrec) * x + jnp.log(1.0 - xrec) * (1.0 - x)


def gaussian_kl_standard(mu, logvar):
    """KL(N(mu, exp(0.5 logvar)^2) || N(0, I)) summed over the last axis.

    Matches torch.distributions.kl_divergence(Normal, Normal(0,1)).sum(-1)
    as used in the reference elbo (create_model.py:48-49).
    """
    var = jnp.exp(logvar)
    return 0.5 * jnp.sum(var + mu ** 2 - 1.0 - logvar, axis=-1)


def reparam_sample(key, mu, logvar):
    """z = mu + exp(0.5 logvar) * eps (reference vae.py:75-78)."""
    import jax
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + jnp.exp(0.5 * logvar) * eps


class VAE(nn.Module):
    """Standalone encoder/decoder pair (reference vae.py:10-45).

    The coupled model composes Encoder/Decoder itself (models.odegpvae);
    this wrapper exists for the pretraining workflow and for the
    reference's `VAE.test` convenience: encode -> reparameterised sample
    -> decode in eval mode (reference vae.py:37-45). `order=2` declares
    the velocity encoder over `frames` stacked input frames like the
    reference ctor (vae.py:18-20) - but note flax init is lazy: its
    params exist only if `encode_velocity` is traced at init
    (init(..., method=VAE.encode_velocity) or a wrapper calling both).
    Like the reference, pretraining never trains it and `save`
    (checkpoint.save_vae_weights) excludes it - the trained velocity
    encoder lives in ODEGPVAE.
    """

    latent_dim: int = 8
    n_filt: int = 8
    frames: int = 1
    order: int = 1

    def setup(self):
        self.encoder = Encoder(self.latent_dim, self.n_filt, frames=1)
        self.decoder = Decoder(self.latent_dim, self.n_filt)
        if self.order == 2:
            self.encoder_v = Encoder(self.latent_dim, self.n_filt,
                                     frames=self.frames)

    def __call__(self, x, key, train: bool = True):
        """Encode -> sample -> decode; returns (xrec, mu, logvar)."""
        mu, logvar = self.encoder(x, train)
        z = reparam_sample(key, mu, logvar)
        return self.decoder(z, train), mu, logvar

    def encode_velocity(self, xv, train: bool = True):
        """Velocity-encoder statistics over `frames` stacked channels
        (NHWC (N, 28, 28, frames)); order=2 only. Trace this at init to
        materialise encoder_v's params."""
        if self.order != 2:
            raise ValueError('encode_velocity requires order=2')
        return self.encoder_v(xv, train)

    def test(self, x, key):
        """reference vae.py:37-45: eval-mode encode, one latent sample,
        decode. `x` is NHWC (N, 28, 28, 1); returns the reconstruction."""
        xrec, _, _ = self(x, key, train=False)
        return xrec
