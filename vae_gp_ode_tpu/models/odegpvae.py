"""ODEGPVAE: the top-level sequence model.

Rebuild of the reference ODEGPVAE module (reference:
experiments/model/core/odegpvae.py:7-70) as a flax module whose forward is
one pure jittable function:

  1. encode frame 0 into q(z0) and reparameterise (plus a velocity encoder
     over the first `frames` frames for 2nd-order ODEs),
  2. draw L pathwise GP samples and integrate L latent trajectories -
     a vmapped axis over PRNG keys (the reference loops in Python,
     odegpvae.py:41-44, and rebuilds its cache statefully),
  3. decode all L*N*T latent states in one batched decoder call.

Data layout: the public API takes reference-layout sequences
(N, T, 1, d, d); convs run NHWC internally (TPU-native).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vae_gp_ode_tpu.gp.svgp import SVGPParams, draw_fn_sample, init_svgp_params
from vae_gp_ode_tpu.dynamics.flow import flow_forward
from vae_gp_ode_tpu.models.vae import Encoder, Decoder, reparam_sample


class ODEGPVAE(nn.Module):
    """Model hyperparameters are static module fields; GP parameters are a
    separate SVGPParams pytree passed through __call__ (they are trained
    jointly but are not neural-net variables)."""

    latent_dim: int = 6
    n_filt: int = 8
    order: int = 1
    frames: int = 5          # velocity-encoder window (reference --frames)
    dt: float = 0.1
    solver: str = 'euler'
    dense: int = 1
    rtol: float = 1e-6
    atol: float = 1e-6
    max_steps: int = 256
    num_features: int = 256  # S, RFF features per GP sample
    use_adjoint: bool = False  # continuous adjoint vs remat backprop
    remat: bool = True       # rematerialise solver steps in reverse mode
    bn_axis: 'str | None' = None  # shard_map axis for global-batch BN
    # (None = single-device; parallel.shard_dp clones the model with the
    # mesh axis so BatchNorm statistics psum over the data shards -
    # exactly the single-device global-batch semantics)
    dtype: 'jnp.dtype | None' = None  # VAE compute dtype (params stay
    # f32; None = exact pre-dtype behavior). bf16 serving runs the
    # conv-dominated encoder/decoder on the MXU's native half precision
    # while the GP/ODE dynamics stay f32: encode() upcasts the latent
    # statistics before the reparameterisation, so z0/ts/trajectories
    # are full precision regardless.

    def setup(self):
        self.encoder = Encoder(self.latent_dim, self.n_filt, frames=1,
                               bn_axis=self.bn_axis, dtype=self.dtype)
        self.decoder = Decoder(self.latent_dim, self.n_filt,
                               bn_axis=self.bn_axis, dtype=self.dtype)
        if self.order == 2:
            self.encoder_v = Encoder(self.latent_dim, self.n_filt,
                                     frames=self.frames,
                                     bn_axis=self.bn_axis,
                                     dtype=self.dtype)

    def encode(self, X, key, train: bool = True, reparam_noise=None,
               train_v=None):
        """Encode a batch of sequences (N, T, 1, d, d) into z0 (N, q or 2q).

        reference odegpvae.py:55-62

        `train_v` overrides the BatchNorm mode of the VELOCITY encoder
        only (default: same as `train`). The reference's pretrained-VAE
        path eval()s encoder and decoder but NOT encoder_v
        (main.py:163-164), so frozen order-2 runs keep encoder_v in
        train mode - the trainer passes train_v=True there.

        `reparam_noise` optionally injects the standard-normal draws
        (noise_s, noise_v) instead of drawing from `key` - the shard_map
        data-parallel step passes each shard its slice of the GLOBAL
        (N, q) draw so the sharded batch reparameterises exactly like the
        single-device one. NOTE the key-split structure here (k_s, k_v =
        split(key)) is mirrored by parallel.shard_dp._reparam_noise_full;
        change them together (pinned by test_parallel equivalence tests).
        """
        x0 = jnp.transpose(X[:, 0], (0, 2, 3, 1))        # NHWC (N,d,d,1)
        s0_mu, s0_logv = self.encoder(x0, train)
        if self.dtype is not None:
            # half-precision VAE compute, full-precision dynamics: the
            # latent statistics (and everything downstream - z0, ts, the
            # GP trajectories) run f32
            s0_mu = s0_mu.astype(jnp.float32)
            s0_logv = s0_logv.astype(jnp.float32)
        k_s, k_v = jax.random.split(key)
        noise_s, noise_v = (reparam_noise if reparam_noise is not None
                            else (None, None))
        if noise_s is not None:
            z0 = s0_mu + jnp.exp(0.5 * s0_logv) * noise_s
        else:
            z0 = reparam_sample(k_s, s0_mu, s0_logv)
        v0_mu = v0_logv = None
        if self.order == 2:
            # first `frames` frames stacked as channels (reference
            # odegpvae.py:60: squeeze(X[:, 0:v_steps]))
            xv = jnp.transpose(X[:, :self.frames, 0], (0, 2, 3, 1))
            v0_mu, v0_logv = self.encoder_v(
                xv, train if train_v is None else train_v)
            if self.dtype is not None:
                v0_mu = v0_mu.astype(jnp.float32)
                v0_logv = v0_logv.astype(jnp.float32)
            if noise_v is not None:
                v0 = v0_mu + jnp.exp(0.5 * v0_logv) * noise_v
            else:
                v0 = reparam_sample(k_v, v0_mu, v0_logv)
            z0 = jnp.concatenate([z0, v0], axis=1)
        return z0, (s0_mu, s0_logv), (v0_mu, v0_logv)

    def sample_trajectories(self, gp: SVGPParams, z0, T: int, key, L: int):
        """Integrate L trajectories, each under a fresh GP function sample
        (reference odegpvae.py:37-45); L is a vmapped axis.

        Returns ztL (L, N, T, D) and total fn evals."""
        ts = self.dt * jnp.arange(T, dtype=z0.dtype)
        keys = jax.random.split(key, L)

        def one(k):
            s = draw_fn_sample(gp, k, self.num_features)
            if self.use_adjoint:
                # continuous adjoint for ANY solver (the reference gets
                # this from torchdiffeq's odeint_adjoint, flow.py:76-85)
                from vae_gp_ode_tpu.dynamics.adjoint import (
                    flow_forward_adjoint)
                zt, nfe = flow_forward_adjoint(
                    gp, s, z0, ts, order=self.order, solver=self.solver,
                    dense=self.dense, rtol=self.rtol, atol=self.atol,
                    max_steps=self.max_steps)
            else:
                zt, nfe = flow_forward(
                    gp, s, z0, ts, order=self.order, solver=self.solver,
                    dense=self.dense, rtol=self.rtol, atol=self.atol,
                    max_steps=self.max_steps, remat=self.remat)
            return zt, nfe

        ztL, nfes = jax.vmap(one)(keys)
        return ztL, jnp.sum(nfes)

    def decode(self, ztL, train: bool = True):
        """Decode latent trajectories (L, N, T, D) -> (L, N, T, 1, d, d);
        2nd order decodes only the position half (reference
        odegpvae.py:18-35)."""
        L, N, T = ztL.shape[:3]
        if self.order == 2:
            ztL = ztL[..., :self.latent_dim]
        flat = ztL.reshape((L * N * T, ztL.shape[-1]))
        imgs = self.decoder(flat, train)                 # (LNT, d, d, 1)
        d = imgs.shape[1]
        imgs = jnp.transpose(imgs, (0, 3, 1, 2))         # NCHW
        return imgs.reshape((L, N, T, 1, d, d))

    def __call__(self, X, gp: SVGPParams, key, L: int = 1,
                 T_custom: Optional[int] = None, train: bool = True,
                 reparam_noise=None, train_v=None):
        """Full forward pass (reference odegpvae.py:48-70).

        @param X: (N, T, 1, d, d) sequences (reference layout)
        @param gp: SVGPParams pytree (trained jointly)
        @param key: PRNG key for z0 reparam + L GP function draws
        @param L: number of MC trajectories (static)
        @param T_custom: forecast horizon override (static)
        @return: Xrec (L, N, T, 1, d, d), (s0_mu, s0_logv),
                 (v0_mu, v0_logv), nfe
        """
        T = X.shape[1] if T_custom is None else T_custom
        # key-split structure mirrored by parallel.shard_dp (see encode)
        k_enc, k_traj = jax.random.split(key)
        z0, s_stats, v_stats = self.encode(X, k_enc, train,
                                           reparam_noise=reparam_noise,
                                           train_v=train_v)
        ztL, nfe = self.sample_trajectories(gp, z0, T, k_traj, L)
        Xrec = self.decode(ztL, train)
        return Xrec, s_stats, v_stats, nfe


def init_model(key, *, latent_dim=6, n_filt=8, order=1, frames=5, dt=0.1,
               solver='euler', dense=1, rtol=1e-6, atol=1e-6, max_steps=256,
               num_features=256, num_inducing=100, kernel='RBF',
               q_diag=False, dimwise=True, D_in=None, D_out=None,
               batch=2, T=16, img=28, use_adjoint=False, remat=True):
    """Build (model, variables, gp_params) - the equivalent of the
    reference's build_model factory (reference create_model.py:9-35).

    D_in/D_out default to the reference wiring: order 1 -> (q, q),
    order 2 -> (2q, q).
    """
    if D_in is None:
        D_in = latent_dim * order
    if D_out is None:
        D_out = latent_dim

    model = ODEGPVAE(latent_dim=latent_dim, n_filt=n_filt, order=order,
                     frames=frames, dt=dt, solver=solver, dense=dense,
                     rtol=rtol, atol=atol, max_steps=max_steps,
                     num_features=num_features, use_adjoint=use_adjoint,
                     remat=remat)

    k_gp, k_vae, k_fwd = jax.random.split(key, 3)
    gp = init_svgp_params(k_gp, D_in=D_in, D_out=D_out, M=num_inducing,
                          kernel=kernel, q_diag=q_diag, dimwise=dimwise)

    X_dummy = jnp.zeros((batch, T, 1, img, img), jnp.float32)
    variables = model.init(k_vae, X_dummy, gp, k_fwd, L=1, train=True)
    return model, variables, gp
