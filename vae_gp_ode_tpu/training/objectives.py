"""ELBO objective with exact reference scaling.

reference: experiments/model/create_model.py:37-73
  loss = -(lhood * Ndata - kl_reg * Ndata - kl_u)
where lhood and kl_reg are per-sequence means (MC-averaged over L) and
kl_u is the whitened inducing KL (NOT scaled by Ndata - quirk preserved).
"""

import jax.numpy as jnp

from vae_gp_ode_tpu.gp.svgp import SVGPParams, svgp_kl
from vae_gp_ode_tpu.models.vae import bernoulli_log_prob, gaussian_kl_standard


def elbo_terms(X, Xrec, s_stats, v_stats, gp: SVGPParams,
               eps_guard: bool = False):
    """Compute (lhood, kl_reg, kl_u), each a scalar.

    @param X:    (N, T, 1, d, d) input sequences
    @param Xrec: (L, N, T, 1, d, d) reconstructions
    reference create_model.py:37-58
    """
    s0_mu, s0_logv = s_stats
    v0_mu, v0_logv = v_stats
    if v0_mu is not None:
        mu = jnp.concatenate([s0_mu, v0_mu], axis=1)
        logv = jnp.concatenate([s0_logv, v0_logv], axis=1)
    else:
        mu, logv = s0_mu, s0_logv

    kl_reg = jnp.mean(gaussian_kl_standard(mu, logv))          # scalar

    lp = bernoulli_log_prob(X[None], Xrec, eps_guard=eps_guard)
    # sum over (T, c, h, w), average over L, then over N
    lhood = jnp.mean(jnp.mean(jnp.sum(lp, axis=(2, 3, 4, 5)), axis=0))

    kl_u = svgp_kl(gp)
    return lhood, kl_reg, kl_u


def compute_loss(X, Xrec, s_stats, v_stats, gp: SVGPParams,
                 num_observations: float, eps_guard: bool = False):
    """loss = -(lhood*N - kl_reg*N - kl_u); returns (loss, nll, kl_reg, kl_u).

    reference create_model.py:61-73
    """
    lhood, kl_reg, kl_u = elbo_terms(X, Xrec, s_stats, v_stats, gp,
                                     eps_guard=eps_guard)
    loss = -(lhood * num_observations - kl_reg * num_observations - kl_u)
    return loss, -lhood, kl_reg, kl_u


def compute_test_error(X, Xrec):
    """Mean squared reconstruction error (reference create_model.py:75-77)."""
    assert X.shape == Xrec.shape, \
        f'incorrect shapes X: {X.shape}, Xrec: {Xrec.shape}'
    return jnp.mean((Xrec - X) ** 2)
