"""Squared-exponential (RBF) kernel as pure functions over a params pytree.

Semantics match the reference RBF module (reference:
experiments/model/core/kernels.py:29-195): optionally per-output-dimension
("dimwise") lengthscales/variances, spectral-density frequency sampling for
random Fourier features, decoupled-sampling pathwise update term
nu = K(Z,Z)^{-1}(u - f(Z)) via Cholesky + two triangular solves, and the
cross-gram f_update contraction. Randomness is explicit (keys or injected
noise) instead of the reference's global numpy state (kernels.py:13-26).

All gram math is batched einsum / matmul so XLA can tile it onto the MXU;
the fused per-ODE-step evaluation also has a Pallas fast path in
vae_gp_ode_tpu.ops.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from vae_gp_ode_tpu.core.settings import JITTER
from vae_gp_ode_tpu.core.transforms import softplus, invsoftplus
from vae_gp_ode_tpu.core.linalg import cholesky, solve_triangular


@struct.dataclass
class RBFParams:
    """Unconstrained kernel hyperparameters.

    dimwise=True:  lengthscales (D_out, D_in), variance (D_out,)
    dimwise=False: lengthscales (D_in,),       variance (1,)
    (reference kernels.py:44-49)
    """

    unconstrained_lengthscales: jnp.ndarray
    unconstrained_variance: jnp.ndarray
    dimwise: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class RFFState:
    """A fixed draw of random-Fourier-feature parameters.

    One draw defines (together with nu) a single pathwise sample from the GP
    posterior (reference kernels.py:126-137 "build_cache").

    omega:   (D_in, S, D_out) if dimwise else (D_in, S)
    phase:   (1, S, D_out)    if dimwise else (1, S)
    weights: (S, D_out)  [DF kernel uses (2S, D_out)]
    """

    omega: jnp.ndarray
    phase: jnp.ndarray
    weights: jnp.ndarray


def init_rbf_params(D_in, D_out=None, dimwise=True,
                    lengthscale=0.2, variance=0.1, dtype=jnp.float32):
    """Constant-initialised params (reference kernels.py:52-54 initialises to
    lengthscale 0.2 / variance 0.1; main.py:154 then overwrites with CLI
    values via initialize_and_fix_kernel_parameters)."""
    D_out = D_in if D_out is None else D_out
    ls_shape = (D_out, D_in) if dimwise else (D_in,)
    var_shape = (D_out,) if dimwise else (1,)
    return RBFParams(
        unconstrained_lengthscales=jnp.full(
            ls_shape, invsoftplus(jnp.asarray(lengthscale, dtype)), dtype),
        unconstrained_variance=jnp.full(
            var_shape, invsoftplus(jnp.asarray(variance, dtype)), dtype),
        dimwise=dimwise,
    )


def rbf_lengthscales(p: RBFParams):
    return softplus(p.unconstrained_lengthscales)


def rbf_variance(p: RBFParams):
    return softplus(p.unconstrained_variance)


def _sqdist_shared(X, X2, ls):
    """Scaled squared distance, shared lengthscales -> (N, M).

    reference kernels.py:81-96
    """
    Xs_ = X / ls
    X2s_ = Xs_ if X2 is None else X2 / ls
    xn = jnp.sum(Xs_ * Xs_, axis=1)
    x2n = xn if X2 is None else jnp.sum(X2s_ * X2s_, axis=1)
    cross = Xs_ @ X2s_.T
    return -2.0 * cross + xn[:, None] + x2n[None, :]


def _sqdist_dimwise(X, X2, ls):
    """Scaled squared distance per output dim -> (D_out, N, M).

    reference kernels.py:64-79
    """
    Xd = X[None, :, :] / ls[:, None, :]               # (D, N, D_in)
    X2d = Xd if X2 is None else X2[None, :, :] / ls[:, None, :]
    xn = jnp.sum(Xd * Xd, axis=2)                     # (D, N)
    x2n = xn if X2 is None else jnp.sum(X2d * X2d, axis=2)
    cross = jnp.einsum('dnk,dmk->dnm', Xd, X2d)
    return -2.0 * cross + xn[:, :, None] + x2n[:, None, :]


def rbf_gram(p: RBFParams, X, X2=None):
    """K(X, X2): (D_out, N, M) if dimwise else (N, M).

    reference kernels.py:98-110
    """
    ls = rbf_lengthscales(p)
    var = rbf_variance(p)
    if p.dimwise:
        return var[:, None, None] * jnp.exp(-0.5 * _sqdist_dimwise(X, X2, ls))
    return var * jnp.exp(-0.5 * _sqdist_shared(X, X2, ls))


def rbf_sample_rff(p: RBFParams, key, S, D_in, D_out,
                   noise: Optional[dict] = None) -> RFFState:
    """Draw RFF parameters defining one prior function sample.

    omega ~ N(0, diag(1/ls^2)) (spectral density of SE kernel,
    reference kernels.py:112-124), phase ~ U[0, 2pi), weights ~ N(0, I)
    (reference kernels.py:126-137).

    `noise` optionally injects raw standard-normal/uniform draws
    {omega, phase_u, weights} for exact parity tests against the reference.
    """
    ls = rbf_lengthscales(p)
    omega_shape = (D_in, S, D_out) if p.dimwise else (D_in, S)
    phase_shape = (1, S, D_out) if p.dimwise else (1, S)
    if noise is None:
        k_om, k_ph, k_w = jax.random.split(key, 3)
        omega_raw = jax.random.normal(k_om, omega_shape)
        phase_u = jax.random.uniform(k_ph, phase_shape)
        weights = jax.random.normal(k_w, (S, D_out))
    else:
        omega_raw = noise['omega']
        phase_u = noise['phase_u']
        weights = noise['weights']
    ls_b = ls.T[:, None, :] if p.dimwise else ls[:, None]
    omega = omega_raw / ls_b
    phase = phase_u * (2.0 * jnp.pi)
    return RFFState(omega=omega, phase=phase, weights=weights)


def rbf_rff_eval(p: RBFParams, rff: RFFState, x):
    """Evaluate the RFF prior sample at x: (N, D_in) -> (N, D_out).

    phi(x) = cos(x @ omega + phase) * sqrt(var / S);  f = phi @ w
    (reference kernels.py:140-153)

    Parity quirk preserved: with cos-only features and uniform phase this
    scaling yields a prior sample whose covariance is K/2, not K (the
    textbook construction uses sqrt(2 var / S)). The reference trains its
    published results with this scaling, so we keep it bit-compatible.
    """
    var = rbf_variance(p)
    S = rff.weights.shape[0]
    if p.dimwise:
        xo = jnp.einsum('nd,dfk->nfk', x, rff.omega)
        phi = jnp.cos(xo + rff.phase) * jnp.sqrt(var / S)
        return jnp.einsum('nfk,fk->nk', phi, rff.weights)
    xo = x @ rff.omega
    phi = jnp.cos(xo + rff.phase) * jnp.sqrt(var / S)
    return phi @ rff.weights


def rbf_compute_nu(p: RBFParams, Ku, u_prior, u):
    """Pathwise-update coefficients nu = K(Z,Z)^{-1}(u - f(Z)) in whitened
    form (Wilson et al. 2020 eq. 13; reference kernels.py:155-172).

    Note the exact reference semantics: with the whitened parameterisation
    the first triangular solve is applied to the *prior draw* only, and the
    inducing sample u is added between the two solves:
        a  = L^{-1} f(Z)
        nu = L^{-T} (u - a)
    Returns (M, D_out) if shared, (D_out, M, 1) if dimwise.
    """
    M = Ku.shape[-1]
    eye = jnp.eye(M, dtype=Ku.dtype)
    # core.linalg wrappers: XLA/LAPACK-native normally, pure-HLO under
    # serving export (portable_lowering) - see core/linalg.py
    Lu = cholesky(Ku + eye * JITTER)
    if not p.dimwise:
        a = solve_triangular(Lu, u_prior, lower=True)
        nu = solve_triangular(Lu.T, u - a, lower=False)
        return nu  # (M, D_out)
    # dimwise: Ku (D, M, M); u_prior/u (M, D) -> per-dim column vectors
    up = u_prior.T[:, :, None]       # (D, M, 1)
    uu = u.T[:, :, None]             # (D, M, 1)
    solve = jax.vmap(
        lambda L, b: solve_triangular(L, b, lower=True))
    solve_t = jax.vmap(
        lambda L, b: solve_triangular(L.T, b, lower=False))
    a = solve(Lu, up)                # (D, M, 1)
    nu = solve_t(Lu, uu - a)         # (D, M, 1)
    return nu


def rbf_f_update(p: RBFParams, nu, x, Z):
    """Pathwise update K(x, Z) nu -> (N, D_out).

    reference kernels.py:174-181 (computes Kuf = K(Z, x) then contracts)
    """
    if not p.dimwise:
        Kuf = rbf_gram(p, Z, x)                  # (M, N)
        return jnp.einsum('md,mn->nd', nu, Kuf)
    Kuf = rbf_gram(p, Z, x)                      # (D, M, N)
    return jnp.einsum('dm,dmn->nd', nu[..., 0], Kuf)
