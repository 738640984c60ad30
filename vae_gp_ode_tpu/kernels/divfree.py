"""Divergence-free matrix-valued kernel (the "informative prior").

Semantics match the reference DivergenceFreeKernel (reference:
experiments/model/core/kernels.py:201-393): an RBF envelope multiplied by a
Hessian-structure term (diff (x) diff / l^2 + ((D-1) - r^2/l^2) I) which
guarantees sampled vector fields have zero divergence, plus operator-valued
random Fourier features (B(w) = |w| I - w w^T / |w|, cos & sin features, 2S
weights; Brault et al., ORFF) and a single big (M*D, M*D) Cholesky for the
pathwise update.

Parity notes (quirks preserved deliberately):
  * the DF kernel uses *unscaled* squared distances with an explicit
    1/(2 l^2) envelope factor, where l^2 is the full (D, D) dimwise
    lengthscale matrix broadcast over output-dim pairs
    (reference kernels.py:217-230, 289-291 - this differs from the RBF
    class's lengthscale-normalised square_dist).
  * the params reuse the dimwise RBFParams layout: lengthscales (D, D),
    variance (D,) (reference kernels.py:201-203 subclasses RBF with
    dimwise=True).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from vae_gp_ode_tpu.core.settings import JITTER
from vae_gp_ode_tpu.core.linalg import cholesky, solve_triangular
from vae_gp_ode_tpu.kernels.rbf import (
    RBFParams, RFFState, rbf_lengthscales, rbf_variance,
)


def _sqdist_unscaled(X, X2=None):
    """Unscaled squared euclidean distance -> (N, M).

    reference kernels.py:217-230
    """
    xn = jnp.sum(X * X, axis=1)
    X2_ = X if X2 is None else X2
    x2n = xn if X2 is None else jnp.sum(X2_ * X2_, axis=1)
    return -2.0 * (X @ X2_.T) + xn[:, None] + x2n[None, :]


def _difference(X, X2=None):
    """(X2 - X) arranged as (D, N, M) (reference kernels.py:233-242:
    X2.T[:,None,:] - X.T[:,:,None])."""
    X2_ = X if X2 is None else X2
    return X2_.T[:, None, :] - X.T[:, :, None]


def df_gram(p: RBFParams, X, X2=None):
    """Matrix-valued gram K(X, X2) -> (N*D, M*D).

    reference kernels.py:265-303
    """
    D = X.shape[1]
    ls = rbf_lengthscales(p)          # (D, D)
    var = rbf_variance(p)             # (D,)
    ls2 = ls * ls                     # (D, D)

    sq = _sqdist_unscaled(X, X2)                       # (N, M)
    sq4 = sq[:, :, None, None]                         # (N, M, 1, 1)
    rbf_term = var * jnp.exp(-sq4 / (2.0 * ls2))       # (N, M, D, D)

    diff = _difference(X, X2)                          # (D, N, M)
    # diff_i * diff_j arranged (N, M, D, D), scaled by 1/l^2
    outer = jnp.transpose(diff[:, None, :, :] * diff[None, :, :, :],
                          (2, 3, 0, 1))                # (N, M, D, D)
    term1 = outer / ls2

    eye = jnp.eye(D, dtype=X.dtype)
    term2 = ((D - 1.0) - sq4 / ls2) * eye[None, None, :, :]   # (N, M, D, D)

    K = rbf_term * (term1 + term2) / ls2               # (N, M, D, D)
    N = X.shape[0]
    M = N if X2 is None else X2.shape[0]
    # interleave output dims with points: (N, D, M, D) -> (N*D, M*D)
    return jnp.transpose(K, (0, 2, 1, 3)).reshape(N * D, M * D)


def df_gram_diag(p: RBFParams, X):
    """Diagonal of ``df_gram(p, X)`` without building the (N*D, N*D) gram.

    At zero distance sq = 0 and diff = 0, so term1 vanishes and
    term2 = (D-1) I; the diagonal entry for point n, output dim d is
    var[d] * (D-1) / ls2[d, d] - constant across points. Returns (N*D,)
    in df_gram's points-major layout (index n*D + d). Pinned against
    jnp.diagonal(df_gram(...)) in tests/test_kernels_df.py.
    """
    D = X.shape[1]
    ls = rbf_lengthscales(p)
    var = rbf_variance(p)
    ls2 = ls * ls
    ls2_dd = jnp.diagonal(ls2) if ls2.ndim == 2 else ls2
    kdiag = jnp.broadcast_to(var * (D - 1.0) / ls2_dd, (D,))
    return jnp.tile(kdiag, X.shape[0])


def df_sample_rff(p: RBFParams, key, S, D_in, D_out,
                  noise: Optional[dict] = None) -> RFFState:
    """Draw operator-valued RFF parameters (reference kernels.py:305-316).

    omega: (D, S, D) scaled by dimwise lengthscales; weights: (2S, D)
    (cos and sin blocks); phase: (1, S, D).
    """
    ls = rbf_lengthscales(p)
    if noise is None:
        k_om, k_ph, k_w = jax.random.split(key, 3)
        omega_raw = jax.random.normal(k_om, (D_in, S, D_out))
        phase_u = jax.random.uniform(k_ph, (1, S, D_out))
        weights = jax.random.normal(k_w, (2 * S, D_out))
    else:
        omega_raw = noise['omega']
        phase_u = noise['phase_u']
        weights = noise['weights']
    omega = omega_raw / ls.T[:, None, :]
    phase = phase_u * (2.0 * jnp.pi)
    return RFFState(omega=omega, phase=phase, weights=weights)


def df_orff_B(rff: RFFState, dtype=jnp.float32):
    """B^*(omega) = |w| I - w w^T / |w| per feature -> (2S, D, D)
    (reference kernels.py:327-337; cos and sin blocks share B)."""
    D = rff.omega.shape[0]
    om1 = jnp.transpose(rff.omega, (1, 0, 2))          # (S, D, D)
    om2 = jnp.transpose(rff.omega, (1, 2, 0))          # (S, D, D)
    norm = jnp.sqrt(jnp.sum(rff.omega ** 2, axis=0))[:, None]   # (S, 1, D)
    ww = om1 @ om2                                     # (S, D, D)
    eye = jnp.eye(D, dtype=dtype)
    b_omega = norm * eye[None, :] - ww / norm          # (S, D, D)
    return jnp.concatenate([b_omega, b_omega], axis=0)  # (2S, D, D)


def df_orff_contraction(p: RBFParams, rff: RFFState):
    """Precompute the per-draw ORFF contraction matrix G (2S*D, D):

        f(n, d) = sum_{j,i} trig(n, j, i) * w(j, i) * B(j, i, d)
                  * sqrt(var_d / S)
                = [trig flat (N, 2S*D)] @ G

    The reference (kernels.py:319-351) materialises the (N, 2S, D, D)
    tensor and rebuilds B at EVERY solver step; B, w and var are fixed for
    a given function draw, so the whole contraction collapses to one
    (2S*D, D) matrix computed once per draw - the per-step prior eval
    becomes a single MXU matmul. Exact same math (associativity only).
    """
    S = rff.omega.shape[1]
    var = rbf_variance(p)                              # (D,)
    B = df_orff_B(rff, rff.omega.dtype)                # (2S, D, D)
    G = B * rff.weights[:, :, None]                    # (2S, D, D)
    G = G * jnp.sqrt(var / S)[None, None, :]
    twoSD = G.shape[0] * G.shape[1]
    return G.reshape(twoSD, G.shape[2])                # (2S*D, D)


def df_rff_eval(p: RBFParams, rff: RFFState, x, G=None):
    """Evaluate the operator-valued RFF prior sample at x -> (N, D).

    reference kernels.py:319-351 (ORFF for divergence-free fields,
    B(w) = |w|_2 I - w w^T / |w|_2 applied per feature; cos and sin
    feature blocks share B but use independent weights).

    With `G` (the per-draw contraction from :func:`df_orff_contraction`)
    the evaluation is trig-features + one matmul - the hot-path form used
    inside ODE solves. Without it, the reference's direct computation.
    """
    D = x.shape[1]
    S = rff.omega.shape[1]

    xo = jnp.einsum('nd,dfk->nfk', x, rff.omega)       # (N, S, D)
    phi_cos = jnp.cos(xo + rff.phase)
    phi_sin = jnp.sin(xo + rff.phase)
    trig = jnp.concatenate([phi_cos, phi_sin], axis=1)  # (N, 2S, D)

    if G is not None:
        return trig.reshape(x.shape[0], -1) @ G        # (N, D)

    var = rbf_variance(p)                              # (D,)
    B = df_orff_B(rff, x.dtype)                        # (2S, D, D)
    phi = trig[..., None] * B[None] * jnp.sqrt(var / S)  # (N, 2S, D, D)
    return jnp.sum(phi * rff.weights[None, :, :, None], axis=(1, 2))


def df_compute_nu(p: RBFParams, Ku, u_prior, u):
    """Pathwise-update coefficients for the matrix-valued kernel.

    One (M*D, M*D) Cholesky + two triangular solves
    (reference kernels.py:376-387). Returns (M*D, 1).
    """
    MD = Ku.shape[0]
    eye = jnp.eye(MD, dtype=Ku.dtype)
    # core.linalg wrappers: pure-HLO under serving export (portable mode)
    Lu = cholesky(Ku + eye * JITTER)
    a = solve_triangular(
        Lu, u_prior.reshape(MD)[:, None], lower=True)
    nu = solve_triangular(
        Lu.T, u.reshape(MD)[:, None] - a, lower=False)
    return nu  # (MD, 1)


def df_f_update(p: RBFParams, nu, x, Z):
    """Pathwise update K(x, Z) nu -> (N, D) (reference kernels.py:390-393)."""
    Kuf = df_gram(p, Z, x)            # (M*D, N*D)
    return (Kuf.T @ nu).reshape(x.shape)
