"""Sparse variational GP with decoupled pathwise posterior sampling.

Rebuild of the reference SVGP layer (reference:
experiments/model/core/svpy.py:30-210) as pure functions over pytrees:

  * whitened variational posterior q(u) = N(m, L L^T), full-Cholesky
    (packed lower-tri vectors) or diagonal,
  * `draw_fn_sample`: the reference's stateful `build_cache` (svpy.py:103)
    becomes an explicit pure function key -> FnSample; the ODE right-hand
    side is then the pure `fn_eval(params, sample, x)`,
  * closed-form whitened KL(q(u) || N(0, I)) (svpy.py:144-175),
  * exact conditional q(f(x)) (svpy.py:179-210) for eval/diagnostics.

Decoupled sampling: f(x) = Phi(x) w + K(x, Z) nu with
nu = K(Z,Z)^{-1}(u - f_prior(Z)) (Wilson et al. 2020, eq. 13).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from vae_gp_ode_tpu.core.settings import JITTER
from vae_gp_ode_tpu.core.transforms import (
    softplus, unpack_tril, pack_tril, tril_size,
)
from vae_gp_ode_tpu.kernels import rbf as rbfk
from vae_gp_ode_tpu.kernels import divfree as dfk


@struct.dataclass
class SVGPParams:
    """Trainable SVGP state (all leaves optimised jointly).

    kernel:        RBFParams (the DF kernel reuses the dimwise layout)
    inducing_loc:  (M, D_in)
    Um:            (M, D_out) variational mean (whitened)
    Us_sqrt:       packed scale: (D_out, M(M+1)/2) full-Cholesky, or
                   (M, D_out) unconstrained diag (softplus-constrained)
    (reference svpy.py:76-86)
    """

    kernel: rbfk.RBFParams
    inducing_loc: jnp.ndarray
    Um: jnp.ndarray
    Us_sqrt: jnp.ndarray
    q_diag: bool = struct.field(pytree_node=False, default=False)
    kernel_name: str = struct.field(pytree_node=False, default='RBF')

    @property
    def M(self):
        return self.inducing_loc.shape[0]

    @property
    def D_in(self):
        return self.inducing_loc.shape[1]

    @property
    def D_out(self):
        return self.Um.shape[1]


@struct.dataclass
class FnSample:
    """One pathwise posterior function sample (the reference's cache,
    svpy.py:103-121): fixed RFF draw + pathwise-update coefficients.

    df_G: DF kernel only - the per-draw ORFF contraction matrix
    (2S*D, D) so the per-ODE-step prior eval is one matmul
    (kernels.divfree.df_orff_contraction); None for RBF."""

    rff: rbfk.RFFState
    nu: jnp.ndarray
    df_G: Optional[jnp.ndarray] = None


def init_svgp_params(key, D_in, D_out, M, kernel='RBF', q_diag=False,
                     dimwise=True, dtype=jnp.float32) -> SVGPParams:
    """Random initialisation matching the reference's scales:
    inducing_loc ~ N(0,1), Um ~ N(0,1)*0.1, Us_sqrt = I*1e-3
    (reference svpy.py:76-86)."""
    k_z, k_m = jax.random.split(key)
    if kernel == 'RBF':
        kern = rbfk.init_rbf_params(D_in, D_out, dimwise=dimwise, dtype=dtype)
    elif kernel == 'DF':
        if D_in != D_out:
            # the matrix-valued DF kernel is square by construction (the
            # (M*D, M*D) gram and the ORFF B(w) = |w|I - ww^T/|w| both
            # require D_in == D_out); the reference crashes on mismatched
            # dims too (kernels.py:265-303, 319-351 shape analysis), so
            # 2nd-order ODEs (D_in = 2q -> D_out = q) need the RBF kernel
            raise ValueError(
                f'DF kernel requires D_in == D_out, got {D_in} != {D_out}')
        # DF kernel reuses the dimwise param layout (reference kernels.py:203)
        kern = rbfk.init_rbf_params(D_in, D_out, dimwise=True, dtype=dtype)
    else:
        raise ValueError(f'Invalid kernel selection: {kernel!r}')

    inducing_loc = jax.random.normal(k_z, (M, D_in), dtype)
    Um = jax.random.normal(k_m, (M, D_out), dtype) * 0.1
    if q_diag:
        # unconstrained diag scale; softplus(us) = 1e-3 at init
        from vae_gp_ode_tpu.core.transforms import invsoftplus
        Us_sqrt = jnp.full((M, D_out), invsoftplus(jnp.asarray(1e-3, dtype)),
                           dtype)
    else:
        eye = jnp.eye(M, dtype=dtype) * 1e-3
        Us_sqrt = pack_tril(jnp.broadcast_to(eye, (D_out, M, M)))
    return SVGPParams(kernel=kern, inducing_loc=inducing_loc, Um=Um,
                      Us_sqrt=Us_sqrt, q_diag=q_diag, kernel_name=kernel)


def _scale_tril(p: SVGPParams):
    """Constrained scale of q(u): (D_out, M, M) lower-tri."""
    return unpack_tril(p.Us_sqrt, p.M)


def sample_inducing(p: SVGPParams, key=None, epsilon=None):
    """Draw u ~ q(u) = N(m, L L^T) (whitened), (M, D_out).

    reference svpy.py:88-101
    """
    if epsilon is None:
        epsilon = jax.random.normal(key, (p.M, p.D_out), p.Um.dtype)
    if p.q_diag:
        ZS = softplus(p.Us_sqrt) * epsilon
    else:
        ZS = jnp.einsum('dnm,md->nd', _scale_tril(p), epsilon)
    return ZS + p.Um


def draw_fn_sample(p: SVGPParams, key, S, noise: Optional[dict] = None
                   ) -> FnSample:
    """Draw one pathwise posterior sample (reference svpy.py:103-121).

    1. draw RFF parameters (omega, phase, weights),
    2. draw u ~ q(u),
    3. compute nu = K(Z,Z)^{-1}(u - f_prior(Z)) via Cholesky + solves.

    `noise` optionally injects raw draws {omega, phase_u, weights, epsilon}
    for exact parity testing.
    """
    if noise is None:
        k_rff, k_u = jax.random.split(key)
        eps = None
    else:
        k_rff = k_u = None
        eps = noise['epsilon']

    Z = p.inducing_loc
    if p.kernel_name == 'DF':
        rff = dfk.df_sample_rff(p.kernel, k_rff, S, p.D_in, p.D_out,
                                noise=noise)
        G = dfk.df_orff_contraction(p.kernel, rff)
        u = sample_inducing(p, k_u, epsilon=eps)
        Ku = dfk.df_gram(p.kernel, Z)
        u_prior = dfk.df_rff_eval(p.kernel, rff, Z, G=G)
        nu = dfk.df_compute_nu(p.kernel, Ku, u_prior, u)
        return FnSample(rff=rff, nu=nu, df_G=G)
    rff = rbfk.rbf_sample_rff(p.kernel, k_rff, S, p.D_in, p.D_out,
                              noise=noise)
    u = sample_inducing(p, k_u, epsilon=eps)
    Ku = rbfk.rbf_gram(p.kernel, Z)
    u_prior = rbfk.rbf_rff_eval(p.kernel, rff, Z)
    nu = rbfk.rbf_compute_nu(p.kernel, Ku, u_prior, u)
    return FnSample(rff=rff, nu=nu)


def fn_eval(p: SVGPParams, s: FnSample, x):
    """Evaluate the sampled posterior function: f(x) = prior + update.

    The per-ODE-step hot path (reference svpy.py:123-142). On TPU the
    dimwise-RBF case dispatches to the fused Pallas kernel
    (ops.pathwise.fused_pathwise_eval); the jnp path is the reference
    implementation and the reverse-mode graph.
    """
    if p.kernel_name == 'DF':
        from vae_gp_ode_tpu.ops import config as ops_config
        if ops_config.use_pallas() and s.df_G is not None:
            D, S = x.shape[1], s.rff.phase.shape[1]
            M = p.inducing_loc.shape[0]
            if ops_config.df_kernel_fits(D, S, M):
                from vae_gp_ode_tpu.ops.df_pathwise import (
                    df_fused_operands, fused_df_pathwise_eval)
                return fused_df_pathwise_eval(
                    x, *df_fused_operands(p, s, D),
                    ops_config.interpret_mode())
            if ops_config.df_tiled_fits(D, S, M):
                # wide shapes: (output-dim, feature-chunk) grid-tiled
                # kernel - the single-block panel kills the v5e compiler
                from vae_gp_ode_tpu.ops.df_pathwise import (
                    df_fused_operands)
                from vae_gp_ode_tpu.ops.df_pathwise_tiled import (
                    tiled_df_pathwise_eval)
                return tiled_df_pathwise_eval(
                    x, *df_fused_operands(p, s, D),
                    interpret=ops_config.interpret_mode())
        f_prior = dfk.df_rff_eval(p.kernel, s.rff, x, G=s.df_G)
        f_up = dfk.df_f_update(p.kernel, s.nu, x, p.inducing_loc)
        return f_prior + f_up
    if p.kernel.dimwise:
        from vae_gp_ode_tpu.ops import config as ops_config
        from vae_gp_ode_tpu.ops.pathwise import (
            fused_pathwise_eval, rbf_fused_operands)
        if ops_config.use_pallas():
            K, S = s.rff.phase.shape[2], s.rff.phase.shape[1]
            M = p.inducing_loc.shape[0]
            if ops_config.rbf_kernel_fits(K, S, M):
                return fused_pathwise_eval(
                    x, *rbf_fused_operands(p, s),
                    ops_config.interpret_mode())
            if ops_config.rbf_tiled_fits(K, S, M):
                # wide shapes: grid-tiled kernel (ops.pathwise_tiled) -
                # the single-block panel would kill the v5e compiler
                from vae_gp_ode_tpu.ops.pathwise_tiled import (
                    tiled_pathwise_eval)
                return tiled_pathwise_eval(
                    x, *rbf_fused_operands(p, s),
                    ops_config.interpret_mode())
    f_prior = rbfk.rbf_rff_eval(p.kernel, s.rff, x)
    f_up = rbfk.rbf_f_update(p.kernel, s.nu, x, p.inducing_loc)
    return f_prior + f_up


def svgp_kl(p: SVGPParams):
    """Whitened KL(q(u) || N(0, I)) in closed form (reference
    svpy.py:144-175)."""
    alpha = p.Um                                   # (M, D)
    if p.q_diag:
        Lq_diag = softplus(p.Us_sqrt)              # (M, D)
        trace = jnp.sum(Lq_diag ** 2, axis=0)      # (D,)
    else:
        Lq = _scale_tril(p)                        # (D, M, M)
        Lq_diag = jnp.transpose(
            jnp.diagonal(Lq, axis1=1, axis2=2))    # (M, D)
        trace = jnp.sum(Lq ** 2, axis=(1, 2))      # (D,)
    mahalanobis = jnp.sum(alpha ** 2, axis=0)      # (D,)
    logdet_qcov = jnp.sum(jnp.log(Lq_diag ** 2), axis=0)  # (D,)
    twoKL = -logdet_qcov + mahalanobis + trace - float(p.M)
    return 0.5 * jnp.sum(twoKL)


def svgp_conditional(p: SVGPParams, x, full_cov=False):
    """Exact conditional q(f(x)) = N(m(x), Sigma(x)) for the RBF kernels
    (reference svpy.py:179-210; the reference version is dead code using a
    deprecated torch API - this is a working equivalent for eval).

    Returns (mean (N, D), var (N, D) or (D, N, N) if full_cov).
    DF kernel: full_cov returns the full (N*D, N*D) covariance - the
    matrix-valued kernel correlates output dims, so the covariance does
    not factor per-dim like the RBF case.
    """
    if p.kernel_name == 'DF':
        return _svgp_conditional_df(p, x, full_cov)
    dimwise = p.kernel.dimwise
    Z = p.inducing_loc
    M = p.M
    Ku = rbfk.rbf_gram(p.kernel, Z)                       # (M,M) or (D,M,M)
    eye = jnp.eye(M, dtype=Ku.dtype)
    Lu = jnp.linalg.cholesky(Ku + eye * JITTER)
    Kuf = rbfk.rbf_gram(p.kernel, Z, x)                   # (M,N) or (D,M,N)

    if dimwise:
        A = jax.vmap(lambda L, b: jax.scipy.linalg.solve_triangular(
            L, b, lower=True))(Lu, Kuf)                   # (D, M, N)
    else:
        A = jax.scipy.linalg.solve_triangular(Lu, Kuf, lower=True)  # (M, N)

    if p.q_diag:
        # diagonal q(u): S = diag(s^2), NOT the rank-1 outer product s s^T
        # (round-3 review finding - the outer product gave wrong, possibly
        # negative, posterior variances for M > 1)
        s = softplus(p.Us_sqrt).T                         # (D, M)
        SK = jax.vmap(jnp.diag)(s * s) - eye[None]        # (D, M, M)
    else:
        Ls = _scale_tril(p)                               # (D, M, M)
        SK = Ls @ jnp.transpose(Ls, (0, 2, 1)) - eye[None]  # (D, M, M)
    B = jnp.einsum('dme,den->dmn' if dimwise else 'dmi,in->dmn', SK, A)

    A_b = A if dimwise else A[None]                        # (D, M, N)
    if full_cov:
        delta = jnp.einsum('dme,dmn->den', A_b, B)         # (D, N, N)
        Kff = rbfk.rbf_gram(p.kernel, x)
        Kff = Kff if dimwise else Kff[None]
        var = Kff + delta                                  # (D, N, N)
    else:
        delta = jnp.sum(A_b * B, axis=1)                   # (D, N)
        # k(x, x) for the SE kernel is just the variance - no need to
        # build the (D, N, N) gram to read its diagonal
        N = x.shape[0]
        var_k = jnp.atleast_1d(rbfk.rbf_variance(p.kernel))
        Kff = jnp.broadcast_to(var_k[:, None],
                               (var_k.shape[0], N))        # (D or 1, N)
        var = (Kff + delta).T                               # (N, D)

    mean = jnp.einsum('dmn,md->nd' if dimwise else 'mn,md->nd', A, p.Um)
    return mean, var


def _svgp_conditional_df(p: SVGPParams, x, full_cov=False):
    """Exact conditional for the matrix-valued divergence-free kernel:
    one (M*D, M*D) Cholesky solve (the working analog of the reference's
    dead build_conditional, svpy.py:179-210, whose torch.cholesky call
    could never handle the DF gram shapes).

    Same whitened convention as the RBF branch (mean = A^T m,
    Sigma = Kff + A^T (S - I) A with A = Lu^{-1} Kuf): q(u)'s covariance
    is block-diagonal over output dims d with blocks L_d L_d^T, laid out
    on the flattened inducing vector u[m*D + d] (the layout
    df_compute_nu/df_gram use: points-major, dims fastest).

    Returns (mean (N, D), var (N, D)); full_cov returns the full
    (N*D, N*D) covariance (see svgp_conditional docstring).
    """
    Z = p.inducing_loc
    M, D = p.M, p.D_out
    MD = M * D
    Ku = dfk.df_gram(p.kernel, Z)                        # (MD, MD)
    Lu = jnp.linalg.cholesky(Ku + jnp.eye(MD, dtype=Ku.dtype) * JITTER)
    Kuf = dfk.df_gram(p.kernel, Z, x)                    # (MD, N*D)
    A = jax.scipy.linalg.solve_triangular(Lu, Kuf, lower=True)

    if p.q_diag:
        s2 = (softplus(p.Us_sqrt) ** 2).reshape(MD)      # (MD,) at m*D+d
        B = (s2 - 1.0)[:, None] * A                      # (S - I) A
    else:
        Ls = _scale_tril(p)                              # (D, M, M)
        Ad = jnp.transpose(A.reshape(M, D, -1), (1, 0, 2))   # (D, M, ND)
        t = jnp.einsum('dnm,dnk->dmk', Ls, Ad)           # L_d^T A_d
        SdA = jnp.einsum('dmn,dnk->dmk', Ls, t)          # L_d L_d^T A_d
        B = jnp.transpose(SdA - Ad, (1, 0, 2)).reshape(MD, -1)

    mean = (A.T @ p.Um.reshape(MD)[:, None]).reshape(x.shape[0], D)
    if full_cov:
        return mean, dfk.df_gram(p.kernel, x) + A.T @ B  # (ND, ND)
    # closed-form diagonal: building the (ND, ND) gram just to read its
    # diagonal costs O(N^2 D^2) memory (144 MB at N=1000, D=6)
    Kff_diag = dfk.df_gram_diag(p.kernel, x)             # (ND,)
    var = (Kff_diag + jnp.sum(A * B, axis=0)).reshape(x.shape[0], D)
    return mean, var
