"""Fused pathwise GP evaluation: f(x) = Phi(x) w + K(x, Z) nu.

This is the per-ODE-step hot op (SURVEY.md section 3.1 hot loop): for the
dimwise RBF kernel it is evaluated (T-1) * L times per training step on
small operands (N=20 states, S=256 features, M=100 inducing, D=6 dims).
The Pallas kernel fuses the whole evaluation - feature projection, cosine,
scaling, feature contraction, scaled cross-distances, exponential, and the
inducing contraction - into one VMEM-resident kernel, eliminating all HBM
round-trips between the ~10 XLA ops it replaces.

Reverse mode uses a custom VJP whose backward recomputes through the jnp
reference implementation (identical math; the forward outputs match to
float32 roundoff, and the cotangents only flow through the reference
graph). The reference implementation is also the parity oracle on CPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pathwise_eval_reference(x, omega, phase, weights, Z, nu, ls, var):
    """jnp reference: dimwise-RBF prior + pathwise update.

    Shapes: x (N, D), omega (D, S, K), phase (1, S, K), weights (S, K),
    Z (M, D), nu (K, M), ls (K, D), var (K,). Returns (N, K).
    Matches kernels.rbf rbf_rff_eval + rbf_f_update semantics (including
    the preserved sqrt(var/S) prior scaling quirk).
    """
    S = weights.shape[0]
    xo = jnp.einsum('nd,dfk->nfk', x, omega)
    phi = jnp.cos(xo + phase) * jnp.sqrt(var / S)
    f_prior = jnp.einsum('nfk,fk->nk', phi, weights)

    Xd = x[None, :, :] / ls[:, None, :]                  # (K, N, D)
    Zd = Z[None, :, :] / ls[:, None, :]                  # (K, M, D)
    xn = jnp.sum(Xd * Xd, axis=2)                        # (K, N)
    zn = jnp.sum(Zd * Zd, axis=2)                        # (K, M)
    cross = jnp.einsum('kmd,knd->kmn', Zd, Xd)           # (K, M, N)
    sq = zn[:, :, None] + xn[:, None, :] - 2.0 * cross
    Kuf = var[:, None, None] * jnp.exp(-0.5 * sq)        # (K, M, N)
    f_up = jnp.einsum('km,kmn->nk', nu, Kuf)
    return f_prior + f_up


def _pathwise_kernel(x_ref, omega_ref, phase_ref, w_ref, z_ref, nu_ref,
                     ls_ref, var_ref, out_ref):
    """Single-block VMEM kernel; output dims K iterated as a static loop
    (K is 6-12: each iteration is one (N,S)/(M,N) tile program)."""
    x = x_ref[:]                   # (N, D)
    Z = z_ref[:]                   # (M, D)
    K = out_ref.shape[1]
    S = w_ref.shape[0]

    for k in range(K):
        var_k = var_ref[k]
        # ---- prior term: cos(x @ omega_k + phase_k) . w_k
        om_k = omega_ref[:, :, k]                          # (D, S)
        xo = jnp.dot(x, om_k, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (N, S)
        phi = jnp.cos(xo + phase_ref[:, :, k])             # (N, S)
        phi = phi * jnp.sqrt(var_k / S)
        f1 = jnp.dot(phi, w_ref[:, k:k + 1],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (N, 1)

        # ---- update term: nu_k . (var_k exp(-0.5 d^2(Z/ls_k, x/ls_k)))
        inv_ls = 1.0 / ls_ref[k, :]                        # (D,)
        xs = x * inv_ls[None, :]                           # (N, D)
        zs = Z * inv_ls[None, :]                           # (M, D)
        xn = jnp.sum(xs * xs, axis=1, keepdims=True)       # (N, 1)
        zn = jnp.sum(zs * zs, axis=1, keepdims=True)       # (M, 1)
        cross = jnp.dot(xs, zs.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (N, M)
        sq = xn + zn.T - 2.0 * cross
        Kxz = var_k * jnp.exp(-0.5 * sq)                   # (N, M)
        f2 = jnp.dot(Kxz, nu_ref[k, :][:, None],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (N, 1)

        out_ref[:, k:k + 1] = f1 + f2


def _pallas_forward(x, omega, phase, weights, Z, nu, ls, var,
                    interpret=False):
    N = x.shape[0]
    D = x.shape[1]
    K = var.shape[0]
    if N <= 512:
        # single-block fast path (a grid adds ~30% overhead at small N)
        return pl.pallas_call(
            _pathwise_kernel,
            out_shape=jax.ShapeDtypeStruct((N, K), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, omega, phase, weights, Z, nu, ls, var)
    # batch-tile large N: the (TILE, S) and (TILE, M) intermediates must
    # fit scoped VMEM (a (1280, 1536) f32 intermediate alone is ~8 MB)
    tile = 256
    grid = (pl.cdiv(N, tile),)
    full = lambda i: (0, 0)           # noqa: E731 (operand replicated)
    full3 = lambda i: (0, 0, 0)       # noqa: E731
    return pl.pallas_call(
        _pathwise_kernel,
        out_shape=jax.ShapeDtypeStruct((N, K), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(omega.shape, full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(phase.shape, full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(weights.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(Z.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(nu.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(ls.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(var.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, omega, phase, weights, Z, nu, ls, var)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_pathwise_eval(x, omega, phase, weights, Z, nu, ls, var,
                        interpret=False):
    """Pallas-fused forward, reference-graph backward. Same signature and
    semantics as :func:`pathwise_eval_reference`."""
    return _pallas_forward(x, omega, phase, weights, Z, nu, ls, var,
                           interpret=interpret)


def _fwd(x, omega, phase, weights, Z, nu, ls, var, interpret):
    out = _pallas_forward(x, omega, phase, weights, Z, nu, ls, var,
                          interpret=interpret)
    return out, (x, omega, phase, weights, Z, nu, ls, var)


def _bwd(interpret, res, g):
    _, vjp = jax.vjp(pathwise_eval_reference, *res)
    return vjp(g)


fused_pathwise_eval.defvjp(_fwd, _bwd)
