"""Fused pathwise GP evaluation: f(x) = Phi(x) w + K(x, Z) nu.

This is the per-ODE-step hot op (SURVEY.md section 3.1 hot loop): for the
dimwise RBF kernel it is evaluated (T-1) * L times per training step on
small operands (N=20 states, S=256 features, M=100 inducing, D=6 dims).
The Pallas kernel fuses the whole evaluation - feature projection, cosine,
scaling, feature contraction, scaled cross-distances, exponential, and the
inducing contraction - into one VMEM-resident kernel, eliminating all HBM
round-trips between the ~10 XLA ops it replaces.

Reverse mode uses a custom VJP with a HAND-WRITTEN Pallas backward kernel
(_pathwise_bwd_kernel: the whole cotangent computation in one VMEM-resident
program, forced-f32 like the forward); batches past the single-block VMEM
limit fall back to differentiating the jnp reference at HIGHEST matmul
precision. The reference implementation is also the parity oracle on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
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
        var_k = var_ref[np.int32(k)]
        # ---- prior term: cos(x @ omega_k + phase_k) . w_k
        om_k = omega_ref[:, :, np.int32(k)]                          # (D, S)
        xo = jnp.dot(x, om_k, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (N, S)
        phi = jnp.cos(xo + phase_ref[:, :, np.int32(k)])             # (N, S)
        phi = phi * jnp.sqrt(var_k / S)
        f1 = jnp.dot(phi, w_ref[:, k:k + 1],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (N, 1)

        # ---- update term: nu_k . (var_k exp(-0.5 d^2(Z/ls_k, x/ls_k)))
        inv_ls = 1.0 / ls_ref[np.int32(k), :]                        # (D,)
        xs = x * inv_ls[None, :]                           # (N, D)
        zs = Z * inv_ls[None, :]                           # (M, D)
        xn = jnp.sum(xs * xs, axis=1, keepdims=True)       # (N, 1)
        zn = jnp.sum(zs * zs, axis=1, keepdims=True)       # (M, 1)
        cross = jnp.dot(xs, zs.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (N, M)
        sq = xn + zn.T - 2.0 * cross
        Kxz = var_k * jnp.exp(-0.5 * sq)                   # (N, M)
        f2 = jnp.dot(Kxz, nu_ref[np.int32(k), :][:, None],
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


def _pathwise_bwd_kernel(x_ref, omega_ref, phase_ref, w_ref, z_ref, nu_ref,
                         ls_ref, var_ref, g_ref,
                         dx_ref, dom_ref, dph_ref, dw_ref, dz_ref, dnu_ref,
                         dls_ref, dvar_ref):
    """Hand-written VJP of the fused pathwise evaluation: recomputes the
    forward intermediates in VMEM (cheaper than spilling the (N, S) /
    (N, M) activations to HBM) and emits every operand cotangent from one
    kernel. The step backward is ~95% of train wall-clock (RESULTS.md
    profile), so this replaces the ~25 XLA ops of the reference-graph VJP
    per ODE step."""
    x = x_ref[:]                    # (N, D)
    Z = z_ref[:]                    # (M, D)
    g = g_ref[:]                    # (N, K)
    K = g.shape[1]
    S = w_ref.shape[0]

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    dx = jnp.zeros_like(x)
    dZ = jnp.zeros_like(Z)
    for k in range(K):
        gk = g[:, k:k + 1]                                 # (N, 1)
        var_k = var_ref[np.int32(k)]
        scale = jnp.sqrt(var_k / S)

        # ---- prior term
        om_k = omega_ref[:, :, np.int32(k)]                          # (D, S)
        u = mm(x, om_k) + phase_ref[:, :, np.int32(k)]               # (N, S)
        cosv = jnp.cos(u)
        sinv = jnp.sin(u)
        w_k = w_ref[:, k:k + 1]                            # (S, 1)
        f1 = mm(cosv, w_k) * scale                         # (N, 1)
        dw = mm(cosv.T, gk) * scale                        # (S, 1)
        dcos = gk * (scale * w_k.T)                        # (N, S)
        du = -sinv * dcos                                  # (N, S)
        dph = jnp.sum(du, axis=0, keepdims=True)           # (1, S)
        dx = dx + mm(du, om_k.T)
        dom = mm(x.T, du)                                  # (D, S)

        # ---- update term
        inv_ls = 1.0 / ls_ref[np.int32(k), :]                        # (D,)
        xs = x * inv_ls[None, :]                           # (N, D)
        zs = Z * inv_ls[None, :]                           # (M, D)
        xn = jnp.sum(xs * xs, axis=1, keepdims=True)       # (N, 1)
        zn = jnp.sum(zs * zs, axis=1, keepdims=True)       # (M, 1)
        sq = xn + zn.T - 2.0 * mm(xs, zs.T)                # (N, M)
        Kxz = var_k * jnp.exp(-0.5 * sq)                   # (N, M)
        nu_k = nu_ref[np.int32(k), :][:, None]                       # (M, 1)
        f2 = mm(Kxz, nu_k)                                 # (N, 1)
        dnu = mm(Kxz.T, gk)                                # (M, 1)
        dKxz = gk * nu_k.T                                 # (N, M)
        dsq = -0.5 * Kxz * dKxz                            # (N, M)
        rowsum = jnp.sum(dsq, axis=1, keepdims=True)       # (N, 1)
        colsum = jnp.sum(dsq, axis=0, keepdims=True)       # (1, M)
        dxs = 2.0 * (rowsum * xs - mm(dsq, zs))            # (N, D)
        dzs = 2.0 * (colsum.T * zs - mm(dsq.T, xs))        # (M, D)
        dx = dx + dxs * inv_ls[None, :]
        dZ = dZ + dzs * inv_ls[None, :]
        dls = -(jnp.sum(dxs * xs, axis=0)
                + jnp.sum(dzs * zs, axis=0)) * inv_ls      # (D,)

        # ---- variance: f1 ~ sqrt(var), f2 ~ var
        dvar = (jnp.sum(gk * f1) * (0.5 / var_k)
                + jnp.sum(gk * f2) / var_k)

        dom_ref[:, :, np.int32(k)] = dom
        dph_ref[:, :, np.int32(k)] = dph
        dw_ref[:, k:k + 1] = dw
        dnu_ref[k:k + 1, :] = dnu.T
        dls_ref[k:k + 1, :] = dls[None, :]
        dvar_ref[:, k:k + 1] = dvar.reshape(1, 1)

    dx_ref[:] = dx
    dz_ref[:] = dZ


def _pallas_backward(x, omega, phase, weights, Z, nu, ls, var, g,
                     interpret=False):
    N, D = x.shape
    K = var.shape[0]
    outs = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),        # dx
        jax.ShapeDtypeStruct(omega.shape, x.dtype),    # domega
        jax.ShapeDtypeStruct(phase.shape, x.dtype),    # dphase
        jax.ShapeDtypeStruct(weights.shape, x.dtype),  # dweights
        jax.ShapeDtypeStruct(Z.shape, x.dtype),        # dZ
        jax.ShapeDtypeStruct(nu.shape, x.dtype),       # dnu
        jax.ShapeDtypeStruct(ls.shape, x.dtype),       # dls
        jax.ShapeDtypeStruct((1, K), x.dtype),         # dvar (row vector)
    )
    res = pl.pallas_call(
        _pathwise_bwd_kernel,
        out_shape=outs,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in outs),
        interpret=interpret,
    )(x, omega, phase, weights, Z, nu, ls, var, g)
    return res[:-1] + (res[-1][0],)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused_pathwise_eval_f32(x, omega, phase, weights, Z, nu, ls, var,
                             interpret=False):
    """Pallas-fused forward AND backward (f32 operands only)."""
    return _pallas_forward(x, omega, phase, weights, Z, nu, ls, var,
                           interpret=interpret)


def _fwd(x, omega, phase, weights, Z, nu, ls, var, interpret):
    out = _pallas_forward(x, omega, phase, weights, Z, nu, ls, var,
                          interpret=interpret)
    return out, (x, omega, phase, weights, Z, nu, ls, var)


def _bwd(interpret, res, g):
    # large N falls back to the reference-graph VJP (the backward kernel
    # is single-block; training N is 20-ish). Forced f32 matmuls: the
    # Pallas forward ran at Precision.HIGHEST, and a default-precision
    # (bf16-input on TPU) backward would drift ~4e-2 against it
    if res[0].shape[0] > 512:
        with jax.default_matmul_precision('highest'):
            _, vjp = jax.vjp(pathwise_eval_reference, *res)
            return vjp(g)
    return _pallas_backward(*res, g, interpret=interpret)


_fused_pathwise_eval_f32.defvjp(_fwd, _bwd)


def fused_pathwise_eval(x, omega, phase, weights, Z, nu, ls, var,
                        interpret=False):
    """Pallas-fused forward AND backward. Same signature and semantics as
    :func:`pathwise_eval_reference` (which remains the parity oracle).

    x64-proof entry: f64 operands (e.g. under ``jax_enable_x64``) are cast
    to f32 at this boundary - the kernel is an f32 program and Mosaic has
    no 64-bit lowering (see ops.f32cast) - and the result is cast back to
    ``x``'s dtype.
    """
    from vae_gp_ode_tpu.ops.f32cast import f32_args
    args, had64 = f32_args((x, omega, phase, weights, Z, nu, ls, var))
    out = _fused_pathwise_eval_f32(*args, interpret)
    return out.astype(x.dtype) if had64 else out


def rbf_fused_operands(gp, sample):
    """The fused-RBF-kernel operand block shared by the per-step eval
    (gp.svgp.fn_eval) and the whole-trajectory flow (dynamics.flow):
    (omega, phase, weights, Z, nur, lengthscales, variance). One source
    of truth for the packing - a layout change edits only this."""
    from vae_gp_ode_tpu.kernels.rbf import rbf_lengthscales, rbf_variance
    return (sample.rff.omega, sample.rff.phase, sample.rff.weights,
            gp.inducing_loc, sample.nu[..., 0],
            rbf_lengthscales(gp.kernel), rbf_variance(gp.kernel))
