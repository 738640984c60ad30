"""Grid-tiled fused pathwise GP evaluation for wide shapes.

The single-block kernels in ops.pathwise hold the whole K x (S + M)
operand panel in one program; the v5e compiler (reached through the axon
remote-compile helper) dies once that panel grows past the validated
envelope (q=12 or S=1024 at the reference M=100 - measured round 4,
results/kernel_shapes_r4.jsonl; gates in ops.config). This module tiles
the SAME evaluation (reference svpy.py:123-142 / kernels.py:140-181
semantics, identical to ops.pathwise.pathwise_eval_reference) over a
(batch, output-dim, feature-chunk) grid so every grid program only ever
sees an (s_tile + M)-wide panel for ONE output dim.

Mosaic layout constraint (measured round 5 on hardware - the first
revision of this module lowered in interpret mode but died on the real
chip): a block's last two dims must each be divisible by (8, 128) or
equal the corresponding array dim. Per-k operand slices therefore enter
with k as a LEADING axis of rank-3 arrays - (K, D, S), (K, 1, S),
(K, 1, M), (K, 1, D), (K, 1, 1) - so every block's trailing dims are
either the full array dims or a 128-multiple feature chunk; the wrapper
owns the (trivially differentiable) relayout transposes. Feature chunks
are 128-multiples (pick_s_tile), or a single full-S chunk when S has no
128-multiple divisor.

    forward  grid (nb, K, ns): out block (1, tile_n, 1) of the (K, N, 1)
        output at (k, b) is revisited consecutively over the innermost s
        axis; the feature chunks accumulate the RFF prior term, and the
        (S-independent) inducing update term is added once at s == 0.
    backward grid (K, ns), single batch block (training N is ~20; the
        jnp VJP owns N > 512 like ops.pathwise): per-(k, s) cotangent
        blocks (domega/dphase/dweights) are written exactly once; dx and
        the per-k scalars accumulate across their (consecutive) revisit
        windows.

The per-program panel width is s_tile + M <= 612 regardless of K and S,
well inside the width the single-block kernels already compile at
(2136). Hardware validation: tools/probe_kernel_shapes_r5.py /
results/kernel_shapes_r5.jsonl.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_gp_ode_tpu.ops.pathwise import pathwise_eval_reference

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def pick_s_tile(S, cap=512):
    """Largest 128-multiple divisor of S that is <= cap, else S itself
    (one chunk - still narrower than the single-block panel whenever
    K > 1). 128-multiples keep the chunked lane dimension legal for
    Mosaic (blocks must be 128-divisible or full in the last dim)."""
    t = min(cap, S) // 128 * 128
    while t > 0:
        if S % t == 0:
            return t
        t -= 128
    return S


def _fwd_kernel(x_ref, om_ref, ph_ref, w_ref, z_ref, nu_ref, ls_ref,
                var_ref, out_ref, *, S_total):
    s_idx = pl.program_id(2)
    x = x_ref[:]                                  # (tile_n, D)
    var_k = var_ref[0, 0, 0]

    # ---- prior chunk: cos(x @ om[k, :, chunk] + ph) . w[k, chunk]
    om = om_ref[0]                                # (D, s_tile)
    xo = _mm(x, om)
    phi = jnp.cos(xo + ph_ref[0]) * jnp.sqrt(var_k / S_total)
    f1 = jnp.sum(phi * w_ref[0], axis=1, keepdims=True)  # (tile_n, 1)

    @pl.when(s_idx == 0)
    def _():
        # ---- inducing update (S-independent): added exactly once per k
        inv_ls = 1.0 / ls_ref[0, 0, :]            # (D,)
        xs = x * inv_ls[None, :]
        zs = z_ref[:] * inv_ls[None, :]           # (M, D)
        xn = jnp.sum(xs * xs, axis=1, keepdims=True)
        zn = jnp.sum(zs * zs, axis=1, keepdims=True)
        sq = xn + zn.T - 2.0 * _mm(xs, zs.T)      # (tile_n, M)
        Kxz = var_k * jnp.exp(-0.5 * sq)
        f2 = jnp.sum(Kxz * nu_ref[0], axis=1, keepdims=True)
        out_ref[0] = f1 + f2

    @pl.when(s_idx != 0)
    def _():
        out_ref[0] = out_ref[0] + f1


def _relayout(omega, phase, weights, nu, ls, var):
    """Original kernel layouts -> k-leading rank-3 Mosaic-legal blocks."""
    return (jnp.transpose(omega, (2, 0, 1)),      # (K, D, S)
            jnp.transpose(phase, (2, 0, 1)),      # (K, 1, S)
            weights.T[:, None, :],                # (K, 1, S)
            nu[:, None, :],                       # (K, 1, M)
            ls[:, None, :],                       # (K, 1, D)
            var[:, None, None])                   # (K, 1, 1)


def _pallas_forward_tiled(x, omega, phase, weights, Z, nu, ls, var,
                          interpret=False, s_tile=None):
    N, D = x.shape
    S, K = weights.shape
    M = Z.shape[0]
    s_tile = s_tile or pick_s_tile(S)
    assert S % s_tile == 0, (S, s_tile)
    tile_n = N if N <= 512 else 256
    grid = (pl.cdiv(N, tile_n), K, S // s_tile)
    omT, phT, wT, nuR, lsR, varR = _relayout(omega, phase, weights,
                                             nu, ls, var)
    kern = functools.partial(_fwd_kernel, S_total=S)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, N, 1), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda b, k, s: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, s_tile), lambda b, k, s: (k, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_tile), lambda b, k, s: (k, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_tile), lambda b, k, s: (k, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda b, k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda b, k, s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, k, s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, k, s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, 1), lambda b, k, s: (k, b, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, omT, phT, wT, Z, nuR, lsR, varR)
    return out[:, :, 0].T                          # (N, K)


def _bwd_kernel(x_ref, om_ref, ph_ref, w_ref, z_ref, nu_ref, ls_ref,
                var_ref, g_ref,
                dx_ref, dom_ref, dph_ref, dw_ref, dz_ref, dnu_ref,
                dls_ref, dvar_ref, *, S_total):
    k_idx = pl.program_id(0)
    s_idx = pl.program_id(1)
    x = x_ref[:]                                  # (N, D)
    gk = g_ref[0]                                 # (N, 1)
    var_k = var_ref[0, 0, 0]
    scale = jnp.sqrt(var_k / S_total)

    # ---- prior chunk backward (recompute trig)
    om = om_ref[0]                                # (D, s_tile)
    u = _mm(x, om) + ph_ref[0]                    # (N, s_tile)
    cosv = jnp.cos(u)
    sinv = jnp.sin(u)
    w_row = w_ref[0]                              # (1, s_tile)
    f1 = jnp.sum(cosv * w_row, axis=1, keepdims=True) * scale  # (N, 1)
    dw_ref[0] = jnp.sum(cosv * gk, axis=0, keepdims=True) * scale
    du = -sinv * (gk * (scale * w_row))           # (N, s_tile)
    dom_ref[0] = _mm(x.T, du)                     # (D, s_tile)
    dph_ref[0] = jnp.sum(du, axis=0, keepdims=True)
    dx_prior = _mm(du, om.T)                      # (N, D)
    dvar_prior = jnp.sum(gk * f1) * (0.5 / var_k)

    @pl.when((k_idx == 0) & (s_idx == 0))
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dz_ref[:] = jnp.zeros_like(dz_ref)

    dx_ref[:] = dx_ref[:] + dx_prior

    @pl.when(s_idx == 0)
    def _():
        # ---- update-term backward, once per k
        inv_ls = 1.0 / ls_ref[0, 0, :]
        xs = x * inv_ls[None, :]
        zs = z_ref[:] * inv_ls[None, :]           # (M, D)
        xn = jnp.sum(xs * xs, axis=1, keepdims=True)
        zn = jnp.sum(zs * zs, axis=1, keepdims=True)
        sq = xn + zn.T - 2.0 * _mm(xs, zs.T)      # (N, M)
        Kxz = var_k * jnp.exp(-0.5 * sq)
        nu_row = nu_ref[0]                        # (1, M)
        f2 = jnp.sum(Kxz * nu_row, axis=1, keepdims=True)    # (N, 1)
        dnu_ref[0] = jnp.sum(Kxz * gk, axis=0, keepdims=True)
        dKxz = gk * nu_row                        # (N, M)
        dsq = -0.5 * Kxz * dKxz
        rowsum = jnp.sum(dsq, axis=1, keepdims=True)
        colsum = jnp.sum(dsq, axis=0, keepdims=True)
        dxs = 2.0 * (rowsum * xs - _mm(dsq, zs))
        dzs = 2.0 * (colsum.T * zs - _mm(dsq.T, xs))
        dx_ref[:] = dx_ref[:] + dxs * inv_ls[None, :]
        dz_ref[:] = dz_ref[:] + dzs * inv_ls[None, :]
        dls_ref[0] = (-(jnp.sum(dxs * xs, axis=0)
                        + jnp.sum(dzs * zs, axis=0)) * inv_ls)[None, :]
        dvar_ref[0] = (dvar_prior
                       + jnp.sum(gk * f2) / var_k).reshape(1, 1)

    @pl.when(s_idx != 0)
    def _():
        dvar_ref[0] = dvar_ref[0] + dvar_prior.reshape(1, 1)


def _pallas_backward_tiled(x, omega, phase, weights, Z, nu, ls, var, g,
                           interpret=False, s_tile=None):
    N, D = x.shape
    S, K = weights.shape
    M = Z.shape[0]
    s_tile = s_tile or pick_s_tile(S)
    assert S % s_tile == 0, (S, s_tile)
    grid = (K, S // s_tile)
    omT, phT, wT, nuR, lsR, varR = _relayout(omega, phase, weights,
                                             nu, ls, var)
    gT = g.T[:, :, None]                           # (K, N, 1)
    kern = functools.partial(_bwd_kernel, S_total=S)
    outs = (
        jax.ShapeDtypeStruct((N, D), x.dtype),       # dx
        jax.ShapeDtypeStruct((K, D, S), x.dtype),    # domega (k-leading)
        jax.ShapeDtypeStruct((K, 1, S), x.dtype),    # dphase (k-leading)
        jax.ShapeDtypeStruct((K, 1, S), x.dtype),    # dweights (k-leading)
        jax.ShapeDtypeStruct((M, D), x.dtype),       # dZ
        jax.ShapeDtypeStruct((K, 1, M), x.dtype),    # dnu
        jax.ShapeDtypeStruct((K, 1, D), x.dtype),    # dls
        jax.ShapeDtypeStruct((K, 1, 1), x.dtype),    # dvar
    )
    res = pl.pallas_call(
        kern,
        out_shape=outs,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, D), lambda k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, s_tile), lambda k, s: (k, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_tile), lambda k, s: (k, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_tile), lambda k, s: (k, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda k, s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda k, s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda k, s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda k, s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, D), lambda k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, s_tile), lambda k, s: (k, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_tile), lambda k, s: (k, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_tile), lambda k, s: (k, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda k, s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda k, s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda k, s: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, omT, phT, wT, Z, nuR, lsR, varR, gT)
    dx, domT, dphT, dwT, dZ, dnuR, dlsR, dvarR = res
    return (dx,
            jnp.transpose(domT, (1, 2, 0)),        # (D, S, K)
            jnp.transpose(dphT, (1, 2, 0)),        # (1, S, K)
            dwT[:, 0, :].T,                        # (S, K)
            dZ,
            dnuR[:, 0, :],                         # (K, M)
            dlsR[:, 0, :],                         # (K, D)
            dvarR[:, 0, 0])                        # (K,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _tiled_pathwise_eval_f32(x, omega, phase, weights, Z, nu, ls, var,
                             interpret=False, s_tile=None):
    """Grid-tiled Pallas forward AND backward (f32 operands only)."""
    return _pallas_forward_tiled(x, omega, phase, weights, Z, nu, ls, var,
                                 interpret=interpret, s_tile=s_tile)


def _fwd(x, omega, phase, weights, Z, nu, ls, var, interpret, s_tile):
    out = _pallas_forward_tiled(x, omega, phase, weights, Z, nu, ls, var,
                                interpret=interpret, s_tile=s_tile)
    return out, (x, omega, phase, weights, Z, nu, ls, var)


def _bwd(interpret, s_tile, res, g):
    # the tiled backward holds the full batch in one block; large N owns
    # the same jnp fallback as ops.pathwise (training N is ~20)
    if res[0].shape[0] > 512:
        with jax.default_matmul_precision('highest'):
            _, vjp = jax.vjp(pathwise_eval_reference, *res)
            return vjp(g)
    return _pallas_backward_tiled(*res, g, interpret=interpret,
                                  s_tile=s_tile)


_tiled_pathwise_eval_f32.defvjp(_fwd, _bwd)


def tiled_pathwise_eval(x, omega, phase, weights, Z, nu, ls, var,
                        interpret=False, s_tile=None):
    """Grid-tiled fused pathwise eval for shapes past the single-block
    envelope. Same signature and semantics as
    :func:`ops.pathwise.pathwise_eval_reference` (the parity oracle).
    `s_tile` overrides the feature-chunk size (tests exercise multi-chunk
    accumulation with small chunks; hardware uses the legal default)."""
    from vae_gp_ode_tpu.ops.f32cast import f32_args
    args, had64 = f32_args((x, omega, phase, weights, Z, nu, ls, var))
    out = _tiled_pathwise_eval_f32(*args, interpret, s_tile)
    return out.astype(x.dtype) if had64 else out
