"""Grid-tiled fused pathwise GP evaluation for wide shapes.

The single-block kernels in ops.pathwise hold the whole K x (S + M)
operand panel in one program; the v5e compiler (reached through the axon
remote-compile helper) dies once that panel grows past the validated
envelope (q=12 or S=1024 at the reference M=100 - measured round 4,
results/kernel_shapes_r4.jsonl; gates in ops.config). This module tiles
the SAME evaluation (reference svpy.py:123-142 / kernels.py:140-181
semantics, identical to ops.pathwise.pathwise_eval_reference) over a
(batch, output-dim, feature-chunk) grid so every grid program only ever
sees an (s_tile + M)-wide panel for ONE output dim:

    forward  grid (nb, K, ns): out block (tile_n, 1) at (b, k) is
        revisited consecutively over the innermost s axis; the feature
        chunks accumulate the RFF prior term, and the (S-independent)
        inducing update term is added once at s == 0.
    backward grid (K, ns), single batch block (training N is ~20; the
        jnp VJP owns N > 512 like ops.pathwise): per-(k, s) cotangent
        blocks (domega/dphase/dweights) are written exactly once; dx and
        the per-k scalars accumulate across their (consecutive) revisit
        windows.

The per-program panel width is s_tile + M <= 612 regardless of K and S,
which is well inside the width the single-block kernels already compile
at (2136). Hardware validation: tools/probe_kernel_shapes_r5.py /
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
    """Largest power-of-two divisor of S that is <= cap, else S itself
    (one chunk - still narrower than the single-block panel whenever
    K > 1)."""
    t = cap
    while t > 1:
        if S % t == 0:
            return t
        t //= 2
    return S


def _fwd_kernel(x_ref, om_ref, ph_ref, w_ref, z_ref, nu_ref, ls_ref,
                var_ref, out_ref, *, S_total):
    s_idx = pl.program_id(2)
    x = x_ref[:]                                  # (tile_n, D)
    var_k = var_ref[0, 0]

    # ---- prior chunk: cos(x @ om[:, chunk, k] + ph) . w[chunk, k]
    om = om_ref[:, :, 0]                          # (D, s_tile)
    xo = _mm(x, om)
    phi = jnp.cos(xo + ph_ref[:, :, 0]) * jnp.sqrt(var_k / S_total)
    f1 = _mm(phi, w_ref[:, 0:1])                  # (tile_n, 1)

    @pl.when(s_idx == 0)
    def _():
        # ---- inducing update (S-independent): added exactly once per k
        inv_ls = 1.0 / ls_ref[0, :]               # (D,)
        xs = x * inv_ls[None, :]
        zs = z_ref[:] * inv_ls[None, :]           # (M, D)
        xn = jnp.sum(xs * xs, axis=1, keepdims=True)
        zn = jnp.sum(zs * zs, axis=1, keepdims=True)
        sq = xn + zn.T - 2.0 * _mm(xs, zs.T)      # (tile_n, M)
        Kxz = var_k * jnp.exp(-0.5 * sq)
        f2 = _mm(Kxz, nu_ref[0, :][:, None])      # (tile_n, 1)
        out_ref[:] = f1 + f2

    @pl.when(s_idx != 0)
    def _():
        out_ref[:] = out_ref[:] + f1


def _pallas_forward_tiled(x, omega, phase, weights, Z, nu, ls, var,
                          interpret=False):
    N, D = x.shape
    S, K = weights.shape
    M = Z.shape[0]
    s_tile = pick_s_tile(S)
    tile_n = N if N <= 512 else 256
    grid = (pl.cdiv(N, tile_n), K, S // s_tile)
    kern = functools.partial(_fwd_kernel, S_total=S)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, K), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda b, k, s: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, s_tile, 1), lambda b, k, s: (0, s, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, 1), lambda b, k, s: (0, s, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_tile, 1), lambda b, k, s: (s, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda b, k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda b, k, s: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, k, s: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, k, s: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda b, k, s: (b, k),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, omega, phase, weights, Z, nu, ls, var.reshape(1, -1))


def _bwd_kernel(x_ref, om_ref, ph_ref, w_ref, z_ref, nu_ref, ls_ref,
                var_ref, g_ref,
                dx_ref, dom_ref, dph_ref, dw_ref, dz_ref, dnu_ref,
                dls_ref, dvar_ref, *, S_total):
    k_idx = pl.program_id(0)
    s_idx = pl.program_id(1)
    x = x_ref[:]                                  # (N, D)
    gk = g_ref[:]                                 # (N, 1)
    var_k = var_ref[0, 0]
    scale = jnp.sqrt(var_k / S_total)

    # ---- prior chunk backward (recompute trig)
    om = om_ref[:, :, 0]                          # (D, s_tile)
    u = _mm(x, om) + ph_ref[:, :, 0]              # (N, s_tile)
    cosv = jnp.cos(u)
    sinv = jnp.sin(u)
    w_k = w_ref[:, 0:1]                           # (s_tile, 1)
    f1 = _mm(cosv, w_k) * scale                   # (N, 1): chunk's share
    dw = _mm(cosv.T, gk) * scale
    du = -sinv * (gk * (scale * w_k.T))           # (N, s_tile)
    dom_ref[:, :, 0] = _mm(x.T, du)
    dph_ref[:, :, 0] = jnp.sum(du, axis=0, keepdims=True)
    dw_ref[:] = dw
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
        inv_ls = 1.0 / ls_ref[0, :]
        xs = x * inv_ls[None, :]
        zs = z_ref[:] * inv_ls[None, :]           # (M, D)
        xn = jnp.sum(xs * xs, axis=1, keepdims=True)
        zn = jnp.sum(zs * zs, axis=1, keepdims=True)
        sq = xn + zn.T - 2.0 * _mm(xs, zs.T)      # (N, M)
        Kxz = var_k * jnp.exp(-0.5 * sq)
        nu_k = nu_ref[0, :][:, None]              # (M, 1)
        f2 = _mm(Kxz, nu_k)                       # (N, 1)
        dnu_ref[:] = _mm(Kxz.T, gk).T             # (1, M)
        dKxz = gk * nu_k.T                        # (N, M)
        dsq = -0.5 * Kxz * dKxz
        rowsum = jnp.sum(dsq, axis=1, keepdims=True)
        colsum = jnp.sum(dsq, axis=0, keepdims=True)
        dxs = 2.0 * (rowsum * xs - _mm(dsq, zs))
        dzs = 2.0 * (colsum.T * zs - _mm(dsq.T, xs))
        dx_ref[:] = dx_ref[:] + dxs * inv_ls[None, :]
        dz_ref[:] = dz_ref[:] + dzs * inv_ls[None, :]
        dls_ref[:] = (-(jnp.sum(dxs * xs, axis=0)
                        + jnp.sum(dzs * zs, axis=0)) * inv_ls)[None, :]
        dvar_ref[:] = (dvar_prior
                       + jnp.sum(gk * f2) / var_k).reshape(1, 1)

    @pl.when(s_idx != 0)
    def _():
        dvar_ref[:] = dvar_ref[:] + dvar_prior.reshape(1, 1)


def _pallas_backward_tiled(x, omega, phase, weights, Z, nu, ls, var, g,
                           interpret=False):
    N, D = x.shape
    S, K = weights.shape
    M = Z.shape[0]
    s_tile = pick_s_tile(S)
    grid = (K, S // s_tile)
    kern = functools.partial(_bwd_kernel, S_total=S)
    outs = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),        # dx
        jax.ShapeDtypeStruct(omega.shape, x.dtype),    # domega
        jax.ShapeDtypeStruct(phase.shape, x.dtype),    # dphase
        jax.ShapeDtypeStruct(weights.shape, x.dtype),  # dweights
        jax.ShapeDtypeStruct(Z.shape, x.dtype),        # dZ
        jax.ShapeDtypeStruct(nu.shape, x.dtype),       # dnu
        jax.ShapeDtypeStruct(ls.shape, x.dtype),       # dls
        jax.ShapeDtypeStruct((1, K), x.dtype),         # dvar (row)
    )
    res = pl.pallas_call(
        kern,
        out_shape=outs,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, D), lambda k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, s_tile, 1), lambda k, s: (0, s, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, 1), lambda k, s: (0, s, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_tile, 1), lambda k, s: (s, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda k, s: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda k, s: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda k, s: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda k, s: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, D), lambda k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, s_tile, 1), lambda k, s: (0, s, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, 1), lambda k, s: (0, s, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_tile, 1), lambda k, s: (s, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda k, s: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda k, s: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda k, s: (0, k),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, omega, phase, weights, Z, nu, ls, var.reshape(1, -1), g)
    return res[:-1] + (res[-1][0],)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _tiled_pathwise_eval_f32(x, omega, phase, weights, Z, nu, ls, var,
                             interpret=False):
    """Grid-tiled Pallas forward AND backward (f32 operands only)."""
    return _pallas_forward_tiled(x, omega, phase, weights, Z, nu, ls, var,
                                 interpret=interpret)


def _fwd(x, omega, phase, weights, Z, nu, ls, var, interpret):
    out = _pallas_forward_tiled(x, omega, phase, weights, Z, nu, ls, var,
                                interpret=interpret)
    return out, (x, omega, phase, weights, Z, nu, ls, var)


def _bwd(interpret, res, g):
    # the tiled backward holds the full batch in one block; large N owns
    # the same jnp fallback as ops.pathwise (training N is ~20)
    if res[0].shape[0] > 512:
        with jax.default_matmul_precision('highest'):
            _, vjp = jax.vjp(pathwise_eval_reference, *res)
            return vjp(g)
    return _pallas_backward_tiled(*res, g, interpret=interpret)


_tiled_pathwise_eval_f32.defvjp(_fwd, _bwd)


def tiled_pathwise_eval(x, omega, phase, weights, Z, nu, ls, var,
                        interpret=False):
    """Grid-tiled fused pathwise eval for shapes past the single-block
    envelope. Same signature and semantics as
    :func:`ops.pathwise.pathwise_eval_reference` (the parity oracle)."""
    from vae_gp_ode_tpu.ops.f32cast import f32_args
    args, had64 = f32_args((x, omega, phase, weights, Z, nu, ls, var))
    out = _tiled_pathwise_eval_f32(*args, interpret)
    return out.astype(x.dtype) if had64 else out
