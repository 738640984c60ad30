"""Grid-tiled fused pathwise evaluation for the divergence-free kernel.

Same motivation as ops.pathwise_tiled: the single-block DF kernel in
ops.df_pathwise holds the whole (N, 2*S*D) trig panel in one program and
the v5e compiler dies past the validated width envelope (ops.config).
This module evaluates the SAME function (ops.df_pathwise.
df_pathwise_reference is the parity oracle; reference kernels.py:319-393
semantics) with the ORFF feature axis (S*D) chunked over a grid:

    forward  grid (ns,): the (N, D) output block is revisited
        consecutively; each program adds one feature chunk's
        cos/sin-contraction, and the (S-independent) matrix-valued
        inducing update (_df_update_body, shared with ops.df_pathwise)
        is added once at s == 0.
    backward grid (ns,): per-chunk cotangents (domf/dphf/dGcos/dGsin)
        are written exactly once; dx accumulates; the update-term
        cotangents (dZt/dnurT/dls2/dvar - via the shared
        _df_update_vjp_body) are written once at s == 0.

G enters SPLIT as (G_cos, G_sin) = (G[:SD], G[SD:]) so each chunk's rows
are one contiguous block per operand; the wrapper owns the (trivially
differentiable) split/concat. Per-program panel width is ~2*sd_tile + M
regardless of S and D. Hardware validation:
tools/probe_kernel_shapes_r5.py / results/kernel_shapes_r5.jsonl.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_gp_ode_tpu.ops.df_pathwise import (
    df_pathwise_reference, _df_update_body, _df_update_vjp_body, _mm,
)
from vae_gp_ode_tpu.ops.pathwise_tiled import pick_s_tile


def _fwd_kernel(x_ref, omf_ref, phf_ref, gcos_ref, gsin_ref, zt_ref,
                nurt_ref, ls2_ref, var_ref, out_ref):
    s_idx = pl.program_id(0)
    x = x_ref[:]                                   # (N, D)
    xo = _mm(x, omf_ref[:]) + phf_ref[:]           # (N, sd_tile)
    f = _mm(jnp.cos(xo), gcos_ref[:]) + _mm(jnp.sin(xo), gsin_ref[:])

    @pl.when(s_idx == 0)
    def _():
        out_ref[:] = f + _df_update_body(
            x, zt_ref[:], nurt_ref[:], ls2_ref[:], var_ref[:])

    @pl.when(s_idx != 0)
    def _():
        out_ref[:] = out_ref[:] + f


def _pallas_forward_tiled(x, omf, phf, G, Z, nur, ls2, var,
                          interpret=False, sd_tile=None):
    N, D = x.shape
    SD = omf.shape[1]
    M = Z.shape[0]
    t = sd_tile or pick_s_tile(SD)
    assert SD % t == 0, (SD, t)
    grid = (SD // t,)
    full = lambda s: (0, 0)  # noqa: E731
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, t), lambda s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, D), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, D), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, D), full, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, omf, phf, G[:SD], G[SD:], Z.T, nur.T, ls2, var.reshape(1, -1))


def _bwd_kernel(x_ref, omf_ref, phf_ref, gcos_ref, gsin_ref, zt_ref,
                nurt_ref, ls2_ref, var_ref, gout_ref,
                dx_ref, domf_ref, dphf_ref, dgcos_ref, dgsin_ref,
                dzt_ref, dnurt_ref, dls2_ref, dvar_ref):
    s_idx = pl.program_id(0)
    x = x_ref[:]                                   # (N, D)
    gout = gout_ref[:]                             # (N, D)

    # ---- prior chunk backward (recompute trig)
    omf = omf_ref[:]                               # (D, sd_tile)
    xo = _mm(x, omf) + phf_ref[:]
    cosv = jnp.cos(xo)
    sinv = jnp.sin(xo)
    dgcos_ref[:] = _mm(cosv.T, gout)
    dgsin_ref[:] = _mm(sinv.T, gout)
    dxo = (-sinv * _mm(gout, gcos_ref[:].T)
           + cosv * _mm(gout, gsin_ref[:].T))      # (N, sd_tile)
    dphf_ref[:] = jnp.sum(dxo, axis=0, keepdims=True)
    domf_ref[:] = _mm(x.T, dxo)
    dx_prior = _mm(dxo, omf.T)                     # (N, D)

    @pl.when(s_idx == 0)
    def _():
        (dx_u, dZt, dnurT, dls2, dvar) = _df_update_vjp_body(
            x, zt_ref[:], nurt_ref[:], ls2_ref[:], var_ref[:], gout)
        dx_ref[:] = dx_prior + dx_u
        dzt_ref[:] = dZt
        dnurt_ref[:] = dnurT
        dls2_ref[:] = dls2
        dvar_ref[:] = dvar

    @pl.when(s_idx != 0)
    def _():
        dx_ref[:] = dx_ref[:] + dx_prior


def _pallas_backward_tiled(x, omf, phf, G, Z, nur, ls2, var, gout,
                           interpret=False, sd_tile=None):
    N, D = x.shape
    SD = omf.shape[1]
    M = Z.shape[0]
    f32 = x.dtype
    t = sd_tile or pick_s_tile(SD)
    assert SD % t == 0, (SD, t)
    grid = (SD // t,)
    full = lambda s: (0, 0)  # noqa: E731
    outs = (
        jax.ShapeDtypeStruct(x.shape, f32),        # dx
        jax.ShapeDtypeStruct(omf.shape, f32),      # domf
        jax.ShapeDtypeStruct(phf.shape, f32),      # dphf
        jax.ShapeDtypeStruct((SD, D), f32),        # dG_cos
        jax.ShapeDtypeStruct((SD, D), f32),        # dG_sin
        jax.ShapeDtypeStruct((D, M), f32),         # dZt
        jax.ShapeDtypeStruct((D, M), f32),         # dnurT
        jax.ShapeDtypeStruct(ls2.shape, f32),      # dls2
        jax.ShapeDtypeStruct((1, D), f32),         # dvar
    )
    res = pl.pallas_call(
        _bwd_kernel,
        out_shape=outs,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, t), lambda s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, D), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, D), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, t), lambda s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, D), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, D), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), full, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, omf, phf, G[:SD], G[SD:], Z.T, nur.T, ls2, var.reshape(1, -1),
      gout)
    (dx, domf, dphf, dGc, dGs, dZt, dnurT, dls2, dvar) = res
    dG = jnp.concatenate([dGc, dGs], axis=0)
    return dx, domf, dphf, dG, dZt.T, dnurT.T, dls2, dvar[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _tiled_df_pathwise_eval_f32(x, omf, phf, G, Z, nur, ls2, var,
                                interpret=False, sd_tile=None):
    """Grid-tiled Pallas forward AND backward for the DF pathwise eval
    (f32 operands only). Large batches (N > 512) fall back to the jnp
    reference in BOTH directions, like ops.df_pathwise."""
    if x.shape[0] > 512:
        with jax.default_matmul_precision('highest'):
            return df_pathwise_reference(x, omf, phf, G, Z, nur, ls2, var)
    return _pallas_forward_tiled(x, omf, phf, G, Z, nur, ls2, var,
                                 interpret=interpret, sd_tile=sd_tile)


def _fwd(x, omf, phf, G, Z, nur, ls2, var, interpret, sd_tile):
    if x.shape[0] > 512:
        with jax.default_matmul_precision('highest'):
            out = df_pathwise_reference(x, omf, phf, G, Z, nur, ls2, var)
    else:
        out = _pallas_forward_tiled(x, omf, phf, G, Z, nur, ls2, var,
                                    interpret=interpret, sd_tile=sd_tile)
    return out, (x, omf, phf, G, Z, nur, ls2, var)


def _bwd(interpret, sd_tile, res, g):
    if res[0].shape[0] > 512:
        with jax.default_matmul_precision('highest'):
            _, vjp = jax.vjp(df_pathwise_reference, *res)
            return vjp(g)
    return _pallas_backward_tiled(*res, g, interpret=interpret,
                                  sd_tile=sd_tile)


_tiled_df_pathwise_eval_f32.defvjp(_fwd, _bwd)


def tiled_df_pathwise_eval(x, omf, phf, G, Z, nur, ls2, var,
                           interpret=False, sd_tile=None):
    """Grid-tiled fused DF pathwise eval for shapes past the single-block
    envelope. Same semantics as :func:`df_pathwise_reference` (the parity
    oracle). `sd_tile` overrides the ORFF-axis chunk size (tests exercise
    multi-chunk accumulation; hardware uses the legal default)."""
    from vae_gp_ode_tpu.ops.f32cast import f32_args
    args, had64 = f32_args((x, omf, phf, G, Z, nur, ls2, var))
    out = _tiled_df_pathwise_eval_f32(*args, interpret, sd_tile)
    return out.astype(x.dtype) if had64 else out
