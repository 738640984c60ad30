"""Fully-fused DF-kernel euler trajectory (VERDICT r2 #3).

The paper's headline configuration (`--kernel DF`, the divergence-free
"informative prior", reference kernels.py:201-393) previously dispatched
one fused Pallas eval per euler step (ops.df_pathwise), paying a kernel
launch + operand reload every step. This module runs the ENTIRE
trajectory inside one Pallas program, exactly like ops.flow_fused does
for the dimwise-RBF kernel: GP operands load into VMEM once, the state z
never leaves VMEM, every output row is written as it is produced.

The per-step math is shared with ops.df_pathwise (`_df_eval_body` /
`_df_eval_vjp_body` - one source of truth for the DF pathwise-eval
semantics and its hand-written VJP); this module owns only the euler
walk and the discrete-adjoint accumulation:

  forward:   z_{t+1} = z_t + dts[t] * f(z_t),  zs[0] = z0
  backward:  g_t = zsbar[t] + g_{t+1} + (d f/d z_t)^T (dts[t] g_{t+1})
             param_bar += (d f/d param)^T (dts[t] g_{t+1})
             dtsbar[t] = <g_{t+1}, f(z_t)>

DF kernels are order-1 only (D_in == D_out by construction - see
gp/svgp.init_svgp_params), so unlike flow_fused there is no order-2
branch. Batches above `_SINGLE_BLOCK_N` rows grid-tile over independent
trajectories with zero-padded ragged tails and per-tile parameter
cotangent slabs summed by the wrapper (same scheme as flow_fused; keeps
the kernel valid under the outer L-vmap). `df_euler_flow_reference` is
the jnp parity oracle.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_gp_ode_tpu.ops.df_pathwise import (
    df_pathwise_reference, _df_eval_body, _df_eval_vjp_body,
)

# HALF of ops.flow_fused's measured-safe thresholds: the DF live
# per-step intermediate set is the (N, 2*S*D) cos+sin ORFF block - twice
# the RBF kernel's width - so the same VMEM budget halves the rows.
# Measured INSIDE the full train step on a v5e (value_and_grad + remat +
# L-vmap; tools/probe_fused_batch.py): single-block/tile 256/128 fails
# to compile at N>=256, 128/64 compiles and runs at N up to 1280.
_SINGLE_BLOCK_N = 128
_TILE_N = 64


def df_euler_flow_reference(z0, omf, phf, G, Z, nur, ls2, var, dts, T):
    """lax.scan euler trajectory through the DF pathwise sample.

    Returns zs (T, N, D) with zs[0] = z0 (parity oracle for the kernel).
    """
    dts_v = jnp.broadcast_to(jnp.asarray(dts, z0.dtype), (T - 1,))

    def step(z, h):
        z1 = z + h * df_pathwise_reference(z, omf, phf, G, Z, nur, ls2,
                                           var)
        return z1, z1

    _, zs = jax.lax.scan(step, z0, dts_v)
    return jnp.concatenate([z0[None], zs], axis=0)


# zero-pad helper shared with the RBF trajectory kernel (padding rows
# integrate to finite trajectories and carry zero cotangents)
from vae_gp_ode_tpu.ops.flow_fused import _pad_rows  # noqa: E402


def _make_fwd_kernel(T, D, SD):
    def kernel(z0_ref, omf_ref, phf_ref, g_ref, zt_ref, nurt_ref,
               ls2_ref, var_ref, dts_ref, out_ref):
        omf = omf_ref[:]
        phf = phf_ref[:]
        G = g_ref[:]
        Zt = zt_ref[:]
        nurT = nurt_ref[:]
        ls2 = ls2_ref[:]
        var_row = var_ref[:]

        z = z0_ref[:]
        out_ref[jnp.int32(0)] = z

        def step(t, z):
            f = _df_eval_body(z, omf, phf, G, Zt, nurT, ls2, var_row, SD)
            z1 = z + dts_ref[t] * f
            out_ref[pl.ds(t + 1, 1)] = z1[None]
            return z1

        # i32 bounds: under jax_enable_x64 Python-int bounds make the
        # induction var i64, which Mosaic's convert rule cannot lower
        # (it self-recurses to RecursionError - measured round 4)
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(T - 1), step, z)

    return kernel


def _make_bwd_kernel(T, D, SD, slab=False):
    """Discrete adjoint of the DF euler flow (one Pallas program).

    Walks t = T-2 .. 0 recomputing each step's forward intermediates
    from the saved state (via _df_eval_vjp_body). Parameter cotangents
    ride the fori_loop carry; `slab=True` is the grid-tiled variant
    (leading length-1 slab axis per batch tile, summed by the wrapper -
    disjoint writes keep the kernel valid under the outer L-vmap)."""

    def kernel(zs_ref, zsbar_ref, omf_ref, phf_ref, g_ref, zt_ref,
               nurt_ref, ls2_ref, var_ref, dts_ref,
               z0bar_ref, omfbar_ref, phfbar_ref, gcbar_ref, gsbar_ref,
               ztbar_ref, nurtbar_ref, ls2bar_ref, varbar_ref,
               dtsbar_ref):
        omf = omf_ref[:]
        phf = phf_ref[:]
        G = g_ref[:]
        Zt = zt_ref[:]
        nurT = nurt_ref[:]
        ls2 = ls2_ref[:]
        var_row = var_ref[:]
        f32 = omf.dtype
        M = Zt.shape[1]

        def body(i, carry):
            (g, omfbar, phfbar, gcbar, gsbar, ztbar, nurtbar, ls2bar,
             varbar) = carry
            t = T - 2 - i
            dt = dts_ref[t]
            z = zs_ref[pl.ds(t, 1)][0]              # (N, D)
            fbar = dt * g                           # (N, D)
            (dx, domf, dphf, dGc, dGs, dZt, dnurT, dls2, dvar,
             f) = _df_eval_vjp_body(z, omf, phf, G, Zt, nurT, ls2,
                                    var_row, fbar, SD, want_f=True)
            dtv = jnp.sum(g * f).reshape(1, 1)
            # dtsbar goes straight to the output ref (each (program, t)
            # slot is written exactly once; a carried accumulator would
            # need dynamic_update_slice, which Pallas TPU cannot lower)
            if slab:
                dtsbar_ref[:, pl.ds(t, 1)] = dtv.reshape(1, 1, 1)
            else:
                dtsbar_ref[pl.ds(t, 1)] = dtv

            g_new = zsbar_ref[pl.ds(t, 1)][0] + g + dx
            return (g_new, omfbar + domf, phfbar + dphf, gcbar + dGc,
                    gsbar + dGs, ztbar + dZt, nurtbar + dnurT,
                    ls2bar + dls2, varbar + dvar)

        init = (zsbar_ref[pl.ds(T - 1, 1)][0],
                jnp.zeros((D, SD), f32), jnp.zeros((1, SD), f32),
                jnp.zeros((SD, D), f32), jnp.zeros((SD, D), f32),
                jnp.zeros((D, M), f32), jnp.zeros((D, M), f32),
                jnp.zeros((D, D), f32), jnp.zeros((1, D), f32))
        (g0, omfbar, phfbar, gcbar, gsbar, ztbar, nurtbar, ls2bar,
         # i32 bounds: under jax_enable_x64 Python-int bounds make the
         # induction var i64, which Mosaic's convert rule cannot lower
         # (it self-recurses to RecursionError - measured round 4)
         varbar) = jax.lax.fori_loop(jnp.int32(0), jnp.int32(T - 1), body, init)
        z0bar_ref[:] = g0
        if slab:
            omfbar_ref[:] = omfbar[None]
            phfbar_ref[:] = phfbar[None]
            gcbar_ref[:] = gcbar[None]
            gsbar_ref[:] = gsbar[None]
            ztbar_ref[:] = ztbar[None]
            nurtbar_ref[:] = nurtbar[None]
            ls2bar_ref[:] = ls2bar[None]
            varbar_ref[:] = varbar[None]
        else:
            omfbar_ref[:] = omfbar
            phfbar_ref[:] = phfbar
            gcbar_ref[:] = gcbar
            gsbar_ref[:] = gsbar
            ztbar_ref[:] = ztbar
            nurtbar_ref[:] = nurtbar
            ls2bar_ref[:] = ls2bar
            varbar_ref[:] = varbar

    return kernel


def _pallas_df_flow(z0, omf, phf, G, Zt, nurT, ls2, var_row, dts, T,
                    interpret=False):
    # NOTE: the grid-tiling scheme here (single-block vs tiled dispatch,
    # row padding, rep/tile index maps, per-tile cotangent slabs summed
    # after the call) deliberately MIRRORS ops.flow_fused._pallas_flow_*.
    # Keep the two in sync when changing the scheme; only the operand
    # lists and the (intentionally different, in-step-measured) thresholds
    # differ. Not factored into one helper: the scheme is compile-budget
    # sensitive on the v5e and each change must be re-probed on hardware
    # (tools/probe_fused_batch.py).
    N, D = z0.shape
    SD = omf.shape[1]
    if N <= _SINGLE_BLOCK_N:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8 + [
            pl.BlockSpec(memory_space=pltpu.SMEM)]
        return pl.pallas_call(
            _make_fwd_kernel(T, D, SD),
            out_shape=jax.ShapeDtypeStruct((T, N, D), z0.dtype),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(z0, omf, phf, G, Zt, nurT, ls2, var_row, dts)
    tile = _TILE_N
    n_tiles = pl.cdiv(N, tile)
    Np = n_tiles * tile
    z0p = _pad_rows(z0, Np)
    rep2 = lambda i: (0, 0)           # noqa: E731 (operand replicated)
    in_specs = [
        pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(omf.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(phf.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(G.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(Zt.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(nurT.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(ls2.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(var_row.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(dts.shape, lambda i: (0,), memory_space=pltpu.SMEM),
    ]
    zs = pl.pallas_call(
        _make_fwd_kernel(T, D, SD),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((T, Np, D), z0.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, tile, D), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(z0p, omf, phf, G, Zt, nurT, ls2, var_row, dts)
    return zs[:, :N]


def _pallas_df_flow_bwd(zs, zsbar, omf, phf, G, Zt, nurT, ls2, var_row,
                        dts, T, interpret=False):
    N, D = zs.shape[1:]
    SD = omf.shape[1]
    M = Zt.shape[1]
    f32 = zs.dtype
    if N <= _SINGLE_BLOCK_N:
        out_shapes = (
            jax.ShapeDtypeStruct((N, D), f32),       # z0bar
            jax.ShapeDtypeStruct((D, SD), f32),      # omfbar
            jax.ShapeDtypeStruct((1, SD), f32),      # phfbar
            jax.ShapeDtypeStruct((SD, D), f32),      # G cos-half bar
            jax.ShapeDtypeStruct((SD, D), f32),      # G sin-half bar
            jax.ShapeDtypeStruct((D, M), f32),       # Ztbar
            jax.ShapeDtypeStruct((D, M), f32),       # nurTbar
            jax.ShapeDtypeStruct((D, D), f32),       # ls2bar
            jax.ShapeDtypeStruct((1, D), f32),       # varbar
            jax.ShapeDtypeStruct((T - 1, 1), f32),   # dtsbar
        )
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9 + [
            pl.BlockSpec(memory_space=pltpu.SMEM)]
        return pl.pallas_call(
            _make_bwd_kernel(T, D, SD),
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in out_shapes),
            interpret=interpret,
        )(zs, zsbar, omf, phf, G, Zt, nurT, ls2, var_row, dts)

    tile = _TILE_N
    n_tiles = pl.cdiv(N, tile)
    Np = n_tiles * tile
    zsp = jnp.transpose(_pad_rows(jnp.transpose(zs, (1, 0, 2)), Np),
                        (1, 0, 2))
    zsbarp = jnp.transpose(_pad_rows(jnp.transpose(zsbar, (1, 0, 2)), Np),
                           (1, 0, 2))
    out_shapes = (
        jax.ShapeDtypeStruct((Np, D), f32),               # z0bar
        jax.ShapeDtypeStruct((n_tiles, D, SD), f32),      # omfbar slabs
        jax.ShapeDtypeStruct((n_tiles, 1, SD), f32),      # phfbar
        jax.ShapeDtypeStruct((n_tiles, SD, D), f32),      # G cos-half
        jax.ShapeDtypeStruct((n_tiles, SD, D), f32),      # G sin-half
        jax.ShapeDtypeStruct((n_tiles, D, M), f32),       # Ztbar
        jax.ShapeDtypeStruct((n_tiles, D, M), f32),       # nurTbar
        jax.ShapeDtypeStruct((n_tiles, D, D), f32),       # ls2bar
        jax.ShapeDtypeStruct((n_tiles, 1, D), f32),       # varbar
        jax.ShapeDtypeStruct((n_tiles, T - 1, 1), f32),   # dtsbar
    )
    rep2 = lambda i: (0, 0)           # noqa: E731
    tile3 = lambda i: (i, 0, 0)       # noqa: E731
    in_specs = [
        pl.BlockSpec((T, tile, D), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, tile, D), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(omf.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(phf.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(G.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(Zt.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(nurT.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(ls2.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(var_row.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(dts.shape, lambda i: (0,), memory_space=pltpu.SMEM),
    ]
    out_specs = (
        pl.BlockSpec((tile, D), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D, SD), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, SD), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, SD, D), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, SD, D), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D, M), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D, M), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D, D), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T - 1, 1), tile3, memory_space=pltpu.VMEM),
    )
    outs = pl.pallas_call(
        _make_bwd_kernel(T, D, SD, slab=True),
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(zsp, zsbarp, omf, phf, G, Zt, nurT, ls2, var_row, dts)
    z0bar = outs[0][:N]
    return (z0bar,) + tuple(jnp.sum(o, axis=0) for o in outs[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _packed_df_euler_flow_f32(z0, omf, phf, G, Z, nur, ls2, var, dts, T,
                              interpret=False):
    """Euler DF-GP-ODE flow: Pallas forward AND Pallas discrete-adjoint
    backward (both single kernels; grid-tiled above _SINGLE_BLOCK_N=128
    rows - half the RBF kernel's boundary, see the threshold comment at
    the top of this module). Operand layout matches
    ops.df_pathwise.fused_df_pathwise_eval; returns zs (T, N, D) with
    zs[0] = z0."""
    return _pallas_df_flow(z0, omf, phf, G, Z.T, nur.T, ls2,
                           var.reshape(1, -1), dts, T,
                           interpret=interpret)


def _pk_fwd(z0, omf, phf, G, Z, nur, ls2, var, dts, T, interpret):
    zs = _pallas_df_flow(z0, omf, phf, G, Z.T, nur.T, ls2,
                         var.reshape(1, -1), dts, T, interpret=interpret)
    return zs, (zs, omf, phf, G, Z, nur, ls2, var, dts)


def _pk_bwd(T, interpret, res, zsbar):
    zs, omf, phf, G, Z, nur, ls2, var, dts = res
    (z0bar, omfbar, phfbar, gcbar, gsbar, ztbar, nurtbar, ls2bar, varbar,
     dtsbar) = _pallas_df_flow_bwd(
        zs, zsbar, omf, phf, G, Z.T, nur.T, ls2, var.reshape(1, -1),
        dts, T, interpret=interpret)
    Gbar = jnp.concatenate([gcbar, gsbar], axis=0)       # (2SD, D)
    return (z0bar, omfbar, phfbar, Gbar, ztbar.T, nurtbar.T, ls2bar,
            varbar[0], dtsbar[:, 0])


_packed_df_euler_flow_f32.defvjp(_pk_fwd, _pk_bwd)


def packed_df_euler_flow(z0, omf, phf, G, Z, nur, ls2, var, dts, T,
                         interpret=False):
    """Euler DF-GP-ODE flow (see :func:`_packed_df_euler_flow_f32` for
    the kernel semantics).

    x64-proof entry: f64 operands are cast to f32 at this boundary
    (Mosaic has no 64-bit lowering; see ops.f32cast) and the trajectory is
    cast back to ``z0``'s dtype."""
    from vae_gp_ode_tpu.ops.f32cast import f32_args
    args, had64 = f32_args((z0, omf, phf, G, Z, nur, ls2, var, dts))
    out = _packed_df_euler_flow_f32(*args, T, interpret)
    return out.astype(z0.dtype) if had64 else out
