"""Grid-tiled fused pathwise evaluation for the divergence-free kernel.

Same motivation as ops.pathwise_tiled: the single-block DF kernel in
ops.df_pathwise dies in the v5e compiler past the validated width
envelope (ops.config). This module evaluates the SAME function
(ops.df_pathwise.df_pathwise_reference is the parity oracle; reference
kernels.py:319-393 semantics) tiled over an (output-dim, feature-chunk)
grid.

Why per-output-dim and not just per-feature-chunk: the first revision of
this module chunked only the ORFF feature axis and kept the full
matrix-valued update body per program. Measured round 5
(results/kernel_shapes_r5.jsonl): its FORWARD compiled and matched the
oracle on-chip at S=1024 (D=6), but the update body's D^2-unrolled
(N, M) expression tree killed the axon compile helper in the backward -
and in the forward at D=12. Splitting the update over a per-i grid axis
cuts every program to O(D) update terms (one output column), the same
program-size class as the RBF tiled kernels that compile at q=12.

    forward  grid (D, ns) [i outer, s inner]: the (N, 1) output column i
        accumulates its ORFF prior share over consecutive feature
        chunks; the update column (O(D) j-loop) is added once at s == 0.
    backward grid (ns, D) [s outer, i inner]: per-(i, s) cotangent
        blocks (dG_cos/dG_sin) are written exactly once; domf/dphf
        accumulate over the consecutive i revisits of each s block; dx,
        dZt, dnurT, dls2, dvar live in resident full blocks accumulated
        across the whole grid (constant index maps), with the
        traced-i column/row writes expressed as one-hot masks (scalar
        scatter writes do not exist in Pallas TPU).

The program id i is TRACED, so per-i operand slices enter as i-leading
rank-3 blocks - x columns (D, N, 1), Z rows (D, 1, M), ls2 columns
(D, 1, D), G columns (D, 1, S*D) - exactly the Mosaic-legal layout the
RBF tiled kernels use; the i == j kernel diagonal becomes a traced mask.
Hardware validation: tools/probe_kernel_shapes_r5.py /
results/kernel_shapes_r5.jsonl.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_gp_ode_tpu.ops.df_pathwise import df_pathwise_reference, _mm
from vae_gp_ode_tpu.ops.pathwise_tiled import pick_s_tile


def _sq_dist(x, Zt):
    """Unscaled squared distances (N, M) - the DF kernel's envelope uses
    UNSCALED distances (reference kernels.py:217-230 override)."""
    return (jnp.sum(x * x, axis=1, keepdims=True)
            + jnp.sum(Zt * Zt, axis=0, keepdims=True)
            - 2.0 * _mm(x, Zt))


def _fwd_kernel(x_ref, omf_ref, phf_ref, gcos_ref, gsin_ref, xi_ref,
                zti_ref, zt_ref, nurt_ref, ls2c_ref, var_ref, out_ref,
                *, D):
    i_idx = pl.program_id(0)
    s_idx = pl.program_id(1)
    x = x_ref[:]                                   # (N, D)

    # ---- ORFF prior, column i, feature chunk s
    xo = _mm(x, omf_ref[:]) + phf_ref[:]           # (N, t)
    f = (jnp.sum(jnp.cos(xo) * gcos_ref[0], axis=1, keepdims=True)
         + jnp.sum(jnp.sin(xo) * gsin_ref[0], axis=1, keepdims=True))

    @pl.when(s_idx == 0)
    def _():
        # ---- matrix-valued update, column i: O(D) terms
        Zt = zt_ref[:]                             # (D, M)
        sq = _sq_dist(x, Zt)                       # (N, M)
        ds_i = xi_ref[0] - zti_ref[0]              # (N, M)
        ls2_col = ls2c_ref[0, 0, :]                # (D,): ls2[j, i] over j
        var_i = var_ref[0, 0, 0]
        acc = jnp.zeros_like(f)
        for j in range(D):
            inv = 1.0 / ls2_col[j]
            dsj = x[:, j:j + 1] - Zt[j:j + 1, :]   # (N, M)
            E = jnp.exp(sq * (-0.5 * inv))
            diag = (i_idx == j).astype(x.dtype)
            base = (dsj * ds_i * inv
                    + diag * ((D - 1.0) - sq * inv))
            contrib = E * base * (var_i * inv)
            acc = acc + jnp.sum(contrib * nurt_ref[j:j + 1, :],
                                axis=1, keepdims=True)
        out_ref[0] = f + acc

    @pl.when(s_idx != 0)
    def _():
        out_ref[0] = out_ref[0] + f


def _relayout(x, G, Z, nur, ls2, var, SD):
    """Per-i operand slices as i-leading rank-3 Mosaic-legal blocks."""
    Zt = Z.T                                       # (D, M)
    return (G[:SD].T[:, None, :],                  # GcosT (D, 1, SD)
            G[SD:].T[:, None, :],                  # GsinT (D, 1, SD)
            x.T[:, :, None],                       # xT3   (D, N, 1)
            Zt, Zt[:, None, :],                    # Zt, Zt3 (D, 1, M)
            nur.T,                                 # nurT  (D, M)
            ls2.T[:, None, :],                     # ls2C  (D, 1, D)
            var.reshape(-1, 1, 1))                 # varR  (D, 1, 1)


def _pallas_forward_tiled(x, omf, phf, G, Z, nur, ls2, var,
                          interpret=False, sd_tile=None):
    N, D = x.shape
    SD = omf.shape[1]
    M = Z.shape[0]
    t = sd_tile or pick_s_tile(SD)
    assert SD % t == 0, (SD, t)
    grid = (D, SD // t)
    GcosT, GsinT, xT3, Zt, Zt3, nurT, ls2C, varR = _relayout(
        x, G, Z, nur, ls2, var, SD)
    kern = functools.partial(_fwd_kernel, D=D)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((D, N, 1), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, D), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, t), lambda i, s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i, s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, s: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, s: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, 1), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, omf, phf, GcosT, GsinT, xT3, Zt3, Zt, nurT, ls2C, varR)
    return out[:, :, 0].T                          # (N, D)


def _bwd_kernel(x_ref, omf_ref, phf_ref, gcos_ref, gsin_ref, xi_ref,
                zti_ref, zt_ref, nurt_ref, ls2c_ref, var_ref, gout_ref,
                dx_ref, domf_ref, dphf_ref, dgcos_ref, dgsin_ref,
                dzt_ref, dnurt_ref, dls2_ref, dvar_ref, *, D):
    s_idx = pl.program_id(0)
    i_idx = pl.program_id(1)
    f32 = x_ref.dtype
    x = x_ref[:]                                   # (N, D)
    gi = gout_ref[0]                               # (N, 1)

    # ---- prior chunk backward, column i (recompute trig)
    omf = omf_ref[:]                               # (D, t)
    xo = _mm(x, omf) + phf_ref[:]
    cosv = jnp.cos(xo)
    sinv = jnp.sin(xo)
    dgcos_ref[0] = jnp.sum(cosv * gi, axis=0, keepdims=True)
    dgsin_ref[0] = jnp.sum(sinv * gi, axis=0, keepdims=True)
    dxo = (-sinv * (gi * gcos_ref[0])
           + cosv * (gi * gsin_ref[0]))            # (N, t)
    domf_i = _mm(x.T, dxo)                         # (D, t)
    dphf_i = jnp.sum(dxo, axis=0, keepdims=True)
    dx_prior = _mm(dxo, omf.T)                     # (N, D)

    @pl.when(i_idx == 0)
    def _():
        domf_ref[:] = domf_i
        dphf_ref[:] = dphf_i

    @pl.when(i_idx != 0)
    def _():
        domf_ref[:] = domf_ref[:] + domf_i
        dphf_ref[:] = dphf_ref[:] + dphf_i

    @pl.when((s_idx == 0) & (i_idx == 0))
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dzt_ref[:] = jnp.zeros_like(dzt_ref)
        dnurt_ref[:] = jnp.zeros_like(dnurt_ref)
        dls2_ref[:] = jnp.zeros_like(dls2_ref)
        dvar_ref[:] = jnp.zeros_like(dvar_ref)

    dx_ref[:] = dx_ref[:] + dx_prior

    @pl.when(s_idx == 0)
    def _():
        # ---- update-column VJP (one output column i, static j loop)
        Zt = zt_ref[:]                             # (D, M)
        sq = _sq_dist(x, Zt)                       # (N, M)
        ds_i = xi_ref[0] - zti_ref[0]              # (N, M)
        ls2_col = ls2c_ref[0, 0, :]                # (D,)
        var_i = var_ref[0, 0, 0]

        sqbar = jnp.zeros_like(sq)
        dsbar_i = jnp.zeros_like(sq)
        dvar_i = jnp.zeros((), f32)
        dls2_acc = jnp.zeros((D, D), f32)
        dx_cols, dzt_rows, dnur_rows = [], [], []
        rows = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
        for j in range(D):
            inv = 1.0 / ls2_col[j]
            dsj = x[:, j:j + 1] - Zt[j:j + 1, :]   # (N, M)
            E = jnp.exp(sq * (-0.5 * inv))
            diag = (i_idx == j).astype(f32)
            dji = dsj * ds_i
            base = dji * inv + diag * ((D - 1.0) - sq * inv)
            c1 = var_i * inv
            contrib = E * base * c1
            dcontrib = gi * nurt_ref[j:j + 1, :]   # (N, M)
            dnur_rows.append(jnp.sum(contrib * gi, axis=0,
                                     keepdims=True))
            Ebar = dcontrib * base * c1
            basebar = dcontrib * E * c1
            c1bar = jnp.sum(dcontrib * E * base)
            sqbar = sqbar + Ebar * E * (-0.5 * inv)
            invbar = jnp.sum(Ebar * E * sq) * (-0.5)
            dsbar_j = basebar * ds_i * inv
            dsbar_i = dsbar_i + basebar * dsj * inv
            invbar = invbar + jnp.sum(basebar * dji)
            sqbar = sqbar + basebar * (-inv) * diag
            invbar = invbar + jnp.sum(-basebar * sq) * diag
            dvar_i = dvar_i + c1bar * inv
            invbar = invbar + c1bar * var_i
            # dls2[j, i] via one-hot (j static, i traced)
            oh = ((rows == j) & (cols == i_idx)).astype(f32)
            dls2_acc = dls2_acc + (-invbar * inv * inv) * oh
            dx_cols.append(jnp.sum(dsbar_j, axis=1, keepdims=True))
            dzt_rows.append(-jnp.sum(dsbar_j, axis=0, keepdims=True))

        oh_i = (jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
                == i_idx).astype(f32)              # (1, D)
        oh_i_col = (jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
                    == i_idx).astype(f32)          # (D, 1)
        dx_upd = (jnp.concatenate(dx_cols, axis=1)
                  + jnp.sum(dsbar_i, axis=1, keepdims=True) * oh_i
                  + 2.0 * (jnp.sum(sqbar, axis=1, keepdims=True) * x
                           - _mm(sqbar, Zt.T)))
        dzt_upd = (jnp.concatenate(dzt_rows, axis=0)
                   - oh_i_col * jnp.sum(dsbar_i, axis=0, keepdims=True)
                   + 2.0 * (jnp.sum(sqbar, axis=0, keepdims=True) * Zt
                            - _mm(x.T, sqbar)))
        dx_ref[:] = dx_ref[:] + dx_upd
        dzt_ref[:] = dzt_ref[:] + dzt_upd
        dnurt_ref[:] = dnurt_ref[:] + jnp.concatenate(dnur_rows, axis=0)
        dls2_ref[:] = dls2_ref[:] + dls2_acc
        dvar_ref[:] = dvar_ref[:] + dvar_i * oh_i


def _pallas_backward_tiled(x, omf, phf, G, Z, nur, ls2, var, gout,
                           interpret=False, sd_tile=None):
    N, D = x.shape
    SD = omf.shape[1]
    M = Z.shape[0]
    f32 = x.dtype
    t = sd_tile or pick_s_tile(SD)
    assert SD % t == 0, (SD, t)
    grid = (SD // t, D)                            # s outer, i inner
    GcosT, GsinT, xT3, Zt, Zt3, nurT, ls2C, varR = _relayout(
        x, G, Z, nur, ls2, var, SD)
    goutT = gout.T[:, :, None]                     # (D, N, 1)
    kern = functools.partial(_bwd_kernel, D=D)
    outs = (
        jax.ShapeDtypeStruct((N, D), f32),         # dx
        jax.ShapeDtypeStruct((D, SD), f32),        # domf
        jax.ShapeDtypeStruct((1, SD), f32),        # dphf
        jax.ShapeDtypeStruct((D, 1, SD), f32),     # dGcosT
        jax.ShapeDtypeStruct((D, 1, SD), f32),     # dGsinT
        jax.ShapeDtypeStruct((D, M), f32),         # dZt
        jax.ShapeDtypeStruct((D, M), f32),         # dnurT
        jax.ShapeDtypeStruct((D, D), f32),         # dls2
        jax.ShapeDtypeStruct((1, D), f32),         # dvar
    )
    full2 = lambda s, i: (0, 0)       # noqa: E731
    res = pl.pallas_call(
        kern,
        out_shape=outs,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, D), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, t), lambda s, i: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda s, i: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda s, i: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda s, i: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda s, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda s, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda s, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda s, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda s, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, D), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, t), lambda s, i: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda s, i: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda s, i: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda s, i: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, M), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), full2, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, omf, phf, GcosT, GsinT, xT3, Zt3, Zt, nurT, ls2C, varR, goutT)
    (dx, domf, dphf, dGcT, dGsT, dZt, dnurT, dls2, dvar) = res
    dG = jnp.concatenate([dGcT[:, 0, :].T, dGsT[:, 0, :].T], axis=0)
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
