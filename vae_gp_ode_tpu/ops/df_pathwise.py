"""Fused pathwise evaluation for the divergence-free kernel.

The DF per-ODE-step eval (SURVEY.md section 3.1 hot loop with
`--kernel DF`, the paper's headline "informative prior") is

    f(x) = ORFF_prior(x) + K(x, Z) nu          (reference svpy.py:123-142,
                                                kernels.py:319-393)

where K(x, Z) is the matrix-valued gram: for every output-dim pair (j, i)
a separate RBF envelope exp(-r^2 / (2 ls2[j,i])) modulates a Hessian
structure term (reference kernels.py:265-303). The jnp path materialises
(N, M, D, D) tensors through ~25 XLA ops per solver step; this kernel
keeps everything in VMEM and walks the D*D pairs as a static loop of
(N, M) vector ops - with the prior's trig features + the per-draw ORFF
contraction G (kernels/divfree.py df_orff_contraction) as three MXU
matmuls.

Index convention (matches kernels/divfree.py df_gram(Z, x) exactly):

    f_up[n, i] = sum_j (var[i] / ls2[j, i]) * sum_m E_ji[n, m] *
                 ( d_j[n,m] d_i[n,m] / ls2[j,i]
                   + ((D-1) - sq[n,m] / ls2[j,i]) * delta_ji ) * nur[m, j]

    E_ji[n, m] = exp(-sq[n, m] / (2 ls2[j, i]))
    d_k[n, m]  = x[n, k] - Z[m, k],  sq = |x_n - Z_m|^2

Z and nu enter the kernel TRANSPOSED ((D, M) row-sliced layouts) so every
in-kernel broadcast is a clean (1, M)-row slice; the wrapper owns the
(cheap, trivially-differentiable) transposes. Reverse mode is a
hand-written Pallas VJP (same recompute-in-VMEM strategy as
ops/pathwise.py); `df_pathwise_reference` is the parity oracle against
kernels.divfree.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def df_pathwise_reference(x, omf, phf, G, Z, nur, ls2, var):
    """jnp reference with the kernel's operand layout.

    x (N, D); omf (D, S*D) = omega.reshape; phf (1, S*D) = phase.reshape;
    G (2*S*D, D) from df_orff_contraction; Z (M, D); nur (M, D) = nu
    reshaped m-major; ls2 (D, D) = lengthscales**2; var (D,).
    Returns f (N, D). Semantics identical to
    divfree.df_rff_eval(..., G=G) + divfree.df_f_update(...).
    """
    D = x.shape[1]

    xo = x @ omf                                        # (N, S*D)
    trig = jnp.concatenate(
        [jnp.cos(xo + phf), jnp.sin(xo + phf)], axis=1)  # (N, 2*S*D)
    f_prior = trig @ G                                   # (N, D)

    sq = (jnp.sum(x * x, axis=1)[:, None]
          + jnp.sum(Z * Z, axis=1)[None, :]
          - 2.0 * x @ Z.T)                               # (N, M)
    d = x.T[:, :, None] - Z.T[:, None, :]                # (D, N, M)
    inv = 1.0 / ls2                                      # (D, D)
    E = jnp.exp(-0.5 * sq[None, None] * inv[:, :, None, None])  # (D,D,N,M)
    base = (d[:, None] * d[None, :]                      # d_j d_i
            * inv[:, :, None, None]
            + ((D - 1.0) - sq[None, None] * inv[:, :, None, None])
            * jnp.eye(D, dtype=x.dtype)[:, :, None, None])
    coef = (var[None, :] * inv)[:, :, None, None]        # var_i / ls2_ji
    f_up = jnp.einsum('jinm,mj->ni', E * base * coef, nur)
    return f_prior + f_up


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_HI)


def _df_update_body(x, Zt, nurT, ls2, var_row):
    """In-kernel matrix-valued pathwise update on VALUES (the
    S-independent half of the DF eval; shared by the single-block
    kernels here, the trajectory kernel in ops.df_flow_fused, and the
    feature-chunked kernel in ops.df_pathwise_tiled).

    x (N, D); Zt (D, M); nurT (D, M); ls2 (D, D) VALUES (indexed [j, i]
    scalars); var_row (1, D). Returns f_up (N, D)."""
    D = x.shape[1]
    sq = (jnp.sum(x * x, axis=1, keepdims=True)
          + jnp.sum(Zt * Zt, axis=0, keepdims=True)
          - 2.0 * _mm(x, Zt))                            # (N, M)
    ds = [x[:, k:k + 1] - Zt[k:k + 1, :] for k in range(D)]
    cols = []
    for i in range(D):
        var_i = var_row[0, i]
        acc = None
        for j in range(D):
            inv = 1.0 / ls2[j, i]
            E = jnp.exp(sq * (-0.5 * inv))               # (N, M)
            base = ds[j] * ds[i] * inv
            if i == j:
                base = base + ((D - 1.0) - sq * inv)
            contrib = E * base * (var_i * inv)           # (N, M)
            term = jnp.sum(contrib * nurT[j:j + 1, :],
                           axis=1, keepdims=True)        # (N, 1)
            acc = term if acc is None else acc + term
        cols.append(acc)
    return jnp.concatenate(cols, axis=1)


def _df_eval_body(x, omf, phf, G, Zt, nurT, ls2, var_row, SD):
    """In-kernel DF pathwise eval on VALUES (shared by the per-step kernel
    and the whole-trajectory kernel in ops.df_flow_fused).

    x (N, D); omf (D, SD); phf (1, SD); G (2SD, D); Zt (D, M);
    nurT (D, M); ls2 (D, D) VALUES (indexed [j, i] scalars); var_row
    (1, D). Returns f (N, D)."""
    # ---- ORFF prior: trig features + contraction matmuls
    xo = _mm(x, omf) + phf                               # (N, SD)
    f = _mm(jnp.cos(xo), G[:SD]) + _mm(jnp.sin(xo), G[SD:])
    return f + _df_update_body(x, Zt, nurT, ls2, var_row)


def _make_fwd_kernel(D, SD):
    def kernel(x_ref, omf_ref, phf_ref, g_ref, zt_ref, nurt_ref, ls2_ref,
               var_ref, out_ref):
        out_ref[:] = _df_eval_body(
            x_ref[:], omf_ref[:], phf_ref[:], g_ref[:], zt_ref[:],
            nurt_ref[:], ls2_ref[:], var_ref[:], SD)

    return kernel


def _pallas_forward(x, omf, phf, G, Z, nur, ls2, var, interpret=False):
    N, D = x.shape
    SD = omf.shape[1]
    return pl.pallas_call(
        _make_fwd_kernel(D, SD),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, omf, phf, G, Z.T, nur.T, ls2, var.reshape(1, -1))


def _one_hot2(shape, j, i, dtype):
    """`shape`-shaped one-hot at [j, i], built from iota (scalar scatter
    writes do not exist in Pallas TPU)."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((r == j) & (c == i)).astype(dtype)


def _df_eval_vjp_body(x, omf, phf, G, Zt, nurT, ls2, var_row, gout, SD,
                      want_f=False):
    """In-kernel VJP of _df_eval_body on VALUES (shared by the per-step
    backward kernel and the trajectory discrete adjoint).

    Recomputes the forward intermediates; returns
    (dx, domf, dphf, dG_cos, dG_sin, dZt, dnurT, dls2, dvar_row) with
    dls2 (D, D) / dvar_row (1, D) assembled via one-hot masks (scalar
    scatter writes do not exist in Pallas TPU). With `want_f=True` the
    recomputed f(x) (N, D) is appended to the return tuple (the
    trajectory adjoint needs it for the dt cotangent; almost free since
    every piece is already recomputed here)."""
    # ---- prior backward (recompute trig)
    xo = _mm(x, omf) + phf                               # (N, SD)
    cosv = jnp.cos(xo)
    sinv = jnp.sin(xo)
    f_val = (_mm(cosv, G[:SD]) + _mm(sinv, G[SD:])) if want_f else None
    dG_cos = _mm(cosv.T, gout)                           # (SD, D)
    dG_sin = _mm(sinv.T, gout)                           # (SD, D)
    dxo = (-sinv * _mm(gout, G[:SD].T)
           + cosv * _mm(gout, G[SD:].T))                 # (N, SD)
    dphf = jnp.sum(dxo, axis=0, keepdims=True)
    domf = _mm(x.T, dxo)
    dx = _mm(dxo, omf.T)                                 # (N, D)

    upd = _df_update_vjp_body(x, Zt, nurT, ls2, var_row, gout,
                              want_f=want_f)
    (dx_u, dZt, dnurT, dls2, dvar) = upd[:5]
    outs = (dx + dx_u, domf, dphf, dG_cos, dG_sin, dZt, dnurT, dls2, dvar)
    if want_f:
        return outs + (f_val + upd[5],)
    return outs


def _df_update_vjp_body(x, Zt, nurT, ls2, var_row, gout, want_f=False):
    """In-kernel VJP of :func:`_df_update_body` on VALUES (the
    S-independent half of the DF eval backward; recomputes the per-pair
    intermediates). Returns (dx, dZt, dnurT, dls2, dvar_row), with the
    recomputed f_up (N, D) appended when `want_f`."""
    D = x.shape[1]
    f32 = x.dtype

    sq = (jnp.sum(x * x, axis=1, keepdims=True)
          + jnp.sum(Zt * Zt, axis=0, keepdims=True)
          - 2.0 * _mm(x, Zt))                            # (N, M)
    ds = [x[:, k:k + 1] - Zt[k:k + 1, :] for k in range(D)]

    sqbar = jnp.zeros_like(sq)
    dsbar = [jnp.zeros_like(sq) for _ in range(D)]
    dnur_rows = [jnp.zeros_like(sq[:1, :]) for _ in range(D)]
    dls2 = jnp.zeros((D, D), f32)
    dvar = jnp.zeros((1, D), f32)
    f_up_cols = []
    for i in range(D):
        gi = gout[:, i:i + 1]                            # (N, 1)
        var_i = var_row[0, i]
        dvar_i = jnp.zeros((), f32)
        f_up_i = None
        for j in range(D):
            inv = 1.0 / ls2[j, i]
            E = jnp.exp(sq * (-0.5 * inv))               # (N, M)
            dji = ds[j] * ds[i]
            base = dji * inv
            if i == j:
                base = base + ((D - 1.0) - sq * inv)
            c1 = var_i * inv
            contrib = E * base * c1                      # (N, M)
            if want_f:
                term = jnp.sum(contrib * nurT[j:j + 1, :],
                               axis=1, keepdims=True)    # (N, 1)
                f_up_i = term if f_up_i is None else f_up_i + term
            # out_i = sum_m contrib * nur[m, j]
            dcontrib = gi * nurT[j:j + 1, :]             # (N, M)
            dnur_rows[j] = dnur_rows[j] + jnp.sum(
                contrib * gi, axis=0, keepdims=True)     # (1, M)
            Ebar = dcontrib * base * c1
            basebar = dcontrib * E * c1
            c1bar = jnp.sum(dcontrib * E * base)
            # E = exp(-0.5 inv sq)
            sqbar = sqbar + Ebar * E * (-0.5 * inv)
            invbar = jnp.sum(Ebar * E * sq) * (-0.5)
            # base = d_j d_i inv (+ delta_ji ((D-1) - sq inv))
            dsbar[j] = dsbar[j] + basebar * ds[i] * inv
            dsbar[i] = dsbar[i] + basebar * ds[j] * inv
            invbar += jnp.sum(basebar * dji)
            if i == j:
                sqbar = sqbar - basebar * inv
                invbar += jnp.sum(-basebar * sq)
            # c1 = var_i * inv
            dvar_i += c1bar * inv
            invbar += c1bar * var_i
            # inv = 1 / ls2[j, i]
            dls2 = dls2 + (-invbar * inv * inv) * _one_hot2((D, D), j, i, f32)
        dvar = dvar + dvar_i * _one_hot2((1, D), 0, i, f32)
        if want_f:
            f_up_cols.append(f_up_i)

    # ds_k[n, m] = x[n, k] - Zt[k, m]
    dx_ds = jnp.concatenate(
        [jnp.sum(dsbar[k], axis=1, keepdims=True) for k in range(D)],
        axis=1)                                          # (N, D)
    dzt_ds = jnp.concatenate(
        [-jnp.sum(dsbar[k], axis=0, keepdims=True) for k in range(D)],
        axis=0)                                          # (D, M)
    # sq = |x|^2 + |Zt cols|^2 - 2 x Zt
    dx_full = (dx_ds
               + 2.0 * (jnp.sum(sqbar, axis=1, keepdims=True) * x
                        - _mm(sqbar, Zt.T)))
    dZt = (dzt_ds
           + 2.0 * (jnp.sum(sqbar, axis=0, keepdims=True) * Zt
                    - _mm(x.T, sqbar)))
    dnurT = jnp.concatenate(dnur_rows, axis=0)           # (D, M)
    outs = (dx_full, dZt, dnurT, dls2, dvar)
    if want_f:
        return outs + (jnp.concatenate(f_up_cols, axis=1),)
    return outs


def _make_bwd_kernel(D, SD):
    def kernel(x_ref, omf_ref, phf_ref, g_ref, zt_ref, nurt_ref, ls2_ref,
               var_ref, gout_ref,
               dx_ref, domf_ref, dphf_ref, dg_ref, dzt_ref, dnurt_ref,
               dls2_ref, dvar_ref):
        (dx, domf, dphf, dG_cos, dG_sin, dZt, dnurT, dls2,
         dvar) = _df_eval_vjp_body(
            x_ref[:], omf_ref[:], phf_ref[:], g_ref[:], zt_ref[:],
            nurt_ref[:], ls2_ref[:], var_ref[:], gout_ref[:], SD)
        dx_ref[:] = dx
        domf_ref[:] = domf
        dphf_ref[:] = dphf
        dg_ref[pl.ds(0, SD)] = dG_cos
        dg_ref[pl.ds(SD, SD)] = dG_sin
        dzt_ref[:] = dZt
        dnurt_ref[:] = dnurT
        dls2_ref[:] = dls2
        dvar_ref[:] = dvar

    return kernel


def _pallas_backward(x, omf, phf, G, Z, nur, ls2, var, gout,
                     interpret=False):
    N, D = x.shape
    SD = omf.shape[1]
    M = Z.shape[0]
    f32 = x.dtype
    outs = (
        jax.ShapeDtypeStruct(x.shape, f32),      # dx
        jax.ShapeDtypeStruct(omf.shape, f32),    # domf
        jax.ShapeDtypeStruct(phf.shape, f32),    # dphf
        jax.ShapeDtypeStruct(G.shape, f32),      # dG
        jax.ShapeDtypeStruct((D, M), f32),       # dZt
        jax.ShapeDtypeStruct((D, M), f32),       # dnurT
        jax.ShapeDtypeStruct(ls2.shape, f32),    # dls2
        jax.ShapeDtypeStruct((1, D), f32),       # dvar
    )
    res = pl.pallas_call(
        _make_bwd_kernel(D, SD),
        out_shape=outs,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in outs),
        interpret=interpret,
    )(x, omf, phf, G, Z.T, nur.T, ls2, var.reshape(1, -1), gout)
    (dx, domf, dphf, dG, dZt, dnurT, dls2, dvar) = res
    return dx, domf, dphf, dG, dZt.T, dnurT.T, dls2, dvar[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused_df_pathwise_eval_f32(x, omf, phf, G, Z, nur, ls2, var,
                                interpret=False):
    """Pallas-fused forward AND backward for the DF pathwise eval
    (f32 operands only; see :func:`fused_df_pathwise_eval`).

    Large batches (N > 512) fall back to the jnp reference in BOTH
    directions: the single-block kernel materialises the (N, 2*S*D)
    feature matrix in VMEM, which overflows past ~512 rows at the
    production S (the RBF kernel tiles its grid instead; the train/solve
    paths here are N<=batch so the single block is the fast case)."""
    if x.shape[0] > 512:
        # match the Pallas kernel's forced-f32 matmuls (default TPU
        # precision is bf16-input, ~4e-2 drift)
        with jax.default_matmul_precision('highest'):
            return df_pathwise_reference(x, omf, phf, G, Z, nur, ls2, var)
    return _pallas_forward(x, omf, phf, G, Z, nur, ls2, var,
                           interpret=interpret)


def _fwd(x, omf, phf, G, Z, nur, ls2, var, interpret):
    if x.shape[0] > 512:
        with jax.default_matmul_precision('highest'):
            out = df_pathwise_reference(x, omf, phf, G, Z, nur, ls2, var)
    else:
        out = _pallas_forward(x, omf, phf, G, Z, nur, ls2, var,
                              interpret=interpret)
    return out, (x, omf, phf, G, Z, nur, ls2, var)


def _bwd(interpret, res, g):
    if res[0].shape[0] > 512:
        with jax.default_matmul_precision('highest'):
            _, vjp = jax.vjp(df_pathwise_reference, *res)
            return vjp(g)
    return _pallas_backward(*res, g, interpret=interpret)


_fused_df_pathwise_eval_f32.defvjp(_fwd, _bwd)


def fused_df_pathwise_eval(x, omf, phf, G, Z, nur, ls2, var,
                           interpret=False):
    """Pallas-fused forward AND backward for the DF pathwise eval. Same
    semantics as :func:`df_pathwise_reference` (the parity oracle).

    x64-proof entry: f64 operands are cast to f32 at this boundary
    (Mosaic has no 64-bit lowering; see ops.f32cast) and the result is
    cast back to ``x``'s dtype."""
    from vae_gp_ode_tpu.ops.f32cast import f32_args
    args, had64 = f32_args((x, omf, phf, G, Z, nur, ls2, var))
    out = _fused_df_pathwise_eval_f32(*args, interpret)
    return out.astype(x.dtype) if had64 else out


def df_fused_operands(gp, sample, D):
    """The fused-DF-kernel operand block shared by the per-step eval
    (gp.svgp.fn_eval) and the whole-trajectory flow (dynamics.flow):
    (omf, phf, G, Z, nur, ls^2, variance) with the (S, D) ORFF axes
    flattened to the kernels' packed (D, S*D)/(1, S*D) layout."""
    from vae_gp_ode_tpu.kernels.rbf import rbf_lengthscales, rbf_variance
    S = sample.rff.omega.shape[1]
    ls = rbf_lengthscales(gp.kernel)
    return (sample.rff.omega.reshape(D, S * D),
            sample.rff.phase.reshape(1, S * D), sample.df_G,
            gp.inducing_loc, sample.nu.reshape(-1, D), ls * ls,
            rbf_variance(gp.kernel))
