"""Fully-fused GP-ODE euler trajectory kernel.

The default training configuration integrates T=16 points with euler
(15 steps), each step evaluating the pathwise GP sample on a (20, 6) state.
Dispatching 15 separate fused-eval kernels (or ~150 XLA ops) leaves the
chip idle between launches at these sizes. This kernel runs the ENTIRE
trajectory inside one Pallas program: the GP operands load into VMEM once,
the state z never leaves vector registers/VMEM, and each output row is
written as it is produced.

MXU mapping: the per-output-dim structure (K dimwise lengthscales) is
flattened k-major so each euler step is five dense matmuls -

    xo     = z @ omf              (N, K*S)   feature projection
    f1     = (cos(xo+phf)*ws) @ B_S  (N, K)  block-sum over S features
    cross  = z @ Zb               (N, K*M)   per-dim-scaled inducing dots
    xn     = (z*z) @ il2          (N, K*M)   squared-norm broadcast
    f2     = (exp(-0.5 sq)*nus) @ B_M (N, K) block-sum over M inducing

where B_S (K*S, K) / B_M (K*M, K) are 0/1 block-indicator matrices built
IN-KERNEL from iota (so the host-side operand packing is pure
transpose/reshape/scale - no scatters, and its XLA VJP is equally cheap;
the scatter-built block-diagonal weight matrices of the first version
dominated the vmapped train step through their gather VJPs).

Supports 1st-order (dz = f(z)) and 2nd-order (d(s,v) = (v, f(s,v)))
latent ODEs with the dimwise-RBF kernel, and per-interval step sizes
(dts (T-1,)) for non-uniform grids. The L Monte-Carlo axis vmaps into the
kernel grid (each grid program owns one function draw's trajectory).
Reverse mode = a hand-written Pallas discrete-adjoint backward kernel
(see _make_bwd_kernel); the jnp packed_flow_reference is the parity
oracle.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vae_gp_ode_tpu.ops.pathwise import pathwise_eval_reference

_HI = jax.lax.Precision.HIGHEST


def euler_flow_reference(z0, omega, phase, weights, Z, nu, ls, var, dt,
                         T, order=1):
    """lax.scan euler trajectory through the dimwise-RBF pathwise sample.

    Returns zs (T, N, D) with zs[0] = z0.
    """
    q = var.shape[0]

    def rhs(z):
        f = pathwise_eval_reference(z, omega, phase, weights, Z, nu, ls,
                                    var)
        if order == 2:
            return jnp.concatenate([z[:, q:], f], axis=1)
        return f

    dts = jnp.broadcast_to(jnp.asarray(dt, z0.dtype), (T - 1,))

    def step(z, h):
        z1 = z + h * rhs(z)
        return z1, z1

    _, zs = jax.lax.scan(step, z0, dts)
    return jnp.concatenate([z0[None], zs], axis=0)


def _pack_operands(omega, phase, weights, Z, nu, ls, var):
    """Flatten the per-output-dim operands k-major (traced XLA ops run
    once per trajectory draw). Pure transpose/reshape/scale/repeat - no
    scatters - so reverse mode through the packing is a handful of cheap
    XLA ops."""
    D, S, K = omega.shape
    M = Z.shape[0]

    # feature projection, k-major flattening: column k*S+s <- omega[:, s, k]
    omf = jnp.transpose(omega, (0, 2, 1)).reshape(D, K * S)
    phf = jnp.transpose(phase[0], (1, 0)).reshape(1, K * S)
    # scaled feature weights (row vector, k-major): sqrt(var_k/S) folded in
    ws = (weights * jnp.sqrt(var / S)).T.reshape(1, K * S)

    # inducing dots: column k*M+m <- Z[m, :] / ls[k, :]^2
    inv_ls2 = 1.0 / (ls * ls)                                   # (K, D)
    Zb = (Z[None, :, :] * inv_ls2[:, None, :])                  # (K, M, D)
    Zb = jnp.transpose(Zb.reshape(K * M, D), (1, 0))            # (D, K*M)
    zn = jnp.sum((Z[None, :, :] / ls[:, None, :]) ** 2,
                 axis=2).reshape(1, K * M)                      # (1, K*M)
    # broadcast matrix for xn: (z*z) @ il2 -> (N, K*M)
    il2 = jnp.repeat(inv_ls2, M, axis=0).T                      # (D, K*M)
    # scaled nu (row vector, k-major) with var_k folded in
    nus = (nu * var[:, None]).reshape(1, K * M)

    return omf, phf, ws, Zb, zn, il2, nus


def _block_sum_mask(blocks, size, dtype):
    """(blocks*size, blocks) 0/1 indicator: column b sums block b."""
    r = jax.lax.broadcasted_iota(jnp.int32, (blocks * size, blocks), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (blocks * size, blocks), 1)
    return (r // jnp.int32(size) == c).astype(dtype)


def _expand_mask(blocks, size, dtype):
    """(blocks, blocks*size) 0/1 indicator: row b broadcasts into block b
    (the transpose of _block_sum_mask, built directly to avoid an
    in-kernel transpose)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (blocks, blocks * size), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (blocks, blocks * size), 1)
    return (c // jnp.int32(size) == r).astype(dtype)


def _make_kernel(T, order, K, S, M):
    def kernel(z0_ref, omf_ref, phf_ref, ws_ref, zb_ref, zn_ref,
               il2_ref, nus_ref, dts_ref, out_ref):
        omf = omf_ref[:]
        phf = phf_ref[:]
        ws = ws_ref[:]
        Zb = zb_ref[:]
        zn = zn_ref[:]
        il2 = il2_ref[:]
        nus = nus_ref[:]
        f32 = omf.dtype
        Bs = _block_sum_mask(K, S, f32)       # (K*S, K)
        Bm = _block_sum_mask(K, M, f32)       # (K*M, K)

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=_HI)

        def feval(z):
            xo = mm(z, omf)                              # (N, K*S)
            phi = jnp.cos(xo + phf) * ws
            f1 = mm(phi, Bs)                             # (N, K)
            cross = mm(z, Zb)                            # (N, K*M)
            xn = mm(z * z, il2)                          # (N, K*M)
            G = jnp.exp(-0.5 * (xn + zn - 2.0 * cross)) * nus
            f2 = mm(G, Bm)                               # (N, K)
            return f1 + f2

        def rhs(z):
            f = feval(z)
            if order == 2:
                return jnp.concatenate([z[:, K:], f], axis=1)
            return f

        z = z0_ref[:]
        out_ref[jnp.int32(0)] = z

        def step(t, z):
            z1 = z + dts_ref[t] * rhs(z)
            out_ref[pl.ds(t + 1, 1)] = z1[None]
            return z1

        # i32 bounds: under jax_enable_x64 Python-int bounds make the
        # induction var i64, which Mosaic's convert rule cannot lower
        # (it self-recurses to RecursionError - measured round 4)
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(T - 1), step, z)

    return kernel


# Above this batch size the single-block program's (N, K*S) step
# intermediates overflow VMEM; the grid-tiled variant below keeps every
# per-program intermediate at (TILE, K*S). Thresholds measured on a real
# v5e INSIDE the full train step (value_and_grad + remat + L-vmap - the
# standalone kernel tolerates more, which round 3 learned the hard way
# when N=320 passed kernel-only probing but failed the train step):
# single-block compiles+runs in-step at N=256 and fails at N=320, so the
# boundary is 256. TILE=128 is the largest measured-safe tile: at 256
# the BACKWARD kernel (~12 live (TILE, K*S) intermediates + the
# cotangent carry) crashes the v5e compiler, while 128 compiles and runs
# in-step at N up to 5120 (tools/probe_fused_batch.py).
_SINGLE_BLOCK_N = 256
_TILE_N = 128


def _pad_rows(x, rows):
    """Zero-pad the leading axis to `rows`. Zero rows integrate to finite
    trajectories (forward) and carry zero cotangents (backward), so
    padding never contaminates real outputs/gradients."""
    if x.shape[0] == rows:
        return x
    pad = jnp.zeros((rows - x.shape[0],) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _pallas_flow_packed(z0, omf, phf, ws, Zb, zn, il2, nus, dts, T, order,
                        interpret=False):
    N, D = z0.shape
    K = D // 2 if order == 2 else D
    S = ws.shape[1] // K
    M = nus.shape[1] // K
    if N <= _SINGLE_BLOCK_N:
        # single-block fast path (a grid adds overhead at training N)
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8 + [
            pl.BlockSpec(memory_space=pltpu.SMEM)]
        return pl.pallas_call(
            _make_kernel(T, order, K, S, M),
            out_shape=jax.ShapeDtypeStruct((T, N, D), z0.dtype),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(z0, omf, phf, ws, Zb, zn, il2, nus, dts)
    # grid-tile the batch: each row's trajectory is independent, so each
    # grid program integrates one tile of rows with the (small) GP
    # operands replicated per program
    tile = _TILE_N
    n_tiles = pl.cdiv(N, tile)
    Np = n_tiles * tile
    z0p = _pad_rows(z0, Np)
    rep2 = lambda i: (0, 0)           # noqa: E731 (operand replicated)
    in_specs = [
        pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(omf.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(phf.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(ws.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(Zb.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(zn.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(il2.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(nus.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(dts.shape, lambda i: (0,), memory_space=pltpu.SMEM),
    ]
    zs = pl.pallas_call(
        _make_kernel(T, order, K, S, M),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((T, Np, D), z0.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, tile, D), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(z0p, omf, phf, ws, Zb, zn, il2, nus, dts)
    return zs[:, :N]


def _pallas_flow(z0, omega, phase, weights, Z, nu, ls, var, dt, T, order,
                 interpret=False):
    packed = _pack_operands(omega, phase, weights, Z, nu, ls, var)
    dts = jnp.broadcast_to(jnp.asarray(dt, z0.dtype), (T - 1,))
    return packed_euler_flow(z0, *packed, dts, T, order, interpret)


# ---------------------------------------------------------------------------
# packed-level flow with a hand-written Pallas backward (discrete adjoint)
# ---------------------------------------------------------------------------

def packed_flow_reference(z0, omf, phf, ws, Zb, zn, il2, nus, dts, T,
                          order):
    """jnp mirror of the packed forward kernel (oracle for the backward)."""
    D = z0.shape[1]
    K = D // 2 if order == 2 else D
    S = ws.shape[1] // K
    M = nus.shape[1] // K

    def feval(z):
        xo = z @ omf
        phi = jnp.cos(xo + phf) * ws
        f1 = phi.reshape(z.shape[0], K, S).sum(axis=2)
        cross = z @ Zb
        xn = (z * z) @ il2
        G = jnp.exp(-0.5 * (xn + zn - 2.0 * cross)) * nus
        f2 = G.reshape(z.shape[0], K, M).sum(axis=2)
        return f1 + f2

    def rhs(z):
        f = feval(z)
        if order == 2:
            return jnp.concatenate([z[:, K:], f], axis=1)
        return f

    dts_v = jnp.broadcast_to(jnp.asarray(dts, z0.dtype), (T - 1,))

    def step(z, h):
        z1 = z + h * rhs(z)
        return z1, z1

    _, zs = jax.lax.scan(step, z0, dts_v)
    return jnp.concatenate([z0[None], zs], axis=0)


def _make_bwd_kernel(T, order, K, S, M, slab=False):
    """Discrete adjoint of the packed euler flow, one Pallas program.

    Walks t = T-2 .. 0, recomputing the step's forward intermediates from
    the saved state (cheaper than storing (N, K*S) activations). The
    parameter cotangents ride the fori_loop carry (VMEM values) and are
    written once at the end:

      g_t = zsbar[t] + g_{t+1} + dt * (d rhs/d z_t)^T g_{t+1}
      param_bar += dt * (d rhs/d param)^T g_{t+1}

    Cotangents come out in the UNPACKED row-vector shapes (ws/nus/zn as
    (1, K*S)/(1, K*M)) so the outer packing VJP is scatter-free.

    `slab=True` is the grid-tiled variant: the parameter-cotangent output
    refs carry a leading length-1 slab axis (one slab per batch tile; the
    wrapper sums the slabs), which keeps every grid program's writes
    disjoint - no cross-program accumulation, so the kernel stays valid
    under the outer L-vmap (which prepends its own grid dimension).
    """

    def kernel(zs_ref, zsbar_ref, omf_ref, phf_ref, ws_ref, zb_ref,
               zn_ref, il2_ref, nus_ref, dts_ref,
               z0bar_ref, omfbar_ref, phfbar_ref, wsbar_ref, zbbar_ref,
               znbar_ref, il2bar_ref, nusbar_ref, dtsbar_ref):
        omf = omf_ref[:]
        phf = phf_ref[:]
        ws = ws_ref[:]
        Zb = zb_ref[:]
        zn = zn_ref[:]
        il2 = il2_ref[:]
        nus = nus_ref[:]
        f32 = omf.dtype
        Bs = _block_sum_mask(K, S, f32)       # (K*S, K)
        Bm = _block_sum_mask(K, M, f32)       # (K*M, K)
        Es = _expand_mask(K, S, f32)          # (K, K*S)
        Em = _expand_mask(K, M, f32)          # (K, K*M)

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=_HI)

        def body(i, carry):
            (g, omfbar, phfbar, wsbar, zbbar, znbar, il2bar,
             nusbar) = carry
            t = T - 2 - i
            dt = dts_ref[t]
            z = zs_ref[pl.ds(t, 1)][0]          # (N, D)
            # --- recompute forward intermediates
            xo = mm(z, omf)                     # (N, KS)
            cosv = jnp.cos(xo + phf)
            sinv = jnp.sin(xo + phf)
            phi = cosv * ws
            f1 = mm(phi, Bs)                    # (N, K)
            cross = mm(z, Zb)                   # (N, KM)
            xn = mm(z * z, il2)                 # (N, KM)
            Kxz = jnp.exp(-0.5 * (xn + zn - 2.0 * cross))
            G = Kxz * nus
            f2 = mm(G, Bm)                      # (N, K)
            f = f1 + f2

            if order == 2:
                # rhs = concat(z[:, K:], f); d/d(dt_t) uses the full rhs
                dtv = (jnp.sum(g[:, :K] * z[:, K:])
                       + jnp.sum(g[:, K:] * f)).reshape(1, 1)
                fbar = dt * g[:, K:]            # (N, K)
            else:
                dtv = jnp.sum(g * f).reshape(1, 1)
                fbar = dt * g                   # (N, K)
            # dtsbar goes straight to the output ref (each (program, t)
            # slot is written exactly once; a carried accumulator would
            # need dynamic_update_slice, which Pallas TPU cannot lower)
            if slab:
                dtsbar_ref[:, pl.ds(t, 1)] = dtv.reshape(1, 1, 1)
            else:
                dtsbar_ref[pl.ds(t, 1)] = dtv

            # --- vjp through feval (input cotangent into z, param accums)
            Gbar = mm(fbar, Em)                 # (N, KM)
            nusbar = nusbar + jnp.sum(Kxz * Gbar, axis=0, keepdims=True)
            Kxzbar = nus * Gbar
            sqbar = -0.5 * Kxz * Kxzbar         # (N, KM)
            znbar = znbar + jnp.sum(sqbar, axis=0, keepdims=True)
            il2bar = il2bar + mm((z * z).T, sqbar)
            zbbar = zbbar + mm(z.T, -2.0 * sqbar)
            zvec = 2.0 * z * mm(sqbar, il2.T) + mm(-2.0 * sqbar, Zb.T)

            phibar = mm(fbar, Es)               # (N, KS)
            wsbar = wsbar + jnp.sum(cosv * phibar, axis=0, keepdims=True)
            cosbar = ws * phibar
            xobar = -sinv * cosbar              # (N, KS)
            phfbar = phfbar + jnp.sum(xobar, axis=0, keepdims=True)
            omfbar = omfbar + mm(z.T, xobar)
            zvec = zvec + mm(xobar, omf.T)      # (N, D)

            # --- chain to g_t
            g_new = zsbar_ref[pl.ds(t, 1)][0] + g + zvec
            if order == 2:
                # static-slice concat, not .at[].add: scatter-add does
                # not lower in Pallas TPU (interpret mode hides this)
                g_new = jnp.concatenate(
                    [g_new[:, :K], g_new[:, K:] + dt * g[:, :K]], axis=1)
            return (g_new, omfbar, phfbar, wsbar, zbbar, znbar, il2bar,
                    nusbar)

        D = K * order
        init = (zsbar_ref[pl.ds(T - 1, 1)][0],
                jnp.zeros((D, K * S), f32), jnp.zeros((1, K * S), f32),
                jnp.zeros((1, K * S), f32), jnp.zeros((D, K * M), f32),
                jnp.zeros((1, K * M), f32), jnp.zeros((D, K * M), f32),
                jnp.zeros((1, K * M), f32))
        (g0, omfbar, phfbar, wsbar, zbbar, znbar, il2bar,
         # i32 bounds: under jax_enable_x64 Python-int bounds make the
         # induction var i64, which Mosaic's convert rule cannot lower
         # (it self-recurses to RecursionError - measured round 4)
         nusbar) = jax.lax.fori_loop(jnp.int32(0), jnp.int32(T - 1), body, init)
        z0bar_ref[:] = g0
        if slab:
            omfbar_ref[:] = omfbar[None]
            phfbar_ref[:] = phfbar[None]
            wsbar_ref[:] = wsbar[None]
            zbbar_ref[:] = zbbar[None]
            znbar_ref[:] = znbar[None]
            il2bar_ref[:] = il2bar[None]
            nusbar_ref[:] = nusbar[None]
        else:
            omfbar_ref[:] = omfbar
            phfbar_ref[:] = phfbar
            wsbar_ref[:] = wsbar
            zbbar_ref[:] = zbbar
            znbar_ref[:] = znbar
            il2bar_ref[:] = il2bar
            nusbar_ref[:] = nusbar

    return kernel


def _pallas_flow_bwd(zs, zsbar, omf, phf, ws, Zb, zn, il2, nus, dts, T,
                     order, interpret=False):
    N, D = zs.shape[1:]
    K = D // 2 if order == 2 else D
    KS = ws.shape[1]
    KM = nus.shape[1]
    f32 = zs.dtype
    if N <= _SINGLE_BLOCK_N:
        out_shapes = (
            jax.ShapeDtypeStruct((N, D), f32),       # z0bar
            jax.ShapeDtypeStruct((D, KS), f32),      # omfbar
            jax.ShapeDtypeStruct((1, KS), f32),      # phfbar
            jax.ShapeDtypeStruct((1, KS), f32),      # wsbar
            jax.ShapeDtypeStruct((D, KM), f32),      # zbbar
            jax.ShapeDtypeStruct((1, KM), f32),      # znbar
            jax.ShapeDtypeStruct((D, KM), f32),      # il2bar
            jax.ShapeDtypeStruct((1, KM), f32),      # nusbar
            jax.ShapeDtypeStruct((T - 1, 1), f32),   # dtsbar
        )
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9 + [
            pl.BlockSpec(memory_space=pltpu.SMEM)]
        return pl.pallas_call(
            _make_bwd_kernel(T, order, K, KS // K, KM // K),
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in out_shapes),
            interpret=interpret,
        )(zs, zsbar, omf, phf, ws, Zb, zn, il2, nus, dts)

    # grid-tiled: per-tile z0bar blocks; parameter cotangents come out as
    # one slab per tile (disjoint writes) and are summed here. Zero-padded
    # rows carry zero cotangents end-to-end (every param contribution in
    # the kernel scales with that row's g, which starts and stays 0).
    tile = _TILE_N
    n_tiles = pl.cdiv(N, tile)
    Np = n_tiles * tile
    zsp = _pad_rows(jnp.transpose(zs, (1, 0, 2)), Np)
    zsp = jnp.transpose(zsp, (1, 0, 2))
    zsbarp = _pad_rows(jnp.transpose(zsbar, (1, 0, 2)), Np)
    zsbarp = jnp.transpose(zsbarp, (1, 0, 2))
    out_shapes = (
        jax.ShapeDtypeStruct((Np, D), f32),               # z0bar
        jax.ShapeDtypeStruct((n_tiles, D, KS), f32),      # omfbar slabs
        jax.ShapeDtypeStruct((n_tiles, 1, KS), f32),      # phfbar
        jax.ShapeDtypeStruct((n_tiles, 1, KS), f32),      # wsbar
        jax.ShapeDtypeStruct((n_tiles, D, KM), f32),      # zbbar
        jax.ShapeDtypeStruct((n_tiles, 1, KM), f32),      # znbar
        jax.ShapeDtypeStruct((n_tiles, D, KM), f32),      # il2bar
        jax.ShapeDtypeStruct((n_tiles, 1, KM), f32),      # nusbar
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
        pl.BlockSpec(ws.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(Zb.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(zn.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(il2.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(nus.shape, rep2, memory_space=pltpu.VMEM),
        pl.BlockSpec(dts.shape, lambda i: (0,), memory_space=pltpu.SMEM),
    ]
    out_specs = (
        pl.BlockSpec((tile, D), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D, KS), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KS), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KS), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D, KM), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KM), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D, KM), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KM), tile3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T - 1, 1), tile3, memory_space=pltpu.VMEM),
    )
    outs = pl.pallas_call(
        _make_bwd_kernel(T, order, K, KS // K, KM // K, slab=True),
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(zsp, zsbarp, omf, phf, ws, Zb, zn, il2, nus, dts)
    z0bar = outs[0][:N]
    return (z0bar,) + tuple(jnp.sum(o, axis=0) for o in outs[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _packed_euler_flow_f32(z0, omf, phf, ws, Zb, zn, il2, nus, dts, T,
                           order=1, interpret=False):
    """Euler GP-ODE flow over packed operands (f32 only; see
    :func:`packed_euler_flow`)."""
    return _pallas_flow_packed(z0, omf, phf, ws, Zb, zn, il2, nus, dts, T,
                               order, interpret=interpret)


def _pk_fwd(z0, omf, phf, ws, Zb, zn, il2, nus, dts, T, order, interpret):
    zs = _pallas_flow_packed(z0, omf, phf, ws, Zb, zn, il2, nus, dts, T,
                             order, interpret=interpret)
    return zs, (zs, omf, phf, ws, Zb, zn, il2, nus, dts)


def _pk_bwd(T, order, interpret, res, zsbar):
    zs, omf, phf, ws, Zb, zn, il2, nus, dts = res
    outs = _pallas_flow_bwd(zs, zsbar, omf, phf, ws, Zb, zn, il2, nus,
                            dts, T, order, interpret=interpret)
    (z0bar, omfbar, phfbar, wsbar, zbbar, znbar, il2bar, nusbar,
     dtsbar) = outs
    return (z0bar, omfbar, phfbar, wsbar, zbbar, znbar, il2bar, nusbar,
            dtsbar[:, 0])


_packed_euler_flow_f32.defvjp(_pk_fwd, _pk_bwd)


def packed_euler_flow(z0, omf, phf, ws, Zb, zn, il2, nus, dts, T, order=1,
                      interpret=False):
    """Euler GP-ODE flow over packed operands with per-interval step
    sizes dts (T-1,): Pallas forward AND Pallas discrete-adjoint backward
    (both single kernels).

    x64-proof entry: f64 operands are cast to f32 at this boundary
    (Mosaic has no 64-bit lowering; see ops.f32cast) and the trajectory is
    cast back to ``z0``'s dtype."""
    from vae_gp_ode_tpu.ops.f32cast import f32_args
    args, had64 = f32_args((z0, omf, phf, ws, Zb, zn, il2, nus, dts))
    out = _packed_euler_flow_f32(*args, T, order, interpret)
    return out.astype(z0.dtype) if had64 else out


def fused_euler_flow(z0, omega, phase, weights, Z, nu, ls, var, dt,
                     T, order=1, interpret=False):
    """One-kernel euler GP-ODE trajectory. Returns zs (T, N, D).

    T and order are static; dt may be traced. Reverse mode: the packed
    flow has a hand-written Pallas discrete-adjoint backward; the operand
    packing (transposes/reshapes/scales only) is differentiated by XLA.

    x64-proof entry: f64 operands are cast to f32 before the packing (the
    kernel is an f32 program; see ops.f32cast), the trajectory cast back
    to ``z0``'s dtype.
    """
    from vae_gp_ode_tpu.ops.f32cast import f32_args
    args, had64 = f32_args((z0, omega, phase, weights, Z, nu, ls, var, dt))
    out = _pallas_flow(*args, T, order, interpret=interpret)
    return out.astype(z0.dtype) if had64 else out
