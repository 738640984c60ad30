"""Fully-fused GP-ODE euler trajectory kernel.

The default training configuration integrates T=16 points with euler
(15 steps), each step evaluating the pathwise GP sample on a (20, 6) state.
Dispatching 15 separate fused-eval kernels (or ~150 XLA ops) leaves the
chip idle between launches at these sizes. This kernel runs the ENTIRE
trajectory inside one Pallas program: the GP operands load into VMEM once,
the state z never leaves vector registers/VMEM, and each output row is
written as it is produced.

MXU mapping: the per-output-dim structure (K dimwise lengthscales) is
flattened into block-diagonal contraction matrices built once per
trajectory, so each euler step is exactly five dense matmuls -

    xo     = z @ omega_f          (N, K*S)   feature projection
    f1     = cos(xo + phase) @ Ww (N, K)     block-diag feature weights
    cross  = z @ Zb               (N, K*M)   per-dim-scaled inducing dots
    xn_b   = (z*z) @ invls2_b     (N, K*M)   squared-norm broadcast
    f2     = exp(-0.5 sq) @ Wnu   (N, K)     block-diag nu contraction

- all shapes MXU-aligned up to padding, no per-k serialisation.
Supports 1st-order (dz = f(z)) and 2nd-order (d(s,v) = (v, f(s,v)))
latent ODEs with the dimwise-RBF kernel. Reverse mode = custom VJP through
the lax.scan reference implementation (identical math, f32 precision).
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

    def step(z, _):
        z1 = z + dt * rhs(z)
        return z1, z1

    _, zs = jax.lax.scan(step, z0, None, length=T - 1)
    return jnp.concatenate([z0[None], zs], axis=0)


def _pack_operands(omega, phase, weights, Z, nu, ls, var):
    """Precompute the flattened/block-diagonal operands (traced XLA ops,
    executed once per trajectory draw - negligible next to the solve)."""
    D, S, K = omega.shape
    M = Z.shape[0]
    dtype = omega.dtype

    # feature projection, k-major flattening: column k*S+s <- omega[:, s, k]
    omega_f = jnp.transpose(omega, (0, 2, 1)).reshape(D, K * S)
    phase_f = jnp.transpose(phase[0], (1, 0)).reshape(1, K * S)
    # block-diag feature weights with sqrt(var_k / S) folded in
    w_scaled = (weights * jnp.sqrt(var / S)).T.reshape(K * S)   # k-major
    rows = jnp.arange(K * S)
    cols = rows // S
    Ww = jnp.zeros((K * S, K), dtype).at[rows, cols].set(w_scaled)

    # inducing dots: column k*M+m <- Z[m, :] / ls[k, :]^2
    inv_ls2 = 1.0 / (ls * ls)                                   # (K, D)
    Zb = (Z[None, :, :] * inv_ls2[:, None, :])                  # (K, M, D)
    Zb = jnp.transpose(Zb.reshape(K * M, D), (1, 0))            # (D, K*M)
    zn = jnp.sum((Z[None, :, :] / ls[:, None, :]) ** 2,
                 axis=2).reshape(1, K * M)                      # (1, K*M)
    # broadcast matrix for xn: (z*z) @ invls2_b -> (N, K*M)
    invls2_b = jnp.repeat(inv_ls2, M, axis=0).T                 # (D, K*M)
    # block-diag nu contraction with var_k folded in
    nu_scaled = (nu * var[:, None]).reshape(K * M)
    rows_m = jnp.arange(K * M)
    cols_m = rows_m // M
    Wnu = jnp.zeros((K * M, K), dtype).at[rows_m, cols_m].set(nu_scaled)

    return omega_f, phase_f, Ww, Zb, zn, invls2_b, Wnu


def _make_kernel(T, order, K):
    def kernel(z0_ref, omf_ref, phf_ref, ww_ref, zb_ref, zn_ref,
               il2_ref, wnu_ref, dt_ref, out_ref):
        dt = dt_ref[0, 0]
        omf = omf_ref[:]
        phf = phf_ref[:]
        Ww = ww_ref[:]
        Zb = zb_ref[:]
        zn = zn_ref[:]
        il2 = il2_ref[:]
        Wnu = wnu_ref[:]

        def feval(z):
            xo = jnp.dot(z, omf, preferred_element_type=jnp.float32,
                         precision=_HI)                        # (N, K*S)
            f1 = jnp.dot(jnp.cos(xo + phf), Ww,
                         preferred_element_type=jnp.float32,
                         precision=_HI)                        # (N, K)
            cross = jnp.dot(z, Zb, preferred_element_type=jnp.float32,
                            precision=_HI)                     # (N, K*M)
            xn = jnp.dot(z * z, il2, preferred_element_type=jnp.float32,
                         precision=_HI)                        # (N, K*M)
            Kxz = jnp.exp(-0.5 * (xn + zn - 2.0 * cross))
            f2 = jnp.dot(Kxz, Wnu, preferred_element_type=jnp.float32,
                         precision=_HI)                        # (N, K)
            return f1 + f2

        def rhs(z):
            f = feval(z)
            if order == 2:
                return jnp.concatenate([z[:, K:], f], axis=1)
            return f

        z = z0_ref[:]
        out_ref[0] = z

        def step(t, z):
            z1 = z + dt * rhs(z)
            out_ref[pl.ds(t + 1, 1)] = z1[None]
            return z1

        jax.lax.fori_loop(0, T - 1, step, z)

    return kernel


def _pallas_flow(z0, omega, phase, weights, Z, nu, ls, var, dt, T, order,
                 interpret=False):
    N, D = z0.shape
    K = var.shape[0]
    packed = _pack_operands(omega, phase, weights, Z, nu, ls, var)
    dt_arr = jnp.asarray(dt, z0.dtype).reshape(1, 1)
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8 + [
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    return pl.pallas_call(
        _make_kernel(T, order, K),
        out_shape=jax.ShapeDtypeStruct((T, N, D), z0.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(z0, *packed, dt_arr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_euler_flow(z0, omega, phase, weights, Z, nu, ls, var, dt,
                     T, order=1, interpret=False):
    """One-kernel euler GP-ODE trajectory. Returns zs (T, N, D).

    T and order are static; dt may be traced.
    """
    return _pallas_flow(z0, omega, phase, weights, Z, nu, ls, var, dt, T,
                        order, interpret=interpret)


def _fwd(z0, omega, phase, weights, Z, nu, ls, var, dt, T, order,
         interpret):
    out = _pallas_flow(z0, omega, phase, weights, Z, nu, ls, var, dt, T,
                       order, interpret=interpret)
    return out, (z0, omega, phase, weights, Z, nu, ls, var, dt)


def _bwd(T, order, interpret, res, g):
    def ref(z0, omega, phase, weights, Z, nu, ls, var, dt):
        return euler_flow_reference(z0, omega, phase, weights, Z, nu, ls,
                                    var, dt, T, order)

    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


fused_euler_flow.defvjp(_fwd, _bwd)
