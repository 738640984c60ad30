"""x64-mode robustness of the Pallas entry points (VERDICT r3 #3).

Round-3 regression: under ``jax_enable_x64`` the ``jax.random`` draws
inside ``gp.draw_fn_sample`` come out float64, and the per-step Pallas
pathwise kernel then crashed Mosaic lowering on TPU
(``NotImplementedError: 64-bit types are not supported`` at the
``xo + phase`` add - the accuracy probe's queue log, round 3). The fix is
an f32 cast boundary at every public fused-op entry (ops.f32cast): f64
operands are cast to f32 (the kernels are f32 programs by design), the
result cast back to the caller's dtype.

These tests run the real dispatch path (interpret mode on CPU) inside a
``jax.enable_x64()`` scope: operands come out f64 exactly as in the
crashed probe, and each entry must (a) not raise, (b) return the caller's
dtype, (c) match the f64 reference to f32 accuracy, and (d) propagate
gradients (f64 cotangents through the cast boundary into the f32 custom
VJP and back).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _rbf_operands_f64(key, N=6, S=16, M=8, D=4, K=4):
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (N, D))
    omega = jax.random.normal(ks[1], (D, S, K))
    phase = jax.random.uniform(ks[2], (1, S, K)) * 2 * np.pi
    weights = jax.random.normal(ks[3], (S, K))
    Z = jax.random.normal(ks[4], (M, D))
    nu = jax.random.normal(ks[5], (K, M))
    ls = jax.random.uniform(ks[6], (K, D), minval=0.5, maxval=2.0)
    var = jax.random.uniform(ks[7], (K,), minval=0.3, maxval=1.0)
    return x, omega, phase, weights, Z, nu, ls, var


@pytest.mark.slow
def test_fused_pathwise_eval_x64_operands():
    from vae_gp_ode_tpu.ops.pathwise import (
        fused_pathwise_eval, pathwise_eval_reference)
    with jax.enable_x64():
        ops = _rbf_operands_f64(jax.random.PRNGKey(0))
        assert ops[2].dtype == jnp.float64   # the round-3 crash operand
        out = fused_pathwise_eval(*ops, interpret=True)
        assert out.dtype == jnp.float64
        ref = pathwise_eval_reference(*ops)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

        # gradients: f64 cotangents must flow through the cast boundary
        g = jax.grad(lambda *a: jnp.sum(
            fused_pathwise_eval(*a, True) ** 2), argnums=tuple(range(8)))(
            *ops)
        gr = jax.grad(lambda *a: jnp.sum(
            pathwise_eval_reference(*a) ** 2), argnums=tuple(range(8)))(
            *ops)
        for a, b in zip(g, gr):
            assert a.dtype == jnp.float64
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_euler_flow_x64_operands():
    from vae_gp_ode_tpu.ops.flow_fused import (
        fused_euler_flow, euler_flow_reference)
    with jax.enable_x64():
        ks = jax.random.split(jax.random.PRNGKey(1), 8)
        N, S, M, D, T = 5, 8, 6, 3, 5
        args = (jax.random.normal(ks[0], (N, D)) * 0.5,
                jax.random.normal(ks[1], (D, S, D)),
                jax.random.uniform(ks[2], (1, S, D)) * 6.28,
                jax.random.normal(ks[3], (S, D)),
                jax.random.normal(ks[4], (M, D)),
                jax.random.normal(ks[5], (D, M)) * 0.1,
                jax.random.uniform(ks[6], (D, D), minval=0.8, maxval=2.0),
                jax.random.uniform(ks[7], (D,), minval=0.3, maxval=1.0))
        out = fused_euler_flow(*args, 0.1, T, 1, True)
        assert out.dtype == jnp.float64
        ref = euler_flow_reference(*args, 0.1, T, 1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

        g = jax.grad(lambda z: jnp.sum(
            fused_euler_flow(z, *args[1:], 0.1, T, 1, True) ** 2))(args[0])
        gr = jax.grad(lambda z: jnp.sum(
            euler_flow_reference(z, *args[1:], 0.1, T, 1) ** 2))(args[0])
        assert g.dtype == jnp.float64
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   rtol=5e-4, atol=1e-5)


@pytest.mark.slow
def test_df_fused_entries_x64_operands():
    from vae_gp_ode_tpu.ops.df_pathwise import (
        fused_df_pathwise_eval, df_pathwise_reference)
    from vae_gp_ode_tpu.ops.df_flow_fused import (
        packed_df_euler_flow, df_euler_flow_reference)
    with jax.enable_x64():
        N, S, M, D = 5, 8, 7, 4
        ks = jax.random.split(jax.random.PRNGKey(2), 8)
        x = jax.random.normal(ks[0], (N, D)) * 0.5
        omf = jax.random.normal(ks[1], (D, S * D))
        phf = jax.random.uniform(ks[2], (1, S * D)) * 6.28
        G = jax.random.normal(ks[3], (2 * S * D, D)) * 0.3
        Z = jax.random.normal(ks[4], (M, D))
        nur = jax.random.normal(ks[5], (M, D)) * 0.1
        ls2 = jax.random.uniform(ks[6], (D, D), minval=0.8, maxval=3.0)
        var = jax.random.uniform(ks[7], (D,), minval=0.3, maxval=1.0)
        args = (x, omf, phf, G, Z, nur, ls2, var)
        assert x.dtype == jnp.float64

        out = fused_df_pathwise_eval(*args, True)
        assert out.dtype == jnp.float64
        ref = df_pathwise_reference(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

        T = 5
        dts = jnp.full((T - 1,), 0.05)
        zs = packed_df_euler_flow(*args, dts, T, True)
        assert zs.dtype == jnp.float64
        zref = df_euler_flow_reference(*args, dts, T)
        np.testing.assert_allclose(np.asarray(zs), np.asarray(zref),
                                   rtol=2e-4, atol=2e-5)

        g = jax.grad(lambda z: jnp.sum(
            packed_df_euler_flow(z, *args[1:], dts, T, True) ** 2))(x)
        gr = jax.grad(lambda z: jnp.sum(
            df_euler_flow_reference(z, *args[1:], dts, T) ** 2))(x)
        assert g.dtype == jnp.float64
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   rtol=5e-4, atol=1e-5)


def _iter_jaxprs(jaxpr):
    yield jaxpr
    for eqn in jaxpr.eqns:
        for v in eqn.params.values():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for x in vals:
                if hasattr(x, 'jaxpr') and hasattr(x.jaxpr, 'eqns'):
                    yield from _iter_jaxprs(x.jaxpr)
                elif hasattr(x, 'eqns'):
                    yield from _iter_jaxprs(x)


def _kernel_avals_64bit(fn, *args):
    """All 64-bit avals inside any pallas_call kernel jaxpr of fn."""
    closed = jax.make_jaxpr(fn)(*args)
    bad = []
    for j in _iter_jaxprs(closed.jaxpr):
        for eqn in j.eqns:
            if 'pallas_call' not in eqn.primitive.name:
                continue
            kj = eqn.params['jaxpr']
            kj = kj.jaxpr if hasattr(kj, 'jaxpr') else kj
            for sub in _iter_jaxprs(kj):
                for e2 in sub.eqns:
                    for v in list(e2.invars) + list(e2.outvars):
                        aval = getattr(v, 'aval', None)
                        if (hasattr(aval, 'dtype')
                                and np.dtype(aval.dtype).itemsize == 8):
                            bad.append((e2.primitive.name, str(aval)))
    return bad


@pytest.mark.slow
def test_kernel_jaxprs_free_of_64bit_avals_under_x64():
    """Mosaic has NO 64-bit lowering; worse, its convert-element-type
    rule SELF-RECURSES to RecursionError on an i64->i32 convert (measured
    round 4 on a real v5e: under x64, Python-int ``fori_loop`` bounds
    made the induction variable i64 and the fused-flow kernels crashed
    at compile). Interpret mode on CPU executes 64-bit jaxprs happily,
    so the only CPU-checkable invariant is the jaxpr itself: under
    jax_enable_x64, NO aval inside ANY pallas kernel jaxpr may be
    64-bit - indices and loop bounds must be pinned i32, floats f32 (the
    ops.f32cast boundary). Covers forward AND custom-vjp backward of the
    fused whole-trajectory and per-step paths, both kernel families."""
    from vae_gp_ode_tpu.gp import init_svgp_params, draw_fn_sample
    from vae_gp_ode_tpu.dynamics import flow_forward
    from vae_gp_ode_tpu.ops import config as ops_config
    with jax.enable_x64():
        key = jax.random.PRNGKey(0)
        for kern in ('RBF', 'DF'):
            gp = init_svgp_params(key, D_in=3, D_out=3, M=8, kernel=kern)
            s = draw_fn_sample(gp, key, 16)
            z0 = jax.random.normal(jax.random.PRNGKey(1), (4, 3)) * 0.5
            ts = jnp.asarray(0.1 * np.arange(5))
            ops_config.set_use_pallas(True)
            try:
                for fuse, solver in ((True, 'euler'), (False, 'rk4')):
                    ops_config.set_fuse_flow(fuse)
                    bad = _kernel_avals_64bit(
                        lambda g, sa, z, t: flow_forward(
                            g, sa, z, t, solver=solver)[0], gp, s, z0, ts)
                    bad += _kernel_avals_64bit(
                        jax.grad(lambda z: flow_forward(
                            gp, s, z, ts, solver=solver)[0].sum()), z0)
                    assert not bad, (kern, solver, fuse, bad[:5])
            finally:
                ops_config.set_use_pallas(None)
                ops_config.set_fuse_flow(True)


@pytest.mark.slow
def test_fn_eval_dispatch_x64_end_to_end():
    """The exact round-3 crash path: draw_fn_sample under x64 (f64 RFF
    draws) -> svgp.fn_eval -> fused Pallas dispatch. Must produce the jnp
    path's values instead of crashing at Mosaic lowering."""
    from vae_gp_ode_tpu.gp import svgp
    from vae_gp_ode_tpu.ops import config as ops_config
    with jax.enable_x64():
        gp = svgp.init_svgp_params(jax.random.PRNGKey(0), D_in=4, D_out=4,
                                   M=8, kernel='RBF')
        s = svgp.draw_fn_sample(gp, jax.random.PRNGKey(1), S=16)
        assert s.rff.phase.dtype == jnp.float64
        x = jax.random.normal(jax.random.PRNGKey(2), (6, 4)) * 0.5

        ops_config.set_use_pallas(True)
        try:
            f_pallas = svgp.fn_eval(gp, s, x)
        finally:
            ops_config.set_use_pallas(None)
        ops_config.set_use_pallas(False)
        try:
            f_jnp = svgp.fn_eval(gp, s, x)
        finally:
            ops_config.set_use_pallas(None)
        np.testing.assert_allclose(np.asarray(f_pallas), np.asarray(f_jnp),
                                   rtol=2e-4, atol=2e-5)
