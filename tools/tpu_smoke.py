"""Cheap TPU smoke: compile + run every shipped Pallas kernel at the
reference envelope and assert parity against the jnp oracle (VERDICT r4
#2).

All 229 suite tests run the kernels in interpret mode on CPU
(tests/conftest.py), so a real Mosaic lowering regression (like the
round-3 x64 RecursionError, commit 063dd0d) used to surface only at
bench time - i.e. possibly as a null round. This tool is the fast TPU
tier: forward AND hand-written backward of the four kernel programs

  rbf_pathwise   ops/pathwise.py      per-ODE-step RBF eval
  rbf_flow       ops/flow_fused.py    whole-trajectory RBF euler flow
  df_pathwise    ops/df_pathwise.py   per-ODE-step DF eval
  df_flow        ops/df_flow_fused.py whole-trajectory DF euler flow

at the reference shapes (N=20, S=256, M=100, D=6/K=6, T=16;
reference main.py:33-101), parity-checked against the jnp reference at
HIGHEST matmul precision. Emits ONE JSON line and exits nonzero on any
compile or parity failure. Run it as one bounded tools/tpu_lease.sh item
BEFORE bench in a measurement queue.

Usage:  tools/tpu_lease.sh python tools/tpu_smoke.py
        python tools/tpu_smoke.py --device cpu   # interpret-mode dry run
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, T, Q, M, S = 20, 16, 6, 100, 256
FWD_TOL = dict(rtol=2e-4, atol=2e-5)
GRAD_TOL = dict(rtol=1e-3, atol=1e-4)
# trajectory grads accumulate over T-1=15 steps with a different (but
# equally valid) f32 summation order in the discrete-adjoint kernel than
# in XLA's scan VJP, so near-zero elements of O(200)-scale grad arrays
# carry O(1e-2) absolute noise: compare with an atol scaled to each
# array's magnitude (1e-4 relative to max|ref|). Exact elementwise grad
# parity is pinned by the suite at small T (test_ops_pallas,
# test_x64_kernels); the smoke asserts compile + scale-sane parity.
FLOW_GRAD_RTOL = 1e-3
FLOW_GRAD_SCALE = 1e-4


def _rbf_operands(key):
    import jax
    import jax.numpy as jnp
    ks = jax.random.split(key, 8)
    D = K = Q
    return (jax.random.normal(ks[0], (N, D)) * 0.5,
            jax.random.normal(ks[1], (D, S, K)),
            jax.random.uniform(ks[2], (1, S, K)) * 6.28,
            jax.random.normal(ks[3], (S, K)),
            jax.random.normal(ks[4], (M, D)),
            jax.random.normal(ks[5], (K, M)) * 0.1,
            jax.random.uniform(ks[6], (K, D), minval=0.8, maxval=2.0),
            jax.random.uniform(ks[7], (K,), minval=0.3, maxval=1.0))


def _df_operands(key):
    import jax
    ks = jax.random.split(key, 8)
    D = Q
    return (jax.random.normal(ks[0], (N, D)) * 0.5,
            jax.random.normal(ks[1], (D, S * D)),
            jax.random.uniform(ks[2], (1, S * D)) * 6.28,
            jax.random.normal(ks[3], (2 * S * D, D)) * 0.05,
            jax.random.normal(ks[4], (M, D)),
            jax.random.normal(ks[5], (M, D)) * 0.1,
            jax.random.uniform(ks[6], (D, D), minval=0.8, maxval=2.0),
            jax.random.uniform(ks[7], (D,), minval=0.3, maxval=1.0))


def _check(name, fused_fn, ref_fn, ops, checks, interpret,
           scale_grad_tol=False):
    """Compile + run forward and backward; record parity + wall time."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    t0 = time.perf_counter()
    out = fused_fn(*ops, interpret=interpret)
    out_h = np.asarray(out)                      # fetch = completion proof
    with jax.default_matmul_precision('highest'):
        ref = np.asarray(ref_fn(*ops))
    np.testing.assert_allclose(out_h, ref, err_msg=f'{name} fwd',
                               **FWD_TOL)
    t_fwd = time.perf_counter() - t0

    t0 = time.perf_counter()
    argnums = tuple(range(len(ops)))
    g = jax.grad(lambda *a: jnp.sum(fused_fn(*a, interpret=interpret) ** 2),
                 argnums=argnums)(*ops)
    g_h = [np.asarray(x) for x in g]
    with jax.default_matmul_precision('highest'):
        gr = jax.grad(lambda *a: jnp.sum(ref_fn(*a) ** 2),
                      argnums=argnums)(*ops)
    for i, (a, b) in enumerate(zip(g_h, gr)):
        b = np.asarray(b)
        if scale_grad_tol:
            tol = dict(rtol=FLOW_GRAD_RTOL,
                       atol=max(1e-5, FLOW_GRAD_SCALE
                                * float(np.max(np.abs(b)))))
        else:
            tol = GRAD_TOL
        np.testing.assert_allclose(a, b, err_msg=f'{name} grad arg{i}',
                                   **tol)
    t_bwd = time.perf_counter() - t0
    checks[name] = {'ok': True, 'fwd_s': round(t_fwd, 1),
                    'bwd_s': round(t_bwd, 1)}
    print(f'{name}: ok (fwd {t_fwd:.1f}s, bwd {t_bwd:.1f}s)',
          file=sys.stderr)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--device', default='tpu',
                   help="'cpu' = interpret-mode dry run of this script")
    args = p.parse_args()
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    interpret = args.device == 'cpu'

    from vae_gp_ode_tpu.ops.pathwise import (
        fused_pathwise_eval, pathwise_eval_reference)
    from vae_gp_ode_tpu.ops.flow_fused import (
        fused_euler_flow, euler_flow_reference)
    from vae_gp_ode_tpu.ops.df_pathwise import (
        fused_df_pathwise_eval, df_pathwise_reference)
    from vae_gp_ode_tpu.ops.df_flow_fused import (
        packed_df_euler_flow, df_euler_flow_reference)

    key = jax.random.PRNGKey(0)
    t_start = time.perf_counter()
    checks = {}
    result = {'metric': 'tpu_smoke', 'ok': False,
              'backend': jax.default_backend(),
              'config': f'N={N} T={T} q={Q} M={M} S={S} (reference '
                        f'envelope); fwd+bwd parity vs jnp@highest'}
    try:
        _check('rbf_pathwise', fused_pathwise_eval,
               pathwise_eval_reference, _rbf_operands(key), checks,
               interpret)
        _check('rbf_flow',
               lambda *a, interpret: fused_euler_flow(
                   *a, 0.1, T, 1, interpret),
               lambda *a: euler_flow_reference(*a, 0.1, T, 1),
               _rbf_operands(jax.random.fold_in(key, 1)), checks,
               interpret, scale_grad_tol=True)
        _check('df_pathwise', fused_df_pathwise_eval,
               df_pathwise_reference, _df_operands(jax.random.fold_in(
                   key, 2)), checks, interpret)
        # the flow kernels take per-step dts and return (T, N, D)
        df_ops = _df_operands(jax.random.fold_in(key, 3))
        import jax.numpy as jnp
        dts = jnp.full((T - 1,), 0.1, jnp.float32)
        _check('df_flow',
               lambda *a, interpret: packed_df_euler_flow(
                   *a, dts, T, interpret),
               lambda *a: df_euler_flow_reference(*a, dts, T),
               df_ops, checks, interpret, scale_grad_tol=True)
        result['ok'] = True
    except Exception as e:
        result['error'] = f'{type(e).__name__}: {str(e)[:400]}'
        result['checks'] = checks
        result['elapsed_s'] = round(time.perf_counter() - t_start, 1)
        print(json.dumps(result), flush=True)
        sys.exit(1)
    result['checks'] = checks
    result['elapsed_s'] = round(time.perf_counter() - t_start, 1)
    print(json.dumps(result), flush=True)


if __name__ == '__main__':
    main()
