"""Standalone Pallas-kernel compile/run/parity probe over (q, S, M, N).

Round-5 successor to probe_kernel_shapes_r4.py, extended with the
grid-tiled wide-shape kernels (ops.pathwise_tiled / df_pathwise_tiled)
whose whole purpose is the shapes the single-block kernels die at
(q=12 / S=1024 - results/kernel_shapes_r4.jsonl). Each invocation
compiles ONE kernel - forward and grad - at the requested shape in a
fresh process, checks forward parity against the jnp oracle at HIGHEST
precision, and emits one JSON line; exit 0 iff ok.

  python tools/probe_kernel_shapes_r5.py --kernel rbf_tiled --q 12 --S 1024

Run each probe as its own tools/tpu_lease.sh item (per-item protocol;
a failed wide compile can kill the v5e compiler for the process, never
share a process between probes).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument('--kernel', required=True,
                    choices=['rbf_fused', 'rbf_perstep', 'df_fused',
                             'rbf_tiled', 'df_tiled'])
parser.add_argument('--q', type=int, default=6)
parser.add_argument('--S', type=int, default=256)
parser.add_argument('--M', type=int, default=100)
parser.add_argument('--N', type=int, default=256)
parser.add_argument('--T', type=int, default=16)
parser.add_argument('--order', type=int, default=1)
parser.add_argument('--device', type=str, default='tpu')


def _rbf_operands(ks, N, D, S, K, M):
    import jax
    return (jax.random.normal(ks[0], (N, D)) * 0.5,
            jax.random.normal(ks[1], (D, S, K)),
            jax.random.uniform(ks[2], (1, S, K)) * 6.28,
            jax.random.normal(ks[3], (S, K)),
            jax.random.normal(ks[4], (M, D)),
            jax.random.normal(ks[5], (K, M)) * 0.1,
            jax.random.uniform(ks[6], (K, D), minval=0.8, maxval=2.0),
            jax.random.uniform(ks[7], (K,), minval=0.3, maxval=1.0))


def _df_operands(ks, N, D, S, M):
    import jax
    ls = jax.random.uniform(ks[6], (D, D), minval=0.8, maxval=3.0)
    return (jax.random.normal(ks[0], (N, D)) * 0.5,
            jax.random.normal(ks[1], (D, S * D)),
            jax.random.uniform(ks[2], (1, S * D)) * 6.28,
            jax.random.normal(ks[3], (2 * S * D, D)) * 0.3,
            jax.random.normal(ks[4], (M, D)),
            jax.random.normal(ks[5], (M, D)) * 0.1,
            ls * ls,
            jax.random.uniform(ks[7], (D,), minval=0.3, maxval=1.0))


def main():
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from vae_gp_ode_tpu.ops import config as ops_config

    K, S, M, N, T = args.q, args.S, args.M, args.N, args.T
    D = K * args.order
    interp = ops_config.interpret_mode()
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    out = {'metric': 'kernel_shape_probe', 'round': 5,
           'kernel': args.kernel,
           'q': K, 'S': S, 'M': M, 'N': N, 'order': args.order}
    oracle = None      # (fn, operands) -> forward-parity check when set
    try:
        if args.kernel == 'rbf_fused':
            from vae_gp_ode_tpu.ops.flow_fused import fused_euler_flow
            a = _rbf_operands(ks, N, D, S, K, M)
            raw = jax.jit(lambda *a: fused_euler_flow(
                *a, 0.1, T, args.order, interp))
            fn = jax.jit(lambda *a: jnp.sum(raw(*a) ** 2))
        elif args.kernel == 'df_fused':
            from vae_gp_ode_tpu.ops.df_flow_fused import packed_df_euler_flow
            dts = jnp.full((T - 1,), 0.05)
            a = _df_operands(ks, N, D, S, M)
            raw = jax.jit(lambda *a: packed_df_euler_flow(
                *a, dts, T, interp))
            fn = jax.jit(lambda *a: jnp.sum(raw(*a) ** 2))
        elif args.kernel == 'rbf_perstep':
            from vae_gp_ode_tpu.ops.pathwise import fused_pathwise_eval
            a = _rbf_operands(ks, N, D, S, K, M)
            raw = jax.jit(lambda *a: fused_pathwise_eval(*a, interp))
            fn = jax.jit(lambda *a: jnp.sum(raw(*a) ** 2))
            from vae_gp_ode_tpu.ops.pathwise import pathwise_eval_reference
            oracle = pathwise_eval_reference
        elif args.kernel == 'rbf_tiled':
            from vae_gp_ode_tpu.ops.pathwise_tiled import tiled_pathwise_eval
            a = _rbf_operands(ks, N, D, S, K, M)
            raw = jax.jit(lambda *a: tiled_pathwise_eval(*a, interp))
            fn = jax.jit(lambda *a: jnp.sum(raw(*a) ** 2))
            from vae_gp_ode_tpu.ops.pathwise import pathwise_eval_reference
            oracle = pathwise_eval_reference
        else:  # df_tiled
            from vae_gp_ode_tpu.ops.df_pathwise_tiled import (
                tiled_df_pathwise_eval)
            a = _df_operands(ks, N, D, S, M)
            raw = jax.jit(lambda *a: tiled_df_pathwise_eval(*a, interp))
            fn = jax.jit(lambda *a: jnp.sum(raw(*a) ** 2))
            from vae_gp_ode_tpu.ops.df_pathwise import df_pathwise_reference
            oracle = df_pathwise_reference

        t0 = time.perf_counter()
        fwd = raw(*a)
        v = float(jnp.sum(fwd ** 2))
        out['fwd_compile_run_s'] = round(time.perf_counter() - t0, 2)
        if oracle is not None:
            with jax.default_matmul_precision('highest'):
                ref = jax.jit(oracle)(*a)
            err = float(jnp.max(jnp.abs(fwd - ref)))
            rel = err / (float(jnp.max(jnp.abs(ref))) + 1e-30)
            out['fwd_max_abs_err'] = float(f'{err:.3e}')
            out['fwd_max_rel_err'] = float(f'{rel:.3e}')
            if not (rel < 5e-3):
                raise AssertionError(
                    f'forward parity vs jnp oracle: rel err {rel:.3e}')
        t0 = time.perf_counter()
        g = jax.jit(jax.grad(fn))(*a)
        gn = float(jnp.abs(g[0]).sum())
        out['grad_compile_run_s'] = round(time.perf_counter() - t0, 2)
        out.update({'ok': True,
                    'finite': bool(v == v and gn == gn)})
    except Exception as e:
        out.update({'ok': False,
                    'error': f'{type(e).__name__}: {str(e)[:200]}'})
    print(json.dumps(out), flush=True)
    sys.exit(0 if out.get('ok') else 1)


if __name__ == '__main__':
    main()
