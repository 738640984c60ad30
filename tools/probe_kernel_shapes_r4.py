"""Standalone Pallas-kernel compile/run probe over (q, S, M, N) shapes.

Round-4 companion to probe_envelope_r4.py: the envelope probe runs the
FULL train step, so a remote-compile failure there can't distinguish
"Mosaic died on the kernel at this width" from "the axon compile helper
died on the whole program" (capacity64 dies even in pure-XLA mode, so
the helper has a program-size ceiling of its own). This probe compiles
and runs ONE kernel - forward and grad - at the requested shape.

  python tools/probe_kernel_shapes_r4.py --kernel rbf_fused --q 12 --N 512

Emits one JSON line; exit 0 iff ok.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument('--kernel', required=True,
                    choices=['rbf_fused', 'rbf_perstep', 'df_fused'])
parser.add_argument('--q', type=int, default=6)
parser.add_argument('--S', type=int, default=256)
parser.add_argument('--M', type=int, default=100)
parser.add_argument('--N', type=int, default=256)
parser.add_argument('--T', type=int, default=16)
parser.add_argument('--order', type=int, default=1)
parser.add_argument('--device', type=str, default='tpu')


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
    out = {'metric': 'kernel_shape_probe', 'kernel': args.kernel,
           'q': K, 'S': S, 'M': M, 'N': N, 'order': args.order}
    try:
        if args.kernel == 'rbf_fused':
            from vae_gp_ode_tpu.ops.flow_fused import fused_euler_flow
            a = (jax.random.normal(ks[0], (N, D)) * 0.5,
                 jax.random.normal(ks[1], (D, S, K)),
                 jax.random.uniform(ks[2], (1, S, K)) * 6.28,
                 jax.random.normal(ks[3], (S, K)),
                 jax.random.normal(ks[4], (M, D)),
                 jax.random.normal(ks[5], (K, M)) * 0.1,
                 jax.random.uniform(ks[6], (K, D), minval=0.8, maxval=2.0),
                 jax.random.uniform(ks[7], (K,), minval=0.3, maxval=1.0))
            fn = jax.jit(lambda *a: jnp.sum(
                fused_euler_flow(*a, 0.1, T, args.order, interp) ** 2))
        elif args.kernel == 'df_fused':
            from vae_gp_ode_tpu.ops.df_flow_fused import packed_df_euler_flow
            dts = jnp.full((T - 1,), 0.05)
            a = (jax.random.normal(ks[0], (N, D)) * 0.5,
                 jax.random.normal(ks[1], (D, S * D)),
                 jax.random.uniform(ks[2], (1, S * D)) * 6.28,
                 jax.random.normal(ks[3], (2 * S * D, D)) * 0.3,
                 jax.random.normal(ks[4], (M, D)),
                 jax.random.normal(ks[5], (M, D)) * 0.1,
                 jax.random.uniform(ks[6], (D, D), minval=0.8, maxval=3.0),
                 jax.random.uniform(ks[7], (D,), minval=0.3, maxval=1.0))
            fn = jax.jit(lambda *a: jnp.sum(
                packed_df_euler_flow(*a, dts, T, interp) ** 2))
        else:
            from vae_gp_ode_tpu.ops.pathwise import fused_pathwise_eval
            a = (jax.random.normal(ks[0], (N, D)) * 0.5,
                 jax.random.normal(ks[1], (D, S, K)),
                 jax.random.uniform(ks[2], (1, S, K)) * 6.28,
                 jax.random.normal(ks[3], (S, K)),
                 jax.random.normal(ks[4], (M, D)),
                 jax.random.normal(ks[5], (K, M)) * 0.1,
                 jax.random.uniform(ks[6], (K, D), minval=0.8, maxval=2.0),
                 jax.random.uniform(ks[7], (K,), minval=0.3, maxval=1.0))
            fn = jax.jit(lambda *a: jnp.sum(
                fused_pathwise_eval(*a, interp) ** 2))

        t0 = time.perf_counter()
        v = float(fn(*a))
        out['fwd_compile_run_s'] = round(time.perf_counter() - t0, 2)
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
