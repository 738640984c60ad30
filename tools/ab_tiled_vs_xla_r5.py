"""Interleaved A/B: tiled Pallas pathwise kernels vs XLA@highest at WIDE shapes.

Round 5 closed the compile gap (the tiled kernels compile and match at
q=12 / S=1024 - results/kernel_shapes_r5.jsonl); this probe answers the
remaining question from VERDICT r4 weak-#3: do they also WIN on speed at
those shapes, or is the wide-shape production path better off on XLA?

One process, one shape, both paths compiled up front, then R interleaved
rounds of (tiled, xla) timing units. Each unit dispatches `reps`
back-to-back evaluations and is closed by a VALUE FETCH (float of a
reduced scalar) - block_until_ready lies over the axon tunnel (round-2
measurement, CLAUDE.md), only fetches prove completion. Interleaving
cancels the tunnel's ~±30% drift; compare medians within this process
only. Also times value_and_grad the same way (the backward is ~95% of a
real train step).

  tools/tpu_lease.sh python tools/ab_tiled_vs_xla_r5.py \
      --kernel rbf --q 12 --S 1024 >> results/ab_tiled_r5.jsonl

Run each shape as its own lease item (per-item protocol, CLAUDE.md).
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_kernel_shapes_r5 import _df_operands, _rbf_operands  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument('--kernel', required=True, choices=['rbf', 'df'])
parser.add_argument('--q', type=int, default=12)
parser.add_argument('--S', type=int, default=1024)
parser.add_argument('--M', type=int, default=100)
parser.add_argument('--N', type=int, default=256)
parser.add_argument('--reps', type=int, default=30)
parser.add_argument('--rounds', type=int, default=8)
parser.add_argument('--device', type=str, default='tpu')


def _timed_unit(fn, a, reps):
    """reps async dispatches closed by one value fetch; returns seconds."""
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(*a)
    _ = float(y)
    return time.perf_counter() - t0


def main():
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from vae_gp_ode_tpu.ops import config as ops_config

    K, S, M, N = args.q, args.S, args.M, args.N
    interp = ops_config.interpret_mode()
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    out = {'metric': 'ab_tiled_vs_xla', 'round': 5, 'kernel': args.kernel,
           'q': K, 'S': S, 'M': M, 'N': N,
           'reps': args.reps, 'rounds': args.rounds}
    try:
        if args.kernel == 'rbf':
            from vae_gp_ode_tpu.ops.pathwise import pathwise_eval_reference
            from vae_gp_ode_tpu.ops.pathwise_tiled import tiled_pathwise_eval
            a = _rbf_operands(ks, N, K, S, K, M)
            tiled_raw = tiled_pathwise_eval
            oracle = pathwise_eval_reference
        else:
            from vae_gp_ode_tpu.ops.df_pathwise import df_pathwise_reference
            from vae_gp_ode_tpu.ops.df_pathwise_tiled import (
                tiled_df_pathwise_eval)
            a = _df_operands(ks, N, K, S, M)
            tiled_raw = tiled_df_pathwise_eval
            oracle = df_pathwise_reference

        tiled = jax.jit(lambda *a: jnp.sum(tiled_raw(*a, interp) ** 2))

        def _xla_sum(*a):
            with jax.default_matmul_precision('highest'):
                return jnp.sum(oracle(*a) ** 2)

        xla = jax.jit(_xla_sum)
        tiled_g = jax.jit(jax.value_and_grad(tiled))
        xla_g = jax.jit(jax.value_and_grad(_xla_sum))

        # warm-up compiles (wide tiled fwd can take minutes; log them)
        for name, f in (('tiled_fwd', tiled), ('xla_fwd', xla),
                        ('tiled_grad', tiled_g), ('xla_grad', xla_g)):
            t0 = time.perf_counter()
            r = f(*a)
            _ = float(r[0] if isinstance(r, tuple) else r)
            dt = time.perf_counter() - t0
            out[f'compile_{name}_s'] = round(dt, 2)
            print(f'# compiled {name} in {dt:.1f}s', file=sys.stderr,
                  flush=True)

        fwd = {'tiled': [], 'xla': []}
        grad = {'tiled': [], 'xla': []}
        for r in range(args.rounds):
            fwd['tiled'].append(_timed_unit(tiled, a, args.reps))
            fwd['xla'].append(_timed_unit(xla, a, args.reps))
            grad['tiled'].append(_timed_unit(
                lambda *a: tiled_g(*a)[0], a, args.reps))
            grad['xla'].append(_timed_unit(
                lambda *a: xla_g(*a)[0], a, args.reps))
            print(f'# round {r}: fwd t={fwd["tiled"][-1]:.3f}s '
                  f'x={fwd["xla"][-1]:.3f}s  grad t={grad["tiled"][-1]:.3f}s '
                  f'x={grad["xla"][-1]:.3f}s', file=sys.stderr, flush=True)

        for tag, d in (('fwd', fwd), ('grad', grad)):
            mt = statistics.median(d['tiled'])
            mx = statistics.median(d['xla'])
            out[f'{tag}_tiled_median_s'] = round(mt, 4)
            out[f'{tag}_xla_median_s'] = round(mx, 4)
            out[f'{tag}_evals_per_sec_tiled'] = round(args.reps / mt, 1)
            out[f'{tag}_evals_per_sec_xla'] = round(args.reps / mx, 1)
            out[f'{tag}_speedup_tiled_over_xla'] = round(mx / mt, 3)
        out['ok'] = True
    except Exception as e:
        out.update({'ok': False,
                    'error': f'{type(e).__name__}: {str(e)[:300]}'})
    print(json.dumps(out), flush=True)
    sys.exit(0 if out.get('ok') else 1)


if __name__ == '__main__':
    main()
