"""Per-variant train-step microbenchmark (supports RESULTS.md's perf
decisions): measures the full jitted train step under each compute-path
configuration on the reference envelope.

Variants:
  xla          - pure XLA (set_use_pallas(False))
  pallas       - Pallas fused per-step eval fwd + hand-written Pallas bwd
  pallas_jnpbwd- Pallas fwd + reference-graph bwd (round-1 default,
                 incl. its default matmul precision), swapped in by
                 re-registering the custom_vjp backward (defvjp)
  fuseflow     - whole-trajectory fused kernel (set_fuse_flow(True))
  pallas_noremat / df - remat off / DF kernel
  df_fused     - DF kernel through the fused whole-trajectory Pallas
                 program (ops.df_flow_fused; round-3 VERDICT #3)
  xla_highest  - pure XLA with jax_default_matmul_precision='highest'
                 (the f32-accuracy-without-Pallas candidate default for
                 the non-fused solver paths; round-3 VERDICT #7)

Usage:
  python bench_variants.py [--L 1 5] [--steps 30] [--reps 5]
      one JSON line per (variant, L) - absolute numbers; remote-TPU
      dispatch drifts +-30% across minutes, so compare only nearby lines.
  python bench_variants.py --ab pallas fuseflow [--rounds 12]
      interleaved pairwise comparison: alternates A/B measurement blocks
      (~50 ms each) so the tunnel drift cancels, and reports the median
      per-round B/A speed ratio - the number to trust for flipping
      defaults (ratio > 1 means B is faster).
"""

import argparse
import json
import statistics
import time

parser = argparse.ArgumentParser()
parser.add_argument('--L', type=int, nargs='*', default=[1, 5])
parser.add_argument('--steps', type=int, default=30)
parser.add_argument('--reps', type=int, default=5)
parser.add_argument('--variants', type=str, nargs='*',
                    default=['xla', 'pallas', 'pallas_jnpbwd', 'fuseflow',
                             'pallas_noremat', 'df'])
parser.add_argument('--ab', type=str, nargs=2, default=None,
                    help='two variant names: interleaved A/B comparison')
parser.add_argument('--rounds', type=int, default=12,
                    help='A/B alternation rounds (ab mode)')
parser.add_argument('--device', type=str, default='tpu')
parser.add_argument('--batch', type=int, default=20)
parser.add_argument('--T', type=int, default=16)
parser.add_argument('--M', type=int, default=100)
parser.add_argument('--S', type=int, default=256)
parser.add_argument('--solver', type=str, default='euler',
                    help='ODE solver for the model under test (the '
                         'fused-flow variants require euler; use '
                         'midpoint/rk4/dopri5 for the non-fused-path '
                         'default decision, VERDICT r2 #7)')
parser.add_argument('--scan', type=eval, default=False,
                    help='measure the step inside a scanned epoch (true '
                         'device speed; the per-step protocol is remote-'
                         'dispatch-bound at ~1 ms/step and masks variant '
                         'differences below that)')

BATCH, T, Q, M, S = 20, 16, 6, 100, 256


def main():
    global BATCH, T, M, S
    args = parser.parse_args()
    BATCH, T, M, S = args.batch, args.T, args.M, args.S
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from vae_gp_ode_tpu.core.settings import enable_compilation_cache
    enable_compilation_cache()
    from vae_gp_ode_tpu.models.odegpvae import init_model
    from vae_gp_ode_tpu.training.trainer import (
        create_train_state, make_train_step, make_train_epoch)
    from vae_gp_ode_tpu.ops import config as ops_config
    from vae_gp_ode_tpu.ops import pathwise

    X = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, T, 1, 28, 28))
    X = (X - 0.1307) / 0.3081
    key = jax.random.PRNGKey(2)

    def apply_variant(name):
        """Set the global compute-path switches for `name`; returns
        (model kwargs, restore callback). Switches matter at TRACE time
        only - once a step is compiled it keeps its path."""
        ops_config.set_use_pallas(None)
        ops_config.set_fuse_flow(False)
        restore = lambda: None                            # noqa: E731
        if name == 'xla':
            ops_config.set_use_pallas(False)
        elif name == 'xla_highest':
            # pure XLA but with f32 matmul accumulation everywhere -
            # the candidate accuracy-without-Pallas default (the config
            # is read at trace time; warm-up compiles under it)
            import jax as _jax
            prev = _jax.config.jax_default_matmul_precision
            _jax.config.update('jax_default_matmul_precision', 'highest')
            ops_config.set_use_pallas(False)
            restore = lambda: _jax.config.update(       # noqa: E731
                'jax_default_matmul_precision', prev)
        elif name == 'pallas_jnpbwd':
            def jnp_bwd(interpret, res, g):
                _, vjp = jax.vjp(pathwise.pathwise_eval_reference, *res)
                return vjp(g)
            pathwise.fused_pathwise_eval.defvjp(pathwise._fwd, jnp_bwd)
            restore = lambda: pathwise.fused_pathwise_eval.defvjp(  # noqa: E731
                pathwise._fwd, pathwise._bwd)
        elif name == 'fuseflow':
            ops_config.set_fuse_flow(True)
        kw = {}
        if name == 'pallas_noremat':
            kw['remat'] = False
        elif name == 'df':
            kw['kernel'] = 'DF'
        elif name == 'df_jnp':
            # DF through the jnp/XLA graph (pre-fused-kernel behaviour)
            ops_config.set_use_pallas(False)
            kw['kernel'] = 'DF'
        elif name == 'df_fused':
            # DF whole-trajectory fused Pallas kernel (round-3)
            ops_config.set_fuse_flow(True)
            kw['kernel'] = 'DF'
        return kw, restore

    def build_runner(name, L):
        """Compile + warm the train step for `name`; returns a zero-arg
        block runner giving steps/sec for one `--steps`-step block."""
        kw, restore = apply_variant(name)
        EPOCH_I, EP_BLOCK = 18, 10
        try:
            model, variables, gp = init_model(
                jax.random.PRNGKey(0), latent_dim=Q, n_filt=8, order=1,
                num_features=S, num_inducing=M, batch=BATCH, T=T,
                solver=args.solver, remat=kw.get('remat', True),
                kernel=kw.get('kernel', 'RBF'))
            state0, tx = create_train_state(model, variables, gp, lr=1e-3)
            if args.scan:
                epoch = make_train_epoch(model, tx, 360.0, True)
                batches = jax.random.uniform(
                    jax.random.PRNGKey(9),
                    (EPOCH_I, BATCH, T, 1, 28, 28))
                batches = (batches - 0.1307) / 0.3081
                state = state0
                for i in range(2):
                    state, m = epoch(state, batches,
                                     jax.random.fold_in(key, i), L)
                    float(m['loss'][-1])
            else:
                step = make_train_step(model, tx, num_observations=360.0,
                                       eps_guard=True)
                state = state0
                for i in range(3):
                    state, m = step(state, X, jax.random.fold_in(key, i),
                                    L)
                float(m['loss'])      # fetch: block_until_ready lies here
        finally:
            restore()
            ops_config.set_use_pallas(None)
            ops_config.set_fuse_flow(False)

        box = {'state': state}

        if args.scan:
            def run_block():
                # fetch-forced: a value fetch per epoch proves completion
                # (block_until_ready can return early over the tunnel)
                st = box['state']
                t0 = time.perf_counter()
                for e in range(EP_BLOCK):
                    st, m = epoch(st, batches,
                                  jax.random.fold_in(key, 99 + e), L)
                    float(m['loss'][-1])
                dt = time.perf_counter() - t0
                box['state'] = st
                return EPOCH_I * EP_BLOCK / dt

            return run_block

        def run_block():
            # fetch-forced (the per-step-FETCH protocol, like bench.py's
            # per-step phase): the chain is serialised by the state
            # dependence, so one final value fetch proves the whole
            # block completed - block_until_ready returns early here
            st = box['state']
            t0 = time.perf_counter()
            for i in range(args.steps):
                st, m = step(st, X, jax.random.fold_in(key, 99 + i), L)
            float(m['loss'])
            dt = time.perf_counter() - t0
            box['state'] = st
            return args.steps / dt

        return run_block

    # full measurement config in every output line, so a results row is
    # interpretable without reading the launching script (VERDICT r3 #7)
    cfg = {'solver': args.solver, 'batch': BATCH, 'T': T, 'M': M, 'S': S,
           'scan': bool(args.scan), 'rounds': args.rounds}

    if args.ab:
        a, b = args.ab
        for L in args.L:
            ra = build_runner(a, L)
            rb = build_runner(b, L)
            ra(), rb()                                    # touch both
            ratios, a_sps, b_sps = [], [], []
            for _ in range(args.rounds):
                sa = ra()
                sb = rb()
                ratios.append(sb / sa)
                a_sps.append(sa)
                b_sps.append(sb)
            ratios.sort()
            n = len(ratios)
            print(json.dumps({
                'ab': [a, b], 'L': L,
                'median_ratio_b_over_a': round(
                    statistics.median(ratios), 4),
                'ratio_range': [round(min(ratios), 3),
                                round(max(ratios), 3)],
                # central 80% of per-round ratios: the decision interval
                # (the full range is dominated by single tunnel hiccups)
                'ratio_iqr80': [round(ratios[n // 10], 3),
                                round(ratios[n - 1 - n // 10], 3)],
                f'{a}_best_sps': round(max(a_sps), 1),
                f'{b}_best_sps': round(max(b_sps), 1),
                'config': cfg}), flush=True)
        return

    for name in args.variants:
        for L in args.L:
            run_block = build_runner(name, L)
            best = 0.0
            for r in range(args.reps):
                best = max(best, run_block())
            print(json.dumps({
                'variant': name, 'L': L,
                'steps_per_sec': round(best, 2),
                'us_per_step': round(1e6 / best, 1),
                'config': cfg}), flush=True)


if __name__ == '__main__':
    main()
