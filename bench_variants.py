"""Per-variant train-step microbenchmark (supports RESULTS.md's perf
decisions): measures the full jitted train step under each compute-path
configuration on the reference envelope.

Variants:
  xla          - pure XLA (set_use_pallas(False))
  pallas       - Pallas fused per-step eval fwd + hand-written Pallas bwd
  pallas_jnpbwd- Pallas fwd + reference-graph bwd (round-1 default),
                 selected via ops.pathwise fallback threshold monkeypatch
  fuseflow     - whole-trajectory fused kernel (set_fuse_flow(True))

Usage: python bench_variants.py [--L 1 5] [--steps 30] [--reps 5]
Prints one JSON line per (variant, L).
"""

import argparse
import json
import time

parser = argparse.ArgumentParser()
parser.add_argument('--L', type=int, nargs='*', default=[1, 5])
parser.add_argument('--steps', type=int, default=30)
parser.add_argument('--reps', type=int, default=5)
parser.add_argument('--variants', type=str, nargs='*',
                    default=['xla', 'pallas', 'pallas_jnpbwd', 'fuseflow',
                             'pallas_noremat', 'df'])
parser.add_argument('--device', type=str, default='tpu')
parser.add_argument('--batch', type=int, default=20)
parser.add_argument('--T', type=int, default=16)
parser.add_argument('--M', type=int, default=100)
parser.add_argument('--S', type=int, default=256)

BATCH, T, Q, M, S = 20, 16, 6, 100, 256


def main():
    global BATCH, T, M, S
    args = parser.parse_args()
    BATCH, T, M, S = args.batch, args.T, args.M, args.S
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from vae_gp_ode_tpu.models.odegpvae import init_model
    from vae_gp_ode_tpu.training.trainer import (
        create_train_state, make_train_step)
    from vae_gp_ode_tpu.ops import config as ops_config
    from vae_gp_ode_tpu.ops import pathwise

    X = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, T, 1, 28, 28))
    X = (X - 0.1307) / 0.3081
    key = jax.random.PRNGKey(2)

    def measure(L, remat=True, kernel='RBF'):
        model, variables, gp = init_model(
            jax.random.PRNGKey(0), latent_dim=Q, n_filt=8, order=1,
            num_features=S, num_inducing=M, batch=BATCH, T=T,
            solver='euler', remat=remat, kernel=kernel)
        state, tx = create_train_state(model, variables, gp, lr=1e-3)
        step = make_train_step(model, tx, num_observations=360.0,
                               eps_guard=True)
        for i in range(3):
            state, m = step(state, X, jax.random.fold_in(key, i), L)
        jax.block_until_ready(m['loss'])
        best = 0.0
        for r in range(args.reps):
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, m = step(state, X, jax.random.fold_in(key, 99 + i),
                                L)
            jax.block_until_ready(m['loss'])
            best = max(best, args.steps / (time.perf_counter() - t0))
        return best

    for name in args.variants:
        ops_config.set_use_pallas(None)
        ops_config.set_fuse_flow(False)
        orig_bwd = None
        if name == 'xla':
            ops_config.set_use_pallas(False)
        elif name == 'pallas_jnpbwd':
            # route backward through the jnp reference graph (the round-1
            # behaviour) by forcing the large-N fallback branch
            orig_bwd = pathwise._bwd

            def jnp_bwd(interpret, res, g):
                _, vjp = jax.vjp(pathwise.pathwise_eval_reference, *res)
                return vjp(g)
            pathwise.fused_pathwise_eval.defvjp(pathwise._fwd, jnp_bwd)
        elif name == 'fuseflow':
            ops_config.set_fuse_flow(True)
        try:
            for L in args.L:
                kw = {}
                if name == 'pallas_noremat':
                    kw['remat'] = False
                elif name == 'df':
                    kw['kernel'] = 'DF'
                sps = measure(L, **kw)
                print(json.dumps({
                    'variant': name, 'L': L,
                    'steps_per_sec': round(sps, 2),
                    'us_per_step': round(1e6 / sps, 1)}), flush=True)
        finally:
            if orig_bwd is not None:
                pathwise.fused_pathwise_eval.defvjp(pathwise._fwd,
                                                    orig_bwd)
            ops_config.set_use_pallas(None)
            ops_config.set_fuse_flow(False)


if __name__ == '__main__':
    main()
