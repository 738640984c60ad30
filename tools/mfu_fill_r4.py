"""Chip-filling MFU measurement (VERDICT r3 #6).

The reference envelope (batch 20, n_filt 8, q 6, S 256) is tiny: at
saturation batch 5120 the train step reaches ~12.7 TFLOP/s of model
compute, ~6.4% of v5e bf16 peak (197 TFLOP/s). This tool measures what
configurations actually fill the chip, one configuration per invocation
(so the TPU-lease protocol stays per-item):

  --preset reference     the envelope row, for continuity
  --preset saturation    batch 5120 at reference model size
  --preset seeds4        batched multi-model training: K=4 models (vmap
                         over init seeds - the quality-table seed sweep
                         as ONE dispatch), batch 1280 each
  --preset capacity32 / capacity64 / capacity128
                         higher-capacity VAE (--n_filt is a reference
                         CLI flag; conv channels x4/x8/x16, q=16) - the
                         production model-scaling use case
  --preset large_s       S=8192 RFF features (tighter decoupled-sampling
                         prior approximation), batch 1280

or explicit --n_filt/--q/--S/--M/--batch/--seeds/--L.

Timing: fetch-forced scanned-epoch protocol (the only sound one over the
axon tunnel - see bench.py); FLOPs from XLA HLO cost analysis of the
unoptimised epoch lowering (counts the scan body once = one step; the
vmapped-seeds lowering counts all K models). Emits one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument('--preset', type=str, default=None)
parser.add_argument('--n_filt', type=int, default=8)
parser.add_argument('--q', type=int, default=6)
parser.add_argument('--S', type=int, default=256)
parser.add_argument('--M', type=int, default=100)
parser.add_argument('--batch', type=int, default=20)
parser.add_argument('--T', type=int, default=16)
parser.add_argument('--L', type=int, default=1)
parser.add_argument('--seeds', type=int, default=1,
                    help='K>1: vmap the train step over K model seeds')
parser.add_argument('--iters', type=int, default=6,
                    help='scan length (batches per epoch dispatch)')
parser.add_argument('--reps', type=int, default=3)
parser.add_argument('--device', type=str, default='tpu')
parser.add_argument('--use_case', type=str, default=None)
parser.add_argument('--flops_only', action='store_true',
                    help='print {"model_flops_per_step": N} and exit. '
                         'Run with --device cpu: the axon PJRT client '
                         'returns None from cost_analysis (for tpu- AND '
                         'cpu-lowered modules alike, measured round 4), '
                         'so the TPU run shells out to this mode.')

PRESETS = {
    'reference': dict(batch=20, iters=18,
                      use_case='reference training envelope'),
    'saturation': dict(batch=5120, iters=4,
                       use_case='single-model batch saturation'),
    'seeds4': dict(batch=1280, seeds=4, iters=4,
                   use_case='multi-seed quality sweep in one dispatch'),
    'capacity32': dict(n_filt=32, q=16, batch=1280, iters=4,
                       use_case='higher-capacity VAE (production scaling)'),
    'capacity64': dict(n_filt=64, q=16, batch=1280, iters=3,
                       use_case='higher-capacity VAE (production scaling)'),
    'capacity128': dict(n_filt=128, q=16, batch=640, iters=3,
                        use_case='higher-capacity VAE (production scaling)'),
    'large_s': dict(S=8192, batch=1280, iters=4,
                    use_case='tighter RFF prior approximation (large S)'),
}

V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    args = parser.parse_args()
    if args.preset:
        for k, v in PRESETS[args.preset].items():
            setattr(args, k, v)
    import jax
    import jax.numpy as jnp
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from vae_gp_ode_tpu.models.odegpvae import init_model
    from vae_gp_ode_tpu.training.trainer import (
        create_train_state, make_train_epoch)
    from vae_gp_ode_tpu.training.trainer import _make_step_fn, _make_epoch_fn
    from vae_gp_ode_tpu.ops import config as ops_config

    if args.flops_only:
        # jnp-path lowering on the CPU backend, abstract batch shapes
        # (never materialise a (iters, 5120, 16, 1, 28, 28) host array);
        # model init at batch=2 - parameters are batch-independent
        assert jax.default_backend() == 'cpu', \
            'run --flops_only with --device cpu'
        model, variables, gp = init_model(
            jax.random.PRNGKey(0), latent_dim=args.q, n_filt=args.n_filt,
            order=1, num_features=args.S, num_inducing=args.M, batch=2,
            T=args.T, solver='euler')
        state, tx = create_train_state(model, variables, gp, lr=1e-3)
        b_sds = jax.ShapeDtypeStruct(
            (args.iters, args.batch, args.T, 1, 28, 28), jnp.float32)
        key = jax.random.PRNGKey(4)
        with ops_config.forced_jnp():
            if args.seeds > 1:
                state_v = jax.tree.map(
                    lambda a: jnp.stack([jnp.asarray(a)] * args.seeds),
                    state)
                epoch_v = jax.jit(jax.vmap(
                    lambda st, bs, k: _make_epoch_fn(_make_step_fn(
                        model, tx, 360.0, True))(st, bs, k, args.L),
                    in_axes=(0, None, 0)))
                lowered = epoch_v.lower(
                    state_v, b_sds, jax.random.split(key, args.seeds))
            else:
                epoch = make_train_epoch(model, tx, num_observations=360.0,
                                         eps_guard=True)
                lowered = epoch.lower(state, b_sds, key, args.L)
        cost = lowered.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        print(json.dumps({'model_flops_per_step': float(cost['flops'])}))
        return

    cfg = {'preset': args.preset, 'n_filt': args.n_filt, 'q': args.q,
           'S': args.S, 'M': args.M, 'batch': args.batch, 'T': args.T,
           'L': args.L, 'seeds': args.seeds, 'iters_per_epoch': args.iters,
           'use_case': args.use_case}
    out = {'metric': 'mfu_fill', **cfg}

    try:
        mk = lambda key: init_model(                       # noqa: E731
            key, latent_dim=args.q, n_filt=args.n_filt, order=1,
            num_features=args.S, num_inducing=args.M, batch=args.batch,
            T=args.T, solver='euler')
        model, variables, gp = mk(jax.random.PRNGKey(0))
        state, tx = create_train_state(model, variables, gp, lr=1e-3)

        batches = jax.random.uniform(
            jax.random.PRNGKey(3),
            (args.iters, args.batch, args.T, 1, 28, 28))
        batches = (batches - 0.1307) / 0.3081
        key = jax.random.PRNGKey(4)
        L = args.L

        if args.seeds > 1:
            # batched multi-model training: stack K independently
            # initialised train states, vmap the epoch over them (shared
            # data, per-model PRNG streams) - the quality-table seed
            # sweep as one dispatch
            states = [state]
            for i in range(1, args.seeds):
                _, v_i, g_i = mk(jax.random.PRNGKey(i))
                states.append(create_train_state(model, v_i, g_i,
                                                 lr=1e-3)[0])
            state_v = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
            epoch_raw = _make_epoch_fn(_make_step_fn(
                model, tx, 360.0, True))
            epoch_v = jax.jit(jax.vmap(
                lambda st, bs, k: epoch_raw(st, bs, k, L),
                in_axes=(0, None, 0)))
            keys0 = jax.random.split(key, args.seeds)

            def dispatch(st, i):
                ks = jax.vmap(jax.random.fold_in, (0, None))(keys0, i)
                st, m = epoch_v(st, batches, ks)
                return st, m

            st, m = dispatch(state_v, 0)
            float(m['loss'][0][-1])
            fetch = lambda m: float(m['loss'][0][-1])       # noqa: E731
            run_state = state_v
        else:
            epoch = make_train_epoch(model, tx, num_observations=360.0,
                                     eps_guard=True)

            def dispatch(st, i):
                st, m = epoch(st, batches, jax.random.fold_in(key, i), L)
                return st, m

            st, m = dispatch(state, 0)
            float(m['loss'][-1])
            fetch = lambda m: float(m['loss'][-1])          # noqa: E731
            run_state = state

        # flops of ONE step (scan body counted once; x K models when
        # vmapped), from XLA HLO cost analysis of the jnp-path lowering
        # in a CPU subprocess (--flops_only): the axon PJRT client
        # returns None from cost_analysis for tpu- AND cpu-lowered
        # modules alike, and pallas custom calls would count as zero
        # flops anyway.
        # config-keyed cache: the CPU lowering takes minutes on this
        # 1-CPU host and runs INSIDE the lease window (bench.py invokes
        # this tool per run since round 5); the count is a pure function
        # of the shape config
        flops_key = json.dumps(
            [args.n_filt, args.q, args.S, args.M, args.batch, args.T, L,
             args.seeds, args.iters])
        flops_cache_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            '.mfu_flops_cache.json')
        cache = {}
        if os.path.exists(flops_cache_path):
            try:
                with open(flops_cache_path) as f:
                    cache = json.load(f)
            except (OSError, ValueError):
                cache = {}
        flops_per_step = cache.get(flops_key)
        if flops_per_step is None:
            import subprocess
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), '--flops_only',
                 '--device', 'cpu', '--n_filt', str(args.n_filt),
                 '--q', str(args.q), '--S', str(args.S), '--M', str(args.M),
                 '--batch', str(args.batch), '--T', str(args.T),
                 '--L', str(L), '--seeds', str(args.seeds),
                 '--iters', str(args.iters)],
                capture_output=True, text=True, timeout=1800)
            assert r.returncode == 0, r.stderr[-500:]
            flops_per_step = float(json.loads(
                r.stdout.strip().splitlines()[-1])['model_flops_per_step'])
            cache[flops_key] = flops_per_step
            with open(flops_cache_path, 'w') as f:
                json.dump(cache, f)

        # adaptive block size: one warm dispatch to gauge epoch time,
        # then blocks of ~2-8 s (fetch-forced, best-of-reps)
        t0 = time.perf_counter()
        st, m = dispatch(run_state, 1)
        fetch(m)
        ep_s = time.perf_counter() - t0
        block = max(1, min(20, int(4.0 / max(ep_s, 1e-3))))

        best = 0.0
        for r in range(args.reps):
            st = run_state
            t0 = time.perf_counter()
            for e in range(block):
                st, m = dispatch(st, 10 + r * block + e)
                fetch(m)
            dt = time.perf_counter() - t0
            best = max(best, args.iters * block / dt)

        tflops = flops_per_step * best / 1e12
        out.update({
            'steps_per_sec': round(best, 3),
            'seqs_per_sec': round(best * args.batch * args.seeds, 1),
            'model_flops_per_step': flops_per_step,
            'achieved_model_tflops_per_sec': round(tflops, 3),
            'v5e_bf16_peak_tflops': V5E_BF16_PEAK_TFLOPS,
            'mfu_vs_bf16_peak_pct': round(
                tflops / V5E_BF16_PEAK_TFLOPS * 100, 3),
            'epochs_per_block': block,
        })
    except Exception as e:
        out['error'] = f'{type(e).__name__}: {str(e)[:300]}'
        print(json.dumps(out), flush=True)
        sys.exit(1)
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
