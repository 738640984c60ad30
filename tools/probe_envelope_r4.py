"""Dispatch-envelope probe for the Pallas kernels at production scales.

Round-4 discovery: every chip-filling preset beyond the reference model
size (n_filt>=32 w/ q=16, or S=8192) kills the axon remote-compile
helper ("tpu_compile_helper subprocess exit code 1") under the shipped
fused-kernel default. The fused kernels' dispatch thresholds were only
ever measured at the reference envelope (q<=12, S=256, M=100 -
ops/flow_fused.py:166-178); this probe measures where each compute path
actually stops compiling so the dispatch gates can be set from data:

  --mode fused     shipped default (whole-trajectory Pallas kernel)
  --mode perstep   per-step Pallas pathwise kernel (fuse_flow off)
  --mode jnp       pure XLA (use_pallas off) - the fallback the gate
                   must be able to rely on

One config per invocation (per-item TPU lease). Emits one JSON line:
ok=true with a fetch-forced epoch time, or ok=false with the error head.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument('--n_filt', type=int, default=8)
parser.add_argument('--q', type=int, default=6)
parser.add_argument('--S', type=int, default=256)
parser.add_argument('--M', type=int, default=100)
parser.add_argument('--batch', type=int, default=256)
parser.add_argument('--T', type=int, default=16)
parser.add_argument('--iters', type=int, default=2)
parser.add_argument('--mode', type=str, required=True,
                    choices=['fused', 'perstep', 'jnp'])
parser.add_argument('--device', type=str, default='tpu')


def main():
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from vae_gp_ode_tpu.models.odegpvae import init_model
    from vae_gp_ode_tpu.training.trainer import (
        create_train_state, make_train_epoch)
    from vae_gp_ode_tpu.ops import config as ops_config

    out = {'metric': 'envelope_probe', 'mode': args.mode,
           'n_filt': args.n_filt, 'q': args.q, 'S': args.S, 'M': args.M,
           'batch': args.batch, 'T': args.T}
    if args.mode == 'fused':
        ops_config.set_use_pallas(True)
        ops_config.set_fuse_flow(True)
    elif args.mode == 'perstep':
        ops_config.set_use_pallas(True)
        ops_config.set_fuse_flow(False)
    else:
        ops_config.set_use_pallas(False)
        ops_config.set_fuse_flow(False)
    if args.mode in ('fused', 'perstep'):
        # this probe MEASURES the envelope, so the shipped width gates
        # (which route out-of-envelope shapes to XLA) must not silently
        # turn a wide 'fused'/'perstep' row into an XLA measurement
        ops_config.set_ignore_width_gates(True)

    try:
        model, variables, gp = init_model(
            jax.random.PRNGKey(0), latent_dim=args.q, n_filt=args.n_filt,
            order=1, num_features=args.S, num_inducing=args.M,
            batch=args.batch, T=args.T, solver='euler')
        state, tx = create_train_state(model, variables, gp, lr=1e-3)
        epoch = make_train_epoch(model, tx, num_observations=360.0,
                                 eps_guard=True)
        batches = jax.random.uniform(
            jax.random.PRNGKey(3),
            (args.iters, args.batch, args.T, 1, 28, 28))
        batches = (batches - 0.1307) / 0.3081
        t0 = time.perf_counter()
        st, m = epoch(state, batches, jax.random.PRNGKey(4), 1)
        loss = float(m['loss'][-1])
        compile_and_first_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        st, m = epoch(st, batches, jax.random.PRNGKey(5), 1)
        loss = float(m['loss'][-1])
        out.update({'ok': True, 'loss_finite': bool(loss == loss),
                    'compile_and_first_epoch_s':
                        round(compile_and_first_s, 2),
                    'warm_epoch_s': round(time.perf_counter() - t0, 4),
                    'steps_per_sec':
                        round(args.iters / (time.perf_counter() - t0), 2)})
    except Exception as e:
        out.update({'ok': False,
                    'error': f'{type(e).__name__}: {str(e)[:200]}'})
    print(json.dumps(out), flush=True)
    sys.exit(0 if out.get('ok') else 1)


if __name__ == '__main__':
    main()
