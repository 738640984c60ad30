"""Batch-scaling measurement under SHIPPED defaults (VERDICT r2 #1).

Round 2's batch table was measured before the fuse_flow default flip and
became unreachable when the untiled fused kernel failed to compile at
batch >= 1280. Round 3 grid-tiles the fused kernel; this tool re-measures
the scanned-epoch throughput at each batch size with whatever the
shipped defaults dispatch to (no config overrides), fetch-forced like
bench.py.

Run on the TPU: python tools/batch_scaling_r3.py
One JSON line per batch size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

Q, M, S, T = 6, 100, 256, 16

# (batch, iters_per_epoch, epochs_per_block, reps): blocks sized so each
# measurement is ~1-3 s of wall clock (tunnel jitter amortised) without
# letting the big batches run for minutes.
CASES = [
    (20, 18, 20, 5),
    (80, 18, 10, 5),
    (320, 10, 6, 4),
    (1280, 5, 4, 3),
    (5120, 2, 3, 3),
]


def measure(batch, iters, epochs, reps):
    from vae_gp_ode_tpu.models.odegpvae import init_model
    from vae_gp_ode_tpu.training.trainer import (
        create_train_state, make_train_epoch)

    model, variables, gp = init_model(
        jax.random.PRNGKey(0), latent_dim=Q, n_filt=8, order=1,
        num_features=S, num_inducing=M, batch=batch, T=T, solver='euler')
    state, tx = create_train_state(model, variables, gp, lr=1e-3)
    train_epoch = make_train_epoch(model, tx, num_observations=360.0,
                                   eps_guard=True)
    batches = jax.random.uniform(
        jax.random.PRNGKey(3), (iters, batch, T, 1, 28, 28))
    batches = (batches - 0.1307) / 0.3081
    key = jax.random.PRNGKey(4)

    st, metrics = train_epoch(state, batches, key, 1)   # compile + warm
    float(metrics['loss'][-1])
    best = 0.0
    for r in range(reps):
        st = state
        t0 = time.perf_counter()
        for e in range(epochs):
            st, metrics = train_epoch(st, batches,
                                      jax.random.fold_in(key, e), 1)
            float(metrics['loss'][-1])     # fetch-forced completion proof
        dt = time.perf_counter() - t0
        best = max(best, iters * epochs / dt)
    return best


def main():
    failures = 0
    for batch, iters, epochs, reps in CASES:
        try:
            sps = measure(batch, iters, epochs, reps)
            print(json.dumps({
                'batch': batch, 'steps_per_sec': round(sps, 1),
                'ms_per_step': round(1e3 / sps, 2),
                'train_seqs_per_sec': round(sps * batch, 0),
                'defaults': 'shipped (fuse_flow on, grid-tiled)'}),
                flush=True)
        except Exception as e:  # noqa: BLE001 - report, keep probing
            print(json.dumps({'batch': batch, 'error':
                              f'{type(e).__name__}: {str(e)[:200]}'}),
                  flush=True)
            failures += 1
    raise SystemExit(1 if failures else 0)


if __name__ == '__main__':
    main()
