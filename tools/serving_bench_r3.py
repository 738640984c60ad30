"""Serving-path benchmark: AOT exported artifact vs live jitted model.

Exports the shipped DF checkpoint (checkpoints/df_5000ep) as a
jax.export artifact and times forward-only inference for both the
artifact (Exported.call) and the live jitted model at the same batch,
fetch-forced per call (block_until_ready lies over the axon tunnel,
CLAUDE.md). Prints one JSON line:

  {"live_seqs_per_sec": ..., "served_seqs_per_sec": ..., "ratio": ...,
   "batch": N, "L": L, "artifact_bytes": ...}

Run on the TPU (no --device flag) once the chip answers; CPU works for
a dry run (--device cpu).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

p = argparse.ArgumentParser()
p.add_argument('--model_path', default=os.path.join(REPO, 'checkpoints',
                                                    'df_5000ep'))
p.add_argument('--batch', type=int, default=40)
p.add_argument('--L', type=int, default=1)
p.add_argument('--reps', type=int, default=30)
p.add_argument('--best_of', type=int, default=5)
p.add_argument('--device', default=None)
args = p.parse_args()

if args.device:
    import jax
    jax.config.update('jax_platforms', args.device)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vae_gp_ode_tpu import serving  # noqa: E402

model, state, ta = serving.load_run_dir(args.model_path)
variables = {'params': state.vae_params, 'batch_stats': state.batch_stats}

live = jax.jit(serving.make_forecast_fn(model, variables, state.gp,
                                        L=args.L))
# the axon tunnel backend may register under a platform name jax.export
# does not lower for; try native first, then an explicit tpu lowering,
# and still report the live half if both fail
exported, nbytes, export_error = None, 0, None
for plats in (None, ('tpu',)):
    try:
        exported = serving.export_forecaster(
            model, variables, state.gp, T=ta.T, batch=args.batch,
            L=args.L, platforms=plats)
        nbytes = len(exported.serialize())
        break
    except Exception as e:  # noqa: BLE001 - diagnostic bench, keep going
        export_error = f'{type(e).__name__}: {e}'
        exported = None

X = jax.random.uniform(jax.random.PRNGKey(0),
                       (args.batch, ta.T, 1, 28, 28), jnp.float32)


def measure(fn):
    # warm up + compile, then fetch-forced timing (a scalar fetch per
    # rep proves completion over the axon tunnel)
    float(jnp.sum(fn(X, jnp.int32(0))))
    best = 0.0
    for trial in range(args.best_of):
        t0 = time.perf_counter()
        acc = 0.0
        for r in range(args.reps):
            acc += float(jnp.sum(fn(X, jnp.int32(r))))
        dt = time.perf_counter() - t0
        best = max(best, args.reps * args.batch / dt)
    return best


live_tp = measure(live)
out = {
    'metric': 'serving_fwd_seqs_per_sec',
    'live_seqs_per_sec': round(live_tp, 2),
    'batch': args.batch, 'L': args.L, 'T': ta.T,
    'backend': jax.default_backend(),
}
if exported is not None:
    try:
        served_tp = measure(exported.call)
        out.update(served_seqs_per_sec=round(served_tp, 2),
                   ratio=round(served_tp / live_tp, 4),
                   artifact_bytes=nbytes,
                   platforms=list(exported.platforms))
    except Exception as e:  # noqa: BLE001
        out['export_error'] = f'call: {type(e).__name__}: {e}'
else:
    out['export_error'] = export_error
print(json.dumps(out))
