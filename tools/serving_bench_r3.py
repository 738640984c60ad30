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


def _timed(fn, reps):
    # fetch-forced timing: a scalar fetch per rep proves completion over
    # the axon tunnel (block_until_ready lies there, CLAUDE.md)
    t0 = time.perf_counter()
    for r in range(reps):
        float(jnp.sum(fn(X, jnp.int32(r))))
    return reps * args.batch / (time.perf_counter() - t0)


# INTERLEAVED protocol (same rationale as bench_variants.py --ab): the
# tunnel drifts ~±30% run-to-run, and a phase of per-call dispatches can
# degrade programs launched AFTER it in the same process (CLAUDE.md) -
# so both programs are compiled/launched up-front and each best-of round
# times live then served back-to-back; the ratio is the median of
# per-round ratios, which cancels both effects.
served_call = None
if exported is not None:
    try:
        float(jnp.sum(exported.call(X, jnp.int32(0))))  # compile + launch
        served_call = exported.call
    except Exception as e:  # noqa: BLE001
        export_error = f'call: {type(e).__name__}: {e}'
float(jnp.sum(live(X, jnp.int32(0))))                   # compile + launch

live_best, served_best, ratios = 0.0, 0.0, []
for trial in range(args.best_of):
    lt = _timed(live, args.reps)
    live_best = max(live_best, lt)
    if served_call is not None:
        st = _timed(served_call, args.reps)
        served_best = max(served_best, st)
        ratios.append(st / lt)

out = {
    'metric': 'serving_fwd_seqs_per_sec',
    'live_seqs_per_sec': round(live_best, 2),
    'batch': args.batch, 'L': args.L, 'T': ta.T,
    'backend': jax.default_backend(),
}
if served_call is not None:
    ratios.sort()
    out.update(served_seqs_per_sec=round(served_best, 2),
               ratio=round(ratios[len(ratios) // 2], 4),
               ratio_range=[round(ratios[0], 4), round(ratios[-1], 4)],
               artifact_bytes=nbytes,
               platforms=list(exported.platforms))
else:
    out['export_error'] = export_error
print(json.dumps(out))
