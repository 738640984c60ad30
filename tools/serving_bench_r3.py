"""Serving-path benchmark: AOT exported artifact vs live jitted model.

Exports the shipped DF checkpoint (checkpoints/df_5000ep) as a
jax.export artifact and times forward-only inference for both the
artifact (Exported.call) and the live jitted model at the same batch,
fetch-forced per call (block_until_ready lies over the axon tunnel,
CLAUDE.md). Prints one JSON line:

  {"live_seqs_per_sec": ..., "served_seqs_per_sec": ..., "ratio": ...,
   "batch": N, "L": L, "artifact_bytes": ...}

Also exports + times the bf16 artifact (half-precision encoder/decoder
compute, f32 dynamics/outputs) in the same interleaved rounds:
"served_bf16_seqs_per_sec", "bf16_vs_f32_ratio" (median per-round),
and "bf16_max_abs_diff" vs the f32 artifact on one batch — plus
in-distribution quality: "mse_f32"/"mse_bf16" score each artifact's
reconstruction against the test pixels (the published MSE protocol's
quantity). On the TPU the two should tie (~0.0326 vs 0.0328 in the
MXU-semantics CPU simulation); a bf16 MSE near 0.041 would mean the
backend accumulated bf16 convs in bf16 (the CPU failure mode) and the
bf16 artifact should not be served from that backend.

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
def _try_export(dtype):
    err = None
    for plats in (None, ('tpu',)):
        try:
            exp = serving.export_forecaster(
                model, variables, state.gp, T=ta.T, batch=args.batch,
                L=args.L, platforms=plats, dtype=dtype)
            return exp, len(exp.serialize()), None
        except Exception as e:  # noqa: BLE001 - diagnostic bench, keep going
            err = f'{type(e).__name__}: {e}'
    return None, 0, err


exported, nbytes, export_error = _try_export('f32')
exported_bf16, nbytes_bf16, export_error_bf16 = _try_export('bf16')

from vae_gp_ode_tpu.data.mnist import (  # noqa: E402
    MNIST_MEAN, MNIST_STD, load_data)

# in-distribution inputs (normalised test sequences) so the quality
# numbers below mean something; padded/truncated to the bench batch
_, _testset = load_data(ta)
_Xd = jnp.asarray(_testset.first())
reps_needed = -(-args.batch // _Xd.shape[0])
X = jnp.concatenate([_Xd] * reps_needed, axis=0)[:args.batch]
Xpix = X * MNIST_STD + MNIST_MEAN


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
served_call, bf16_call, bf16_diff = None, None, None
if exported is not None:
    try:
        float(jnp.sum(exported.call(X, jnp.int32(0))))  # compile + launch
        served_call = exported.call
    except Exception as e:  # noqa: BLE001
        export_error = f'call: {type(e).__name__}: {e}'
if exported_bf16 is not None:
    try:
        yb = exported_bf16.call(X, jnp.int32(0))        # compile + launch
        float(jnp.sum(yb))
        bf16_call = exported_bf16.call
        if served_call is not None:
            bf16_diff = float(jnp.max(jnp.abs(
                yb - exported.call(X, jnp.int32(0)))))
    except Exception as e:  # noqa: BLE001
        export_error_bf16 = f'call: {type(e).__name__}: {e}'
float(jnp.sum(live(X, jnp.int32(0))))                   # compile + launch

live_best, served_best, bf16_best = 0.0, 0.0, 0.0
ratios, bf16_ratios = [], []
for trial in range(args.best_of):
    lt = _timed(live, args.reps)
    live_best = max(live_best, lt)
    if served_call is not None:
        st = _timed(served_call, args.reps)
        served_best = max(served_best, st)
        ratios.append(st / lt)
    if bf16_call is not None:
        bt = _timed(bf16_call, args.reps)
        bf16_best = max(bf16_best, bt)
        if served_call is not None:
            bf16_ratios.append(bt / st)

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
def _mse(call):
    # mean over 2 seeds of the published-protocol quantity: MSE between
    # the reconstruction and the [0,1] test pixels (evaluate.py scores
    # the MC-mean; L=1 here keeps it cheap - relative f32-vs-bf16 is
    # what this row is for)
    vals = [float(jnp.mean((call(X, jnp.int32(s)) - Xpix) ** 2))
            for s in (0, 1)]
    return round(sum(vals) / len(vals), 6)


if served_call is not None:
    out['mse_f32'] = _mse(served_call)
if bf16_call is not None:
    out['mse_bf16'] = _mse(bf16_call)
if bf16_call is not None:
    bf16_ratios.sort()
    out.update(served_bf16_seqs_per_sec=round(bf16_best, 2),
               artifact_bytes_bf16=nbytes_bf16)
    if bf16_ratios:
        out['bf16_vs_f32_ratio'] = round(
            bf16_ratios[len(bf16_ratios) // 2], 4)
    if bf16_diff is not None:
        out['bf16_max_abs_diff'] = round(bf16_diff, 6)
elif export_error_bf16 is not None:
    out['export_error_bf16'] = export_error_bf16
print(json.dumps(out))
