#!/bin/bash
# Re-run the RESULTS.md training-quality table (round 2): the eval
# protocol changed to the reference notebook's per-MC-sample squared
# error (VERDICT round 1, item 2), so every row is retrained/re-evaluated
# under the corrected metric. Runs sequentially on the one TPU chip.
set -u
cd "$(dirname "$0")/.."
mkdir -p results
OUT=results/quality_table_r2.jsonl
: > "$OUT"

COMMON="--Nepoch 5000 --plot_freq 1000 --log_freq 10000"

run () {
  name=$1; shift
  echo "=== training $name: $*" >&2
  timeout 9000 python main.py $COMMON --save "results/$name" "$@" \
      > "results/${name}_train.log" 2>&1
  rc=$?
  rundir=$(ls -dt results/${name}_*/ 2>/dev/null | head -1)
  echo "=== training $name done rc=$rc dir=$rundir" >&2
  if [ -n "$rundir" ]; then
    timeout 1200 python evaluate.py --model_path "$rundir" --L 5 \
        2> "results/${name}_eval.log" | tail -1 \
        | sed "s/^{/{\"config\": \"$name\", /" >> "$OUT"
  fi
}

run rbf_default
run ode2_rbf_q3 --ode 2 --latent_dim 3 --D_in 6 --D_out 3
run rbf_rotrand --rotrand_active True
run rbf_seed7 --seed 7

# DF row: re-evaluate the shipped 5000-epoch checkpoint under the
# corrected metric (no retrain needed - the metric changed, not training)
timeout 1200 python evaluate.py --model_path checkpoints/df_5000ep --L 5 \
    2> results/df_eval.log | tail -1 \
    | sed 's/^{/{"config": "df_5000ep_ckpt", /' >> "$OUT"

echo "=== all done" >&2
cat "$OUT"
