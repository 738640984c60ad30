#!/bin/bash
# Round-2 phase 3: closed glyph-pool ablations (--n_glyphs 20).
# CLOSED-SET runs: train/test share a 20-glyph pool, so test sequences
# are replicas of training ones - the resulting MSE is a memorisation/
# fidelity UPPER BOUND (how well the pipeline represents and propagates
# the rotation with appearance generalisation removed), NOT a
# generalisation measure. Quantifies how much of the open-set rows'
# ~0.49 MSE is appearance generalisation vs dynamics/reconstruction.
set -u
cd "$(dirname "$0")/.."
OUT=results/quality_table_r2.jsonl
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

run rbf_glyphpool20 --n_glyphs 20
run rbf_glyphpool20_rotrand --n_glyphs 20 --rotrand_active True

echo "=== phase3 done ===" >&2
