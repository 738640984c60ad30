#!/bin/bash
# Round-3 VERDICT #4 diagnostic sweep: why does the 2nd-order model trail
# the 1st-order by 8x excess MSE (GP signal variance collapses to ~1e-5)?
# One hypothesis per run; all else is the reference ode2 config
# (q=3, D_in=6, D_out=3, frames=5). Sequential on the one TPU chip.
set -u
cd "$(dirname "$0")/.."
mkdir -p results
OUT=results/ode2_sweep_r3.jsonl
: > "$OUT"

COMMON="--Nepoch 5000 --plot_freq 1000 --log_freq 10000 --ode 2"

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

# seed robustness: is the collapse an unlucky seed?
run ode2_seed7_r3 --latent_dim 3 --D_in 6 --D_out 3 --seed 7
# capacity: 2q=12-dim latent state mirroring the 1st-order q=6 runs
run ode2_q6_r3 --latent_dim 6 --D_in 12 --D_out 6
# velocity window: 3-frame stack instead of 5
run ode2_frames3_r3 --latent_dim 3 --D_in 6 --D_out 3 --frames 3
# integration accuracy: euler dt halved (T grid unchanged; dense=2)
run ode2_dense2_r3 --latent_dim 3 --D_in 6 --D_out 3 --ts_dense_scale 2

echo "=== sweep done" >&2
cat "$OUT"
