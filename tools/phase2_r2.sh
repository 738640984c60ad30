#!/bin/bash
# Round-2 phase 2: two more quality-table rows for BASELINE.md parity.
#   - pretrained_rbf: VAE pretrain (main_vae) -> frozen-VAE coupled
#     training (BASELINE.md row 1 config: Pretrained-VAE + GP-ODE, RBF)
#   - df_retrain: fresh 5000-epoch DF run under current round-2 code
#     (the table's df_5000ep_ckpt row reuses the round-1 checkpoint)
# Appends to results/quality_table_r2.jsonl. Sequential on the one chip.
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

echo "=== VAE pretraining ===" >&2
timeout 3600 python main_vae.py --save data/moving_mnist \
    --output_path results/vae_pretrain \
    > results/vae_pretrain.log 2>&1
echo "=== VAE pretraining done rc=$? ===" >&2
# main_vae appends a timestamp to output_path; weights land in MNIST-VAE/
vdir=$(ls -dt results/vae_pretrain*/ 2>/dev/null | head -1)
echo "=== pretrained VAE weights: ${vdir}MNIST-VAE" >&2

run pretrained_rbf --pretrained True --vae_path "${vdir}MNIST-VAE"
run df_retrain --kernel DF

echo "=== phase2 done ===" >&2
cat "$OUT"
