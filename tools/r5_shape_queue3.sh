#!/bin/bash
# Round-5 session-4: probe the S=2048/q=6 corners the width-product
# tiled gates ALREADY ADMIT (rbf 6*2148=12888 <= 13488, df 6*4196=25176
# <= 25776) but which no hardware row covers - close the admitted-but-
# unprobed hole, or discover the gate needs narrowing. Per-item lease.
set -u
cd "$(dirname "$0")/.."
LOG=results/r5_queue3.log
echo "=== r5 queue3 start $(date) HEAD=$(git rev-parse --short HEAD) ===" >>$LOG

timeout 1800 tools/tpu_lease.sh python tools/probe_kernel_shapes_r5.py \
  --kernel rbf_tiled --q 6 --S 2048 >> results/kernel_shapes_r5.jsonl 2>>$LOG
echo "rbf_tiled q6 S2048 exit=$?" >>$LOG

timeout 1800 tools/tpu_lease.sh python tools/probe_kernel_shapes_r5.py \
  --kernel df_tiled --q 6 --S 2048 >> results/kernel_shapes_r5.jsonl 2>>$LOG
echo "df_tiled q6 S2048 exit=$?" >>$LOG

echo "=== r5 queue3 done $(date) ===" >>$LOG
