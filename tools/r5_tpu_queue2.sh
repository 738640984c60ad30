#!/bin/bash
# Round-5 session-4 TPU queue: fresh bench selfrun at r5 HEAD (first
# selfrun that carries extra.mfu_filled), then the tiled-vs-XLA A/B at
# the wide shapes round 5 unlocked (VERDICT r4 weak-#3's open speed
# question). Per-item lease protocol: bench takes the lease internally;
# each A/B probe is its own tools/tpu_lease.sh item.
set -u
cd "$(dirname "$0")/.."
LOG=results/r5_queue2.log
echo "=== r5 queue2 start $(date) HEAD=$(git rev-parse --short HEAD) ===" >>$LOG

timeout 5400 python bench.py > /tmp/bench_r5_selfrun.json 2>>$LOG
rc=$?
echo "bench exit=$rc" >>$LOG
if [ $rc -eq 0 ] && grep -q '"value"' /tmp/bench_r5_selfrun.json; then
  cp /tmp/bench_r5_selfrun.json results/bench_r5_selfrun.json
fi

timeout 2400 tools/tpu_lease.sh python tools/ab_tiled_vs_xla_r5.py \
  --kernel df --q 12 --S 256 >> results/ab_tiled_r5.jsonl 2>>$LOG
echo "ab df q12 S256 exit=$?" >>$LOG

timeout 3000 tools/tpu_lease.sh python tools/ab_tiled_vs_xla_r5.py \
  --kernel rbf --q 12 --S 1024 >> results/ab_tiled_r5.jsonl 2>>$LOG
echo "ab rbf q12 S1024 exit=$?" >>$LOG

timeout 3000 tools/tpu_lease.sh python tools/ab_tiled_vs_xla_r5.py \
  --kernel df --q 6 --S 1024 >> results/ab_tiled_r5.jsonl 2>>$LOG
echo "ab df q6 S1024 exit=$?" >>$LOG

echo "=== r5 queue2 done $(date) ===" >>$LOG
