#!/bin/bash
# Round-4 TPU measurements, sequential, ONE lease per item (round-4
# protocol, tools/tpu_lease.sh) so a driver-launched bench.py mid-queue
# waits minutes for the current item instead of starving behind the
# whole queue (that starvation nulled BENCH_r03 - VERDICT r3 #1).
cd /root/repo
LOG=/tmp/r4_queue.log
W=tools/tpu_lease.sh
echo "=== r4 TPU queue start $(date)" >> $LOG

run() {  # $1=label $2=outfile(append) rest=command
  local label=$1 out=$2; shift 2
  echo "--- $label $(date)" >> $LOG
  $W "$@" > /tmp/r4_item.out 2>>$LOG
  local rc=$?
  echo "$label rc=$rc $(date)" >> $LOG
  # only land non-empty output (round 3 committed a 0-byte probe json)
  if [ -s /tmp/r4_item.out ]; then cat /tmp/r4_item.out >> "$out"; fi
}

# 1. accuracy probe (VERDICT r3 #3 / r2 #7): pallas vs xla vs f64 oracle
run accuracy_probe results/accuracy_probe_r4.json \
  timeout 3600 python tools/accuracy_probe_r4.py

# 2-3. DF fused A/B reconciliation (VERDICT r3 #2): enough rounds that
# the central-80% interval is decision-grade, at L=1 AND L=5
run ab_df_L1 results/ab_r4.jsonl \
  timeout 3600 python bench_variants.py --ab df df_fused --scan True \
    --L 1 --rounds 24
run ab_df_L5 results/ab_r4.jsonl \
  timeout 3600 python bench_variants.py --ab df df_fused --scan True \
    --L 5 --rounds 24

# 4-9. chip-filling MFU table (VERDICT r3 #5/#6), one preset per item
for p in reference saturation seeds4 capacity32 capacity64 large_s; do
  run "mfu_$p" results/mfu_fill_r4.jsonl \
    timeout 3600 python tools/mfu_fill_r4.py --preset "$p"
done

# 10. the scoreboard itself: a full bench.py run through the same
# protocol (bench takes its own lease) - proves BENCH_r04 will land
echo "--- bench $(date)" >> $LOG
timeout 5400 python bench.py > results/bench_r4_selfrun.json 2>>$LOG
echo "bench rc=$? $(date)" >> $LOG

echo "=== r4 TPU queue done $(date)" >> $LOG
