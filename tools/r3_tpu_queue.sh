#!/bin/bash
# Round-3 remaining TPU measurements, run sequentially in one process
# chain so a single launch finishes the queue even if the driving
# session dies. Appends JSON lines to results/*.jsonl + a progress log.
cd /root/repo
LOG=/tmp/r3_queue.log
echo "=== r3 TPU queue start $(date)" >> $LOG

# take the single-chip lease (bench.py waits on it, bounded) so a
# driver-launched bench.py mid-queue doesn't record a spurious
# backend-unavailable null; released before our own final bench step
echo $$ > /tmp/tpu_lease.lock
trap 'rm -f /tmp/tpu_lease.lock' EXIT

# the host has ONE CPU: a concurrently-running pytest suite starves TPU
# dispatch and corrupts the numbers (~2x, CLAUDE.md). tests/conftest.py
# writes its pid to this lock at session start and removes it at session
# end; wait for it, bounded (stale lock / dead pid -> proceed; the full
# suite takes ~26 min, so 60 min covers it with margin).
WAITED=0
while [ -e /tmp/pytest_running.lock ] && [ $WAITED -lt 3600 ]; do
  PID=$(cat /tmp/pytest_running.lock 2>/dev/null)
  if [ -n "$PID" ] && ! kill -0 "$PID" 2>/dev/null; then
    echo "stale pytest lock (pid $PID dead), proceeding $(date)" >> $LOG
    break
  fi
  echo "waiting for pytest lock (pid $PID) $(date)" >> $LOG
  sleep 30; WAITED=$((WAITED+30))
done

echo "--- batch scaling" >> $LOG
python tools/batch_scaling_r3.py > results/batch_scaling_r3.jsonl 2>>$LOG
echo "batch_scaling rc=$?" >> $LOG

echo "--- A/B df vs df_fused (VERDICT #3)" >> $LOG
python bench_variants.py --ab df df_fused --scan True --L 1 \
  > /tmp/ab_df_fused.jsonl 2>>$LOG
echo "ab_df rc=$?" >> $LOG
cat /tmp/ab_df_fused.jsonl >> results/ab_r3.jsonl

echo "--- A/B xla_highest vs pallas, rk4 (VERDICT #7)" >> $LOG
python bench_variants.py --ab xla_highest pallas --scan True --L 1 \
  --solver rk4 > /tmp/ab_xh_rk4.jsonl 2>>$LOG
echo "ab_xh_rk4 rc=$?" >> $LOG
cat /tmp/ab_xh_rk4.jsonl >> results/ab_r3.jsonl

echo "--- A/B xla_highest vs pallas, midpoint (VERDICT #7)" >> $LOG
python bench_variants.py --ab xla_highest pallas --scan True --L 1 \
  --solver midpoint > /tmp/ab_xh_mid.jsonl 2>>$LOG
echo "ab_xh_mid rc=$?" >> $LOG
cat /tmp/ab_xh_mid.jsonl >> results/ab_r3.jsonl

echo "--- accuracy probe (VERDICT #7)" >> $LOG
python tools/accuracy_probe_r3.py > results/accuracy_probe_r3.json 2>>$LOG
echo "accuracy rc=$?" >> $LOG

echo "--- main.py epochs_per_fetch A/B (chained metric -> real trainer)" >> $LOG
python tools/epf_ab_r3.py --nepoch 600 --k 10 --mode fetch \
  > results/epf_ab_r3.json 2>>$LOG
echo "epf_ab fetch rc=$?" >> $LOG

echo "--- main.py epochs_per_dispatch A/B (multi-epoch segment)" >> $LOG
python tools/epf_ab_r3.py --nepoch 600 --k 10 --mode dispatch \
  > results/epd_ab_r3.json 2>>$LOG
echo "epf_ab dispatch rc=$?" >> $LOG

echo "--- serving-path bench (AOT artifact vs live jit)" >> $LOG
python tools/serving_bench_r3.py > results/serving_bench_r3.json 2>>$LOG
echo "serving_bench rc=$?" >> $LOG

echo "--- bench.py sanity" >> $LOG
rm -f /tmp/tpu_lease.lock   # bench waits on the lease itself
python bench.py > /tmp/bench_r3.json 2>>$LOG
echo "bench rc=$?" >> $LOG
cat /tmp/bench_r3.json >> $LOG
echo $$ > /tmp/tpu_lease.lock   # retake for the optional extras below

# OPTIONAL (after all headline measurements): fixed-kernel DF quality
# row - the plots_dynamics_extended.ipynb 'odegpvae_ode1_df_fixed'
# variant (kernel hyperparams frozen at the CLI init values via the
# round-3 --fix_kernel flag); appends to the quality table jsonl.
echo "--- fixed-kernel DF retrain (extended-notebook variant)" >> $LOG
timeout 9000 python main.py --Nepoch 5000 --plot_freq 1000 \
  --log_freq 10000 --kernel DF --fix_kernel True \
  --save results/df_fixed_kernel \
  > results/df_fixed_kernel_train.log 2>&1
echo "df_fixed train rc=$?" >> $LOG
RUNDIR=$(ls -dt results/df_fixed_kernel_*/ 2>/dev/null | head -1)
if [ -n "$RUNDIR" ]; then
  timeout 1200 python evaluate.py --model_path "$RUNDIR" --L 5 \
    2> results/df_fixed_kernel_eval.log | tail -1 \
    | sed 's/^{/{"config": "df_fixed_kernel", /' \
    >> results/quality_table_r2.jsonl
  echo "df_fixed eval rc=$?" >> $LOG
fi
rm -f /tmp/tpu_lease.lock
echo "=== r3 TPU queue done $(date)" >> $LOG
