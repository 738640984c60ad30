#!/bin/bash
# Round-5 kernel-shape measurement queue (VERDICT r4 #3 + ADVICE r4 #4).
#
# Each probe is ONE per-item lease (tools/tpu_lease.sh) in a FRESH
# process: a failed wide compile can poison the v5e compiler for its
# process, and results must never share fate. Appends one JSON line per
# probe to results/kernel_shapes_r5.jsonl.
#
# Rows:
#   - in-envelope ok=true rows for all three single-block kernels at the
#     reference envelope (q=6, S=256, M=100) - ADVICE r4 #4 asked for
#     the passing side of the width-gate bracket in the evidence file;
#   - grid-tiled kernels (ops.pathwise_tiled / df_pathwise_tiled) at the
#     exact shapes the single-block kernels die at (q=12, S=1024 -
#     results/kernel_shapes_r4.jsonl) - VERDICT r4 #3's done-condition.
set -u
cd "$(dirname "$0")/.."
OUT=results/kernel_shapes_r5.jsonl
run() {
  echo "=== probe $* $(date -u +%H:%M:%S)" >&2
  local tmp
  tmp=$(mktemp)
  timeout 1500 tools/tpu_lease.sh python tools/probe_kernel_shapes_r5.py "$@" > "$tmp"
  if [ -s "$tmp" ]; then
    cat "$tmp" >> "$OUT"
  else  # process died/timed out before it could print its JSON line
    echo "{\"metric\": \"kernel_shape_probe\", \"round\": 5, \"args\": \"$*\", \"ok\": false, \"error\": \"probe process failed or timed out (1500s)\"}" >> "$OUT"
  fi
  rm -f "$tmp"
}

# in-envelope (passing-side bracket)
run --kernel rbf_perstep --q 6 --S 256 --M 100 --N 256
run --kernel rbf_fused   --q 6 --S 256 --M 100 --N 256
run --kernel df_fused    --q 6 --S 256 --M 100 --N 256
# grid-tiled at the r4 death shapes
run --kernel rbf_tiled   --q 12 --S 256  --M 100 --N 256
run --kernel rbf_tiled   --q 6  --S 1024 --M 100 --N 256
run --kernel rbf_tiled   --q 12 --S 1024 --M 100 --N 256
run --kernel df_tiled    --q 6  --S 1024 --M 100 --N 256
run --kernel df_tiled    --q 12 --S 256  --M 100 --N 256
echo "=== queue done $(date -u +%H:%M:%S)" >&2
