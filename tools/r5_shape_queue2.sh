#!/bin/bash
# Second round-5 probe pass: re-probe the grid-tiled kernels after the
# Mosaic-legal relayout (k-leading rank-3 blocks, 128-multiple feature
# chunks) that the first hardware pass demanded. Appends to the same
# results/kernel_shapes_r5.jsonl.
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
  else
    echo "{\"metric\": \"kernel_shape_probe\", \"round\": 5, \"args\": \"$*\", \"ok\": false, \"error\": \"probe process failed or timed out (1500s)\"}" >> "$OUT"
  fi
  rm -f "$tmp"
}

run --kernel rbf_tiled --q 12 --S 256  --M 100 --N 256
run --kernel rbf_tiled --q 6  --S 1024 --M 100 --N 256
run --kernel rbf_tiled --q 12 --S 1024 --M 100 --N 256
run --kernel df_tiled  --q 6  --S 1024 --M 100 --N 256
run --kernel df_tiled  --q 12 --S 256  --M 100 --N 256
echo "=== queue done $(date -u +%H:%M:%S)" >&2
