#!/bin/bash
# Per-item TPU lease wrapper (round-4 protocol; fixes VERDICT r3 #1).
#
# Round 3 lost the driver's official bench number because the measurement
# queue held /tmp/tpu_lease.lock for its ENTIRE multi-hour runtime while
# bench.py's wait is bounded at 2700 s. Round 4 inverts the granularity:
# every TPU measurement item runs as
#
#     tools/tpu_lease.sh <command ...>
#
# which (1) waits, bounded, for any LIVE lease holder (stale/dead-pid
# leases are ignored), (2) waits for a live pytest session (this 1-CPU
# host: a concurrent suite starves TPU dispatch ~2x, CLAUDE.md), then
# (3) takes the lease for the duration of ONE command and releases it on
# exit. bench.py uses the same protocol internally (_wait_for_tpu_lease +
# _take_tpu_lease), so a driver-launched bench mid-queue waits minutes
# for the current item instead of starving behind the whole queue.
set -u
# Paths overridable for the regression tests (tests/test_lease.py), which
# must not touch the real locks while the suite itself holds the pytest
# lock (a test using the real PYLOCK would wait on its own session).
LEASE="${TPU_LEASE_PATH:-/tmp/tpu_lease.lock}"
PYLOCK="${PYTEST_LOCK_PATH:-/tmp/pytest_running.lock}"

wait_lock() {  # $1=path $2=max_s $3=label; rc 0 = absent/stale, 1 = timeout
  local waited=0 pid
  while [ -e "$1" ]; do
    pid=$(cat "$1" 2>/dev/null)
    if [ -z "$pid" ]; then
      sleep 1            # a writer may be between create and write
      pid=$(cat "$1" 2>/dev/null)
      [ -e "$1" ] || return 0
    fi
    if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
      echo "tpu_lease: stale $3 (pid '${pid:-}' dead), proceeding" >&2
      rm -f "$1"
      return 0
    fi
    if [ "$waited" -ge "$2" ]; then
      echo "tpu_lease: $3 wait bound ${2}s exhausted (pid $pid)" >&2
      return 1
    fi
    [ "$waited" -eq 0 ] && echo "tpu_lease: waiting for $3 (pid $pid)" >&2
    sleep 15; waited=$((waited+15))
  done
  return 0
}

# Acquisition: wait for any live lease holder (items are minutes each
# under this protocol; 2700 s covers the longest, a full bench.py run),
# then for a live pytest session (the full suite is ~66 min on this
# 1-CPU host; 4500 s bound), then TAKE the lease ATOMICALLY (noclobber).
# The atomic take closes the two-waiters race: two items that both saw a
# free lease before blocking on the pytest lock would otherwise both
# write it and collide in axon backend init (the round-3 failure mode).
# A lost race loops back to wait on the winner. Exhausted wait bounds
# keep the pre-round-4 semantics: proceed anyway (force-take) so a hung
# holder can never wedge the whole measurement pipeline.
taken=0
while :; do
  wait_lock "$LEASE" 2700 "TPU lease" || break
  wait_lock "$PYLOCK" 4500 "pytest session" || true
  if (set -C; echo $$ > "$LEASE") 2>/dev/null; then
    taken=1; break
  fi
done
[ "$taken" -eq 1 ] || echo $$ > "$LEASE"
release() {
  if [ "$(cat "$LEASE" 2>/dev/null)" = "$$" ]; then rm -f "$LEASE"; fi
}
trap release EXIT

"$@"
exit $?
