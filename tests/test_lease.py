"""Regression tests for the per-item TPU lease protocol (round 4).

Round 3's official scoreboard number was lost to lease coordination: the
measurement queue held /tmp/tpu_lease.lock for its entire multi-hour
runtime while the driver-launched bench.py gave up after its bounded
wait (VERDICT r3 #1). Round 4 inverted the granularity — the lease wraps
ONE bounded item — and these tests pin the pieces that make that safe:

- stale (dead-pid) leases are ignored, not waited on, by both the
  Python helpers in bench.py and the tools/tpu_lease.sh wrapper;
- the lease is held exactly for the duration of one command and always
  released, including on command failure (exit code passed through);
- release never deletes a lease a LATER process has taken over (the
  lost-race degradation documented in bench._take_tpu_lease).

All tests use temp lease paths (the shell wrapper reads
TPU_LEASE_PATH / PYTEST_LOCK_PATH) so they cannot interact with a real
measurement or with this very pytest session's own lock.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, 'tools', 'tpu_lease.sh')
sys.path.insert(0, REPO)

import bench  # noqa: E402  (top-level imports are stdlib-only)


def _dead_pid():
    """A pid guaranteed dead: spawn a process and let it exit."""
    p = subprocess.Popen(['true'])
    p.wait()
    return p.pid


# ---------------------------------------------------------------- python


def test_wait_ignores_stale_lease(tmp_path):
    lease = str(tmp_path / 'lease')
    with open(lease, 'w') as f:
        f.write(str(_dead_pid()))
    t0 = time.perf_counter()
    bench._wait_for_tpu_lease(lease=lease, max_wait_s=600)
    # a stale lease must not cost a wait cycle (the loop sleeps 30 s)
    assert time.perf_counter() - t0 < 5


def test_wait_returns_when_no_lease(tmp_path):
    t0 = time.perf_counter()
    bench._wait_for_tpu_lease(lease=str(tmp_path / 'absent'), max_wait_s=600)
    assert time.perf_counter() - t0 < 5


def test_wait_is_bounded_for_live_holder(tmp_path):
    # a LIVE holder with max_wait_s=0 must return immediately — the bound
    # is what kept round 3's bench from hanging forever (it recorded a
    # null instead; the per-item protocol makes the wait succeed, but the
    # bound itself must hold)
    lease = str(tmp_path / 'lease')
    with open(lease, 'w') as f:
        f.write(str(os.getpid()))           # this process: alive
    t0 = time.perf_counter()
    bench._wait_for_tpu_lease(lease=lease, max_wait_s=0)
    assert time.perf_counter() - t0 < 5


def test_wait_treats_empty_lease_as_stale(tmp_path):
    # a holder killed between create and write leaves a 0-byte lease; it
    # must not be waited on for the full bound (45 min in production)
    lease = str(tmp_path / 'lease')
    open(lease, 'w').close()
    t0 = time.perf_counter()
    bench._wait_for_tpu_lease(lease=lease, max_wait_s=600)
    assert time.perf_counter() - t0 < 10    # one 1s grace re-read, no 30s


def test_take_and_release_lease(tmp_path):
    lease = str(tmp_path / 'lease')
    release = bench._take_tpu_lease(lease=lease)
    with open(lease) as f:
        assert f.read().strip() == str(os.getpid())
    release()
    assert not os.path.exists(lease)


def test_release_spares_foreign_lease(tmp_path):
    # lost race: another process overwrote the lease after we took it —
    # our release must NOT delete the new holder's lease
    lease = str(tmp_path / 'lease')
    release = bench._take_tpu_lease(lease=lease)
    with open(lease, 'w') as f:
        f.write(str(os.getpid() + 1))
    release()
    assert os.path.exists(lease)
    os.remove(lease)


# ----------------------------------------------------------------- shell


def _run_wrapped(tmp_path, *cmd, lease_prefill=None):
    lease = str(tmp_path / 'lease')
    env = dict(os.environ,
               TPU_LEASE_PATH=lease,
               PYTEST_LOCK_PATH=str(tmp_path / 'pylock'))
    if lease_prefill is not None:
        with open(lease, 'w') as f:
            f.write(str(lease_prefill))
    r = subprocess.run(['bash', SCRIPT] + list(cmd), env=env,
                       capture_output=True, text=True, timeout=60)
    return r, lease


def test_wrapper_runs_command_and_releases(tmp_path):
    r, lease = _run_wrapped(tmp_path, 'cat',
                            str(tmp_path / 'lease'))
    assert r.returncode == 0
    # during the command the lease held the wrapper's pid (a live pid)
    assert r.stdout.strip().isdigit()
    # and after exit the lease is gone
    assert not os.path.exists(lease)


def test_wrapper_passes_through_failure_and_releases(tmp_path):
    r, lease = _run_wrapped(tmp_path, 'false')
    assert r.returncode == 1
    assert not os.path.exists(lease)


def test_wrapper_ignores_stale_lease(tmp_path):
    t0 = time.perf_counter()
    r, lease = _run_wrapped(tmp_path, 'true', lease_prefill=_dead_pid())
    assert r.returncode == 0
    assert time.perf_counter() - t0 < 10    # no 15 s wait cycle
    assert 'stale' in r.stderr
    assert not os.path.exists(lease)


def test_wrapper_ignores_empty_lease(tmp_path):
    t0 = time.perf_counter()
    r, lease = _run_wrapped(tmp_path, 'true', lease_prefill='')
    assert r.returncode == 0
    assert time.perf_counter() - t0 < 15    # 1s grace re-read, no 15s cycle
    assert 'stale' in r.stderr
    assert not os.path.exists(lease)
