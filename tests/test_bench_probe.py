"""Regression tests for bench.py's round-5 reliability hardening.

Two consecutive rounds (BENCH_r03, BENCH_r04) recorded `value: null`
because bench.py made exactly ONE backend-probe attempt and gave up
(VERDICT r4 #1). These tests pin the bounded-retry behaviour, the
failure-path diagnostics (attempt log + clearly-labeled stale selfrun),
and the atomic lease take (ADVICE r4: a truncating open could clobber a
lease taken between bench's wait loop and its write).

All tests monkeypatch the probe / use temp paths - nothing here touches a
real backend or the real locks.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (top-level imports are stdlib-only)


# ---------------------------------------------------------------- retry


def test_probe_retry_succeeds_after_transient_failures(monkeypatch):
    calls = []

    def fake_probe(timeout_s):
        calls.append(timeout_s)
        if len(calls) < 3:
            raise RuntimeError('backend probe failed: transient outage')

    monkeypatch.setattr(bench, '_probe_backend', fake_probe)
    attempts = bench._probe_backend_with_retry(
        max_attempts=5, attempt_timeout_s=7, retry_sleep_s=0)
    assert len(calls) == 3
    assert len(attempts) == 3
    assert attempts[-1]['ok'] is True
    assert not attempts[0]['ok'] and 'transient' in attempts[0]['error']
    # the configured per-attempt timeout is what reaches the probe
    assert calls == [7, 7, 7]


def test_probe_retry_exhausts_and_carries_attempt_log(monkeypatch):
    def fake_probe(timeout_s):
        raise RuntimeError('backend probe failed: hard down')

    monkeypatch.setattr(bench, '_probe_backend', fake_probe)
    try:
        bench._probe_backend_with_retry(max_attempts=4, retry_sleep_s=0)
        raise AssertionError('expected RuntimeError')
    except RuntimeError as e:
        assert '4 probe attempts' in str(e)
        assert len(e.attempts) == 4
        assert all(not a['ok'] for a in e.attempts)
        assert all('hard down' in a['error'] for a in e.attempts)


def test_probe_retry_respects_total_time_bound(monkeypatch):
    # with a long per-retry sleep and a tight total bound, the loop must
    # stop after the first failure instead of sleeping past the bound
    def fake_probe(timeout_s):
        raise RuntimeError('down')

    monkeypatch.setattr(bench, '_probe_backend', fake_probe)
    t0 = time.perf_counter()
    try:
        bench._probe_backend_with_retry(
            max_attempts=9, retry_sleep_s=3600, max_total_s=10)
        raise AssertionError('expected RuntimeError')
    except RuntimeError as e:
        assert len(e.attempts) == 1
    assert time.perf_counter() - t0 < 5


def test_probe_single_attempt_is_default_compatible(monkeypatch):
    # an immediately-healthy backend costs exactly one attempt
    monkeypatch.setattr(bench, '_probe_backend', lambda timeout_s: None)
    attempts = bench._probe_backend_with_retry()
    assert len(attempts) == 1 and attempts[0]['ok']


# ------------------------------------------------------- stale selfrun


def test_latest_selfrun_reads_most_recent_record():
    rec = bench._latest_selfrun()
    # the repo ships at least the round-4 selfrun; the helper must label
    # it with provenance and NEVER return it shaped like a headline
    assert rec is not None
    assert rec['file'].startswith('results/')
    assert isinstance(rec['value'], float) and rec['value'] > 0
    assert 'mtime' in rec
    assert 'metric' not in rec   # not confusable with the bench record


# --------------------------------------------------------- atomic take


def test_take_lease_is_atomic_create(tmp_path):
    lease = str(tmp_path / 'lease')
    release = bench._take_tpu_lease(lease=lease)
    with open(lease) as f:
        assert f.read().strip() == str(os.getpid())
    release()
    assert not os.path.exists(lease)


def test_take_lease_clears_stale_holder(tmp_path):
    import subprocess
    p = subprocess.Popen(['true'])
    p.wait()
    lease = str(tmp_path / 'lease')
    with open(lease, 'w') as f:
        f.write(str(p.pid))             # dead pid: stale
    t0 = time.perf_counter()
    release = bench._take_tpu_lease(lease=lease, max_wait_s=600)
    # a stale lease must not cost a 30 s wait cycle
    assert time.perf_counter() - t0 < 10
    with open(lease) as f:
        assert f.read().strip() == str(os.getpid())
    release()


def test_take_lease_force_takes_after_bounded_wait(tmp_path):
    # a LIVE holder that outlives the bound must not wedge bench into a
    # null record: after two exhausted waits the take degrades to the
    # pre-round-4 force-take
    lease = str(tmp_path / 'lease')
    with open(lease, 'w') as f:
        f.write(str(os.getpid()))       # this process: alive forever
    t0 = time.perf_counter()
    release = bench._take_tpu_lease(lease=lease, max_wait_s=0)
    assert time.perf_counter() - t0 < 10
    with open(lease) as f:
        assert f.read().strip() == str(os.getpid())
    release()


# ------------------------------------------------- error JSON contract


def test_error_json_shape(monkeypatch, capsys):
    # end-to-end: an exhausted probe must emit ONE parseable JSON line
    # with null value, the attempt log, and a stale_selfrun that is
    # clearly provenance-labeled
    def fake_probe(timeout_s):
        raise RuntimeError('down')

    monkeypatch.setattr(bench, '_probe_backend', fake_probe)
    monkeypatch.setattr(bench, '_wait_for_tpu_lease',
                        lambda **kw: None)
    monkeypatch.setattr(bench, '_take_tpu_lease',
                        lambda **kw: (lambda: None))
    monkeypatch.setattr(bench, '_probe_backend_with_retry',
                        lambda: (_ for _ in ()).throw(_failing_error()))
    try:
        bench.main()
        raise AssertionError('expected SystemExit')
    except SystemExit as e:
        assert e.code == 1
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec['value'] is None
    assert rec['metric'] == 'train_seqs_per_sec'
    assert 'TPU backend unavailable' in rec['error']
    assert isinstance(rec['probe_attempts'], list)
    assert len(rec['probe_attempts']) == 2
    assert rec['stale_selfrun'] is None or 'file' in rec['stale_selfrun']


def _failing_error():
    e = RuntimeError('backend unavailable after 2 probe attempts')
    e.attempts = [{'t': 'x', 'ok': False, 'error': 'down'}] * 2
    return e
