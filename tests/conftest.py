"""Test configuration: run all tests on a virtual 8-device CPU platform.

Multi-device tests use the standard JAX fake-multi-device trick
(XLA_FLAGS=--xla_force_host_platform_device_count=8) since only one real
TPU chip is available; sharding semantics are platform-independent.
This must run before jax is imported anywhere.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# this jax build hardcodes jax_platforms='axon,cpu' (ignores the env var):
# force the CPU backend explicitly so tests use the virtual 8-device mesh
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')


# advertise a running suite to the TPU benchmark queue: this host has ONE
# CPU, and a concurrent pytest run starves TPU dispatch (~2x timing
# corruption, CLAUDE.md). tools/r3_tpu_queue.sh waits (bounded) while this
# lock exists and its pid is alive.
_LOCK = '/tmp/pytest_running.lock'


def pytest_sessionstart(session):
    # symmetric direction (VERDICT r3 #7): a live TPU measurement item
    # holds /tmp/tpu_lease.lock; the suite starting mid-item would starve
    # its dispatch on this 1-CPU host (~2x corruption). Wait, bounded
    # per-item (round-4 protocol: the lease wraps single items, minutes
    # each, not whole queues). The wait/stale-pid logic lives in ONE
    # place - bench._wait_for_tpu_lease - so the protocol (incl. the
    # empty-pid-is-stale rule) can't silently diverge between the suite
    # and the bench. Opt out with VGO_SKIP_TPU_LEASE_WAIT=1.
    if not os.environ.get('VGO_SKIP_TPU_LEASE_WAIT'):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench
        bench._wait_for_tpu_lease(max_wait_s=2700)
    try:
        # don't clobber a live concurrent session's lock (its pid would
        # be lost and its session would lose lock protection on our exit)
        if os.path.exists(_LOCK):
            with open(_LOCK) as f:
                pid = f.read().strip()
            if pid and pid != str(os.getpid()):
                try:
                    os.kill(int(pid), 0)
                    return          # other session alive: leave its lock
                except (OSError, ValueError):
                    pass            # stale: take it over
        with open(_LOCK, 'w') as f:
            f.write(str(os.getpid()))
    except OSError:
        pass


def pytest_sessionfinish(session, exitstatus):
    try:
        with open(_LOCK) as f:
            if f.read().strip() != str(os.getpid()):
                return              # not ours: leave it
        os.remove(_LOCK)
    except OSError:
        pass
