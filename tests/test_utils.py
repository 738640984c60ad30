"""Utility-layer tests: meters, io, summary, plotting smoke."""

import os

import numpy as np
import jax

from vae_gp_ode_tpu.training.meters import (
    CachedRunningAverageMeter, CachedAverageMeter, CachedHyperparams,
)
from vae_gp_ode_tpu.utils.summary import param_count, summarize
from vae_gp_ode_tpu.core.prng import seed_everything


def test_running_average_meter_wma():
    m = CachedRunningAverageMeter(period=3)
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    for i, v in enumerate(vals):
        m.update(v, i)
    # avg is computed over values BEFORE the current update (reference
    # log_utils.py:38-45): last-3 at that point [2,3,4], flipped weights
    # [3,2,1]/6 -> (4*3+3*2+2*1)/6
    assert abs(m.avg - (4 * 3 + 3 * 2 + 2 * 1) / 6.0) < 1e-9
    assert m.val == 5.0
    assert m.vals == vals


def test_average_meter():
    m = CachedAverageMeter()
    for i, v in enumerate([2.0, 4.0, 6.0]):
        m.update(v, i)
    assert m.avg == 4.0
    assert m.count == 3


def test_hyperparam_meter():
    m = CachedHyperparams()
    m.update(np.ones(3), 0)
    m.update(np.zeros(3), 1)
    assert len(m.vals) == 2


def test_param_count_and_summary():
    tree = {'a': np.zeros((2, 3)), 'b': {'c': np.zeros(5)}}
    assert param_count(tree) == 11
    s = summarize(tree, 'test')
    assert 'TOTAL' in s and '11' in s


def test_seed_everything_returns_key():
    k = seed_everything(7)
    x = jax.random.normal(k, (3,))
    k2 = seed_everything(7)
    x2 = jax.random.normal(k2, (3,))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_plotting_smoke(tmp_path):
    from vae_gp_ode_tpu.utils import plotting
    X = np.random.rand(3, 4, 1, 28, 28)
    Xrec = np.random.rand(3, 4, 1, 28, 28)
    plotting.plot_rot_mnist(X, Xrec, fname=str(tmp_path / 'a.png'))
    # plot_rand_rot_mnist takes FLAT frames (reference plot_utils.py:56-80)
    plotting.plot_rand_rot_mnist(X.reshape(-1, 1, 28, 28),
                                 Xrec.reshape(-1, 1, 28, 28),
                                 fname=str(tmp_path / 'ar.png'), rows=2)
    plotting.plot_rollout(Xrec[None], fname=str(tmp_path / 'b.png'))
    plotting.plot_data(X, fname=str(tmp_path / 'c.png'))
    plotting.plot_latent_dynamics(np.random.randn(2, 3, 8, 4), order=2,
                                  fname=str(tmp_path / 'd'))
    os.makedirs(tmp_path / 'plots', exist_ok=True)
    m1, m2, m3, m4 = (CachedRunningAverageMeter() for _ in range(4))
    for i in range(5):
        for m in (m1, m2, m3, m4):
            m.update(float(i), i)
    plotting.plot_trace(m1, m2, m3, m4, str(tmp_path))
    h = CachedHyperparams()
    h.update(np.ones(2), 0)
    plotting.plot_params(h, str(tmp_path))
    mus = np.random.randn(50, 6)
    labs = np.random.randint(0, 8, 50)
    plotting.plot_vae_embeddings(mus, labs, 8, str(tmp_path))
    plotting.visualize_embeddings(mus, labs, 8, str(tmp_path))
    mse = plotting.visualize_output(np.random.rand(16, 28, 28),
                                    np.random.rand(16, 28, 28),
                                    str(tmp_path))
    assert mse > 0
    plotting.plot_trace_vae(m1, m2, m3, str(tmp_path))
    assert (tmp_path / 'a.png').exists()
    assert (tmp_path / 'plots' / 'optimization_trace.png').exists()


def test_compilation_cache_helper(tmp_path):
    """enable_compilation_cache populates a disk cache when forced,
    no-ops on a pure-cpu platform config (XLA:CPU AOT reload trips
    machine-feature mismatch errors) and honours the opt-out.
    Subprocesses isolate the process-global jax config."""
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prog = (
        "import jax, os\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)\n"
        "from vae_gp_ode_tpu.core.settings import enable_compilation_cache\n"
        "d = enable_compilation_cache()\n"
        "import jax.numpy as jnp\n"
        "jax.jit(lambda x: (x @ x).sum())(jnp.ones((32, 32)))\n"
        "print('CACHE_DIR', d, len(os.listdir(d)) if d else -1)\n"
    )
    env = dict(os.environ, VGO_COMPILE_CACHE_DIR=str(tmp_path / 'xla'),
               VGO_COMPILE_CACHE='force')
    r = subprocess.run([sys.executable, '-c', prog], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith('CACHE_DIR')][0]
    _, d, n = line.split()
    assert d == str(tmp_path / 'xla') and int(n) > 0

    # pure-cpu platform config without force -> disabled
    env.pop('VGO_COMPILE_CACHE')
    r = subprocess.run([sys.executable, '-c', prog], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'CACHE_DIR None -1' in r.stdout

    env['VGO_COMPILE_CACHE'] = '0'
    r = subprocess.run([sys.executable, '-c', prog], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'CACHE_DIR None -1' in r.stdout


def test_compilation_cache_disabled_on_cpu_fallback(tmp_path, monkeypatch):
    """REGRESSION: when the axon tunnel is down, an 'axon,cpu' platform
    config silently degrades to the CPU backend; the cache gate must read
    the ACTUAL backend, not the configured string, or the run writes and
    then reloads exactly the XLA:CPU AOT entries the gate exists to block
    (machine-feature mismatch, 'could lead to SIGILL')."""
    from unittest import mock
    import jax
    from vae_gp_ode_tpu.core.settings import enable_compilation_cache
    monkeypatch.setenv('VGO_COMPILE_CACHE_DIR', str(tmp_path / 'xla'))
    monkeypatch.delenv('VGO_COMPILE_CACHE', raising=False)
    # simulate: configured for the TPU ('axon,cpu' passes the cheap
    # pre-check) but the backend that actually came up is cpu
    prior = jax.config.jax_compilation_cache_dir
    try:
        with mock.patch.object(type(jax.config), 'jax_platforms',
                               'axon,cpu', create=True), \
             mock.patch.object(jax, 'default_backend', return_value='cpu'):
            assert enable_compilation_cache() is None
            # same config with a real non-cpu backend -> enabled
            with mock.patch.object(jax, 'default_backend',
                                   return_value='tpu'):
                assert enable_compilation_cache() == str(tmp_path / 'xla')
    finally:
        # the enabled branch sets process-global config; restore it so
        # the rest of the (CPU) suite does not write/reload CPU AOT
        # cache entries
        jax.config.update('jax_compilation_cache_dir', prior)
