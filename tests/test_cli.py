"""CLI integration tests: run the real entry points as subprocesses with
tiny configs and check their artifacts."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    env = dict(os.environ)
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_main_trains_and_writes_artifacts(tmp_path):
    save = str(tmp_path / 'mnist')
    r = _run(['main.py', '--device', 'cpu', '--Nepoch', '2', '--batch',
              '6', '--Ndata', '12', '--Ntest', '6', '--num_inducing', '8',
              '--num_features', '16', '--T', '6', '--save', save])
    assert r.returncode == 0, r.stderr[-2000:]
    runs = [d for d in os.listdir(tmp_path) if d.startswith('mnist')]
    assert len(runs) == 1
    run_dir = tmp_path / runs[0]
    for f in ('args.json', 'logs', 'odegpvae_mnist.ckpt', 'elbo.npy'):
        assert (run_dir / f).exists(), f
    for p in ('data.png', 'rot_mnist.png', 'rollout.png',
              'optimization_trace.png', 'hyperparams.png'):
        assert (run_dir / 'plots' / p).exists(), p
    log = (run_dir / 'logs').read_text()
    assert 'Optimization completed' in log

    # evaluate.py consumes the checkpoint and prints a JSON result
    r2 = _run(['evaluate.py', '--device', 'cpu', '--model_path',
               str(run_dir), '--L', '1'])
    assert r2.returncode == 0, r2.stderr[-2000:]
    out = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out['metric'] == 'test_recon_mse'
    assert out['mse_mean'] > 0


@pytest.mark.slow
def test_epochs_per_fetch_trajectory_identical(tmp_path):
    """--epochs_per_fetch chains epoch dispatches between metric fetches;
    the training trajectory and every logged metric must be bit-identical
    to the fetch-every-epoch default (only the fetch cadence changes)."""
    import re
    logs = []
    for k in ('1', '3'):
        save = str(tmp_path / f'epf{k}')
        r = _run(['main.py', '--device', 'cpu', '--Nepoch', '4', '--batch',
                  '6', '--Ndata', '12', '--Ntest', '6', '--num_inducing',
                  '8', '--num_features', '16', '--T', '6', '--plot_freq',
                  '100', '--epochs_per_fetch', k, '--save', save])
        assert r.returncode == 0, r.stderr[-2000:]
        run_dir = [d for d in os.listdir(tmp_path)
                   if d.startswith(f'epf{k}')][0]
        logs.append((tmp_path / run_dir / 'logs').read_text())
    rows = [re.findall(r'(tr_elbo:[^|]+\| test_mse:\S+)', t) for t in logs]
    assert rows[0] == rows[1] and len(rows[0]) == 4
    var = [re.findall(r'Kernel variance \[([^\]]+)', t) for t in logs]
    assert var[0] == var[1] and var[0]


@pytest.mark.slow
def test_epochs_per_dispatch_trajectory_close(tmp_path):
    """--epochs_per_dispatch runs E whole epochs (train + monitoring
    eval) per device dispatch; the trajectory must match the per-epoch
    path to float tolerance (separate XLA compilation -> ~1e-6 fusion
    rounding, NOT bit-exact) and every epoch must still be logged.
    Covers the driver's segment scheduling: artifact epoch 0, segments,
    the L switch at Nepoch//2, remainder singles, the final epoch."""
    import re
    import numpy as np
    logs = []
    for e in ('1', '3'):
        save = str(tmp_path / f'epd{e}')
        r = _run(['main.py', '--device', 'cpu', '--Nepoch', '10',
                  '--batch', '4', '--Ndata', '14', '--Ntest', '6',
                  '--num_inducing', '8', '--num_features', '16', '--T',
                  '6', '--plot_freq', '100', '--log_freq', '1000',
                  '--epochs_per_dispatch', e, '--save', save],
                 timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        run_dir = [d for d in os.listdir(tmp_path)
                   if d.startswith(f'epd{e}')][0]
        logs.append((tmp_path / run_dir / 'logs').read_text())
    rows = [re.findall(r'tr_elbo:\s*(-?[\d.]+)\(.*?test_mse:\s*([\d.]+)',
                       t) for t in logs]
    assert len(rows[0]) == len(rows[1]) == 10
    elbo = [np.array([float(a) for a, _ in r]) for r in rows]
    mse = [np.array([float(b) for _, b in r]) for r in rows]
    np.testing.assert_allclose(elbo[0], elbo[1], rtol=5e-3)
    np.testing.assert_allclose(mse[0], mse[1], rtol=2e-2)


@pytest.mark.slow
def test_main_vae_pretrains_and_couples(tmp_path):
    out_dir = str(tmp_path / 'vae')
    data_dir = str(tmp_path / 'data')
    r = _run(['main_vae.py', '--device', 'cpu', '--vae_epochs', '2',
              '--n_train', '4', '--n_test', '3', '--n_angle', '6',
              '--batch', '8', '--output_path', out_dir, '--save',
              data_dir])
    assert r.returncode == 0, r.stderr[-2000:]
    runs = [d for d in os.listdir(tmp_path) if d.startswith('vae')]
    vae_dir = tmp_path / runs[0] / 'MNIST-VAE'
    assert (vae_dir / 'encoder.ckpt').exists()
    assert (vae_dir / 'decoder.ckpt').exists()

    save = str(tmp_path / 'coupled')
    r2 = _run(['main.py', '--device', 'cpu', '--Nepoch', '1', '--batch',
               '6', '--Ndata', '12', '--Ntest', '6', '--num_inducing',
               '8', '--num_features', '16', '--T', '6', '--pretrained',
               'True', '--vae_path', str(vae_dir), '--save', save])
    assert r2.returncode == 0, r2.stderr[-2000:]
    runs2 = [d for d in os.listdir(tmp_path) if d.startswith('coupled')]
    log = (tmp_path / runs2[0] / 'logs').read_text()
    assert 'Loaded pretrained VAE' in log
