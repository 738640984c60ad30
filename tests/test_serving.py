"""Serving/export path: AOT artifacts round-trip and match the live model.

The reference has no serving story (raw state_dict checkpoints needing the
full source tree); serving.py is the TPU-native production addition. These
tests pin: exported == live model (same seed), serialize/deserialize/file
round-trip, symbolic-batch artifacts, MC reduction, forecast-horizon
export, and the run-dir/CLI wiring."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_gp_ode_tpu.models.odegpvae import init_model
from vae_gp_ode_tpu.training.trainer import create_train_state
from vae_gp_ode_tpu.training import checkpoint as ckpt
from vae_gp_ode_tpu import serving

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T, IMG = 4, 28


def _lapack_custom_calls(mlir):
    """LAPACK custom-call OPS in an MLIR module - not a plain substring
    search: location metadata can carry 'lapack' from unrelated Python
    function names traced earlier in the process (e.g. a test named
    *_matches_lapack)."""
    return [l for l in mlir.splitlines()
            if 'custom_call' in l and 'lapack' in l.lower()]


@pytest.fixture(scope='module')
def tiny():
    model, variables, gp = init_model(
        jax.random.PRNGKey(3), latent_dim=3, n_filt=4, num_features=16,
        num_inducing=8, batch=2, T=T, img=IMG)
    X = jax.random.uniform(jax.random.PRNGKey(5), (3, T, 1, IMG, IMG))
    return model, variables, gp, X


@pytest.mark.slow
def test_exported_matches_live_model(tiny):
    model, variables, gp, X = tiny
    fn = serving.make_forecast_fn(model, variables, gp, L=2)
    exported = serving.export_forecaster(model, variables, gp, T=T,
                                         batch=X.shape[0], L=2)
    live = fn(X, jnp.int32(11))
    served = exported.call(X, jnp.int32(11))
    assert served.shape == (2, 3, T, 1, IMG, IMG)
    np.testing.assert_allclose(np.asarray(served), np.asarray(live),
                               atol=1e-6)
    # deterministic in the seed, different across seeds
    again = exported.call(X, jnp.int32(11))
    np.testing.assert_array_equal(np.asarray(served), np.asarray(again))
    other = exported.call(X, jnp.int32(12))
    assert np.abs(np.asarray(served) - np.asarray(other)).max() > 1e-6


def test_file_roundtrip(tiny, tmp_path):
    model, variables, gp, X = tiny
    exported = serving.export_forecaster(model, variables, gp, T=T,
                                         batch=X.shape[0], L=1)
    path = str(tmp_path / 'fc.jaxexport')
    nbytes = serving.save_forecaster(exported, path)
    assert nbytes == os.path.getsize(path)
    fc = serving.load_forecaster(path)
    np.testing.assert_array_equal(np.asarray(fc(X, seed=7)),
                                  np.asarray(exported.call(X, jnp.int32(7))))
    assert fc.input_shape[1:] == (T, 1, IMG, IMG)


def test_multi_platform_artifact(tiny):
    """One artifact lowered for cpu AND tpu (export box != serving box).
    Multi-platform artifacts use the all-scan linalg arrangement: NO
    LAPACK custom call may appear in ANY branch (a native cholesky in a
    multi-platform module embeds the CPU LAPACK call alongside the TPU
    lowering, and this jaxlib segfaults executing it from a deserialized
    export - core/linalg.py)."""
    model, variables, gp, X = tiny
    exported = serving.export_forecaster(model, variables, gp, T=T, batch=3,
                                         L=1, platforms=('cpu', 'tpu'))
    assert set(exported.platforms) == {'cpu', 'tpu'}
    assert not _lapack_custom_calls(exported.mlir_module())
    fc = serving.Forecaster(exported)
    assert fc(X, seed=0).shape == (1, 3, T, 1, IMG, IMG)
    # a tpu-only export resolves the per-platform linalg branch
    # statically to the native pure-HLO primitives: no lapack either
    tpu_only = serving.export_forecaster(model, variables, gp, T=T,
                                         batch=3, L=1, platforms=('tpu',))
    assert not _lapack_custom_calls(tpu_only.mlir_module())


@pytest.mark.slow
def test_symbolic_batch_serves_any_n(tiny):
    model, variables, gp, _ = tiny
    exported = serving.export_forecaster(model, variables, gp, T=T,
                                         batch=None, L=1)
    fn = serving.make_forecast_fn(model, variables, gp, L=1)
    for n in (1, 4):
        Xn = jax.random.uniform(jax.random.PRNGKey(n), (n, T, 1, IMG, IMG))
        out = exported.call(Xn, jnp.int32(0))
        assert out.shape == (1, n, T, 1, IMG, IMG)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(fn(Xn, jnp.int32(0))),
                                   atol=1e-5)


def test_normalize_input_baked_in(tiny):
    """normalize_input=True artifacts take raw [0,1] pixels and apply the
    training normalisation in-graph (reference data/utils.py:12-15)."""
    from vae_gp_ode_tpu.data.mnist import MNIST_MEAN, MNIST_STD
    model, variables, gp, X = tiny  # X is uniform [0,1) = raw pixels
    raw = serving.export_forecaster(model, variables, gp, T=T,
                                    batch=X.shape[0], L=1,
                                    normalize_input=True)
    norm = serving.export_forecaster(model, variables, gp, T=T,
                                     batch=X.shape[0], L=1)
    np.testing.assert_allclose(
        np.asarray(raw.call(X, jnp.int32(5))),
        np.asarray(norm.call((X - MNIST_MEAN) / MNIST_STD, jnp.int32(5))),
        atol=1e-6)


def test_bf16_serving_artifact(tiny):
    """dtype='bf16' artifacts run the conv-dominated encoder/decoder in
    half precision (MXU-native on TPU) with f32 dynamics and f32 output
    frames; reconstructions stay within a few bf16 ulps of the f32
    artifact."""
    model, variables, gp, X = tiny
    f32 = serving.export_forecaster(model, variables, gp, T=T,
                                    batch=X.shape[0], L=1)
    b16 = serving.export_forecaster(model, variables, gp, T=T,
                                    batch=X.shape[0], L=1, dtype='bf16')
    yf = np.asarray(f32.call(X, jnp.int32(3)))
    yb = np.asarray(b16.call(X, jnp.int32(3)))
    assert yb.dtype == np.float32
    assert np.isfinite(yb).all()
    # sigmoid-range frames: a few bf16 ulps (2^-8 ~ 0.004) of drift
    assert np.abs(yf - yb).max() < 0.05, np.abs(yf - yb).max()
    # bf16 must actually change the compute (not silently f32)
    assert np.abs(yf - yb).max() > 0.0
    assert 'bf16' in b16.mlir_module()   # half-precision ops in the module
    with pytest.raises(ValueError):
        serving.make_forecast_fn(model, variables, gp, dtype='fp8')


@pytest.mark.slow
def test_mc_reduce_and_forecast_horizon(tiny):
    model, variables, gp, X = tiny
    full = serving.export_forecaster(model, variables, gp, T=T,
                                     batch=X.shape[0], L=3)
    mean = serving.export_forecaster(model, variables, gp, T=T,
                                     batch=X.shape[0], L=3,
                                     mc_reduce='mean')
    got = mean.call(X, jnp.int32(2))
    assert got.shape == (3, T, 1, IMG, IMG)
    np.testing.assert_allclose(
        np.asarray(got),
        np.asarray(full.call(X, jnp.int32(2))).mean(axis=0), atol=1e-6)

    # forecast 2T frames from T input frames (reference rollout protocol)
    roll = serving.export_forecaster(model, variables, gp, T=T,
                                     batch=X.shape[0], L=1, T_custom=2 * T)
    assert roll.call(X, jnp.int32(0)).shape == (1, 3, 2 * T, 1, IMG, IMG)

    with pytest.raises(ValueError):
        serving.make_forecast_fn(model, variables, gp, mc_reduce='median')


@pytest.mark.parametrize('kwargs', [
    dict(order=2),                          # velocity encoder path
    dict(solver='dopri5', max_steps=64),    # adaptive bounded while_loop
    dict(solver='adams', max_steps=64),     # VCABM
    dict(solver='bdf'),                     # implicit Newton (general solve)
    dict(kernel='DF'),                      # matrix-valued kernel
])
def test_export_model_variants(kwargs):
    """Every model configuration exports and serves: 2nd-order dynamics,
    the adaptive solvers (bounded while_loops serialize), the implicit
    bdf (whose Newton (D, D) solves must trace portably too - a plain
    jnp.linalg.solve would bake lapack_getrf/trsm custom calls into the
    artifact), both kernels. Every artifact must contain ZERO LAPACK
    custom calls: executing one from a deserialized export segfaults this
    jaxlib's CPU backend in a fresh process (core/linalg.py)."""
    model, variables, gp = init_model(
        jax.random.PRNGKey(1), latent_dim=3, n_filt=4, num_features=16,
        num_inducing=8, batch=2, T=T, **kwargs)
    exported = serving.export_forecaster(model, variables, gp, T=T,
                                         batch=2, L=1)
    bad = _lapack_custom_calls(exported.mlir_module())
    assert not bad, \
        f'LAPACK custom call baked into artifact for {kwargs}: {bad[:2]}'
    X = jax.random.uniform(jax.random.PRNGKey(2), (2, T, 1, IMG, IMG))
    out = exported.call(X, jnp.int32(1))
    assert out.shape == (1, 2, T, 1, IMG, IMG)
    assert np.isfinite(np.asarray(out)).all()


def _write_run_dir(tmp_path, model, variables, gp):
    """Synthesise a training run dir (args.json + checkpoint) the way
    main.py leaves one behind."""
    state, _ = create_train_state(model, variables, gp)
    run = tmp_path / 'run'
    run.mkdir()
    ckpt.save_checkpoint(state, str(run / 'odegpvae_mnist.ckpt'))
    args = dict(latent_dim=3, n_filt=4, ode=1, frames=5, dt=0.1,
                solver='euler', ts_dense_scale=1, num_features=16,
                num_inducing=8, kernel='RBF', q_diag=False, dimwise=True,
                D_in=3, D_out=3, T=T, seed=0, pretrained=False)
    (run / 'args.json').write_text(json.dumps(args))
    return run


def test_export_run_dir(tiny, tmp_path):
    model, variables, gp, X = tiny
    run = _write_run_dir(tmp_path, model, variables, gp)
    out = str(tmp_path / 'run.jaxexport')
    exported, nbytes = serving.export_run_dir(str(run), out, L=1, batch=3)
    assert nbytes == os.path.getsize(out)
    fc = serving.load_forecaster(out)
    served = fc(X, seed=4)
    # the run dir holds the same weights the fixture exports directly
    direct = serving.export_forecaster(model, variables, gp, T=T, batch=3,
                                       L=1).call(X, jnp.int32(4))
    np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                               atol=1e-6)


@pytest.mark.slow
def test_artifact_runs_in_fresh_process(tiny, tmp_path):
    """REGRESSION: executing LAPACK custom calls from a deserialized
    export segfaults this jaxlib's CPU backend in a fresh process (the
    exporting process masks it via its in-process executable cache).
    Artifacts trace Cholesky/solves as pure HLO (core/linalg.py), so a
    process that only deserializes must materialise outputs fine."""
    model, variables, gp, X = tiny
    exported = serving.export_forecaster(model, variables, gp, T=T,
                                         batch=None, L=1)
    art = str(tmp_path / 'fresh.jaxexport')
    serving.save_forecaster(exported, art)
    prog = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from vae_gp_ode_tpu import serving\n"
        f"fc = serving.load_forecaster({art!r})\n"
        "x = np.random.rand(2, %d, 1, %d, %d).astype('float32')\n"
        "y = np.asarray(fc(x, seed=1))\n"
        "assert np.isfinite(y).all()\n"
        "print('FRESH OK', y.shape)\n" % (T, IMG, IMG))
    r = subprocess.run([sys.executable, '-c', prog], cwd=REPO,
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, (r.returncode, r.stderr[-2000:])
    assert 'FRESH OK' in r.stdout


@pytest.mark.slow
def test_trained_df_artifact_fresh_process(tmp_path):
    """REGRESSION: the shipped DF checkpoint's gram is near-singular
    (MD=600, pivots ~2e-5 relative); the first portable Cholesky NaN'd
    on it. The exported artifact must produce finite frames in a fresh
    process."""
    ckpt = os.path.join(REPO, 'checkpoints', 'df_5000ep')
    if not os.path.isdir(ckpt):
        pytest.skip('shipped checkpoint not present')
    art = str(tmp_path / 'df.jaxexport')
    serving.export_run_dir(ckpt, art, L=1, batch=2)
    prog = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from vae_gp_ode_tpu import serving\n"
        f"fc = serving.load_forecaster({art!r})\n"
        "x = (np.random.RandomState(0).rand(2, 16, 1, 28, 28)"
        ".astype('float32') - 0.1307) / 0.3081\n"
        "y = np.asarray(fc(x, seed=2))\n"
        "assert np.isfinite(y).all(), 'NaN in served frames'\n"
        "print('DF FRESH OK')\n")
    r = subprocess.run([sys.executable, '-c', prog], cwd=REPO,
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, (r.returncode, r.stderr[-2000:])
    assert 'DF FRESH OK' in r.stdout


@pytest.mark.slow
def test_http_server(tiny, tmp_path):
    """tools/serve_http.py serves an exported artifact over HTTP with
    only jax + stdlib: /health and /predict round-trip."""
    import time
    import urllib.request
    model, variables, gp, X = tiny
    exported = serving.export_forecaster(model, variables, gp, T=T,
                                         batch=None, L=1, mc_reduce='mean')
    art = str(tmp_path / 'srv.jaxexport')
    serving.save_forecaster(exported, art)
    # port 0: the OS picks a free port; the server prints it as JSON
    proc = subprocess.Popen(
        [sys.executable, 'tools/serve_http.py', '--artifact', art,
         '--port', '0', '--device', 'cpu'],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        line = proc.stdout.readline()
        port = json.loads(line)['port']
        base = f'http://127.0.0.1:{port}'
        deadline = time.time() + 120
        health = None
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(base + '/health', timeout=5) as r:
                    health = json.loads(r.read())
                break
            except OSError:
                time.sleep(0.5)
        assert health and health['ok']
        req = json.dumps({
            'x': np.random.rand(2, T, 1, IMG, IMG).tolist(),
            'seed': 3}).encode()
        with urllib.request.urlopen(urllib.request.Request(
                base + '/predict', data=req,
                headers={'Content-Type': 'application/json'}),
                timeout=600) as r:
            out = json.loads(r.read())
        assert out['shape'] == [2, T, 1, IMG, IMG]
        y = np.asarray(out['y'])
        assert np.isfinite(y).all() and 0.0 <= y.min() and y.max() <= 1.0
    finally:
        proc.terminate()
        proc.wait(timeout=30)


@pytest.mark.slow
def test_serving_cli(tiny, tmp_path):
    model, variables, gp, X = tiny
    run = _write_run_dir(tmp_path, model, variables, gp)
    out = str(tmp_path / 'cli.jaxexport')
    r = subprocess.run(
        [sys.executable, '-m', 'vae_gp_ode_tpu.serving', '--device', 'cpu',
         '--model_path', str(run), '--out', out, '--L', '1', '--Troll', '2',
         '--mc_reduce', 'mean'],
        cwd=REPO, capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info['bytes'] == os.path.getsize(out)
    fc = serving.load_forecaster(out)
    # symbolic batch (default --batch 0) + 2x forecast horizon + MC mean
    for n in (2, 5):
        Xn = jax.random.uniform(jax.random.PRNGKey(n), (n, T, 1, IMG, IMG))
        assert fc(Xn, seed=1).shape == (n, 2 * T, 1, IMG, IMG)


# ------------------------------------------------------ sidecar manifest


def test_manifest_written_and_carried(tiny, tmp_path):
    """save_forecaster writes a provenance sidecar; load carries it."""
    model, variables, gp, X = tiny
    exported = serving.export_forecaster(model, variables, gp, T=T,
                                         batch=3, L=1)
    path = str(tmp_path / 'fc.jaxexport')
    nbytes = serving.save_forecaster(exported, path)
    mpath = path + '.manifest.json'
    assert os.path.exists(mpath)
    with open(mpath) as f:
        m = json.load(f)
    assert m['jax_version'] == jax.__version__
    assert m['platforms'] == list(exported.platforms)
    assert m['nbytes'] == nbytes
    assert m['in_avals'][0]['shape'] == ['3', str(T), '1', str(IMG),
                                         str(IMG)]
    fc = serving.load_forecaster(path)
    assert fc.manifest['jax_version'] == jax.__version__


def test_platform_mismatch_is_actionable(tiny, tmp_path):
    """Loading a tpu-only artifact on the cpu backend must raise a
    provenance-carrying error BEFORE a failed execution - not a
    deserialization trace (VERDICT r4 #7)."""
    model, variables, gp, X = tiny
    exported = serving.export_forecaster(model, variables, gp, T=T,
                                         batch=3, L=1, platforms=('tpu',))
    path = str(tmp_path / 'fc_tpu.jaxexport')
    serving.save_forecaster(exported, path)
    with pytest.raises(RuntimeError) as ei:
        serving.load_forecaster(path)
    msg = str(ei.value)
    assert 'tpu' in msg and 'cpu' in msg and '--platforms' in msg
    # inspection-only override still loads
    fc = serving.load_forecaster(path, check_platform=False)
    assert fc.platforms == ('tpu',)


def test_corrupt_artifact_error_carries_provenance(tiny, tmp_path):
    model, variables, gp, X = tiny
    exported = serving.export_forecaster(model, variables, gp, T=T,
                                         batch=3, L=1)
    path = str(tmp_path / 'fc.jaxexport')
    serving.save_forecaster(exported, path)
    with open(path, 'wb') as f:
        f.write(b'not a stablehlo artifact')
    with pytest.raises(RuntimeError) as ei:
        serving.load_forecaster(path)
    msg = str(ei.value)
    assert 'failed to deserialize' in msg
    assert f'exported with jax {jax.__version__}' in msg


def test_load_without_manifest_is_backward_compatible(tiny, tmp_path):
    """Pre-round-5 artifacts (no sidecar) load exactly as before."""
    model, variables, gp, X = tiny
    exported = serving.export_forecaster(model, variables, gp, T=T,
                                         batch=3, L=1)
    path = str(tmp_path / 'fc.jaxexport')
    serving.save_forecaster(exported, path)
    os.remove(path + '.manifest.json')
    fc = serving.load_forecaster(path)
    assert fc.manifest is None
    assert fc(X, seed=3).shape == (1, 3, T, 1, IMG, IMG)
