"""Adversarial parity sweep at unusual flag envelopes (VERDICT r4 #6).

The main parity harness (test_parity_reference.py) pins the reference
DEFAULT shapes: dimwise RBF, full-Cholesky q(u), T_custom unset. The
reference's flag surface allows odd corners that exercise genuinely
different code paths on both sides; each gets its own end-to-end 1e-4
parity case against the ACTUAL reference source here:

  * q_diag=True       - diagonal inducing posterior (svpy.py:79-82
                        SoftPlus-transformed scale, :96-97 elementwise
                        whitened sample, :164-170 diagonal KL)
  * dimwise=False     - SHARED RBF hyperparameters (kernels.py:44-45
                        (D_in,)/(1,) shapes, :83-96 shared square_dist,
                        :120-125 (D_in, S) frequency draw, :163-166
                        non-dimwise nu solve)
  * T_custom > T      - forecast horizon override (odegpvae.py:51-53),
                        with the DF kernel
  * rot_start         - the random-initial-angle reshuffle
                        (mnist.py:14-22), inert in the reference's live
                        loader but importable and well-defined
  * Ndata % batch != 0 - ragged tail through the actual CLI driver
                        (the reference DataLoader is drop_last=False;
                        our scanned paths train the tail as one extra
                        per-step dispatch)
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

if not os.path.isdir('/root/reference/experiments'):
    pytest.skip('reference source not available', allow_module_level=True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_parity_reference import (            # noqa: E402
    run_both, assert_parity, patch_ref_noise, _t, Q, T, DT,
)

import jax.numpy as jnp                        # noqa: E402

__all__ = ['patch_ref_noise']                  # fixture re-export


@pytest.mark.slow
def test_q_diag_full_stack(patch_ref_noise):
    """Diagonal q(u) end to end: softplus scale, elementwise whitened
    inducing sample, diagonal closed-form KL (reference svpy.py:79-82,
    96-97, 164-170)."""
    ref, jx, _ = run_both(order=1, kernel='RBF',
                          patch_noise=patch_ref_noise, q_diag=True)
    assert_parity(ref, jx)


@pytest.mark.slow
def test_q_diag_df_full_stack(patch_ref_noise):
    """q_diag composes with the DF kernel (the inducing-sample branch is
    kernel-independent, svpy.py:93-100). zt atol is the DF float32
    reduction-order drift (see test_df_kernel_full_stack) - measured
    1.2e-2 on one near-zero element here; the reconstructions and all
    ELBO terms still hold at their 1e-3/1e-4 tolerances below."""
    ref, jx, _ = run_both(order=1, kernel='DF',
                          patch_noise=patch_ref_noise, q_diag=True)
    assert_parity(ref, jx, zt_tol=(1e-2, 2e-2))


def test_shared_rbf_full_stack(patch_ref_noise):
    """Shared (non-dimwise) RBF hyperparameters through the full model:
    (D_in,) lengthscales, (1,) variance, (D_in, S) frequency draw, the
    non-dimwise nu solve and f_update einsums (reference kernels.py:83-96,
    120-125, 163-166, 175-177)."""
    ref, jx, _ = run_both(order=1, kernel='RBF',
                          patch_noise=patch_ref_noise, dimwise=False)
    assert_parity(ref, jx)


def test_shared_rbf_order2(patch_ref_noise):
    """Shared RBF x 2nd-order ODE: the (2q,) shared lengthscale acts on
    the concatenated (s, v) state."""
    ref, jx, _ = run_both(order=2, kernel='RBF',
                          patch_noise=patch_ref_noise, dimwise=False)
    assert_parity(ref, jx)


def _t_custom_both(ctx, T_c):
    """Run the T_custom forecast on both stacks from a shared run_both
    context (reference odegpvae.py:51-53: integrate over
    dt*arange(T_custom), decode all T_custom frames)."""
    from vae_gp_ode_tpu.dynamics.flow import flow_forward

    z0_j, z0_r = ctx['z0']
    N_b = z0_j.shape[0]
    ref_model = ctx['ref_model']
    with torch.no_grad():
        ztL_r = ref_model.sample_trajectories(_t(z0_r), T_c, 1)
        Xrec_r = ref_model.build_decoding(
            ztL_r, (1, N_b, T_c, 1, 28, 28)).numpy()

    gp, sample = ctx['gp'], ctx['sample']
    ts = DT * jnp.arange(T_c)
    zt_j, _ = flow_forward(gp, sample, jnp.asarray(z0_j), ts, order=1,
                           solver='euler')
    bound = ctx['model'].bind(ctx['variables'])
    imgs = bound.decoder(zt_j.reshape(N_b * T_c, Q), train=False)
    Xrec_j = jnp.transpose(imgs, (0, 3, 1, 2)).reshape(
        1, N_b, T_c, 1, 28, 28)
    return (np.asarray(zt_j), ztL_r[0].numpy(),
            np.asarray(Xrec_j), Xrec_r)


def test_t_custom_forecast_rbf(patch_ref_noise):
    """T_custom = 2T with RBF: full-horizon 1e-4-class parity (the RBF
    drift stays small over the doubled horizon)."""
    _, _, ctx = run_both(order=1, kernel='RBF',
                         patch_noise=patch_ref_noise)
    zt_j, zt_r, Xrec_j, Xrec_r = _t_custom_both(ctx, 2 * T)
    np.testing.assert_allclose(zt_j, zt_r, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(Xrec_j, Xrec_r, rtol=1e-3, atol=5e-4)


def test_t_custom_forecast_df(patch_ref_noise):
    """T_custom = 2T with the DF kernel - the notebooks' 2x-rollout
    protocol. The SHARED horizon [:T] must match at the DF tolerance;
    past it the two float32 stacks diverge exponentially (measured:
    frame-12 rel error 7.6 from 1e-3-class frame-6 drift - trajectory
    separation, not a semantics difference), so the extended frames are
    asserted finite + shape-correct only."""
    _, _, ctx = run_both(order=1, kernel='DF',
                         patch_noise=patch_ref_noise)
    T_c = 2 * T
    zt_j, zt_r, Xrec_j, Xrec_r = _t_custom_both(ctx, T_c)
    assert zt_j.shape == (zt_r.shape[0], T_c, Q)
    assert Xrec_j.shape == Xrec_r.shape == (1, zt_r.shape[0], T_c,
                                            1, 28, 28)
    np.testing.assert_allclose(zt_j[:, :T], zt_r[:, :T],
                               rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(Xrec_j[:, :, :T], Xrec_r[:, :, :T],
                               rtol=1e-3, atol=5e-4)
    assert np.isfinite(zt_j).all() and np.isfinite(Xrec_j).all()


def test_rot_start_matches_reference():
    """data.mnist.rot_start == the reference's rot_start (mnist.py:14-22)
    given identical start-angle draws - including the preserved quirk
    that the reference's torch.flip on the size-1 channel axis is a
    no-op, making the output a near-roll with frame 0 skipped."""
    import types
    # the reference data module imports torchvision at module level
    # (mnist.py:10-11); it is not installed here and rot_start does not
    # use it - stub it like test_parity_reference stubs torchsummary
    for name in ('torchvision', 'torchvision.transforms'):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules['torchvision'].transforms = sys.modules[
        'torchvision.transforms']
    sys.path.insert(0, '/root/reference/experiments')
    from data.mnist import rot_start as ref_rot_start
    from vae_gp_ode_tpu.data.mnist import rot_start

    rng = np.random.RandomState(3)
    X = rng.rand(7, T, 1, 9, 9).astype(np.float32)

    seed = 42
    np.random.seed(seed)                      # ref draws from global state
    out_ref = ref_rot_start(torch.tensor(X), T, X.shape[0]).numpy()
    out_jax = rot_start(X, T, seed=seed)      # same RandomState stream
    np.testing.assert_array_equal(out_jax, out_ref)


@pytest.mark.slow
def test_cli_nondivisor_ndata_batch(tmp_path):
    """main.py with Ndata % batch != 0 (reference DataLoader semantics:
    drop_last=False, final short batch trains too). The scanned epoch
    path must train the ragged tail via its extra per-step dispatch and
    finish with finite losses and a checkpoint."""
    import json
    import subprocess

    out = tmp_path / 'run'
    r = subprocess.run(
        [sys.executable, 'main.py', '--device', 'cpu', '--Nepoch', '2',
         '--batch', '8', '--Ndata', '20', '--Ntest', '9',
         '--num_inducing', '8', '--num_features', '16', '--T', '6',
         '--n_filt', '4', '--plot_freq', '1', '--save', str(out)],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    run_dirs = list(tmp_path.glob('run*'))
    assert run_dirs, (r.stdout[-500:], r.stderr[-500:])
    traces = np.load(run_dirs[0] / 'elbo.npy')
    # 2 full batches + 1 tail batch per epoch, 2 epochs: the tail MUST
    # be trained (reference DataLoader drop_last=False semantics)
    assert traces.shape[0] == 6, traces.shape
    assert np.isfinite(traces).all()
    args_json = json.loads((run_dirs[0] / 'args.json').read_text())
    assert args_json['Ndata'] == 20 and args_json['batch'] == 8
    log = (run_dirs[0] / 'logs').read_text()
    assert 'Optimization completed' in log
