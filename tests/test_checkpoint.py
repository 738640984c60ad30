"""Checkpoint round-trips: pickle and Orbax backends, VAE weight files,
DF-kernel dimension validation."""

import numpy as np
import jax
import pytest

from vae_gp_ode_tpu.models.odegpvae import init_model
from vae_gp_ode_tpu.training.trainer import create_train_state
from vae_gp_ode_tpu.training import checkpoint as ckpt
from vae_gp_ode_tpu.gp.svgp import init_svgp_params


@pytest.fixture(scope='module')
def state():
    model, variables, gp = init_model(
        jax.random.PRNGKey(0), latent_dim=3, n_filt=4, order=1,
        num_features=8, num_inducing=6, batch=2, T=4)
    st, _ = create_train_state(model, variables, gp)
    return st


def _assert_state_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pickle_roundtrip(state, tmp_path):
    p = str(tmp_path / 'model.ckpt')
    ckpt.save_checkpoint(state, p)
    restored = ckpt.restore_checkpoint(p, like=state)
    _assert_state_equal(state, restored)
    # restored state is a working TrainState pytree (same treedef)
    assert int(restored.step) == int(state.step)
    assert restored.gp.kernel_name == state.gp.kernel_name


def test_orbax_roundtrip(state, tmp_path):
    pytest.importorskip('orbax.checkpoint')
    d = str(tmp_path / 'orbax')
    ckpt.save_checkpoint_orbax(state, d)
    restored = ckpt.restore_checkpoint_orbax(d, like=state)
    _assert_state_equal(state, restored)


def test_vae_weights_roundtrip(state, tmp_path):
    enc_p = str(tmp_path / 'encoder.ckpt')
    dec_p = str(tmp_path / 'decoder.ckpt')
    ckpt.save_vae_weights(state.vae_params, state.batch_stats, enc_p,
                          dec_p)
    enc, dec = ckpt.load_vae_weights(enc_p, dec_p)
    _assert_state_equal(state.vae_params['encoder'], enc['params'])
    _assert_state_equal(state.vae_params['decoder'], dec['params'])


def test_df_requires_square_dims():
    with pytest.raises(ValueError, match='DF kernel requires'):
        init_svgp_params(jax.random.PRNGKey(0), D_in=6, D_out=3, M=4,
                         kernel='DF')


def test_frozen_vae_checkpoint_needs_matching_template(tmp_path):
    """A --pretrained (frozen-VAE) run's opt_state has set_to_zero state
    for the VAE params instead of Adam moments: restoring with the
    default template must REFUSE (leaf-count mismatch), and restoring
    with a freeze_vae template must round-trip (the evaluate.py template
    bug fixed in round 2)."""
    model, variables, gp = init_model(
        jax.random.PRNGKey(0), latent_dim=3, n_filt=4, order=1,
        num_features=8, num_inducing=6, batch=2, T=4)
    frozen, _ = create_train_state(model, variables, gp, freeze_vae=True)
    p = str(tmp_path / 'frozen.ckpt')
    ckpt.save_checkpoint(frozen, p)

    default_like, _ = create_train_state(model, variables, gp)
    with pytest.raises(ValueError, match='structure mismatch'):
        ckpt.restore_checkpoint(p, like=default_like)

    frozen_like, _ = create_train_state(model, variables, gp,
                                        freeze_vae=True)
    restored = ckpt.restore_checkpoint(p, like=frozen_like)
    _assert_state_equal(frozen, restored)


def test_npz_restore_casts_integer_widths(state, tmp_path):
    """An npz checkpoint whose integer leaves were saved at a different
    width (int64 step counters from another numpy/platform) must restore
    with the TARGET's width actually applied to the returned tree - the
    round-3 review found _validate_like computed the cast but dropped it."""
    p = str(tmp_path / 'w.ckpt')
    ckpt.save_checkpoint(state, p)
    data = dict(np.load(p, allow_pickle=False))
    widened = False
    for k, v in data.items():
        if k.startswith('leaf_') and v.dtype.kind in 'iu':
            data[k] = v.astype(np.int64)
            widened = True
    assert widened, 'state has no integer leaves to widen'

    def rewrite(d):                      # np.savez(path) appends .npz;
        import io                        # write via buffer like the lib
        buf = io.BytesIO()
        np.savez(buf, **d)
        with open(p, 'wb') as f:
            f.write(buf.getvalue())

    rewrite(data)
    restored = ckpt.restore_checkpoint(p, like=state)
    for x, y in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        assert np.asarray(x).dtype == np.asarray(y).dtype
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # lossy values must still refuse
    for k, v in data.items():
        if k.startswith('leaf_') and v.dtype == np.int64:
            data[k] = v + np.int64(2**40)
            break
    rewrite(data)
    with pytest.raises(ValueError, match='does not fit'):
        ckpt.restore_checkpoint(p, like=state)
