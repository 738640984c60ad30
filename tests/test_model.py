"""End-to-end ODEGPVAE tests: forward shapes, ELBO terms, one jitted train
step improving the loss, 2nd-order and DF variants, T_custom forecasting."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_gp_ode_tpu.models.odegpvae import init_model
from vae_gp_ode_tpu.training.objectives import (
    compute_loss, elbo_terms, compute_test_error,
)
from vae_gp_ode_tpu.training.trainer import (
    create_train_state, make_train_step, make_eval_step,
)

N, T, IMG = 4, 8, 28


def make_batch(key, n=N, t=T):
    x = jax.random.uniform(key, (n, t, 1, IMG, IMG))
    return (x - 0.1307) / 0.3081


@pytest.fixture(scope='module')
def setup():
    model, variables, gp = init_model(
        jax.random.PRNGKey(0), latent_dim=3, n_filt=4, order=1,
        num_features=32, num_inducing=10, batch=N, T=T)
    return model, variables, gp


def test_forward_shapes(setup):
    model, variables, gp = setup
    X = make_batch(jax.random.PRNGKey(1))
    Xrec, (s_mu, s_lv), (v_mu, v_lv), nfe = model.apply(
        variables, X, gp, jax.random.PRNGKey(2), L=3, train=False)
    assert Xrec.shape == (3, N, T, 1, IMG, IMG)
    assert s_mu.shape == (N, 3)
    assert v_mu is None
    assert int(nfe) == 3 * (T - 1)   # euler, L=3
    assert np.isfinite(np.asarray(Xrec)).all()
    assert float(Xrec.min()) >= 0.0 and float(Xrec.max()) <= 1.0


def test_t_custom_forecasting(setup):
    model, variables, gp = setup
    X = make_batch(jax.random.PRNGKey(3))
    Xrec, _, _, _ = model.apply(variables, X, gp, jax.random.PRNGKey(4),
                                L=1, T_custom=2 * T, train=False)
    assert Xrec.shape == (1, N, 2 * T, 1, IMG, IMG)


def test_elbo_terms_finite(setup):
    model, variables, gp = setup
    X = make_batch(jax.random.PRNGKey(5))
    Xrec, s_stats, v_stats, _ = model.apply(
        variables, X, gp, jax.random.PRNGKey(6), L=2, train=False)
    # normalised pixels can be negative: use the guarded log for finiteness
    lhood, kl_reg, kl_u = elbo_terms(X, Xrec, s_stats, v_stats, gp,
                                     eps_guard=True)
    for v in (lhood, kl_reg, kl_u):
        assert np.isfinite(float(v))
    assert float(kl_reg) >= 0.0 and float(kl_u) >= 0.0

    loss, nll, _, _ = compute_loss(X, Xrec, s_stats, v_stats, gp, 360.0,
                                   eps_guard=True)
    expect = -(lhood * 360.0 - kl_reg * 360.0 - kl_u)
    np.testing.assert_allclose(float(loss), float(expect), rtol=1e-6)
    np.testing.assert_allclose(float(nll), -float(lhood), rtol=1e-6)


def test_train_step_decreases_loss(setup):
    model, variables, gp = setup
    state, tx = create_train_state(model, variables, gp, lr=1e-3)
    step = make_train_step(model, tx, num_observations=float(N),
                           eps_guard=True)
    X = make_batch(jax.random.PRNGKey(7))
    key = jax.random.PRNGKey(8)
    losses = []
    for i in range(8):
        state, metrics = step(state, X, jax.random.fold_in(key, i), 1)
        losses.append(float(metrics['loss']))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 8
    # loss on a fixed batch should drop substantially over a few steps
    assert losses[-1] < losses[0], f'{losses[0]} -> {losses[-1]}'


@pytest.mark.slow
def test_train_step_L_schedule_recompiles_cleanly(setup):
    model, variables, gp = setup
    state, tx = create_train_state(model, variables, gp)
    step = make_train_step(model, tx, num_observations=float(N),
                           eps_guard=True)
    X = make_batch(jax.random.PRNGKey(9))
    state, m1 = step(state, X, jax.random.PRNGKey(10), 1)
    state, m5 = step(state, X, jax.random.PRNGKey(11), 5)
    assert np.isfinite(float(m5['loss']))
    assert int(m5['nfe']) == 5 * (T - 1)


def test_eval_step(setup):
    model, variables, gp = setup
    state, _ = create_train_state(model, variables, gp)
    ev = make_eval_step(model)
    X = make_batch(jax.random.PRNGKey(12))
    Xrec, mse = ev(state, X, jax.random.PRNGKey(13), 1)
    assert Xrec.shape == (1, N, T, 1, IMG, IMG)
    assert np.isfinite(float(mse))
    manual = compute_test_error(X, Xrec[0])
    np.testing.assert_allclose(float(mse), float(manual), rtol=1e-6)


@pytest.mark.slow
def test_second_order_model():
    model, variables, gp = init_model(
        jax.random.PRNGKey(20), latent_dim=2, n_filt=4, order=2, frames=3,
        num_features=16, num_inducing=8, batch=N, T=T)
    assert gp.D_in == 4 and gp.D_out == 2
    X = make_batch(jax.random.PRNGKey(21))
    Xrec, (s_mu, _), (v_mu, _), _ = model.apply(
        variables, X, gp, jax.random.PRNGKey(22), L=2, train=False)
    assert Xrec.shape == (2, N, T, 1, IMG, IMG)
    assert v_mu.shape == (N, 2)

    # gradient flows into the velocity encoder
    state, tx = create_train_state(model, variables, gp)
    step = make_train_step(model, tx, num_observations=float(N),
                           eps_guard=True)
    state2, m = step(state, X, jax.random.PRNGKey(23), 1)
    assert np.isfinite(float(m['loss']))
    leaves_before = jax.tree_util.tree_leaves(
        state.vae_params['encoder_v'])
    leaves_after = jax.tree_util.tree_leaves(state2.vae_params['encoder_v'])
    assert any(not np.allclose(b, a)
               for b, a in zip(leaves_before, leaves_after))


@pytest.mark.slow
def test_df_kernel_model():
    model, variables, gp = init_model(
        jax.random.PRNGKey(30), latent_dim=3, n_filt=4, order=1,
        kernel='DF', num_features=16, num_inducing=6, batch=N, T=T)
    X = make_batch(jax.random.PRNGKey(31))
    Xrec, _, _, _ = model.apply(variables, X, gp, jax.random.PRNGKey(32),
                                L=1, train=False)
    assert Xrec.shape == (1, N, T, 1, IMG, IMG)
    assert np.isfinite(np.asarray(Xrec)).all()

    state, tx = create_train_state(model, variables, gp)
    step = make_train_step(model, tx, num_observations=float(N),
                           eps_guard=True)
    state, m = step(state, X, jax.random.PRNGKey(33), 1)
    assert np.isfinite(float(m['loss']))


def test_frozen_vae_training():
    """freeze_vae: VAE params AND BatchNorm statistics must not move (the
    reference sets the pretrained encoder/decoder to eval() mode,
    main.py:163-164, so running stats are used and never updated); GP
    params must move."""
    model, variables, gp = init_model(
        jax.random.PRNGKey(40), latent_dim=3, n_filt=4, order=1,
        num_features=16, num_inducing=8, batch=N, T=T)
    state, tx = create_train_state(model, variables, gp, freeze_vae=True)
    step = make_train_step(model, tx, num_observations=float(N),
                           eps_guard=True, freeze_vae=True)
    X = make_batch(jax.random.PRNGKey(41))
    state2, _ = step(state, X, jax.random.PRNGKey(42), 1)
    for b, a in zip(jax.tree_util.tree_leaves(state.vae_params),
                    jax.tree_util.tree_leaves(state2.vae_params)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    for b, a in zip(jax.tree_util.tree_leaves(state.batch_stats),
                    jax.tree_util.tree_leaves(state2.batch_stats)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    assert not np.allclose(np.asarray(state.gp.Um),
                           np.asarray(state2.gp.Um))


def test_unfrozen_training_updates_batch_stats(setup):
    """The default (unfrozen) step keeps train-mode BN: running stats
    move every step (reference semantics)."""
    from vae_gp_ode_tpu.training.trainer import create_train_state as cts
    model, variables, gp = setup
    state, tx = cts(model, variables, gp)
    step = make_train_step(model, tx, num_observations=float(N),
                           eps_guard=True)
    X = make_batch(jax.random.PRNGKey(43))
    state2, _ = step(state, X, jax.random.PRNGKey(44), 1)
    before = np.concatenate([np.ravel(x) for x in
                             jax.tree_util.tree_leaves(state.batch_stats)])
    after = np.concatenate([np.ravel(x) for x in
                            jax.tree_util.tree_leaves(state2.batch_stats)])
    assert not np.allclose(before, after)


def test_epoch_eval_step_reference_bn_semantics(setup):
    """make_epoch_eval_step replicates the reference per-epoch eval
    (main.py:236-246): train-mode BN (batch statistics) and the running
    stats ARE updated by the eval forward; make_eval_step (the notebook
    protocol, model.eval()) returns a different MSE and touches nothing."""
    from vae_gp_ode_tpu.training.trainer import make_epoch_eval_step
    model, variables, gp = setup
    state, tx = create_train_state(model, variables, gp)
    X = make_batch(jax.random.PRNGKey(45))
    k = jax.random.PRNGKey(46)

    ep_ev = make_epoch_eval_step(model)
    Xrec_t, mse_t, new_bs = ep_ev(state, X, k, 1)
    before = np.concatenate([np.ravel(x) for x in
                             jax.tree_util.tree_leaves(state.batch_stats)])
    after = np.concatenate([np.ravel(x) for x in
                            jax.tree_util.tree_leaves(new_bs)])
    assert not np.allclose(before, after)

    ev = make_eval_step(model)
    Xrec_e, mse_e = ev(state, X, k, 1)
    # same weights, same key: only the BN mode differs
    assert not np.allclose(float(mse_t), float(mse_e))


@pytest.mark.slow
def test_train_epoch_matches_per_step_path(setup):
    """The whole-epoch scan must produce the same state/metrics as the
    per-step loop given identical keys and batch order."""
    import jax.numpy as jnp
    from vae_gp_ode_tpu.training.trainer import make_train_epoch
    model, variables, gp = setup
    state, tx = create_train_state(model, variables, gp)
    step = make_train_step(model, tx, num_observations=float(N),
                           eps_guard=True)
    epoch = make_train_epoch(model, tx, num_observations=float(N),
                             eps_guard=True)

    batches = jnp.stack([make_batch(jax.random.PRNGKey(50 + i))
                         for i in range(3)])
    key = jax.random.PRNGKey(60)

    s_e, metrics = epoch(state, batches, key, 1)

    s_l = state
    k = key
    losses = []
    for i in range(3):
        k, k_step = jax.random.split(k)
        s_l, m = step(s_l, batches[i], k_step, 1)
        losses.append(float(m['loss']))

    np.testing.assert_allclose(np.asarray(metrics['loss']),
                               np.asarray(losses), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_e.gp.Um),
                               np.asarray(s_l.gp.Um), rtol=1e-4,
                               atol=1e-6)
    assert int(s_e.step) == 3


@pytest.mark.slow
def test_run_epoch_with_tail_matches_per_step_loop(setup):
    """Non-divisor split (VERDICT r2 #9): the scanned epoch + one tail
    dispatch must reproduce the per-step loop over head batches then the
    short tail batch with the same key schedule - no sequence dropped."""
    import jax.numpy as jnp
    from vae_gp_ode_tpu.training.trainer import (
        make_train_epoch, run_epoch_with_tail)
    model, variables, gp = setup
    state, tx = create_train_state(model, variables, gp)
    step = make_train_step(model, tx, num_observations=float(N),
                           eps_guard=True)
    epoch = make_train_epoch(model, tx, num_observations=float(N),
                             eps_guard=True)

    batches = jnp.stack([make_batch(jax.random.PRNGKey(70 + i))
                         for i in range(2)])
    tail = make_batch(jax.random.PRNGKey(72), n=2)   # short batch
    key = jax.random.PRNGKey(80)

    s_e, metrics = run_epoch_with_tail(epoch, step, state, batches, tail,
                                       key, 1)
    assert metrics['loss'].shape == (3,)

    # per-step replay with the identical key schedule
    k_scan, k_tail = jax.random.split(key)
    s_l, k = state, k_scan
    losses = []
    for i in range(2):
        k, k_step = jax.random.split(k)
        s_l, m = step(s_l, batches[i], k_step, 1)
        losses.append(float(m['loss']))
    s_l, m = step(s_l, tail, k_tail, 1)
    losses.append(float(m['loss']))

    np.testing.assert_allclose(np.asarray(metrics['loss']),
                               np.asarray(losses), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_e.gp.Um),
                               np.asarray(s_l.gp.Um), rtol=1e-4,
                               atol=1e-6)
    assert int(s_e.step) == 3


@pytest.mark.slow
def test_run_epoch_with_tail_none_tail_is_identity(setup):
    """With tail=None the helper must reduce to the plain scanned epoch
    (key still split the same way, so results match the tail path's
    scan portion)."""
    import jax.numpy as jnp
    from vae_gp_ode_tpu.training.trainer import (
        make_train_epoch, run_epoch_with_tail)
    model, variables, gp = setup
    state, tx = create_train_state(model, variables, gp)
    step = make_train_step(model, tx, num_observations=float(N),
                           eps_guard=True)
    epoch = make_train_epoch(model, tx, num_observations=float(N),
                             eps_guard=True)
    batches = jnp.stack([make_batch(jax.random.PRNGKey(90 + i))
                         for i in range(2)])
    key = jax.random.PRNGKey(91)
    s_t, m_t = run_epoch_with_tail(epoch, step, state, batches, None,
                                   key, 1)
    k_scan, _ = jax.random.split(key)
    s_p, m_p = epoch(state, batches, k_scan, 1)
    np.testing.assert_allclose(np.asarray(m_t['loss']),
                               np.asarray(m_p['loss']), rtol=1e-6)
    assert int(s_t.step) == int(s_p.step) == 2


@pytest.mark.slow
def test_frozen_vae_order2_velocity_encoder_stays_train_mode():
    """The reference's pretrained path eval()s encoder and decoder but NOT
    encoder_v (main.py:163-164), so a frozen order-2 run keeps the
    velocity encoder's BatchNorm in train mode: its running stats UPDATE
    while encoder/decoder stats and ALL VAE params stay frozen (round-3
    review parity finding)."""
    model, variables, gp = init_model(
        jax.random.PRNGKey(50), latent_dim=3, n_filt=4, order=2,
        frames=3, num_features=16, num_inducing=8, batch=N, T=T)
    state, tx = create_train_state(model, variables, gp, freeze_vae=True)
    step = make_train_step(model, tx, num_observations=float(N),
                           eps_guard=True, freeze_vae=True)
    X = make_batch(jax.random.PRNGKey(51))
    state2, _ = step(state, X, jax.random.PRNGKey(52), 1)
    for b, a in zip(jax.tree_util.tree_leaves(state.vae_params),
                    jax.tree_util.tree_leaves(state2.vae_params)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    bs0, bs1 = state.batch_stats, state2.batch_stats
    assert jax.tree_util.tree_structure(bs0) == \
        jax.tree_util.tree_structure(bs1)
    for name in ('encoder', 'decoder'):
        for b, a in zip(jax.tree_util.tree_leaves(bs0[name]),
                        jax.tree_util.tree_leaves(bs1[name])):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    moved = any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(jax.tree_util.tree_leaves(bs0['encoder_v']),
                        jax.tree_util.tree_leaves(bs1['encoder_v'])))
    assert moved, 'encoder_v running stats must update (train-mode BN)'


@pytest.mark.slow
def test_train_segment_matches_per_epoch_driver(setup):
    """make_train_segment (E epochs + ragged tail + monitoring eval in
    ONE dispatch) must reproduce the per-epoch driver sequence - same
    batches, same key-split order - to float tolerance (it is a separate
    XLA compilation, so fusion rounding may differ at ~1e-6 relative;
    anything larger means wrong batches/keys/semantics)."""
    from vae_gp_ode_tpu.training.trainer import (
        make_train_epoch, make_train_segment, make_epoch_eval_step,
        run_epoch_with_tail)
    model, variables, gp = setup
    state0, tx = create_train_state(model, variables, gp)
    step = make_train_step(model, tx, num_observations=float(N),
                           eps_guard=True)
    epoch = make_train_epoch(model, tx, num_observations=float(N),
                             eps_guard=True)
    ep_ev = make_epoch_eval_step(model)
    segment = make_train_segment(model, tx, num_observations=float(N),
                                 eps_guard=True)

    E, I, R = 2, 2, 2
    Xtr = make_batch(jax.random.PRNGKey(100), n=I * N + R)
    Xte = make_batch(jax.random.PRNGKey(101), n=N + 1)
    rng = np.random.RandomState(0)
    heads = jnp.asarray(np.stack(
        [rng.permutation(I * N + R)[:I * N].reshape(I, N)
         for _ in range(E)]).astype(np.int32))
    tails = jnp.asarray(rng.randint(0, I * N + R,
                                    size=(E, R)).astype(np.int32))
    test_idx = jnp.asarray(np.stack(
        [rng.permutation(N + 1)[:N] for _ in range(E)]).astype(np.int32))
    key0 = jax.random.PRNGKey(200)

    # --- per-epoch driver replay (main.py's exact split order)
    st, key = state0, key0
    mses_ref, losses_ref = [], []
    for e in range(E):
        key, k_ep = jax.random.split(key)
        st, m = run_epoch_with_tail(epoch, step, st, Xtr[heads[e]],
                                    Xtr[tails[e]], k_ep, 1)
        losses_ref.append(np.asarray(m['loss']))
        key, k_ev = jax.random.split(key)
        _, mse, new_bs = ep_ev(st, Xte[test_idx[e]], k_ev, 1)
        st = st.replace(batch_stats=new_bs)
        mses_ref.append(float(mse))

    # --- one segment dispatch
    st_s, metrics, mses, key_s = segment(state0, Xtr, heads, tails, Xte,
                                         test_idx, key0, 1)

    assert metrics['loss'].shape == (E, I + 1)
    np.testing.assert_allclose(np.asarray(metrics['loss']),
                               np.stack(losses_ref), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(mses), np.asarray(mses_ref),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(st_s.gp.Um),
                               np.asarray(st.gp.Um), rtol=1e-3,
                               atol=1e-5)
    # the advanced key equals the host driver's (pure split bookkeeping)
    np.testing.assert_array_equal(
        jax.random.key_data(key_s), jax.random.key_data(key))
    assert int(st_s.step) == E * (I + 1)

    # tails=None variant compiles and keeps shapes
    st_n, m_n, mses_n, _ = segment(state0, Xtr[:I * N],
                                   heads % (I * N), None, Xte, test_idx,
                                   key0, 1)
    assert m_n['loss'].shape == (E, I) and mses_n.shape == (E,)


@pytest.mark.slow
def test_train_segment_freeze_vae_branch(setup):
    """Frozen-VAE segment: eval-mode monitoring eval (no BN mutation),
    VAE weights unchanged after a segment, GP still trains."""
    from vae_gp_ode_tpu.training.trainer import make_train_segment
    model, variables, gp = setup
    state0, tx = create_train_state(model, variables, gp,
                                    freeze_vae=True)
    segment = make_train_segment(model, tx, num_observations=float(N),
                                 eps_guard=True, freeze_vae=True)
    Xtr = make_batch(jax.random.PRNGKey(110), n=2 * N)
    Xte = make_batch(jax.random.PRNGKey(111), n=N)
    heads = jnp.asarray(
        np.stack([np.random.RandomState(e).permutation(2 * N).reshape(
            2, N) for e in range(2)]).astype(np.int32))
    test_idx = jnp.zeros((2, N), jnp.int32)
    st, metrics, mses, _ = segment(state0, Xtr, heads, None, Xte,
                                   test_idx, jax.random.PRNGKey(1), 1)
    assert np.isfinite(np.asarray(mses)).all()
    for a, b in zip(jax.tree_util.tree_leaves(st.vae_params),
                    jax.tree_util.tree_leaves(state0.vae_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # BN stats untouched (frozen VAE evals in eval mode)
    for a, b in zip(jax.tree_util.tree_leaves(st.batch_stats),
                    jax.tree_util.tree_leaves(state0.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(st.gp.Um),
                           np.asarray(state0.gp.Um))
