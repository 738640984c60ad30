"""Data pipeline tests: shapes, normalisation, splits, rot_start, loaders."""

import numpy as np
import jax.numpy as jnp

from vae_gp_ode_tpu.data import mnist as dm
from vae_gp_ode_tpu.data import synthetic


def test_synthetic_sequences_shapes_and_range():
    X = synthetic.make_rotating_sequences(5, T=16, seed=0)
    assert X.shape == (5, 16, 784)
    assert X.dtype == np.float32
    assert X.min() >= 0.0 and X.max() <= 1.0
    # frames must actually vary (rotation is happening)
    assert np.abs(X[0, 0] - X[0, 4]).max() > 0.1
    # the glyph must have substantial support
    assert (X[0, 0] > 0.3).sum() > 30


def test_synthetic_full_rotation_returns_near_start():
    """T uniform angles covering 360 deg: frame T is frame 0 again, so
    frame T-1 is one step before closing the loop - it must be closer to
    frame 0 than the half-rotation frame is."""
    X = synthetic.make_rotating_sequences(3, T=16, seed=1)
    d_half = np.abs(X[:, 8] - X[:, 0]).mean()
    d_last = np.abs(X[:, 15] - X[:, 0]).mean()
    assert d_last < d_half


def test_load_mnist_data_split_and_norm():
    train, valid, test = dm.load_mnist_data(
        data_root='/nonexistent', batch_size=4, T=16, Ndata=12, Nvalid=4,
        Ntest=4, seed=0)
    assert train.source == 'synthetic'
    assert train.X.shape == (12, 16, 1, 28, 28)
    assert valid.X.shape == (4, 16, 1, 28, 28)
    assert test.X.shape == (4, 16, 1, 28, 28)
    b = train.first()
    assert b.shape == (4, 16, 1, 28, 28)
    # normalised: min is exactly -mean/std where pixels are 0
    np.testing.assert_allclose(float(b.min()), -0.1307 / 0.3081, rtol=1e-4)


def test_loader_iterates_all_and_shuffles():
    X = np.arange(10, dtype=np.float32).reshape(10, 1)
    ld = dm.Loader(X, batch_size=3, shuffle=True, seed=0)
    assert len(ld) == 4
    seen = np.sort(np.concatenate([np.asarray(b).ravel() for b in ld]))
    np.testing.assert_array_equal(seen, np.arange(10))
    # two epochs differ in order
    e1 = np.concatenate([np.asarray(b).ravel() for b in ld])
    e2 = np.concatenate([np.asarray(b).ravel() for b in ld])
    assert not np.array_equal(e1, e2)


def test_rot_start_preserves_frame_multiset():
    X = np.random.RandomState(0).rand(6, 16, 1, 28, 28).astype(np.float32)
    out = dm.rot_start(X, 16, seed=1)
    assert out.shape == X.shape
    for n in range(6):
        a = np.sort(X[n].reshape(16, -1).sum(1))
        b = np.sort(out[n].reshape(16, -1).sum(1))
        # each output frame is one of the input frames (possibly dup of
        # frame pattern) - total mass multiset should broadly agree
        assert abs(a.sum() - b.sum()) / a.sum() < 0.2


def test_rotating_frames_for_pretraining(tmp_path):
    train, test = dm.create_rotating_dataset(str(tmp_path), train_n=3,
                                             test_n=2, n_angles=8)
    assert train.shape == (3, 8, 1, 28, 28)
    assert test.shape == (2, 8, 1, 28, 28)
    p = tmp_path / 'rot_train.npy'
    np.save(p, train)
    ld = dm.load_rotating_mnist_data(str(p), n_angle=8, batch_size=5)
    x, t = ld.first()
    assert x.shape == (5, 1, 28, 28)
    assert t.shape == (5,)
    assert int(t.max()) <= 7


def test_mat_file_ingestion(tmp_path):
    """Exercise the real rot-mnist.mat branch (data/mnist.py
    _load_raw_sequences; reference mnist.py:25-52 semantics): scipy
    loadmat, digit filter Y==3, ordered split, normalisation."""
    import scipy.io as sio

    rng = np.random.RandomState(0)
    Ntotal, T = 14, 16
    # 20 sequences, digits alternating 3 and 7: only the 10 threes survive
    X = rng.rand(20, T, 784).astype(np.float64)
    Y = np.array([3, 7] * 10).reshape(-1, 1)
    matdir = tmp_path / 'rot_mnist'
    matdir.mkdir()
    sio.savemat(str(matdir / 'rot-mnist.mat'), {'X': X, 'Y': Y})

    train, valid, test = dm.load_mnist_data(
        data_root=str(tmp_path), batch_size=2, T=T, Ndata=6, Nvalid=2,
        Ntest=2, digit=3, seed=0)
    assert train.source == 'mat'
    assert train.X.shape == (6, T, 1, 28, 28)
    assert valid.X.shape == (2, T, 1, 28, 28)
    assert test.X.shape == (2, T, 1, 28, 28)

    # the split is ordered over the digit-3 subsequence, and each item is
    # reshaped + normalised exactly as the reference Dataset.__getitem__
    # (utils.py:12-15): (x - 0.1307) / 0.3081
    threes = X[Y[:, 0] == 3].astype(np.float32)
    expect_train = (threes[:6].reshape(6, T, 1, 28, 28)
                    - dm.MNIST_MEAN) / dm.MNIST_STD
    np.testing.assert_allclose(np.asarray(train.X), expect_train,
                               rtol=1e-6, atol=1e-6)
    expect_test = (threes[8:10].reshape(2, T, 1, 28, 28)
                   - dm.MNIST_MEAN) / dm.MNIST_STD
    np.testing.assert_allclose(np.asarray(test.X), expect_test,
                               rtol=1e-6, atol=1e-6)


def test_mat_file_digit_filter_other_digit(tmp_path):
    """--value selects the digit (reference main.py:28 --value 3)."""
    import scipy.io as sio

    rng = np.random.RandomState(1)
    X = rng.rand(8, 16, 784)
    Y = np.array([1, 1, 1, 1, 3, 3, 3, 3]).reshape(-1, 1)
    matdir = tmp_path / 'rot_mnist'
    matdir.mkdir()
    sio.savemat(str(matdir / 'rot-mnist.mat'), {'X': X, 'Y': Y})
    train, valid, test = dm.load_mnist_data(
        data_root=str(tmp_path), batch_size=2, T=16, Ndata=2, Nvalid=1,
        Ntest=1, digit=1, seed=0)
    assert train.source == 'mat'
    ones = X[Y[:, 0] == 1].astype(np.float32)
    expect = (ones[:2].reshape(2, 16, 1, 28, 28)
              - dm.MNIST_MEAN) / dm.MNIST_STD
    np.testing.assert_allclose(np.asarray(train.X), expect, rtol=1e-6,
                               atol=1e-6)


def test_load_mat_mnist_data_frame_level(tmp_path):
    """Frame-level .mat loader (reference mnist.py:91-128): flat
    UNNORMALISED frames + frame-index labels."""
    import types
    import scipy.io as sio

    rng = np.random.RandomState(2)
    T = 4
    X = rng.rand(6, T, 784)
    Y = np.array([3, 3, 3, 3, 3, 7]).reshape(-1, 1)
    matdir = tmp_path / 'rot_mnist'
    matdir.mkdir()
    sio.savemat(str(matdir / 'rot-mnist.mat'), {'X': X, 'Y': Y})

    args = types.SimpleNamespace(data_root=str(tmp_path), mask=True,
                                 value=3, Ndata=3, Ntest=2, T=T, batch=4,
                                 seed=0)
    train, test = dm.load_mat_mnist_data(args)
    assert train.X.shape == (3 * T, 1, 28, 28)
    assert test.X.shape == (2 * T, 1, 28, 28)
    x, y = train.first()
    assert x.shape == (4, 1, 28, 28)
    assert y.shape == (4,)
    assert int(np.asarray(y).max()) < T
    # unnormalised [0,1] pixels (no mean/std shift)
    assert float(np.asarray(train.X).min()) >= 0.0
    threes = X[Y[:, 0] == 3].astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(train.X), threes[:3].reshape(3 * T, 1, 28, 28),
        rtol=1e-6)


def test_glyph_pool_closed_set():
    """--n_glyphs k: sequences are drawn from a closed k-glyph pool
    assigned round-robin, so the train/test splits share appearances
    (a closed-set memorisation-bound ablation - test sequences replicate
    training ones); 0 keeps one fresh glyph per sequence (open-set)."""
    from vae_gp_ode_tpu.data import synthetic

    Xp = synthetic.make_rotating_sequences(8, T=4, seed=3, n_glyphs=2)
    # round-robin: sequence i uses glyph i % 2
    np.testing.assert_array_equal(Xp[0], Xp[2])
    np.testing.assert_array_equal(Xp[1], Xp[7])
    assert not np.array_equal(Xp[0], Xp[1])

    Xo = synthetic.make_rotating_sequences(8, T=4, seed=3)
    assert not np.array_equal(Xo[0], Xo[2])

    # threaded through the sequence loader: train and test share glyphs
    train, _, test = dm.load_mnist_data(
        data_root='/nonexistent_so_synthetic', batch_size=4, T=4,
        Ndata=8, Nvalid=4, Ntest=4, seed=3, n_glyphs=2)
    tr = np.asarray(train.X)
    te = np.asarray(test.X)
    assert any(np.array_equal(te[j], tr[i])
               for j in range(te.shape[0]) for i in range(tr.shape[0]))


def test_epoch_batches_with_tail_covers_every_sequence():
    """Non-divisor split: stacked head + tail together cover every
    sequence exactly once (the reference DataLoader's drop_last=False);
    divisor split: tail is None."""
    X = np.arange(10, dtype=np.float32).reshape(10, 1)
    ld = dm.Loader(X, batch_size=4, shuffle=True, seed=0)
    stacked, tail = ld.epoch_batches_with_tail()
    assert stacked.shape == (2, 4, 1)
    assert tail is not None and tail.shape == (2, 1)
    seen = np.sort(np.concatenate([np.asarray(stacked).ravel(),
                                   np.asarray(tail).ravel()]))
    np.testing.assert_array_equal(seen, np.arange(10))

    ld2 = dm.Loader(X[:8], batch_size=4, shuffle=False, seed=0)
    stacked2, tail2 = ld2.epoch_batches_with_tail()
    assert stacked2.shape == (2, 4, 1) and tail2 is None


def test_epoch_index_batches_same_permutation_stream():
    """The index-only form draws from the SAME one-permutation-per-epoch
    stream as epoch_batches_with_tail / first(), so a device-side
    multi-epoch segment gathering X[heads] trains on bit-identical
    batches (and the eval sees the identical first test batch)."""
    X = np.arange(20, dtype=np.float32).reshape(10, 2)
    a = dm.Loader(X, batch_size=4, shuffle=True, seed=7)
    b = dm.Loader(X, batch_size=4, shuffle=True, seed=7)
    heads, tails = b.epoch_index_batches(3)
    assert heads.shape == (3, 2, 4) and tails.shape == (3, 2)
    for e in range(3):
        stacked, tail = a.epoch_batches_with_tail()
        np.testing.assert_array_equal(np.asarray(b.X[heads[e]]),
                                      np.asarray(stacked))
        np.testing.assert_array_equal(np.asarray(b.X[tails[e]]),
                                      np.asarray(tail))

    c = dm.Loader(X, batch_size=4, shuffle=True, seed=9)
    d = dm.Loader(X, batch_size=4, shuffle=True, seed=9)
    idx = d.first_index(2)
    assert idx.shape == (2, 4)
    for e in range(2):
        np.testing.assert_array_equal(np.asarray(d.X[idx[e]]),
                                      np.asarray(c.first()))

    # divisor split: no tail; unshuffled: identity order
    e1 = dm.Loader(X[:8], batch_size=4, shuffle=False, seed=0)
    h, t = e1.epoch_index_batches(2)
    assert t is None
    np.testing.assert_array_equal(np.asarray(h[0]).ravel(),
                                  np.arange(8))
