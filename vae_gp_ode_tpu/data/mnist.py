"""Rotating-MNIST data pipeline.

Rebuild of the reference data layer (reference: experiments/data/mnist.py,
utils.py, wrappers.py):

  * `load_mnist_data`: sequence loader for coupled training. Loads
    `rot-mnist.mat` (keys X (N, 16, 784), Y labels; filtered to digit 3)
    when present, else generates synthetic rotating glyphs with identical
    shapes. Splits train/valid/test, normalises with MNIST mean/std
    (reference utils.py:13-15 - a quirk, given the Bernoulli likelihood,
    preserved by default) and yields (B, T, 1, 28, 28) batches.
  * `rot_start`: random-initial-angle reshuffle. NOTE: in the reference
    the --rotrand branch is commented out (mnist.py:67-69) so the flag is
    a no-op; here it is implemented *active* but defaults to the
    reference-compatible off behaviour.
  * `load_rotating_mnist_data` / `create_rotating_dataset`: flat-frame
    loaders for VAE pretraining (unnormalised [0, 1] pixels,
    reference mnist.py:130-193).

The dataset is tiny (440 x 16 x 784 floats ~ 22 MB): it lives on-device as
one jnp array and batching is pure index slicing of a per-epoch
permutation - no host<->device transfer in the training loop.
"""

import os

import numpy as np
import jax.numpy as jnp

from vae_gp_ode_tpu.data import synthetic

MNIST_MEAN = 0.1307
MNIST_STD = 0.3081


class Loader:
    """Minimal epoch iterator over an on-device array.

    Replaces torch DataLoader (reference mnist.py:43-52): shuffles a
    permutation per epoch on host, slices on device.
    """

    def __init__(self, X, batch_size, shuffle=True, seed=0,
                 labels=None, drop_last=False):
        self.X = jnp.asarray(X)
        self.labels = None if labels is None else jnp.asarray(labels)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.RandomState(seed)
        self.drop_last = drop_last

    def __len__(self):
        n = self.X.shape[0]
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = self.X.shape[0]
        idx = self._rng.permutation(n) if self.shuffle else np.arange(n)
        for i in range(len(self)):
            sel = idx[i * self.batch_size:(i + 1) * self.batch_size]
            if self.labels is None:
                yield self.X[sel]
            else:
                yield self.X[sel], self.labels[sel]

    def first(self):
        it = iter(self)
        return next(it)

    def epoch_batches(self):
        """One epoch's batches stacked as (I, B, ...) on device (for the
        whole-epoch scanned train path).

        NOTE: the scan needs a static batch shape, so a ragged tail batch
        (when N % batch != 0) is dropped - unlike the reference DataLoader
        (drop_last=False) and this Loader's own __iter__. A warning is
        logged once per Loader. The training drivers use
        epoch_batches_with_tail instead, which returns the tail for a
        separate per-step dispatch so no sequence is ever dropped."""
        stacked, tail = self.epoch_batches_with_tail()
        if tail is not None and not getattr(self, '_tail_warned', False):
            import logging
            logging.getLogger(__name__).warning(
                'epoch_batches: dropping ragged tail batch of %d/%d '
                'sequences each epoch (N %% batch != 0); use '
                'epoch_batches_with_tail (or a divisor batch size) to '
                'see every sequence', tail.shape[0], self.X.shape[0])
            self._tail_warned = True
        return stacked

    def epoch_batches_with_tail(self):
        """(stacked (I, B, ...), tail (N % B, ...) or None) from ONE epoch
        permutation. The stacked part feeds the scanned whole-epoch train
        path (static shapes); the tail - the same sequences the reference
        DataLoader would yield as its final short batch (drop_last=False)
        - is trained with one extra per-step dispatch, so the scanned
        regime sees every sequence exactly once per epoch.

        Sequences only: labels (when this Loader carries them) are not
        returned - the scanned epoch paths are unlabeled; use __iter__
        for (x, label) batches."""
        n = self.X.shape[0]
        I = n // self.batch_size
        idx = (self._rng.permutation(n) if self.shuffle
               else np.arange(n))
        head = jnp.asarray(idx[:I * self.batch_size])
        stacked = self.X[head].reshape(
            (I, self.batch_size) + self.X.shape[1:])
        tail_idx = idx[I * self.batch_size:]
        tail = self.X[jnp.asarray(tail_idx)] if len(tail_idx) else None
        return stacked, tail

    def epoch_index_batches(self, n_epochs):
        """Index-only form of epoch_batches_with_tail for `n_epochs`
        epochs: (heads (E, I, B) int32, tails (E, N % B) int32 or None).
        Draws from the SAME permutation stream (one permutation per
        epoch), so a device-side training segment that gathers X[heads]
        sees bit-identically the batches n_epochs successive
        epoch_batches_with_tail() calls would have produced."""
        n = self.X.shape[0]
        I = n // self.batch_size
        heads, tails = [], []
        for _ in range(n_epochs):
            idx = (self._rng.permutation(n) if self.shuffle
                   else np.arange(n))
            heads.append(idx[:I * self.batch_size].reshape(
                I, self.batch_size))
            tails.append(idx[I * self.batch_size:])
        heads = jnp.asarray(np.stack(heads).astype(np.int32))
        tails = (jnp.asarray(np.stack(tails).astype(np.int32))
                 if n % self.batch_size else None)
        return heads, tails

    def first_index(self, n_epochs):
        """Indices of the first batch of `n_epochs` successive epochs,
        (E, min(B, N)) int32 - the index-only form of n_epochs first()
        calls, consuming the same one-permutation-per-epoch stream."""
        n = self.X.shape[0]
        out = []
        for _ in range(n_epochs):
            idx = (self._rng.permutation(n) if self.shuffle
                   else np.arange(n))
            out.append(idx[:self.batch_size])
        return jnp.asarray(np.stack(out).astype(np.int32))


def rot_start(X, T, seed=None):
    """Re-phase each sequence to a random initial rotation angle.

    Exact reference active-code semantics (mnist.py:14-22): frames
    [s:] followed by frames [1:s+1]. Note the reference's
    `torch.flip(..., dims=(1,))` flips the size-1 CHANNEL axis of
    (T, 1, 28, 28) slices - a no-op - so the output is a near-roll with a
    one-frame phase jump at the wrap (frame 0 is skipped, frame s appears
    twice when s > 0). Quirk preserved for parity.
    """
    rng = np.random.RandomState(seed)
    N = X.shape[0]
    start = rng.randint(0, T, N)
    out = np.empty_like(X)
    for n in range(N):
        s = start[n]
        out[n] = np.concatenate([X[n, s:], X[n, 1:s + 1]], axis=0)
    return out


def _read_mat(matpath, digit=None):
    """Load rot-mnist.mat -> float32 X, optionally filtered to `digit`
    (the one .mat read shared by the sequence and frame loaders)."""
    import scipy.io as sio
    d = sio.loadmat(matpath)
    X = np.squeeze(d['X'])
    if digit is not None:
        Y = np.squeeze(d['Y'])
        X = X[Y == digit]
    return X.astype(np.float32)


def _load_raw_sequences(data_root, Ntotal, T, digit=3, seed=0,
                        n_glyphs=0):
    """Raw (N, T, 784) in [0, 1]: .mat file if present, else synthetic.

    `n_glyphs` (synthetic source only): 0 = fresh glyph per sequence;
    k > 0 = closed k-glyph pool shared by the train/test splits (see
    synthetic.make_rotating_sequences)."""
    matpath = os.path.join(data_root, 'rot_mnist', 'rot-mnist.mat')
    if os.path.exists(matpath):
        return _read_mat(matpath, digit), 'mat'
    X = synthetic.make_rotating_sequences(Ntotal, T=T, seed=seed,
                                          n_glyphs=n_glyphs)
    return X, 'synthetic'


def load_mnist_data(data_root='data/', batch_size=20, T=16, Ndata=360,
                    Nvalid=40, Ntest=40, digit=3, rotrand=False,
                    normalize=True, seed=0, n_glyphs=0):
    """Train/valid/test Loaders of (B, T, 1, 28, 28) sequences.

    Reference split semantics (mnist.py:34-52): first Ndata train, next 40
    valid, next 40 test; batch 20; per-item reshape to (T, 1, 28, 28) and
    mean/std normalisation (utils.py:12-15). `rotrand` applies the
    rot_start reshuffle the reference left commented out.
    """
    Ntotal = Ndata + Nvalid + Ntest
    X, source = _load_raw_sequences(data_root, Ntotal, T, digit, seed,
                                    n_glyphs=n_glyphs)
    if source == 'mat' and X.shape[1] != T * 28 * 28 \
            and X.shape[1] != T:
        # the reference's X.view([N, T, 1, 28, 28]) ERRORS when the .mat
        # sequence length differs from --T; a silent reshape here would
        # re-chunk 16-frame sequences into T-frame pieces, leaking halves
        # of one raw sequence across the train/test split
        raw_T = (X.shape[1] if X.ndim == 3
                 else X.shape[1] // (28 * 28))
        raise ValueError(
            f'rot-mnist.mat sequences have T={raw_T} frames but --T={T} '
            f'was requested; the reference errors here too (mnist.py:34 '
            f'.view) - use --T {raw_T} with the .mat dataset')
    X = X[:Ntotal].reshape(-1, T, 1, 28, 28).astype(np.float32)
    if rotrand:
        X = rot_start(X, T, seed=seed)
    if normalize:
        X = (X - MNIST_MEAN) / MNIST_STD

    Xtr = X[:Ndata]
    Xva = X[Ndata:Ndata + Nvalid]
    Xte = X[Ndata + Nvalid:Ntotal]
    train = Loader(Xtr, batch_size, shuffle=True, seed=seed)
    valid = Loader(Xva, batch_size, shuffle=True, seed=seed + 1)
    test = Loader(Xte, batch_size, shuffle=True, seed=seed + 2)
    train.source = valid.source = test.source = source
    return train, valid, test


def load_data(args, plot=False):
    """Dispatch matching the reference wrapper (wrappers.py:3-6): returns
    (trainset, testset) for task 'mnist'."""
    task = getattr(args, 'task', 'mnist')
    if task != 'mnist':
        raise ValueError(f'Unknown task {task!r}')
    train, _, test = load_mnist_data(
        data_root=getattr(args, 'data_root', 'data/'),
        batch_size=getattr(args, 'batch', 20),
        T=getattr(args, 'T', 16),
        Ndata=getattr(args, 'Ndata', 360),
        Ntest=getattr(args, 'Ntest', 40),
        digit=getattr(args, 'value', 3),
        rotrand=getattr(args, 'rotrand', False) and
        getattr(args, 'rotrand_active', False),
        seed=getattr(args, 'seed', 0),
        n_glyphs=getattr(args, 'n_glyphs', 0),
    )
    return train, test


def load_mat_mnist_data(args, plot=False):
    """Frame-level loader over the .mat sequences: flatten the first
    Ndata/Ntest sequences into (N*T, 1, 28, 28) frames with frame-index
    time labels, UNNORMALISED (reference mnist.py:91-128 + the
    Dataset_labels wrapper, utils.py:17-28 - unused by the reference
    mains but part of its data surface).

    Returns (trainset, testset) Loaders yielding (frames, labels).
    """
    fullname = os.path.join(args.data_root, 'rot_mnist', 'rot-mnist.mat')
    X = _read_mat(fullname,
                  getattr(args, 'value', 3) if getattr(args, 'mask', True)
                  else None)

    N, Ntest, T = args.Ndata, args.Ntest, args.T
    seed = getattr(args, 'seed', 0)
    Xtr = X[:N].astype(np.float32).reshape(N * T, 1, 28, 28)
    Xte = X[N:N + Ntest].astype(np.float32).reshape(Ntest * T, 1, 28, 28)
    t = np.linspace(0, T - 1, T).astype(np.uint8).reshape(1, -1)
    tr_t = np.repeat(t, N, axis=0).reshape(-1)
    te_t = np.repeat(t, Ntest, axis=0).reshape(-1)
    trainset = Loader(Xtr, args.batch, shuffle=True, seed=seed,
                      labels=tr_t)
    testset = Loader(Xte, args.batch, shuffle=True, seed=seed + 1,
                     labels=te_t)
    if plot:
        from vae_gp_ode_tpu.utils import plotting
        x, _ = trainset.first()
        plotting.plot_data(np.asarray(x)[None, :16],
                           fname=os.path.join(args.save, 'plots/data.png'),
                           size=1)
    return trainset, testset


def create_rotating_dataset(save_dir=None, digit=3, train_n=100, test_n=10,
                            n_angles=64, seed=0):
    """Flat rotating frames for VAE pretraining (reference
    mnist.py:162-193). Returns (train (train_n*n_angles or layout below),
    test) arrays shaped (N, n_angles, 1, 28, 28) in [0, 1].

    Without torchvision/network the digits are synthetic glyphs (the
    generator draws one glyph class, so `digit` selections other than the
    default cannot be honoured - warned, not silently ignored). The
    caller saves the arrays (main_vae.py), matching the reference's
    data_path usage; `save_dir` is accepted for signature parity only."""
    if digit != 3:
        import warnings
        warnings.warn(
            f'create_rotating_dataset: digit={digit} requested but the '
            f'synthetic generator draws one glyph class (no MNIST file '
            f'or torchvision in this environment) - returning glyphs',
            stacklevel=2)
    train = synthetic.make_rotating_frames(train_n, n_angles, seed=seed)
    test = synthetic.make_rotating_frames(test_n, n_angles, seed=seed + 1)
    return train.astype(np.float32), test.astype(np.float32)


def load_rotating_mnist_data(data_path, n_angle, batch_size, seed=0):
    """Flat (frame, time-label) loader over a saved .npy
    (reference mnist.py:130-146): x (N*n_angle, 1, 28, 28) unnormalised,
    labels are frame indices 0..n_angle-1."""
    x = np.load(data_path).reshape((-1, 1, 28, 28)).astype(np.float32)
    t = np.linspace(0, n_angle - 1, n_angle).astype(np.uint8).reshape(1, -1)
    labels = np.repeat(t, x.shape[0] // n_angle, axis=0).reshape(-1)
    return Loader(x, batch_size, shuffle=True, seed=seed, labels=labels)
