"""Synthetic rotating-digit data generator.

The reference trains on `data/rot_mnist/rot-mnist.mat` (not redistributed
with the repo) or on torchvision-downloaded MNIST (reference
experiments/data/mnist.py:26, 162-193). Neither a dataset file nor network
access is available in this environment, so this module procedurally draws
digit-like glyphs and rotates them through uniform angles with
scipy.ndimage - producing data with the same shapes, value range and
rotation structure as the reference's rot-MNIST so the full pipeline
(including published-metric evaluation protocol) runs end-to-end.
Real `.mat`/`.npy` files are used automatically when present.
"""

import numpy as np

try:
    from scipy.ndimage import rotate as _nd_rotate
    _HAVE_SCIPY = True
except ImportError:  # pragma: no cover
    _HAVE_SCIPY = False


def _draw_digit3(rng, size=28):
    """Draw a '3'-like glyph: two stacked right-open arcs, with small
    random thickness/scale/offset variation per instance."""
    img = np.zeros((size, size), np.float32)
    cx = size / 2 + rng.uniform(-1.0, 1.0)
    cy = size / 2 + rng.uniform(-1.0, 1.0)
    r = size * 0.22 * rng.uniform(0.9, 1.1)
    thick = rng.uniform(1.2, 1.9)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)

    for sign in (-1.0, 1.0):
        ay = cy + sign * r * 0.85
        d = np.sqrt((xx - cx) ** 2 + (yy - ay) ** 2)
        ring = np.exp(-((d - r) ** 2) / (2 * thick ** 2))
        # keep the right-open part of the arc (angle gate)
        ang = np.arctan2(yy - ay, xx - cx)
        gate = np.cos(ang - sign * 0.35) > -0.45
        img = np.maximum(img, ring * gate)

    img = np.clip(img * rng.uniform(0.95, 1.15), 0.0, 1.0)
    return img


def rotate_image(img, angle_deg, prefer_native=True):
    """Rotate one (H, W) image, same conventions as the reference
    (scipy.ndimage.rotate, reshape=False; reference mnist.py:149-160).

    Uses the native C++ bilinear kernel (vae_gp_ode_tpu.native) when a
    compiler is available - ~30x faster than scipy's spline path - with
    scipy as fallback."""
    if prefer_native:
        from vae_gp_ode_tpu import native
        if native.native_available():
            return native.rotate_bilinear(img, angle_deg)
    if _HAVE_SCIPY:
        return np.clip(
            _nd_rotate(img, angle_deg, reshape=False, order=1), 0.0, 1.0)
    raise RuntimeError('scipy required for rotation (or g++ for the '
                       'native kernel)')


def make_rotating_sequences(n_sequences, T=16, size=28, seed=0,
                            start_angle_zero=True, n_glyphs=None):
    """Generate (N, T, size*size) float32 in [0, 1]: each sequence is one
    glyph rotated through T uniform angles covering a full turn.

    Matches the reference rot-MNIST layout: X (N, 16, 784), fixed initial
    angle (the --rotrand reshuffle is applied downstream when asked).

    `n_glyphs`: None/0 draws a fresh glyph per sequence (open-set: every
    test glyph is an unseen instance - the analog of the reference's
    regime, where test digit-3s are distinct instances from the same
    MNIST distribution). A positive int draws that many base glyphs and
    assigns them round-robin, making a CLOSED-SET ablation: with the
    deterministic angle grid, test sequences are then replicas of
    training sequences, so the resulting MSE is a memorisation/fidelity
    UPPER BOUND (how well the pipeline can represent and propagate the
    rotation with appearance generalisation removed), not a
    generalisation measure.
    """
    rng = np.random.RandomState(seed)
    n_bases = n_sequences if not n_glyphs else min(int(n_glyphs),
                                                   n_sequences)
    pool = np.stack([_draw_digit3(rng, size) for _ in range(n_bases)])
    bases = pool[np.arange(n_sequences) % n_bases]
    if start_angle_zero:
        offsets = np.zeros(n_sequences, np.float32)
    else:
        offsets = rng.uniform(0, 360, n_sequences).astype(np.float32)

    from vae_gp_ode_tpu import native
    if native.native_available():
        # batched C++ bilinear rotation (~10x scipy)
        X = native.make_rot_sequences(bases, T, offsets)
        return X.reshape(n_sequences, T, size * size)

    X = np.zeros((n_sequences, T, size * size), np.float32)
    angles = np.arange(T) * (360.0 / T)
    for n in range(n_sequences):
        for t in range(T):
            X[n, t] = rotate_image(bases[n], angles[t] + offsets[n],
                                   prefer_native=False).reshape(-1)
    return X


def make_rotating_frames(n_digits, n_angles=16, size=28, seed=0):
    """Generate (n_digits, n_angles, 1, size, size) float32 in [0, 1] -
    the flat-frame layout used for VAE pretraining (reference
    mnist.py:162-193: rotate each digit through n_angles uniform angles
    in [0, 2pi), first frame unrotated)."""
    rng = np.random.RandomState(seed)
    angles = np.linspace(0, 2 * np.pi, n_angles)[1:]
    angles = np.rad2deg(angles)
    out = np.zeros((n_digits, n_angles, 1, size, size), np.float32)
    for n in range(n_digits):
        base = _draw_digit3(rng, size)
        out[n, 0, 0] = base
        for i, a in enumerate(angles):
            out[n, i + 1, 0] = rotate_image(base, a)
    return out
