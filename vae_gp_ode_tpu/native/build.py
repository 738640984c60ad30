"""Build + ctypes bindings for the native data-generation library.

Compiles rotate.cpp with g++ -O3 on first use into a per-user cache dir
(no pybind11 dependency; plain C ABI + ctypes). All entry points degrade
gracefully: `native_available()` is False if no compiler is present and
callers fall back to scipy.
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'rotate.cpp')


def _cache_dir():
    d = os.environ.get('VAE_GP_ODE_NATIVE_CACHE',
                       os.path.join(os.path.expanduser('~'), '.cache',
                                    'vae_gp_ode_tpu'))
    os.makedirs(d, exist_ok=True)
    return d


def load_library():
    """Compile (if needed) and load the shared library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            with open(_SRC, 'rb') as f:
                src_hash = hashlib.sha256(f.read()).hexdigest()[:16]
            # -march=native output is host-ISA-specific: key the cache by
            # host too, so a cache dir shared between heterogeneous
            # machines (NFS home) never dlopens an AVX build on a host
            # without those extensions (SIGILL with no fallback)
            import platform
            host = hashlib.sha256(
                f'{platform.machine()}-{platform.processor()}-'
                f'{platform.node()}'.encode()).hexdigest()[:8]
            tag = f'{src_hash}-{host}'
            so_path = os.path.join(_cache_dir(), f'librotate_{tag}.so')
            if not os.path.exists(so_path):
                subprocess.run(
                    ['g++', '-O3', '-march=native', '-shared', '-fPIC',
                     _SRC, '-o', so_path],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so_path)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.rotate_bilinear.argtypes = [f32p, f32p, ctypes.c_int,
                                            ctypes.c_int, ctypes.c_float]
            lib.make_rot_sequences.argtypes = [
                f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, f32p]
            lib.rotate_batch.argtypes = [f32p, f32p, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int, f32p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available():
    return load_library() is not None


def _require_library():
    lib = load_library()
    if lib is None:
        raise RuntimeError(
            'native rotation library unavailable (no C++ compiler found '
            'and no cached build); guard calls with native_available() '
            'or use the scipy path (data.synthetic.rotate_image)')
    return lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rotate_bilinear(img, angle_deg):
    """Rotate (h, w) float32 image; scipy reshape=False order=1 semantics."""
    lib = _require_library()
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty_like(img)
    lib.rotate_bilinear(_fp(img), _fp(out), img.shape[0], img.shape[1],
                        float(angle_deg))
    return out


def make_rot_sequences(bases, T, offsets=None):
    """(n, h, w) base images -> (n, T, h, w) full-turn rotation sequences,
    clipped to [0, 1]."""
    lib = _require_library()
    bases = np.ascontiguousarray(bases, np.float32)
    n, h, w = bases.shape
    if offsets is None:
        offsets = np.zeros(n, np.float32)
    offsets = np.ascontiguousarray(offsets, np.float32)
    out = np.empty((n, T, h, w), np.float32)
    lib.make_rot_sequences(_fp(bases), _fp(out), n, T, h, w, _fp(offsets))
    return out


def rotate_batch(imgs, angles):
    """(n, h, w) images rotated by per-image angles, clipped to [0, 1]."""
    lib = _require_library()
    imgs = np.ascontiguousarray(imgs, np.float32)
    n, h, w = imgs.shape
    angles = np.ascontiguousarray(angles, np.float32)
    out = np.empty_like(imgs)
    lib.rotate_batch(_fp(imgs), _fp(out), n, h, w, _fp(angles))
    return out
