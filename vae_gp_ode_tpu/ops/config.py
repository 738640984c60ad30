"""Runtime switches for the Pallas fast paths.

The jnp reference implementations are always available and are the source
of truth for parity tests and for reverse-mode gradients; the Pallas
kernels are forward fast paths enabled on TPU backends.
"""

import jax

_use_pallas = None


def use_pallas():
    """True if the Pallas fast paths should be used (TPU backend, not
    overridden)."""
    global _use_pallas
    if _use_pallas is not None:
        return _use_pallas
    try:
        return jax.default_backend() not in ('cpu',)
    except Exception:
        return False


def set_use_pallas(value):
    """Override (True/False) or reset (None) the Pallas fast-path switch."""
    global _use_pallas
    _use_pallas = value


def interpret_mode():
    """True when the Pallas kernels must run in interpret mode (non-TPU
    backend). Lets tests force the *real dispatch path* (incl. the
    custom_vjp boundary that forbids forward-mode AD) on CPU via
    set_use_pallas(True)."""
    try:
        return jax.default_backend() == 'cpu'
    except Exception:
        return True


_fuse_flow = False


def fuse_flow():
    """True if whole-trajectory kernel fusion is enabled. Off by default:
    standalone, the fused forward+Pallas-discrete-adjoint backward beats
    the XLA scan 1.6x (908 vs 1440 us on the trajectory gradient). The
    round-1 scatter-built operand packing made it 5x slower inside the
    vmapped train step; the round-2 scatter-free rewrite removed that
    regression, but inside the full train step it now only matches the
    per-step path (interleaved A/B on TPU v5e: median fuseflow/pallas
    ratio 0.995 at L=1 and L=5, `bench_variants.py --ab pallas
    fuseflow`) - the step is latency-floor-bound at the reference
    envelope, so there is no train-step win to justify a default flip.
    Enable for standalone trajectory-gradient workloads."""
    return _fuse_flow


def set_fuse_flow(value):
    global _fuse_flow
    _fuse_flow = bool(value)
