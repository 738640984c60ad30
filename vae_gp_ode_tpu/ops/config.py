"""Runtime switches for the Pallas fast paths.

The jnp reference implementations are always available and are the source
of truth for parity tests; the Pallas kernels run BOTH directions (fused
forward + hand-written backward/discrete-adjoint kernels) on TPU backends,
with the jnp graph as the large-batch fallback.
"""

import contextlib
import threading

import jax

_use_pallas = None
_tls = threading.local()


def use_pallas():
    """True if the Pallas fast paths should be used (TPU backend, not
    overridden). A `forced_jnp()` context (thread-local, highest
    precedence) beats the process-global `set_use_pallas` override."""
    global _use_pallas
    if getattr(_tls, 'forced_jnp', 0):
        return False
    if _use_pallas is not None:
        return _use_pallas
    try:
        return jax.default_backend() not in ('cpu',)
    except Exception:
        return False


@contextlib.contextmanager
def forced_jnp():
    """Pin the jnp compute path for the dynamic extent of the context in
    this thread. Used by step functions whose traced body must never
    dispatch to Pallas (e.g. the GSPMD data-parallel step: the
    partitioner cannot shard a pallas_call over the mesh) - scoping the
    pin to the traced body means interleaved tracing of OTHER functions
    (callbacks, other threads) is unaffected, unlike a process-global
    toggle around the call."""
    _tls.forced_jnp = getattr(_tls, 'forced_jnp', 0) + 1
    try:
        yield
    finally:
        _tls.forced_jnp -= 1


def set_use_pallas(value):
    """Override (True/False) or reset (None) the Pallas fast-path switch."""
    global _use_pallas
    _use_pallas = value


# --- validated width envelope for the Pallas kernels (round 4) --------
# The v5e compiler (reached through the axon remote-compile helper) dies
# - or takes 350-500 s on the forward and then dies in the backward -
# once a kernel's operand panel grows past the envelope the kernels were
# tiled and validated for (q<=6/order<=2, S=256, M=100: panel width
# K*(S+M) = 2136 for the dimwise-RBF kernels, D*(2S+M) = 3672 for the
# matrix-valued DF kernels). Measured round 4 on hardware
# (results/kernel_shapes_r4.jsonl): q=12 or S=1024 fails STANDALONE at
# batch 256, forward and/or backward. Wider shapes must dispatch to the
# jnp/XLA path, which compiles quickly and trains at the same order of
# throughput (results/envelope_probe_r4.jsonl: S=8192 at batch 1280 runs
# 0.30 s/epoch in pure XLA; n_filt=32/q=16 runs 0.34 s/epoch).
_RBF_MAX_COLS = 2136
_DF_MAX_COLS = 3672
_ignore_width_gates = False


def set_ignore_width_gates(value):
    """Probe-only escape hatch: when True the width gates below always
    pass, so out-of-envelope shapes reach the Pallas kernels instead of
    silently dispatching to the jnp/XLA fallback. Needed to RE-MEASURE
    the envelope itself (tools/probe_envelope_r4.py /
    probe_kernel_shapes_r4.py) - without it a 'fused' probe row at q=16
    would compile the XLA path and wrongly report that wide fused
    kernels work. Never set in production: out-of-envelope compiles take
    350-500 s and then kill the v5e compiler."""
    global _ignore_width_gates
    _ignore_width_gates = bool(value)


def rbf_kernel_fits(K, S, M):
    """True iff the dimwise-RBF Pallas kernels are inside the validated
    width envelope for K output dims, S features, M inducing points."""
    return _ignore_width_gates or K * (S + M) <= _RBF_MAX_COLS


# --- grid-tiled wide-shape envelope (round 5) --------------------------
# ops.pathwise_tiled chunks the panel over a (batch, k, feature-chunk)
# grid so each program sees an (s_tile + M)-wide panel for one output
# dim; measured on hardware (results/kernel_shapes_r5.jsonl): q=12 and
# S=1024 - the exact shapes that kill the single-block kernels - compile
# and match the jnp oracle to 3e-7, forward AND hand-written backward.
# The gate is set at the widest MEASURED shape (q=12, S=1024, M=100),
# not an extrapolation: compile time grows with the panel (245 s fwd at
# the corner) and wider shapes are unprobed. Speed at these shapes is
# ~XLA@highest parity (interleaved A/B, results/ab_tiled_r5.jsonl:
# 0.77-1.26x fwd, 0.85-1.16x grad, shape-dependent); the dispatch
# preference buys forced-f32 accuracy - the jnp fallback runs at
# DEFAULT matmul precision (bf16 on TPU, 4.7e-2 drift) - at no
# measurable throughput cost.
_RBF_TILED_MAX_COLS = 12 * (1024 + 100)


def rbf_tiled_fits(K, S, M):
    """True iff the grid-tiled dimwise-RBF kernels (ops.pathwise_tiled)
    are inside the hardware-validated wide-shape envelope. Checked after
    :func:`rbf_kernel_fits` fails: single-block is faster in-envelope."""
    return _ignore_width_gates or K * (S + M) <= _RBF_TILED_MAX_COLS


def df_kernel_fits(D, S, M):
    """Same gate for the divergence-free (matrix-valued) kernels."""
    return _ignore_width_gates or D * (2 * S + M) <= _DF_MAX_COLS


# ops.df_pathwise_tiled splits the DF evaluation over a per-output-dim x
# feature-chunk grid (the first, feature-only tiling still died in the
# compile helper: the D^2-unrolled update body was the killer, not just
# the panel). Measured on hardware (results/kernel_shapes_r5.jsonl):
# D=6/S=1024 (566 s fwd compile), D=12/S=256, and the full corner
# D=12/S=1024 (661 s fwd compile, 9.7e-7 rel) all compile and match the
# jnp oracle, forward AND hand-written backward. Gate at the widest
# MEASURED width D*(2S+M) = 12*(2048+100); wider is unprobed
# (extrapolating past a 661-s compile is not justified).
_DF_TILED_MAX_COLS = 12 * (2 * 1024 + 100)


def df_tiled_fits(D, S, M):
    """True iff the grid-tiled DF kernels (ops.df_pathwise_tiled) are
    inside the hardware-validated wide-shape envelope. Checked after
    :func:`df_kernel_fits` fails: single-block is faster in-envelope."""
    return _ignore_width_gates or D * (2 * S + M) <= _DF_TILED_MAX_COLS


def interpret_mode():
    """True when the Pallas kernels must run in interpret mode (non-TPU
    backend). Lets tests force the *real dispatch path* (incl. the
    custom_vjp boundary that forbids forward-mode AD) on CPU via
    set_use_pallas(True)."""
    try:
        return jax.default_backend() == 'cpu'
    except Exception:
        return True


_fuse_flow = True


def fuse_flow():
    """True if whole-trajectory kernel fusion is enabled (euler/dense=1/
    dimwise-RBF trajectories run as ONE Pallas program with the
    hand-written discrete-adjoint backward; see dynamics/flow.py:47).

    DEFAULT ON since round 2: under the fetch-forced timing protocol
    (the sound one on this link - see bench.py) the fused kernel wins
    the FULL train step by 1.14x at L=1 and 1.36x at L=5 over the
    per-step Pallas path (interleaved A/B, 16 rounds, ratio ranges
    [1.06, 1.20] / [1.29, 1.41]: `bench_variants.py --scan True --ab
    pallas fuseflow`). Round 1's "5x slower in-step" was the
    scatter-built operand packing (fixed in 8551cff) measured under the
    unsound block-timed protocol. Non-applicable configurations
    (other solvers, DF kernel, dense>1) fall back to the scan solvers
    automatically."""
    return _fuse_flow


def set_fuse_flow(value):
    global _fuse_flow
    _fuse_flow = bool(value)
