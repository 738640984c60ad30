"""Global numeric settings.

Mirrors the role of the reference's settings singleton
(reference: experiments/model/misc/settings.py:5-34) but as plain module
constants - there is no device state here because JAX manages placement.
"""

import jax.numpy as jnp

#: default floating dtype for all model math (parity with reference float32)
DEFAULT_DTYPE = jnp.float32

#: jitter added to gram diagonals before Cholesky
#: (reference: kernels.py:11, settings.py:31)
JITTER = 1e-5

#: lower bound added by the softplus constraint
#: (reference: constraint_utils.py:6)
SOFTPLUS_LOWER = 1e-12

#: epsilon used in the guarded Bernoulli log-prob (reference: vae.py:8)
BERNOULLI_EPS = 1e-3


def enable_compilation_cache():
    """Point XLA's persistent compilation cache at a per-user disk dir.

    First compile of the full train step costs minutes over the axon
    tunnel (CLAUDE.md); the on-disk cache makes every later process
    (CLI restarts, bench tools, the driver's compile check) reuse the
    compiled executable. The cache is enabled only when the ACTUAL
    backend is not CPU: reloading XLA:CPU AOT results trips a
    machine-feature canonicalisation mismatch on this host (E-level
    'could lead to SIGILL' logs on every load, measured), and CPU
    compiles are seconds anyway. The configured-platform string alone
    is not enough - when the axon tunnel is down, 'axon,cpu' configs
    silently FALL BACK to the CPU backend, which must not write/reload
    CPU AOT entries either - so after the cheap config check this
    resolves `jax.default_backend()` (initialising the backend; every
    caller is a CLI/bench entry about to use the device anyway).
    VGO_COMPILE_CACHE: '0' = never, 'force' = even on cpu, default =
    non-cpu backends. Dir overridable via VGO_COMPILE_CACHE_DIR. Safe to
    call repeatedly. Best-effort: a backend that cannot serialize
    executables just skips the cache.
    """
    import os
    mode = os.environ.get('VGO_COMPILE_CACHE', '')
    if mode == '0':
        return None
    try:
        import jax
        # cheap pre-check on the *configured* platforms (no backend
        # init): 'cpu' means CPU was explicitly forced (--device cpu /
        # tests) - never initialise a backend in those flows
        platforms = getattr(jax.config, 'jax_platforms', None) or ''
        if platforms.strip().lower() == 'cpu' and mode != 'force':
            return None
        # the authoritative check: what backend actually came up (an
        # 'axon,cpu' config degrades to cpu when the tunnel is down)
        if jax.default_backend() == 'cpu' and mode != 'force':
            return None
        cache_dir = os.environ.get(
            'VGO_COMPILE_CACHE_DIR',
            os.path.join(os.path.expanduser('~'), '.cache',
                         'vae_gp_ode_tpu', 'xla'))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
    except Exception:
        return None
    return cache_dir
