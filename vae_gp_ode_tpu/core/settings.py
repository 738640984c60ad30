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
    compiled executable. No-op when VGO_COMPILE_CACHE=0; dir overridable
    via VGO_COMPILE_CACHE_DIR. Safe to call repeatedly. Best-effort: a
    backend that cannot serialize executables just skips the cache.
    """
    import os
    if os.environ.get('VGO_COMPILE_CACHE', '1') == '0':
        return None
    cache_dir = os.environ.get(
        'VGO_COMPILE_CACHE_DIR',
        os.path.join(os.path.expanduser('~'), '.cache', 'vae_gp_ode_tpu',
                     'xla'))
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
    except Exception:
        return None
    return cache_dir
