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
