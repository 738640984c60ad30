"""TPU-native VAE-GP-ODE framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
IlzeAmandaA/VAE-GP-ODE (NeurIPS-22 workshop, "Latent GP-ODEs with
Informative Priors"): a convolutional VAE encoding image sequences into a
latent initial state, a sparse variational GP (decoupled pathwise sampling,
RBF and divergence-free kernels) defining the latent ODE vector field, and
lax.scan-based numerical ODE integration, trained end-to-end on a
variational ELBO.

Design principles (TPU-first, not a port):
  * pure-functional core: parameters are pytrees, randomness is explicit
    PRNG keys (the reference draws hidden numpy/torch global randomness
    inside the forward pass - see reference kernels.py:13-26, svpy.py:88).
  * everything in one jitted train step; ODE stepping is lax.scan with
    optional jax.checkpoint rematerialisation (the scan analog of the
    reference's torchdiffeq adjoint).
  * MC samples (L) are a vmapped axis, not a Python loop
    (reference odegpvae.py:41-44 loops).
  * Pallas kernels for the hot fused GP-evaluation path, with jnp
    reference implementations kept alongside for parity testing.
  * multi-chip scaling via jax.sharding.Mesh + data-parallel shardings
    (an addition over the single-device reference).
"""

__version__ = "0.1.0"

from vae_gp_ode_tpu.core import settings  # noqa: F401
