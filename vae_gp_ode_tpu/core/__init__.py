from vae_gp_ode_tpu.core import settings, transforms, prng  # noqa: F401
