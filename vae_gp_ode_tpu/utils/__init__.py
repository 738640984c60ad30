from vae_gp_ode_tpu.utils.io import makedirs, get_logger, save_args  # noqa: F401
