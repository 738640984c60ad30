from vae_gp_ode_tpu.models.vae import Encoder, Decoder, bernoulli_log_prob  # noqa: F401
from vae_gp_ode_tpu.models.odegpvae import ODEGPVAE, init_model  # noqa: F401
