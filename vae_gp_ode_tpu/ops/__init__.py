from vae_gp_ode_tpu.ops import config  # noqa: F401
from vae_gp_ode_tpu.ops.pathwise import (  # noqa: F401
    fused_pathwise_eval, pathwise_eval_reference,
)
