from vae_gp_ode_tpu.training.objectives import elbo_terms, compute_loss  # noqa: F401
from vae_gp_ode_tpu.training.trainer import (  # noqa: F401
    TrainState, create_train_state, make_train_step, make_train_epoch,
    make_eval_step, make_epoch_eval_step, run_epoch_with_tail,
)
