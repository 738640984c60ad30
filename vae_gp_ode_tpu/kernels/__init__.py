from vae_gp_ode_tpu.kernels.rbf import (  # noqa: F401
    RBFParams,
    RFFState,
    init_rbf_params,
    rbf_lengthscales,
    rbf_variance,
    rbf_gram,
    rbf_sample_rff,
    rbf_rff_eval,
    rbf_compute_nu,
    rbf_f_update,
)
from vae_gp_ode_tpu.kernels.divfree import (  # noqa: F401
    df_gram,
    df_sample_rff,
    df_rff_eval,
    df_compute_nu,
    df_f_update,
)
