from vae_gp_ode_tpu.parallel.mesh import make_mesh  # noqa: F401
from vae_gp_ode_tpu.parallel.data_parallel import (  # noqa: F401
    make_parallel_train_step, make_parallel_train_epoch, shard_batch,
    shard_epoch, replicate,
)
from vae_gp_ode_tpu.parallel.feature_parallel import (  # noqa: F401
    fp_draw_fn_sample, fp_fn_eval, fp_flow_forward,
)
from vae_gp_ode_tpu.parallel.shard_dp import (  # noqa: F401
    make_shardmap_train_step, make_shardmap_train_epoch,
    make_shardmap_train_segment,
)
