"""TPU accuracy probe for the non-fused compute-path default (VERDICT r2 #7).

Question: does plain XLA with jax_default_matmul_precision='highest'
match the per-step Pallas kernel's f32 exactness (the kernel's stated
rationale for staying default-on despite losing 7-25% speed), or is
Pallas still needed for accuracy?

Method: integrate the same GP-field trajectory (rk4, the non-fused path)
on the TPU under three configurations and compare each to a float64 CPU
oracle:
  pallas       - per-step Pallas kernel (forced f32 MXU accumulation)
  xla_default  - plain XLA, default (bf16-input) matmul precision
  xla_highest  - plain XLA, HIGHEST matmul precision

Run on the TPU: python tools/accuracy_probe_r3.py
One JSON line with max-abs errors vs the f64 oracle.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vae_gp_ode_tpu.gp import init_svgp_params, draw_fn_sample  # noqa: E402
from vae_gp_ode_tpu.dynamics import flow_forward  # noqa: E402
from vae_gp_ode_tpu.ops import config as ops_config  # noqa: E402

N, D, M, S, T = 20, 6, 100, 256, 16


def as_dtype(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def main():
    key = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices('cpu')[0]):
        gp = init_svgp_params(key, D_in=D, D_out=D, M=M, kernel='RBF',
                              dtype=jnp.float32)
        sample = draw_fn_sample(gp, key, S)
        z0 = (jax.random.normal(jax.random.PRNGKey(1), (N, D),
                                dtype=jnp.float32) * 0.5)
        ts = jnp.asarray(0.1 * np.arange(T), jnp.float32)

        # float64 oracle on CPU
        gp64, s64 = as_dtype(gp, jnp.float64), as_dtype(sample, jnp.float64)
        ops_config.set_use_pallas(False)
        zt64, _ = jax.jit(lambda g, s, z, t: flow_forward(
            g, s, z, t, solver='rk4'))(gp64, s64,
                                       z0.astype(jnp.float64),
                                       ts.astype(jnp.float64))
        zt64 = np.asarray(zt64)

    tpu = jax.devices()[0]
    assert tpu.platform != 'cpu', 'run this probe with the TPU visible'
    gp_t = jax.device_put(gp, tpu)
    s_t = jax.device_put(sample, tpu)
    z0_t, ts_t = jax.device_put((z0, ts), tpu)

    out = {'metric': 'rk4_traj_max_abs_err_vs_f64', 'N': N, 'T': T,
           'S': S, 'M': M}
    scale = float(np.abs(zt64).max())
    for name, use_pallas, precision in [
            ('pallas', True, None),
            ('xla_default', False, None),
            ('xla_highest', False, 'highest')]:
        ops_config.set_use_pallas(use_pallas)
        if precision is not None:
            jax.config.update('jax_default_matmul_precision', precision)
        try:
            zt, _ = jax.jit(lambda g, s, z, t: flow_forward(
                g, s, z, t, solver='rk4'))(gp_t, s_t, z0_t, ts_t)
            err = float(np.abs(np.asarray(zt) - zt64).max())
            out[name] = f'{err:.3e}'
        finally:
            ops_config.set_use_pallas(None)
            if precision is not None:
                jax.config.update('jax_default_matmul_precision', None)
    out['traj_scale_max_abs'] = f'{scale:.3e}'
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
