"""TPU accuracy probe for the compute-path defaults (VERDICT r2 #7, r3 #3).

Question: does plain XLA with jax_default_matmul_precision='highest'
match the Pallas kernels' f32 exactness (the kernels' stated rationale
for staying default-on at perf parity), or is Pallas still needed for
accuracy?

Method: integrate the same GP-field trajectory on the TPU under three
configurations and compare each to a float64 CPU oracle:
  pallas       - Pallas kernels (forced f32 MXU accumulation)
  xla_default  - plain XLA, default (bf16-input) matmul precision
  xla_highest  - plain XLA, HIGHEST matmul precision
for BOTH shipped hot paths:
  rk4   - the per-step pathwise kernel (non-fused solver path; reference
          hot path kernels.py:140-181)
  euler - the whole-trajectory fused kernel (fuse_flow, the shipped
          default training path)

Round-3's probe crashed at Mosaic lowering: jax_enable_x64 made the RFF
draws float64 and the kernels had no 64-bit story. Round 4 adds the f32
cast boundary at every fused-op entry (ops/f32cast.py) AND this probe now
explicitly feeds the TPU paths float32 operands - under x64 the CPU-drawn
sample is f64, and device_putting it raw would make the XLA paths compute
in f64, invalidating the comparison.

Run on the TPU: python tools/accuracy_probe_r4.py
One JSON line per solver path with max-abs errors vs the f64 oracle.
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

    # f32 views: ALL measured paths (pallas and xla alike) must consume
    # identical f32 inputs - the f64 oracle alone gets the f64 view
    gp32 = as_dtype(gp, jnp.float32)
    s32 = as_dtype(sample, jnp.float32)
    gp64, s64 = as_dtype(gp, jnp.float64), as_dtype(sample, jnp.float64)

    tpu = jax.devices()[0]
    assert tpu.platform != 'cpu', 'run this probe with the TPU visible'
    gp_t = jax.device_put(gp32, tpu)
    s_t = jax.device_put(s32, tpu)
    z0_t, ts_t = jax.device_put((z0.astype(jnp.float32), ts), tpu)

    for solver, fuse in (('rk4', False), ('euler', True)):
        with jax.default_device(jax.devices('cpu')[0]):
            ops_config.set_use_pallas(False)
            try:
                zt64, _ = jax.jit(lambda g, s, z, t: flow_forward(
                    g, s, z, t, solver=solver))(
                        gp64, s64, z0.astype(jnp.float64),
                        ts.astype(jnp.float64))
            finally:
                ops_config.set_use_pallas(None)
            zt64 = np.asarray(zt64)

        out = {'metric': f'{solver}_traj_max_abs_err_vs_f64',
               'fused_flow_path': fuse, 'N': N, 'T': T, 'S': S, 'M': M}
        for name, use_pallas, precision in [
                ('pallas', True, None),
                ('xla_default', False, None),
                ('xla_highest', False, 'highest')]:
            ops_config.set_use_pallas(use_pallas)
            ops_config.set_fuse_flow(fuse and use_pallas)
            if precision is not None:
                jax.config.update('jax_default_matmul_precision', precision)
            try:
                zt, _ = jax.jit(lambda g, s, z, t: flow_forward(
                    g, s, z, t, solver=solver))(gp_t, s_t, z0_t, ts_t)
                err = float(np.abs(np.asarray(zt) - zt64).max())
                out[name] = f'{err:.3e}'
            except Exception as e:  # record, don't lose the other rows
                out[name] = f'ERROR {type(e).__name__}: {str(e)[:120]}'
            finally:
                ops_config.set_use_pallas(None)
                ops_config.set_fuse_flow(True)
                if precision is not None:
                    jax.config.update('jax_default_matmul_precision', None)
        out['traj_scale_max_abs'] = f'{float(np.abs(zt64).max()):.3e}'
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
