"""Large-S feature-parallel memory measurement (VERDICT r2 #8).

Compares per-device memory of the shard-local RFF draw
(`fp_draw_fn_sample(local_draws=True)`) against the replicated draw the
round-2 code shipped (draw the full (D_in, S, D_out) state on every
device, then lay it out). Uses XLA's own per-device memory analysis of
the compiled programs on an 8-device mesh plus the live shard sizes of
the resulting arrays, so the number is the compiler's, not an estimate.

Run: python tools/fp_large_s_bench.py [--S 32768] [--D 6] [--M 100]
Prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
_flag = '--xla_force_host_platform_device_count=8'
if _flag not in os.environ.get('XLA_FLAGS', ''):
    # APPEND (setdefault would silently drop the forcing when XLA_FLAGS
    # is already exported, and make_mesh({'model': 8}) would then fail)
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' ' + _flag).strip()

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp  # noqa: E402

from vae_gp_ode_tpu.gp import init_svgp_params, draw_fn_sample  # noqa: E402
from vae_gp_ode_tpu.parallel import fp_draw_fn_sample, make_mesh  # noqa: E402


def live_bytes_per_device(sample):
    """Largest single-device footprint of the sample's arrays."""
    per_dev = {}
    for leaf in jax.tree_util.tree_leaves(sample):
        for sh in leaf.addressable_shards:
            per_dev[sh.device] = per_dev.get(sh.device, 0) + sh.data.nbytes
    return max(per_dev.values())


def compiled_temp_bytes(fn, *args):
    """XLA's per-device temp allocation for the jitted fn."""
    c = jax.jit(fn).lower(*args).compile()
    ma = c.memory_analysis()
    if ma is None:
        return None
    return int(ma.temp_size_in_bytes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--S', type=int, default=32768)
    ap.add_argument('--D', type=int, default=6)
    ap.add_argument('--M', type=int, default=100)
    args = ap.parse_args()
    S, D, M = args.S, args.D, args.M

    key = jax.random.PRNGKey(0)
    gp = init_svgp_params(key, D_in=D, D_out=D, M=M, kernel='RBF')
    mesh = make_mesh({'model': 8})
    ndev = 8

    # --- replicated draw (round-2 behaviour): full state on one device
    rep = draw_fn_sample(gp, key, S)
    rep_bytes = sum(leaf.nbytes for leaf in jax.tree_util.tree_leaves(rep))
    rep_temp = compiled_temp_bytes(lambda k: draw_fn_sample(gp, k, S), key)

    # --- shard-local draw: S/n per device, never materialised whole
    sh = fp_draw_fn_sample(gp, key, S, mesh)
    sh_bytes = live_bytes_per_device(sh)
    sh_temp = compiled_temp_bytes(
        lambda k: fp_draw_fn_sample(gp, k, S, mesh), key)

    out = {
        'metric': 'fp_draw_per_device_bytes',
        'S': S, 'D': D, 'M': M, 'n_devices': ndev,
        'replicated_live_bytes': int(rep_bytes),
        'replicated_compile_temp_bytes': rep_temp,
        'sharded_live_bytes_per_device': int(sh_bytes),
        'sharded_compile_temp_bytes_per_device': sh_temp,
        'live_ratio': round(rep_bytes / sh_bytes, 2),
    }
    print(json.dumps(out), flush=True)
    assert sh_bytes < rep_bytes, 'sharded draw must beat replicated'


if __name__ == '__main__':
    main()
