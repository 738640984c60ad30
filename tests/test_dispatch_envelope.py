"""Width-envelope dispatch gates for the Pallas kernels (rounds 4-5).

Measured on a v5e (results/kernel_shapes_r4.jsonl): the single-block
fused kernels stop compiling - standalone, forward and/or backward -
once the operand panel grows past the envelope they were tiled for
(q=12 or S=1024 at batch 256 already fails; near-boundary compiles take
350-500 s before dying). Round 5 (results/kernel_shapes_r5.jsonl): the
grid-tiled kernels (ops.pathwise_tiled / ops.df_pathwise_tiled, the
latter with the D^2 update body split over a per-output-dim grid axis)
compile AND match the oracle at exactly those shapes, so wide dimwise-
RBF and DF shapes now dispatch to the tiled kernels up to the measured
corners (ops.config.rbf_tiled_fits / df_tiled_fits); only shapes beyond
them fall back to the jnp/XLA path, which compiles quickly and trains
at comparable throughput (results/envelope_probe_r4.jsonl).

These tests pin the dispatch: at the reference envelope the traced
train path MUST contain a pallas_call (single-block kernels); at wide
RBF shapes inside the tiled gate it must STILL contain one (the tiled
kernel); past the tiled gate it must NOT, and the jnp path it falls
back to must produce finite values and gradients.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from vae_gp_ode_tpu.gp import init_svgp_params, draw_fn_sample
from vae_gp_ode_tpu.dynamics import flow_forward
from vae_gp_ode_tpu.ops import config as ops_config


def _has_pallas_call(fn, *args):
    return 'pallas_call' in str(jax.make_jaxpr(fn)(*args))


def _flow_jaxpr_probe(kern, D, S, M, fuse):
    gp = init_svgp_params(jax.random.PRNGKey(0), D_in=D, D_out=D, M=M,
                          kernel=kern)
    s = draw_fn_sample(gp, jax.random.PRNGKey(1), S)
    z0 = jax.random.normal(jax.random.PRNGKey(2), (4, D)) * 0.3
    ts = 0.1 * jnp.arange(5)
    ops_config.set_use_pallas(True)
    ops_config.set_fuse_flow(fuse)
    try:
        fn = lambda z: flow_forward(gp, s, z, ts, solver='euler')[0]  # noqa
        has = _has_pallas_call(fn, z0)
        zs = fn(z0)
        g = jax.grad(lambda z: jnp.sum(fn(z) ** 2))(z0)
    finally:
        ops_config.set_use_pallas(None)
        ops_config.set_fuse_flow(True)
    assert np.isfinite(np.asarray(zs)).all()
    assert np.isfinite(np.asarray(g)).all()
    return has


@pytest.mark.slow
def test_rbf_reference_envelope_dispatches_pallas():
    assert _flow_jaxpr_probe('RBF', D=6, S=256, M=100, fuse=True)
    assert _flow_jaxpr_probe('RBF', D=6, S=256, M=100, fuse=False)


@pytest.mark.slow
def test_rbf_wide_shapes_dispatch_tiled_pallas():
    """S=1024 / q(D)=12 are fatal for the SINGLE-BLOCK kernels but pass
    on hardware with the grid-tiled kernels (kernel_shapes_r5.jsonl), so
    the scan path must still trace a pallas_call there."""
    assert _flow_jaxpr_probe('RBF', D=6, S=1024, M=100, fuse=True)
    assert _flow_jaxpr_probe('RBF', D=12, S=256, M=100, fuse=True)


def test_rbf_beyond_tiled_gate_falls_back_to_xla():
    # 6*(4096+100) = 25176 > the measured tiled corner 12*(1024+100)
    assert not _flow_jaxpr_probe('RBF', D=6, S=4096, M=100, fuse=False)


@pytest.mark.slow
def test_df_reference_envelope_dispatches_pallas():
    assert _flow_jaxpr_probe('DF', D=6, S=256, M=100, fuse=True)


@pytest.mark.slow
def test_df_wide_shapes_dispatch_tiled_pallas():
    """Round-5 redesign (per-output-dim grid split of the D^2 update
    body): DF at S=1024 / q=12 compiles and matches the oracle on
    hardware (kernel_shapes_r5.jsonl), so the scan path must trace a
    pallas_call there too."""
    assert _flow_jaxpr_probe('DF', D=6, S=1024, M=100, fuse=True)
    assert _flow_jaxpr_probe('DF', D=12, S=256, M=100, fuse=True)


def test_df_beyond_tiled_gate_falls_back_to_xla():
    # 6*(2*4096+100) = 49752 > the measured tiled corner 12*(2*1024+100)
    assert not _flow_jaxpr_probe('DF', D=6, S=4096, M=100, fuse=True)
    assert not _flow_jaxpr_probe('DF', D=6, S=4096, M=100, fuse=False)


def test_gate_formulas_pin_measured_boundary():
    # validated-good envelope stays in
    assert ops_config.rbf_kernel_fits(6, 256, 100)
    assert ops_config.df_kernel_fits(6, 256, 100)
    # measured-fatal shapes stay out (kernel_shapes_r4.jsonl)
    assert not ops_config.rbf_kernel_fits(12, 256, 100)   # q12
    assert not ops_config.rbf_kernel_fits(16, 256, 100)   # q16
    assert not ops_config.rbf_kernel_fits(6, 1024, 100)   # S1024
    assert not ops_config.df_kernel_fits(6, 1024, 100)
    # grid-tiled gate: measured-good wide shapes in, unprobed ones out
    # (kernel_shapes_r5.jsonl)
    assert ops_config.rbf_tiled_fits(12, 256, 100)
    assert ops_config.rbf_tiled_fits(6, 1024, 100)
    assert ops_config.rbf_tiled_fits(12, 1024, 100)       # the corner
    assert not ops_config.rbf_tiled_fits(6, 4096, 100)
    assert ops_config.df_tiled_fits(6, 1024, 100)         # measured ok
    assert ops_config.df_tiled_fits(12, 256, 100)         # measured ok
    assert ops_config.df_tiled_fits(12, 1024, 100)        # measured ok (661 s compile)
    assert not ops_config.df_tiled_fits(6, 4096, 100)
    assert not ops_config.df_tiled_fits(12, 4096, 100)    # unprobed


def test_ignore_width_gates_override():
    # probe-only escape hatch: the envelope probes must reach the Pallas
    # kernels at out-of-envelope shapes instead of silently measuring
    # the XLA fallback (tools/probe_envelope_r4.py)
    try:
        ops_config.set_ignore_width_gates(True)
        assert ops_config.rbf_kernel_fits(12, 256, 100)
        assert ops_config.df_kernel_fits(6, 1024, 100)
    finally:
        ops_config.set_ignore_width_gates(False)
    assert not ops_config.rbf_kernel_fits(12, 256, 100)
    assert not ops_config.df_kernel_fits(6, 1024, 100)
