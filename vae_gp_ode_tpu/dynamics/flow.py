"""ODE flow over a sampled GP vector field.

Rebuild of the reference ODEfunc/Flow pair (reference:
experiments/model/core/flow.py:7-102). The reference mutates module state
(`build_cache`) before each solve; here a pathwise FnSample is drawn
explicitly by the caller and the RHS is a pure closure, so the whole solve
lives inside one jitted computation and L Monte-Carlo trajectories become a
vmapped axis.
"""

import jax.numpy as jnp

from vae_gp_ode_tpu.gp.svgp import SVGPParams, FnSample, fn_eval, svgp_kl
from vae_gp_ode_tpu.dynamics.solvers import odeint


def make_ode_rhs(gp: SVGPParams, sample: FnSample, order: int):
    """Build the RHS f(t, z) for a 1st- or 2nd-order latent ODE.

    order 1: dz = f(z)                         (reference flow.py:30-32)
    order 2: z = (s, v); d(s, v) = (v, f(s,v)) (reference flow.py:34-38)
    """
    if order == 1:
        def rhs(t, z):
            return fn_eval(gp, sample, z)
    elif order == 2:
        def rhs(t, z):
            q = z.shape[1] // 2
            ds = z[:, q:]
            dv = fn_eval(gp, sample, z)
            return jnp.concatenate([ds, dv], axis=1)
    else:
        raise ValueError(f'ODE order must be 1 or 2, got {order}')
    return rhs


def flow_forward(gp: SVGPParams, sample: FnSample, z0, ts, order=1,
                 solver='euler', dense=1, rtol=1e-6, atol=1e-6,
                 max_steps=256, remat=True):
    """Integrate z0 (N, D) over ts (T,) -> (N, T, D) plus fn-eval count.

    reference flow.py:68-86 (the (T, N, D) -> (N, T, D) permute included).
    On TPU the euler/dimwise-RBF fast path runs the whole trajectory in a
    single fused Pallas kernel (ops.flow_fused); other solver/kernel
    combinations use the lax.scan solvers.
    """
    if (solver == 'euler' and dense == 1 and gp.kernel_name == 'RBF'
            and gp.kernel.dimwise and ts.shape[0] >= 2):
        from vae_gp_ode_tpu.ops import config as ops_config
        if (ops_config.use_pallas() and ops_config.fuse_flow()
                and ops_config.rbf_kernel_fits(
                    sample.rff.phase.shape[2], sample.rff.phase.shape[1],
                    gp.inducing_loc.shape[0])):
            from vae_gp_ode_tpu.ops.flow_fused import fused_euler_flow
            from vae_gp_ode_tpu.ops.pathwise import rbf_fused_operands
            T = ts.shape[0]
            zs = fused_euler_flow(
                z0, *rbf_fused_operands(gp, sample),
                jnp.diff(ts), T, order,
                interpret=ops_config.interpret_mode())
            return jnp.transpose(zs, (1, 0, 2)), jnp.asarray(T - 1)
    if (solver == 'euler' and dense == 1 and gp.kernel_name == 'DF'
            and order == 1 and ts.shape[0] >= 2
            and getattr(sample, 'df_G', None) is not None):
        from vae_gp_ode_tpu.ops import config as ops_config
        if (ops_config.use_pallas() and ops_config.fuse_flow()
                and ops_config.df_kernel_fits(
                    z0.shape[1], sample.rff.phase.shape[1],
                    gp.inducing_loc.shape[0])):
            from vae_gp_ode_tpu.ops.df_flow_fused import packed_df_euler_flow
            from vae_gp_ode_tpu.ops.df_pathwise import df_fused_operands
            T = ts.shape[0]
            zs = packed_df_euler_flow(
                z0, *df_fused_operands(gp, sample, z0.shape[1]),
                jnp.diff(ts), T, ops_config.interpret_mode())
            return jnp.transpose(zs, (1, 0, 2)), jnp.asarray(T - 1)
    rhs = make_ode_rhs(gp, sample, order)
    sol = odeint(rhs, z0, ts, method=solver, dense=dense, rtol=rtol,
                 atol=atol, max_steps=max_steps, remat=remat)
    return jnp.transpose(sol.zs, (1, 0, 2)), sol.nfe


def flow_kl(gp: SVGPParams):
    """Inducing-posterior KL (reference flow.py:92-96)."""
    return svgp_kl(gp)
