"""Continuous-adjoint reverse mode: gradients must match backprop-through-
solver (they are both exact for linear test problems and agree to solver
tolerance in general)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_gp_ode_tpu.dynamics.adjoint import (
    odeint_adjoint, flow_forward_adjoint,
)
from vae_gp_ode_tpu.dynamics.solvers import odeint
from vae_gp_ode_tpu.dynamics.flow import flow_forward
from vae_gp_ode_tpu.gp import svgp


@pytest.mark.parametrize('method', ['euler', 'midpoint', 'rk4'])
def test_adjoint_forward_matches_direct(method):
    z0 = jnp.asarray(np.random.RandomState(0).randn(3, 2), jnp.float32)
    ts = jnp.linspace(0.0, 1.0, 6)
    theta = jnp.asarray(0.8)

    def f(th, t, z):
        return -th * z

    zs_adj, nfe = odeint_adjoint(f, theta, z0, ts, method, 2)
    assert int(nfe) > 0
    zs_dir = odeint(lambda t, z: -theta * z, z0, ts, method=method,
                    dense=2).zs
    np.testing.assert_allclose(np.asarray(zs_adj), np.asarray(zs_dir),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('method', ['euler', 'midpoint', 'rk4'])
def test_adjoint_grads_close_to_backprop(method):
    z0 = jnp.asarray(np.random.RandomState(1).randn(3, 2), jnp.float32)
    ts = jnp.linspace(0.0, 1.0, 6)

    def f(th, t, z):
        return -th * z + 0.1 * jnp.sin(z)

    def loss_adj(th, z0):
        return jnp.sum(odeint_adjoint(f, th, z0, ts, method, 4)[0] ** 2)

    def loss_dir(th, z0):
        return jnp.sum(odeint(lambda t, z: f(th, t, z), z0, ts,
                              method=method, dense=4).zs ** 2)

    th = jnp.asarray(0.7)
    ga_th, ga_z = jax.grad(loss_adj, argnums=(0, 1))(th, z0)
    gd_th, gd_z = jax.grad(loss_dir, argnums=(0, 1))(th, z0)
    # continuous adjoint discretises the backward ODE: agreement to the
    # solver's own order, not machine precision
    tol = {'euler': 0.08, 'midpoint': 0.01, 'rk4': 0.003}[method]
    np.testing.assert_allclose(float(ga_th), float(gd_th), rtol=tol)
    np.testing.assert_allclose(np.asarray(ga_z), np.asarray(gd_z),
                               rtol=tol, atol=tol * 0.1)


@pytest.mark.slow
def test_flow_forward_adjoint_gp():
    """Adjoint flow over a GP sample: values match the direct flow, grads
    to GP hyperparameters are finite and close."""
    gp = svgp.init_svgp_params(jax.random.PRNGKey(0), D_in=3, D_out=3,
                               M=8, kernel='RBF')
    ts = 0.1 * jnp.arange(6)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (4, 3)) * 0.5

    def loss(gp_, use_adjoint):
        s = svgp.draw_fn_sample(gp_, jax.random.PRNGKey(2), S=16)
        if use_adjoint:
            zt, _ = flow_forward_adjoint(gp_, s, z0, ts, order=1,
                                         solver='rk4', dense=2)
        else:
            zt, _ = flow_forward(gp_, s, z0, ts, order=1, solver='rk4',
                                 dense=2)
        return jnp.sum(zt ** 2)

    v_adj = float(loss(gp, True))
    v_dir = float(loss(gp, False))
    np.testing.assert_allclose(v_adj, v_dir, rtol=1e-5)

    g_adj = jax.grad(lambda g: loss(g, True))(gp)
    g_dir = jax.grad(lambda g: loss(g, False))(gp)
    ga = np.asarray(g_adj.kernel.unconstrained_lengthscales)
    gd = np.asarray(g_dir.kernel.unconstrained_lengthscales)
    assert np.isfinite(ga).all()
    np.testing.assert_allclose(ga, gd, rtol=0.05, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_adj.Um), np.asarray(g_dir.Um),
                               rtol=0.05, atol=1e-3)


@pytest.mark.parametrize('method', ['midpoint', 'rk4'])
def test_adjoint_nonautonomous_grads(method):
    """Time-DEPENDENT RHS: the reversed-time stage evaluation must keep
    the solver's order (regression for the stage-time sign bug)."""
    z0 = jnp.asarray(np.random.RandomState(2).randn(3, 2), jnp.float32)
    ts = jnp.linspace(0.0, 1.0, 5)

    def f(th, t, z):
        return th * t * z

    def loss_adj(th):
        return jnp.sum(odeint_adjoint(f, th, z0, ts, method, 8)[0] ** 2)

    def loss_dir(th):
        return jnp.sum(odeint(lambda t, z: f(th, t, z), z0, ts,
                              method=method, dense=8).zs ** 2)

    th = jnp.asarray(0.9)
    ga = float(jax.grad(loss_adj)(th))
    gd = float(jax.grad(loss_dir)(th))
    tol = {'midpoint': 0.01, 'rk4': 0.002}[method]
    np.testing.assert_allclose(ga, gd, rtol=tol)


@pytest.mark.parametrize('method', ['dopri5', 'fixed_adams', 'bdf',
                                    'adams'])
def test_adjoint_adaptive_and_multistep_grads(method):
    """VERDICT round-1 item 4: --use_adjoint with dopri5 (and the other
    non-single-step solvers) - the backward pass integrates the ravelled
    augmented system with the same solver; gradients must match the
    remat/backprop path to solver tolerance."""
    z0 = jnp.asarray(np.random.RandomState(3).randn(3, 2), jnp.float32)
    ts = jnp.linspace(0.0, 1.0, 6)

    def f(th, t, z):
        return -th * z + 0.1 * jnp.sin(z)

    def loss_adj(th, z0):
        return jnp.sum(odeint_adjoint(f, th, z0, ts, method, 4,
                                      1e-6, 1e-6, 256)[0] ** 2)

    def loss_dir(th, z0):
        return jnp.sum(odeint(lambda t, z: f(th, t, z), z0, ts,
                              method=method, dense=4, rtol=1e-6,
                              atol=1e-6, max_steps=256).zs ** 2)

    th = jnp.asarray(0.7)
    va = float(loss_adj(th, z0))
    vd = float(loss_dir(th, z0))
    np.testing.assert_allclose(va, vd, rtol=1e-5)
    ga_th, ga_z = jax.grad(loss_adj, argnums=(0, 1))(th, z0)
    gd_th, gd_z = jax.grad(loss_dir, argnums=(0, 1))(th, z0)
    tol = 0.01 if method == 'bdf' else 0.003
    np.testing.assert_allclose(float(ga_th), float(gd_th), rtol=tol)
    np.testing.assert_allclose(np.asarray(ga_z), np.asarray(gd_z),
                               rtol=tol, atol=tol * 0.1)


@pytest.mark.slow
def test_flow_forward_adjoint_dopri5_gp():
    """The full GP flow under --use_adjoint --solver dopri5 (the exact
    reference capability, flow.py:76-85 + main.py:85)."""
    gp = svgp.init_svgp_params(jax.random.PRNGKey(0), D_in=3, D_out=3,
                               M=8, kernel='RBF')
    ts = 0.1 * jnp.arange(6)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (4, 3)) * 0.5

    def loss(gp_, use_adjoint):
        s = svgp.draw_fn_sample(gp_, jax.random.PRNGKey(2), S=16)
        if use_adjoint:
            zt, _ = flow_forward_adjoint(gp_, s, z0, ts, order=1,
                                         solver='dopri5')
        else:
            zt, _ = flow_forward(gp_, s, z0, ts, order=1, solver='dopri5')
        return jnp.sum(zt ** 2)

    np.testing.assert_allclose(float(loss(gp, True)),
                               float(loss(gp, False)), rtol=1e-5)
    g_adj = jax.grad(lambda g: loss(g, True))(gp)
    g_dir = jax.grad(lambda g: loss(g, False))(gp)
    ga = np.asarray(g_adj.kernel.unconstrained_lengthscales)
    gd = np.asarray(g_dir.kernel.unconstrained_lengthscales)
    assert np.isfinite(ga).all()
    np.testing.assert_allclose(ga, gd, rtol=0.05, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_adj.Um), np.asarray(g_dir.Um),
                               rtol=0.05, atol=1e-3)


@pytest.mark.slow
def test_flow_forward_adjoint_bdf_gp():
    """bdf adjoint through the real GP field at a non-toy parameter count
    (S=64 RFF draws: the flat theta is thousands of floats). The old
    ravelled backward built a dense (P, P) Jacobian over ALL of theta per
    Newton iteration - infeasible here; the structured branch (z-only
    Newton + linear (D, D) a-solve + gth quadrature) must both run and
    match rematerialised backprop gradients."""
    gp = svgp.init_svgp_params(jax.random.PRNGKey(0), D_in=3, D_out=3,
                               M=16, kernel='RBF')
    ts = 0.1 * jnp.arange(5)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (4, 3)) * 0.5

    def loss(gp_, use_adjoint):
        s = svgp.draw_fn_sample(gp_, jax.random.PRNGKey(2), S=64)
        fwd = flow_forward_adjoint if use_adjoint else flow_forward
        zt, _ = fwd(gp_, s, z0, ts, order=1, solver='bdf', dense=4)
        return jnp.sum(zt ** 2)

    np.testing.assert_allclose(float(loss(gp, True)),
                               float(loss(gp, False)), rtol=1e-5)
    g_adj = jax.grad(lambda g: loss(g, True))(gp)
    g_dir = jax.grad(lambda g: loss(g, False))(gp)
    ga = np.asarray(g_adj.kernel.unconstrained_lengthscales)
    gd = np.asarray(g_dir.kernel.unconstrained_lengthscales)
    assert np.isfinite(ga).all()
    np.testing.assert_allclose(ga, gd, rtol=0.1, atol=5e-3)
    np.testing.assert_allclose(np.asarray(g_adj.Um), np.asarray(g_dir.Um),
                               rtol=0.1, atol=5e-3)
