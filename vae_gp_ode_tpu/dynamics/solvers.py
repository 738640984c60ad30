"""Numerical ODE solvers as lax.scan / lax.while-free compiled loops.

Rebuilds the solver surface the reference gets from the external
`torchdiffeq` package (reference: experiments/model/core/flow.py:3-4,76-85;
solver names exposed at main.py:18,81 - including the actual default
`euler` which bypasses the argparse choices list).

TPU-native design:
  * fixed-step solvers are a single `lax.scan` over the time grid -
    static trip count, fully fused by XLA, optional `jax.checkpoint`
    rematerialisation of each step body so reverse-mode memory is O(T)
    states instead of O(T * stages) intermediates (the scan analog of the
    reference's torchdiffeq adjoint option).
  * the adaptive dopri5 runs a *bounded* scan of `max_steps` candidate
    steps with masked accept/reject and masked dense-output writes at the
    requested `ts` - no data-dependent shapes, so the whole solve jits and
    differentiates.
  * implicit methods (bdf) use a fixed-iteration batched Newton with
    per-sample (D, D) Jacobians via vmap(jacfwd) - D is tiny (6-12), so
    these are register-level solves.

All solvers take `f(t, z) -> dz` and integrate from ts[0] through ts[-1],
returning states at each requested time (first row is z0).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vae_gp_ode_tpu.core import linalg


FIXED_STEP_SOLVERS = (
    'euler', 'midpoint', 'rk4', 'explicit_adams', 'fixed_adams', 'bdf',
)
ADAPTIVE_SOLVERS = ('dopri5', 'adams')
SOLVERS = FIXED_STEP_SOLVERS + ADAPTIVE_SOLVERS


class ODESolution(NamedTuple):
    zs: jnp.ndarray      # (T, *z.shape) states at requested times
    nfe: jnp.ndarray     # scalar: number of RHS evaluations


# ---------------------------------------------------------------------------
# single-step integrators (t, z, dt) -> z_next, each with a static fn-eval
# count so nfe replaces the reference's _num_evals buffer (flow.py:20,27-28)
# ---------------------------------------------------------------------------

def _euler_step(f, t, z, dt):
    return z + dt * f(t, z)


def _midpoint_step(f, t, z, dt):
    k1 = f(t, z)
    k2 = f(t + 0.5 * dt, z + 0.5 * dt * k1)
    return z + dt * k2


def _rk4_step(f, t, z, dt):
    k1 = f(t, z)
    k2 = f(t + 0.5 * dt, z + 0.5 * dt * k1)
    k3 = f(t + 0.5 * dt, z + 0.5 * dt * k2)
    k4 = f(t + dt, z + dt * k3)
    return z + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


# (step_fn, rhs evals per step) - the single source for nfe accounting
_ONESTEP = {'euler': (_euler_step, 1), 'midpoint': (_midpoint_step, 2),
            'rk4': (_rk4_step, 4)}


def _newton_solve(g, z_init, iters=6):
    """Solve g(z) = 0 for batched z (N, D) with damped per-sample Newton.

    D is the latent dimension (6-12): the (D, D) solves are tiny and fuse
    into the scan body. Two robustness choices:
      * jacrev (not jacfwd): the GP right-hand side dispatches to a
        jax.custom_vjp Pallas kernel on TPU, which forbids forward-mode
        AD; reverse-mode costs the same at these tiny D.
      * per-sample backtracking (step fractions 1, 1/2, 1/4, keep-current):
        each iterate is accepted only if it reduces that sample's residual
        norm, so the iteration is monotone and cannot blow up on stiff
        vector fields (undamped Newton diverges on the wiggly
        small-lengthscale DF field); where the unit step converges it is
        taken, preserving quadratic convergence.
    """
    jac = jax.vmap(jax.jacrev(lambda zi: g(zi[None])[0]))

    def body(_, z):
        r = g(z)                      # (N, D)
        J = jac(z)                    # (N, D, D)
        # core.linalg.solve: pure-HLO Gauss-Jordan when tracing a serving
        # export (jnp.linalg.solve lowers to LAPACK getrf/trsm custom
        # calls on CPU, which segfault from a deserialized artifact -
        # core/linalg.py), the XLA-native solve otherwise
        dz = linalg.solve(J, r[..., None])[..., 0]
        best_z = z
        best_rn = jnp.sum(r * r, axis=-1)          # (N,)
        for alpha in (1.0, 0.5, 0.25):
            z_try = z - alpha * dz
            rt = g(z_try)
            rtn = jnp.sum(rt * rt, axis=-1)
            better = rtn < best_rn
            best_z = jnp.where(better[..., None], z_try, best_z)
            best_rn = jnp.where(better, rtn, best_rn)
        return best_z

    return jax.lax.fori_loop(0, iters, body, z_init)


# ---------------------------------------------------------------------------
# fixed-step drivers
# ---------------------------------------------------------------------------

def _fixed_singlestep(f, z0, ts, method, dense, remat):
    step_fn, evals_per_step = _ONESTEP[method]

    def interval(z, t_pair):
        t0, t1 = t_pair
        h = (t1 - t0) / dense

        def substep(i, zt):
            return step_fn(f, t0 + i * h, zt, h)

        z1 = jax.lax.fori_loop(0, dense, substep, z)
        return z1, z1

    if remat:
        interval = jax.checkpoint(interval)

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    _, zs = jax.lax.scan(interval, z0, t_pairs)
    zs = jnp.concatenate([z0[None], zs], axis=0)
    nfe = jnp.asarray((ts.shape[0] - 1) * dense * evals_per_step)
    return ODESolution(zs=zs, nfe=nfe)


def _fixed_adams_family(f, z0, ts, method, dense, remat):
    """4-step Adams methods on the dense substep grid, matching the
    accuracy order of torchdiffeq's fixed-grid Adams solvers (order 4) that
    the reference exposes under the same names (reference main.py:18).

    explicit_adams: Adams-Bashforth-4.  fixed_adams: AB4 predictor +
    Adams-Moulton-4 corrector (PECE). (`adams` is the adaptive VCABM
    below, matching torchdiffeq's naming.) The first three substeps bootstrap
    with RK4 (same order), unrolled OUTSIDE the steady-state scan so the
    scan body stays two RHS evaluations. Coefficients assume locally
    uniform substep spacing (as torchdiffeq's fixed-grid Adams do); the
    framework's time grids are dt*arange(T), which is exactly uniform.
    """
    corrector = method == 'fixed_adams'
    T = ts.shape[0]
    total = (T - 1) * dense

    # flat substep grid: start time and step size of each substep
    h_int = (ts[1:] - ts[:-1]) / dense                      # (T-1,)
    t_start = (ts[:-1, None]
               + h_int[:, None] * jnp.arange(dense)).reshape(-1)
    hs = jnp.repeat(h_int, dense)                           # (total,)

    nboot = min(3, total)
    z = z0
    boot_states = []
    fhist = []                      # f at substep starts, oldest first
    for i in range(nboot):          # static unroll (<= 3 substeps)
        t0, h = t_start[i], hs[i]
        k1 = f(t0, z)
        k2 = f(t0 + 0.5 * h, z + 0.5 * h * k1)
        k3 = f(t0 + 0.5 * h, z + 0.5 * h * k2)
        k4 = f(t0 + h, z + h * k3)
        fhist.append(k1)
        z = z + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        boot_states.append(z)

    if total > nboot:
        def substep(carry, inp):
            zt, f1, f2, f3 = carry      # f3 = f_{n-1} ... f1 = f_{n-3}
            t0, h = inp
            fc = f(t0, zt)              # f_n
            z_pred = zt + (h / 24.0) * (55.0 * fc - 59.0 * f3
                                        + 37.0 * f2 - 9.0 * f1)
            if corrector:
                f_pred = f(t0 + h, z_pred)
                z_new = zt + (h / 24.0) * (9.0 * f_pred + 19.0 * fc
                                           - 5.0 * f3 + f2)
            else:
                z_new = z_pred
            return (z_new, f2, f3, fc), z_new

        if remat:
            substep = jax.checkpoint(substep)
        carry0 = (z, fhist[-3], fhist[-2], fhist[-1])
        _, rest = jax.lax.scan(substep, carry0,
                               (t_start[nboot:], hs[nboot:]))
        states = jnp.concatenate([jnp.stack(boot_states), rest], axis=0)
    else:
        states = jnp.stack(boot_states) if boot_states \
            else jnp.zeros((0,) + z0.shape, z0.dtype)

    # outputs are the substep states at the end of each interval
    zs = jnp.concatenate([z0[None], states[dense - 1::dense]], axis=0)
    per = 2 if corrector else 1
    nfe = jnp.asarray(nboot * 4 + max(total - nboot, 0) * per)
    return ODESolution(zs=zs, nfe=nfe)


def _fixed_bdf2(f, z0, ts, dense, remat, newton_iters=6):
    """Fixed-step BDF2 with batched Newton; first substep is backward Euler.

    Variable-step-ratio coefficients (w = h / h_prev, the spacing of the
    z_prev history point, which differs from h across interval boundaries
    when `ts` is non-uniform):

        z_{n+1} = ((1+w)^2 z_n - w^2 z_{n-1}) / (1 + 2w)
                  + h (1+w)/(1+2w) f(t_{n+1}, z_{n+1})

    which reduces to the constant-coefficient 4/3, 1/3, 2/3 stencil at
    w = 1. Without the w terms the method silently drops to first order
    on non-uniform grids (round-3 review finding)."""

    def interval(carry, t_pair):
        z, z_prev, have_prev, h_prev = carry
        t0, t1 = t_pair
        h = (t1 - t0) / dense

        def substep(i, c):
            zt, zp, hp, hpv = c
            t1s = t0 + (i + 1) * h
            w = h / jnp.where(hp, hpv, h)      # 1.0 on the first substep
            c_zt = (1.0 + w) ** 2 / (1.0 + 2.0 * w)
            c_zp = w * w / (1.0 + 2.0 * w)
            c_f = (1.0 + w) / (1.0 + 2.0 * w)

            def g(zn):
                f_n = f(t1s, zn)
                r_bdf2 = zn - c_zt * zt + c_zp * zp - c_f * h * f_n
                r_be = zn - zt - h * f_n
                return jnp.where(hp, r_bdf2, r_be)

            z_new = _newton_solve(g, zt + h * f(t0 + i * h, zt),
                                  iters=newton_iters)
            return z_new, zt, jnp.asarray(True), h

        z1, zp, hp, hpv = jax.lax.fori_loop(
            0, dense, substep, (z, z_prev, have_prev, h_prev))
        return (z1, zp, hp, hpv), z1

    if remat:
        interval = jax.checkpoint(interval)

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    init = (z0, z0, jnp.asarray(False), jnp.asarray(0.0, z0.dtype))
    _, zs = jax.lax.scan(interval, init, t_pairs)
    zs = jnp.concatenate([z0[None], zs], axis=0)
    # per substep: 1 predictor eval + newton_iters * (residual + Jacobian
    # + 3 backtracking residuals); the Jacobian is accounted as 1
    nfe = jnp.asarray((ts.shape[0] - 1) * dense * (1 + 5 * newton_iters))
    return ODESolution(zs=zs, nfe=nfe)


# ---------------------------------------------------------------------------
# adaptive dopri5 (Dormand-Prince RK45) with masked bounded stepping
# ---------------------------------------------------------------------------

# Butcher tableau (Dormand & Prince 1980)
_DP_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                    11 / 84, 0.0])
_DP_B4 = jnp.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                    -92097 / 339200, 187 / 2100, 1 / 40])
# 4th-order dense-output interpolant (Shampine's quartic for Dormand-
# Prince; identical to scipy.integrate RK45.P):
#   z(t + theta*dt) = z + dt * sum_i k_i * sum_j P[i,j] theta^{j+1}
_DP_P = jnp.array([
    [1.0, -8048581381 / 2820520608, 8663915743 / 2820520608,
     -12715105075 / 11282082432],
    [0.0, 0.0, 0.0, 0.0],
    [0.0, 131558114200 / 32700410799, -68118460800 / 10900136933,
     87487479700 / 32700410799],
    [0.0, -1754552775 / 470086768, 14199869525 / 1410260304,
     -10690763975 / 1880347072],
    [0.0, 127303824393 / 49829197408, -318862633887 / 49829197408,
     701980252875 / 199316789632],
    [0.0, -282668133 / 205662961, 2019193451 / 616988883,
     -1453857185 / 822651844],
    [0.0, 40617522 / 29380423, -110615467 / 29380423,
     69997945 / 29380423]])


def _dp_stages(f, t, z, dt, k1):
    """Compute the 7 DP stages; k1 may be reused (FSAL)."""
    ks = [k1]
    for i in range(1, 7):
        acc = jnp.zeros_like(z)
        for j, a in enumerate(_DP_A[i]):
            acc = acc + a * ks[j]
        ks.append(f(t + _DP_C[i] * dt, z + dt * acc))
    return ks


def _hairer_initial_step(f, t0, z0, f0, rtol, atol, order=4):
    """Automatic initial step size (Hairer, Norsett & Wanner, Solving ODEs
    I, sec. II.4; the same algorithm as scipy's _select_initial_step):
    estimate the scale of z and dz, probe one explicit-Euler step, bound
    h by the observed second-derivative proxy. Costs one extra RHS eval.
    `order` is the error-estimator order (4 for RK45 -> exponent 1/5)."""
    scale = atol + jnp.abs(z0) * rtol
    d0 = jnp.sqrt(jnp.mean((z0 / scale) ** 2))
    d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    f1 = f(t0 + h0, z0 + h0 * f0)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / scale) ** 2)) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(dmax <= 1e-15,
                   jnp.maximum(1e-6, h0 * 1e-3),
                   (0.01 / dmax) ** (1.0 / (order + 1.0)))
    return jax.lax.stop_gradient(jnp.minimum(100.0 * h0, h1))


# Lund-stabilised PI step controller constants (Hairer's dopri5.f):
# factor = err^EXPO1 / facold^BETA / SAFE, clipped so h grows <= 10x and
# shrinks <= 5x per step; facold carries the previous ACCEPTED error.
_PI_SAFE = 0.9
_PI_BETA = 0.04
_PI_EXPO1 = 0.2 - _PI_BETA * 0.75
_PI_FAC_MIN = 0.1     # 1/10  -> h at most *10
_PI_FAC_MAX = 5.0     # 1/0.2 -> h at least /5


def _dopri5(f, z0, ts, rtol, atol, max_steps, remat):
    T = ts.shape[0]
    t0, t_end = ts[0], ts[-1]
    dtype = z0.dtype

    # scale-aware dt floor (same construction as _vcabm's t_floor): an
    # absolute constant would override the controller's shrink on solves
    # whose time span is itself tiny and spin at the floor without
    # advancing
    dt_floor = 8.0 * jnp.finfo(dtype).eps * jnp.maximum(
        jnp.max(jnp.abs(ts)), 1.0)

    f0 = f(t0, z0)
    dt0 = jnp.minimum(_hairer_initial_step(f, t0, z0, f0, rtol, atol),
                      jnp.abs(t_end - t0))

    zs_init = jnp.zeros((T,) + z0.shape, dtype).at[0].set(z0)
    filled_init = jnp.zeros((T,), bool).at[0].set(True)

    def step(carry, _):
        t, z, k1, dt, facold, zs, filled, nfe, done = carry

        ks = _dp_stages(f, t, z, dt, k1)
        z5 = z + dt * sum(b * k for b, k in zip(_DP_B5, ks))
        z4 = z + dt * sum(b * k for b, k in zip(_DP_B4, ks))
        # step-size control is a discrete decision: gradients must not flow
        # through the error norm (sqrt/pow blow up at zero error)
        err = jax.lax.stop_gradient(z5 - z4)
        z_sg = jax.lax.stop_gradient(z)
        z5_sg = jax.lax.stop_gradient(z5)
        scale = atol + rtol * jnp.maximum(jnp.abs(z_sg), jnp.abs(z5_sg))
        err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2) + 1e-30)
        accept = err_norm <= 1.0

        # 4th-order DP dense output over [t, t+dt] for requested ts
        # (Shampine's quartic interpolant, _DP_P - same as scipy RK45)
        k_end = ks[6]   # f(t+dt, z5) by FSAL property
        t_new = t + dt
        in_window = (ts > t) & (ts <= t_new) & (~filled) & accept & (~done)
        theta = jnp.clip((ts - t) / dt, 0.0, 1.0)             # (T,)
        tpow = jnp.stack([theta, theta ** 2, theta ** 3, theta ** 4],
                         axis=-1)                             # (T, 4)
        w = tpow @ _DP_P.T                                    # (T, 7)
        interp = z[None] + dt * jnp.tensordot(w, jnp.stack(ks),
                                              axes=([1], [0]))
        bshape = (T,) + (1,) * z0.ndim
        zs = jnp.where(in_window.reshape(bshape), interp, zs)
        filled = filled | in_window

        # Lund-stabilised PI step control (Hairer dopri5.f): the accepted
        # branch damps oscillation with the previous accepted error; the
        # rejected branch is plain I-control with no growth allowed
        fac11 = (err_norm + 1e-30) ** _PI_EXPO1
        fac_acc = jnp.clip(fac11 / (facold ** _PI_BETA) / _PI_SAFE,
                           _PI_FAC_MIN, _PI_FAC_MAX)
        fac_rej = jnp.minimum(_PI_FAC_MAX, fac11 / _PI_SAFE)
        dt_new = jnp.where(accept, dt / fac_acc,
                           dt / jnp.maximum(fac_rej, 1.0))
        facold_next = jnp.where(accept, jnp.maximum(err_norm, 1e-4),
                                facold)
        # do not step far past the end
        active = ~done
        t_next = jnp.where(accept & active, t_new, t)
        z_next = jax.tree.map(
            lambda a, b: jnp.where(accept & active, b, a), z, z5)
        k1_next = jax.tree.map(
            lambda a, b: jnp.where(accept & active, b, a), ks[0], k_end)
        dt_next = jnp.where(active, jnp.minimum(dt_new, t_end - t_next
                                                + 1e-30), dt)
        dt_next = jax.lax.stop_gradient(jnp.maximum(dt_next, dt_floor))
        done_next = done | (t_next >= t_end - 1e-12)
        nfe = nfe + jnp.where(active, 6, 0)   # FSAL: 6 new evals per try
        return (t_next, z_next, k1_next, dt_next, facold_next, zs, filled,
                nfe, done_next), None

    if remat:
        step = jax.checkpoint(step)

    carry0 = (t0, z0, f0, dt0, jnp.asarray(1e-4, dtype), zs_init,
              filled_init, jnp.asarray(2), jnp.asarray(False))
    (tf, zf, _, _, _, zs, filled, nfe, done), _ = jax.lax.scan(
        step, carry0, None, length=max_steps)
    # any unfilled outputs (max_steps exhausted): clamp to final state
    bshape = (T,) + (1,) * z0.ndim
    zs = jnp.where(filled.reshape(bshape), zs, zf[None])
    return ODESolution(zs=zs, nfe=nfe)


# ---------------------------------------------------------------------------
# VCABM: variable-coefficient, variable-step, variable-ORDER Adams (the
# algorithm behind torchdiffeq's `adams` method, which the reference exposes
# at main.py:18 / flow.py:76-85). Shampine & Gordon 1975 divided-difference
# formulation: order-k PECE with predictor over k-1 modified divided
# differences phi_j, corrector + dt*g_{k-1}*phi^P_{k-1}, error estimate
# dt*(g_k - g_{k-1})*phi^P_k, and order adaptation by comparing the k-1,
# k-2 and k+1 error estimates. Requested output times are hit EXACTLY by
# clamping the step (torchdiffeq semantics - no dense-output interpolation).
#
# TPU-native structure: one bounded lax.scan over candidate steps; the
# order-sized history (phi table, previous step times) lives in fixed
# MAX_ORDER-width buffers with masked reads/writes, so shapes are static
# and the whole solve jits and differentiates. The g-coefficient recursion
# is a static 13-iteration fori_loop; beta and the implicit-phi table are
# closed-form cumprod/cumsum (no sequential loop).
# ---------------------------------------------------------------------------

_VCABM_MAX_ORDER = 12
# gamma-star constants for the order-(k+1) error estimate
# (Hairer I, sec III.1, table 1.2 - standard Adams-Moulton constants)
_VCABM_GSTAR = jnp.array([
    1.0, -1 / 2, -1 / 12, -1 / 24, -19 / 720, -3 / 160, -863 / 60480,
    -275 / 24192, -33953 / 3628800, -0.00789255, -0.00678585, -0.00592406,
    -0.00523669])


def _vcabm_g_beta(prev_t, next_t, k, width):
    """The variable-coefficient tables for one candidate step.

    prev_t: (width-1,) accepted step times, most recent first (entries
    beyond the valid history are masked out by `k`). Returns
    (g (width,), beta (width,)): integration coefficients g_0..g_k and
    the phi-rescaling factors beta_0..beta_{k-1} (beta_j = prod of
    (next_t - prev_t[i-1])/(prev_t[0] - prev_t[i])).
    """
    dt = next_t - prev_t[0]
    j_idx = jnp.arange(1, width)                          # (width-1,)
    # beta via masked cumprod (beta_0 = 1); all divides are guarded so a
    # degenerate history entry cannot NaN-poison the scan carry
    num = next_t - prev_t[j_idx - 1]
    den = prev_t[0] - prev_t[j_idx]
    den = jnp.where((j_idx <= k - 1) & (den != 0), den, 1.0)
    ratios = jnp.where(j_idx <= k - 1, num / den, 1.0)
    beta = jnp.concatenate([jnp.ones(1, prev_t.dtype),
                            jnp.cumprod(ratios)])         # (width,)

    # g via the c-recursion (c_q starts at 1/(q+1); each pass folds the
    # next step time in); sequential by construction, 13 static iters
    c0 = 1.0 / jnp.arange(1, width + 2, dtype=prev_t.dtype)  # (width+1,)
    g0 = jnp.zeros((width,), prev_t.dtype).at[0].set(1.0)

    def body(j, cg):
        c, g = cg
        denom = jnp.where(j >= 2, next_t - prev_t[j - 1], 1.0)
        denom = jnp.where(denom != 0, denom, 1.0)
        fac = jnp.where(j == 1, 1.0, dt / denom)
        c_new = c - jnp.concatenate(
            [c[1:], jnp.zeros(1, c.dtype)]) * fac
        c = jnp.where(j <= k, c_new, c)
        g = g.at[j].set(c[0])
        return (c, g)

    _, g = jax.lax.fori_loop(1, width, body, (c0, g0))
    g = jnp.where(jnp.arange(width) <= k, g, 0.0)
    return g, beta


def _vcabm(f, z0, ts, rtol, atol, max_steps, remat):
    T = ts.shape[0]
    dtype = z0.dtype
    W = _VCABM_MAX_ORDER + 2                   # phi-table width (14)
    t0, t_end = ts[0], ts[-1]

    f0 = f(t0, z0)
    dt0 = jnp.minimum(
        _hairer_initial_step(f, t0, z0, f0, rtol, atol, order=1),
        jnp.abs(ts[1] - t0))

    zs_init = jnp.zeros((T,) + z0.shape, dtype).at[0].set(z0)
    phi_init = jnp.zeros((W,) + z0.shape, dtype).at[0].set(f0)
    prev_t_init = jnp.full((W - 1,), t0, dtype)
    gstar = _VCABM_GSTAR.astype(dtype)

    def rms(x, scale):
        return jnp.sqrt(jnp.mean((x / scale) ** 2) + 1e-30)

    # ulp-scale guard: a candidate step landing within ~8 ulps of an
    # output time SNAPS to it, and dt never shrinks below the same floor.
    # Without this a step can stop one ulp short of ts[tgt] and the
    # follow-up sliver step has dt that rounds to exactly 0 in f32 -
    # 0/0 in the coefficient tables then NaN-poisons the scan carry.
    t_floor = 8.0 * jnp.finfo(dtype).eps * jnp.maximum(
        jnp.max(jnp.abs(ts)), 1.0)

    def step(carry, _):
        (y, prev_t, phi, order, n_acc, next_t, tgt, zs, nfe, done) = carry
        final_t = ts[jnp.minimum(tgt, T - 1)]
        t_next = jnp.where(next_t >= final_t - t_floor, final_t, next_t)
        dt = t_next - prev_t[0]

        g, beta = _vcabm_g_beta(prev_t, t_next, order, W)
        ex_phi = phi * beta.reshape((W,) + (1,) * z0.ndim)   # (W, N, D)

        # predictor: y0 + dt * sum_{j<=order-2} g_j phi_j
        jmask = (jnp.arange(W) <= order - 2).astype(dtype)
        p = y + dt * jnp.tensordot(g * jmask, ex_phi, axes=([0], [0]))
        f_p = f(t_next, p)

        # implicit phi table from the predictor eval: phi^P_j =
        # f_p - sum_{i<j} ex_phi_i (closed-form cumsum)
        cs = jnp.cumsum(ex_phi, axis=0)
        phi_p = jnp.concatenate([f_p[None], f_p[None] - cs[:-1]], axis=0)

        take = lambda arr, i: jax.lax.dynamic_index_in_dim(  # noqa: E731
            arr, jnp.maximum(i, 0), axis=0, keepdims=False)
        y_next = p + dt * take(g, order - 1) * take(phi_p, order - 1)

        # corrector eval + full implicit phi table for the next step
        f_c = f(t_next, y_next)
        phi_next = jnp.concatenate([f_c[None], f_c[None] - cs[:-1]],
                                   axis=0)

        # error control (stop_gradient: discrete decisions). The local
        # error is the Milne estimate (the order-k vs order-k+1 corrector
        # difference, dt*(g_k - g_{k-1})*phi^P_k) PLUS the one-correction
        # PECE residual dt*g_{k-1}*(f_c - f_p): with a single corrector
        # application the implicit equation is not solved to convergence
        # and the residual term dominates by ~4x (measured on the
        # rotation problem) - torchdiffeq's adams omits it and runs that
        # factor optimistic against its own tolerance; f_c is already
        # computed for the phi update, so honesty here is free.
        scale = atol + rtol * jnp.maximum(jnp.abs(
            jax.lax.stop_gradient(y)), jnp.abs(jax.lax.stop_gradient(p)))
        sg = jax.lax.stop_gradient
        err_k = rms(sg(dt * (take(g, order) - take(g, order - 1))
                       * take(phi_p, order)
                       + dt * take(g, order - 1) * (f_c - f_p)), scale)
        accept = err_k <= 1.0

        # --- order adaptation (torchdiffeq's rule) ---
        err_km1 = rms(sg(dt * (take(g, order - 1) - take(g, order - 2))
                         * take(phi_p, order - 1)), scale)
        err_km2 = rms(sg(dt * (take(g, order - 2) - take(g, order - 3))
                         * take(phi_p, order - 2)), scale)
        err_kp1 = rms(sg(dt * take(gstar, order + 1)
                         * take(phi_next, order + 1)), scale)
        young = (n_acc + 1 <= 4) | (order < 3)
        ord_up = jnp.minimum(jnp.minimum(order + 1, 3), _VCABM_MAX_ORDER)
        dec = jnp.minimum(err_km1, err_km2) < err_k
        inc = (order < _VCABM_MAX_ORDER) & (err_kp1 < err_k)
        ord_mature = jnp.where(dec, order - 1,
                               jnp.where(inc, order + 1, order))
        next_order = jnp.where(young, ord_up, ord_mature)
        next_order = jnp.clip(next_order, 1, _VCABM_MAX_ORDER)

        # --- step-size control (I-controller, torchdiffeq defaults
        # safety 0.9 / ifactor 10 / dfactor 0.2, exponent 1/(order+1)) ---
        expo = 1.0 / (order.astype(dtype) + 1.0)
        fac = jnp.clip(0.9 * err_k ** (-expo), 0.2, 10.0)
        dt_acc = jnp.where(next_order > order, dt, dt * fac)
        dt_rej = dt * jnp.minimum(fac, 1.0)
        dt_new = sg(jnp.maximum(jnp.where(accept, dt_acc, dt_rej),
                                t_floor))

        # --- output capture: the step lands exactly on ts[tgt] ---
        active = ~done
        hit = accept & active & (t_next >= final_t)
        idx = jnp.where(hit, tgt, 0)
        cur = jax.lax.dynamic_index_in_dim(zs, idx, axis=0,
                                           keepdims=False)
        zs = jax.lax.dynamic_update_index_in_dim(
            zs, jnp.where(hit, y_next, cur), idx, axis=0)
        tgt = tgt + hit.astype(tgt.dtype)
        done = done | (tgt >= T)

        # --- commit or retry ---
        acc = accept & active
        y = jnp.where(acc, y_next, y)
        prev_t = jnp.where(acc,
                           jnp.concatenate([t_next[None], prev_t[:-1]]),
                           prev_t)
        phi = jnp.where(acc, phi_next, phi)
        order = jnp.where(acc, next_order, order)
        n_acc = n_acc + acc.astype(n_acc.dtype)
        next_t = jnp.where(active, prev_t[0] + dt_new, next_t)
        # both the predictor and corrector RHS evals run every candidate
        # step (XLA computes both scan-body branches), so count both
        nfe = nfe + jnp.where(active, 2, 0)
        return (y, prev_t, phi, order, n_acc, next_t, tgt, zs, nfe,
                done), None

    if remat:
        step = jax.checkpoint(step)

    carry0 = (z0, prev_t_init, phi_init, jnp.asarray(1), jnp.asarray(0),
              t0 + dt0, jnp.asarray(1), zs_init, jnp.asarray(2),
              jnp.asarray(T <= 1))
    (yf, _, _, _, _, _, tgt, zs, nfe, done) = jax.lax.scan(
        step, carry0, None, length=max_steps)[0]
    # max_steps exhausted before all outputs: clamp the rest to the final
    # state (same policy as _dopri5)
    bshape = (T,) + (1,) * z0.ndim
    filled = jnp.arange(T) < jnp.maximum(tgt, 1)
    zs = jnp.where(filled.reshape(bshape), zs, yf[None])
    return ODESolution(zs=zs, nfe=nfe)


# ---------------------------------------------------------------------------
# public entry point
# ---------------------------------------------------------------------------

def odeint(f, z0, ts, method='euler', dense=1, rtol=1e-6, atol=1e-6,
           max_steps=256, remat=True):
    """Integrate dz/dt = f(t, z) from ts[0] through ts[-1].

    NOT jitted at this level: jit would key its cache on the identity of
    `f`, so the normal calling pattern (a fresh closure per call) would
    retrace every call AND grow the cache without bound. All production
    paths (train/eval steps, bench) jit at the step level; wrap eager
    hot loops in jax.jit yourself if `f` is long-lived.

    @param f: RHS callable (t, z) -> dz (closed over params/FnSample)
    @param z0: initial state, any array shape
    @param ts: (T,) requested output times, ts[0] is t0
    @param method: one of SOLVERS (reference surface main.py:18,81)
    @param dense: substeps per output interval for fixed-step methods
        (the reference's --ts_dense_scale concept, main.py:83)
    @param rtol, atol: adaptive tolerances (reference flow.py:49: 1e-6)
    @param max_steps: bound on adaptive steps (static, for jit)
    @param remat: rematerialise step bodies in reverse mode
    @return: ODESolution(zs=(T, *z0.shape), nfe=scalar)
    """
    ts = jnp.asarray(ts, dtype=z0.dtype)
    if method in _ONESTEP:
        return _fixed_singlestep(f, z0, ts, method, dense, remat)
    if method in ('explicit_adams', 'fixed_adams'):
        return _fixed_adams_family(f, z0, ts, method, dense, remat)
    if method == 'bdf':
        return _fixed_bdf2(f, z0, ts, dense, remat)
    if method == 'dopri5':
        return _dopri5(f, z0, ts, rtol, atol, max_steps, remat)
    if method == 'adams':
        return _vcabm(f, z0, ts, rtol, atol, max_steps, remat)
    raise ValueError(f'unknown solver {method!r}; choose from {SOLVERS}')
