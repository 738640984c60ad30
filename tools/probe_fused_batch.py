"""TPU probe for VERDICT round-2 Weak #1: the fused trajectory kernel must
compile AND run (value-fetch-verified, grads included) at production shapes
for batch sizes up to 5120 under shipped defaults.

Two sections:
  1. kernel-only: fused_euler_flow forward + grad at N in {20..5120}.
  2. FULL TRAIN STEP (the configuration that actually regressed in round
     3: N=320 passed kernel-only probing but failed the in-step compile,
     because value_and_grad + remat + the L-vmap raise the real VMEM
     pressure): make_train_step under shipped defaults for RBF and DF
     at N around the single-block/tiled boundary and at scale.

Run on the TPU:  python tools/probe_fused_batch.py [--quick]
Prints one line per case; exits non-zero on any failure.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from vae_gp_ode_tpu.ops.flow_fused import fused_euler_flow

    quick = '--quick' in sys.argv[1:]
    K, S, M, T = 6, 256, 100, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    failures = 0
    for N in ((20, 1280) if quick else (20, 1280, 5120)):
        for order in (1, 2):
            D = K * order
            args = (
                jax.random.normal(ks[0], (N, D)) * 0.5,
                jax.random.normal(ks[1], (D, S, K)),
                jax.random.uniform(ks[2], (1, S, K)) * 6.28,
                jax.random.normal(ks[3], (S, K)),
                jax.random.normal(ks[4], (M, D)),
                jax.random.normal(ks[5], (K, M)) * 0.1,
                jax.random.uniform(ks[6], (K, D), minval=0.8, maxval=2.0),
                jax.random.uniform(ks[7], (K,), minval=0.3, maxval=1.0),
            )

            @jax.jit
            def fwd_loss(*a):
                return jnp.sum(fused_euler_flow(*a, 0.1, T, order) ** 2)

            grad_fn = jax.jit(jax.grad(fwd_loss, argnums=(0, 3)))
            try:
                t0 = time.time()
                v = float(fwd_loss(*args))        # value fetch = proof
                g = grad_fn(*args)
                gs = float(jnp.sum(g[0] ** 2)) + float(jnp.sum(g[1] ** 2))
                dt = time.time() - t0
                import math
                ok = math.isfinite(v) and math.isfinite(gs)
                print(f'N={N:5d} order={order}: '
                      f'{"OK " if ok else "NaN"} loss={v:.4e} '
                      f'gnorm2={gs:.4e} compile+run={dt:.1f}s', flush=True)
                if not ok:
                    failures += 1
            except Exception as e:  # noqa: BLE001 - report, keep probing
                print(f'N={N:5d} order={order}: FAIL {type(e).__name__}: '
                      f'{str(e)[:200]}', flush=True)
                failures += 1
    failures += probe_train_step(quick)
    print(f'probe {"PASSED" if failures == 0 else "FAILED"} '
          f'({failures} failures)')
    return 1 if failures else 0


def probe_train_step(quick=False):
    """Full train step under shipped defaults at batch sizes spanning the
    single-block/tiled dispatch boundary (256) and production scale.
    --quick keeps only the boundary cases (320 = first size past the RBF
    single-block limit; 256 = the limit itself)."""
    from vae_gp_ode_tpu.models.odegpvae import init_model
    from vae_gp_ode_tpu.training.trainer import (
        create_train_state, make_train_step)

    T, Q, M, S = 16, 6, 100, 256
    failures = 0
    for kernel in ('RBF', 'DF'):
        for N in ((256, 320) if quick else (20, 256, 320, 512, 1280)):
            kw = ({'kernel': 'DF', 'D_in': Q, 'D_out': Q}
                  if kernel == 'DF' else {})
            model, variables, gp = init_model(
                jax.random.PRNGKey(0), latent_dim=Q, n_filt=8, order=1,
                num_features=S, num_inducing=M, batch=N, T=T,
                solver='euler', **kw)
            state, tx = create_train_state(model, variables, gp, lr=1e-3)
            X = jax.random.uniform(jax.random.PRNGKey(1),
                                   (N, T, 1, 28, 28))
            X = (X - 0.1307) / 0.3081
            step = make_train_step(model, tx, num_observations=360.0,
                                   eps_guard=True)
            try:
                t0 = time.time()
                st, m = step(state, X, jax.random.PRNGKey(2), 1)
                v = float(m['loss'])                # value fetch = proof
                import math
                ok = math.isfinite(v)
                print(f'train_step {kernel} N={N:5d}: '
                      f'{"OK " if ok else "NaN"} loss={v:.4e} '
                      f'compile+run={time.time() - t0:.0f}s', flush=True)
                if not ok:
                    failures += 1
            except Exception as e:  # noqa: BLE001 - report, keep probing
                print(f'train_step {kernel} N={N:5d}: FAIL '
                      f'{type(e).__name__}: {str(e)[:200]}', flush=True)
                failures += 1
    return failures


if __name__ == '__main__':
    sys.exit(main())
