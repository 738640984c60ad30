"""Model evaluation: the reference's notebook protocol as a script.

Rebuild of the eval performed in the reference's plots_dynamics.ipynb /
plots_dynamics_extended.ipynb (the source of every published number in
BASELINE.md): `compute_mse_std(model, data, L)` - full-test-set MC
reconstruction MSE (mean +- std of squared error) - plus 2x-horizon
rollouts and latent-dynamics PCA plots for a trained checkpoint.

Usage:
  python evaluate.py --model_path results/mnist_<stamp> [--L 5]
                     [--Troll 2] [--device cpu]
Prints one JSON line with mse_mean/mse_std and writes plots next to the
checkpoint.
"""

import argparse
import json
import os

import numpy as np

parser = argparse.ArgumentParser('Evaluate a trained VAE-GP-ODE checkpoint')
parser.add_argument('--model_path', type=str, default=None,
                    help='run dir containing odegpvae_mnist.ckpt + args.json')
parser.add_argument('--model_paths', type=str, nargs='*', default=None,
                    help='several run dirs: prints a comparison table '
                         '(the reference notebooks compare 6+ trained '
                         'checkpoints this way)')
parser.add_argument('--L', type=int, default=5,
                    help='MC samples (notebook uses 5)')
parser.add_argument('--Troll', type=int, default=2,
                    help='rollout horizon multiplier')
parser.add_argument('--batch', type=int, default=0,
                    help='eval batch size (0: use training batch)')
parser.add_argument('--device', type=str, default='tpu')


def sigmoid_floor_mse(X_norm):
    """Information-theoretic floor of the reference metric on this data.

    The reference compares sigmoid decoder outputs (range (0,1)) against
    mean/std-NORMALISED pixels (range [-0.42, 2.82] for [0,1] raw data) -
    notebook cell 13 via data/utils.py:12-15. No model can beat the
    pointwise optimum clip(x_norm, 0, 1), so

        floor = mean((X_norm - clip(X_norm, 0, 1))**2)

    is a property of the DATA's pixel distribution, not of the model.
    `mse_excess = mse_mean - floor` is the model's actual reconstruction
    error and the only number comparable across datasets (on the
    synthetic glyphs the floor is ~0.49 of the ~0.49 total; BASELINE.md's
    published 0.02-0.06 on the non-redistributed rot-mnist.mat implies
    that file's pixel distribution has a near-zero floor).

    Returns (floor_mean, ddof-1 std of the floor residuals).
    """
    resid = (X_norm - np.clip(X_norm, 0.0, 1.0)) ** 2
    return float(resid.mean()), float(resid.ravel().std(ddof=1))


def compute_mse_std(model, state, loader, L, key):
    """Full-test-set MC reconstruction MSE, exactly the reference
    notebook's protocol (plots_dynamics.ipynb cell 13):

        se = (Xrec - test_batch)**2      # Xrec (L,N,T,c,d,d) broadcast
        mse, std = torch.mean(se_all), torch.std(se_all)

    i.e. PER-MC-SAMPLE squared error over the full (batches, L, N, T, c,
    h, w) tensor - NOT the squared error of the MC-mean reconstruction -
    with the ddof=1 std of torch.std."""
    import jax
    from vae_gp_ode_tpu.training.trainer import make_eval_step

    ev = make_eval_step(model)
    sqerrs = []
    for i, batch in enumerate(loader):
        key, k = jax.random.split(key)
        Xrec, _ = ev(state, batch, k, L)          # (L,N,T,1,d,d)
        se = (np.asarray(Xrec) - np.asarray(batch)[None]) ** 2
        sqerrs.append(se.ravel())
    allsq = np.concatenate(sqerrs)
    return float(allsq.mean()), float(allsq.std(ddof=1))


def evaluate_one(args, model_path):
    import jax
    from vae_gp_ode_tpu.data.mnist import load_data
    from vae_gp_ode_tpu.serving import load_run_dir
    from vae_gp_ode_tpu.training.trainer import make_eval_step
    from vae_gp_ode_tpu.utils import plotting

    # serving.load_run_dir rebuilds (model, restored state) from
    # args.json + checkpoint, incl. the frozen-VAE opt_state template
    model, state, ta = load_run_dir(model_path)

    trainset, testset = load_data(ta)
    if args.batch:
        testset.batch_size = args.batch

    key = jax.random.PRNGKey(ta.seed + 1)
    mse_mean, mse_std = compute_mse_std(model, state, testset, args.L, key)

    # 2x-horizon rollout (notebook + create_plots.py:19-23)
    roll = make_eval_step(model, T_custom=args.Troll * ta.T)
    test_batch = testset.first()[:3]
    Xroll, _ = roll(state, test_batch, key, 1)
    out_dir = os.path.join(model_path, 'eval')
    os.makedirs(out_dir, exist_ok=True)
    plotting.plot_data(np.asarray(test_batch),
                       fname=os.path.join(out_dir, 'rollout_original.png'),
                       size=3)
    plotting.plot_rollout(np.asarray(Xroll),
                          fname=os.path.join(out_dir, 'rollout.png'))

    floor_mean, floor_std = sigmoid_floor_mse(np.asarray(testset.X))
    return {
        'metric': 'test_recon_mse',
        'mse_mean': round(mse_mean, 6),
        'mse_std': round(mse_std, 6),
        'mse_floor': round(floor_mean, 6),
        'mse_floor_std': round(floor_std, 6),
        'mse_excess': round(mse_mean - floor_mean, 6),
        'L': args.L,
        'rollout_T': args.Troll * ta.T,
        'kernel': ta.kernel,
        'ode': ta.ode,
        'model_path': model_path,
    }


def main():
    args = parser.parse_args()
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from vae_gp_ode_tpu.core.settings import enable_compilation_cache
    enable_compilation_cache()

    if args.model_paths:
        # multi-checkpoint comparison (the notebooks' table protocol)
        results = [evaluate_one(args, p) for p in args.model_paths]
        print(f"{'model':48s} {'kernel':6s} {'ode':3s} "
              f"{'mse_mean':>10s} {'mse_std':>10s}")
        for r in results:
            print(f"{os.path.basename(r['model_path'].rstrip('/')):48s} "
                  f"{r['kernel']:6s} {r['ode']:<3d} "
                  f"{r['mse_mean']:>10.6f} {r['mse_std']:>10.6f}")
        print(json.dumps(results))
    elif args.model_path:
        print(json.dumps(evaluate_one(args, args.model_path)))
    else:
        parser.error('provide --model_path or --model_paths')


if __name__ == '__main__':
    main()
