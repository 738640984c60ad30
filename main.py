"""Coupled VAE-GP-ODE training entry point.

Flag-compatible rebuild of the reference driver (reference:
experiments/main.py:20-253): same argparse surface (including type=eval
booleans and the euler default that bypasses the solver choices list),
same training protocol (Adam lr 1e-3 over all parameters, MC-sample
schedule L=1 for the first half of training then L=5, per-epoch first-test-
batch eval + checkpoint, NaN bailout that reloads the last checkpoint and
emits all plots), same run-dir layout results/<save>_<timestamp>/.

TPU-native differences: one jitted train step (forward + grads + Adam fused
on device), explicit PRNG keys, checkpoints include optimizer state (the
reference silently drops Adam moments on resume).
"""

import argparse
import os
import sys
import time
from datetime import datetime, timedelta

import numpy as np

SOLVERS = ["dopri5", "bdf", "rk4", "midpoint", "adams", "explicit_adams",
           "fixed_adams", "euler"]
KERNELS = ['RBF', 'DF']

parser = argparse.ArgumentParser('Learning latent dynamics with VAE-GP-ODE (TPU)')

# data processing arguments (reference main.py:23-42)
parser.add_argument('--data_root', type=str, default='data/')
parser.add_argument('--task', type=str, default='mnist')
parser.add_argument('--mask', type=eval, default=True,
                    help="select a subset of mnist data")
parser.add_argument('--value', type=int, default=3,
                    help="digit filter")
parser.add_argument('--data_seqlen', type=int, default=100)
parser.add_argument('--batch', type=int, default=20)
parser.add_argument('--T', type=int, default=16)
parser.add_argument('--Ndata', type=int, default=360)
parser.add_argument('--Ntest', type=int, default=40)
parser.add_argument('--rotrand', type=eval, default=True,
                    help="if True multiple initial rotation angles "
                         "(no-op unless --rotrand_active, matching the "
                         "reference's commented-out branch)")
parser.add_argument('--rotrand_active', type=eval, default=False,
                    help="actually apply the rot_start reshuffle")
parser.add_argument('--n_glyphs', type=int, default=0,
                    help="synthetic data only: 0 = fresh glyph per "
                         "sequence (open-set appearance, the reference-"
                         "regime analog); k > 0 = closed k-glyph pool "
                         "shared by train/test - test sequences become "
                         "replicas of training ones, so test MSE is a "
                         "memorisation/fidelity upper bound (dynamics + "
                         "reconstruction ceiling), not generalisation")

# vae arguments (reference main.py:45-54)
parser.add_argument('--latent_dim', type=int, default=6)
parser.add_argument('--n_filt', type=int, default=8)
parser.add_argument('--frames', type=int, default=5)
parser.add_argument('--pretrained', type=eval, default=False)
parser.add_argument('--vae_path', type=str, default='')

# gp arguments (reference main.py:57-71)
parser.add_argument('--kernel', type=str, default='RBF', choices=KERNELS)
parser.add_argument('--num_features', type=int, default=256)
parser.add_argument('--num_inducing', type=int, default=100)
parser.add_argument('--dimwise', type=eval, default=True)
parser.add_argument('--variance', type=float, default=0.7)
parser.add_argument('--lengthscale', type=float, default=2.0)
parser.add_argument('--q_diag', type=eval, default=False)
parser.add_argument('--fix_kernel', type=eval, default=False,
                    help="freeze the kernel hyperparameters (lengthscales"
                         " + variance) during optimisation - the"
                         " reference's initialize_and_fix_kernel_"
                         "parameters(fix=True) capability"
                         " (initialization.py:19-21)")

# ode solver arguments (reference main.py:75-88)
parser.add_argument('--ode', type=int, default=1)
parser.add_argument('--D_in', type=int, default=6)
parser.add_argument('--D_out', type=int, default=6)
parser.add_argument('--solver', type=str, default='euler', choices=SOLVERS)
parser.add_argument('--ts_dense_scale', type=int, default=1,
                    help="substeps per output interval for fixed solvers")
parser.add_argument('--use_adjoint', type=eval, default=False,
                    help="continuous adjoint-ODE reverse mode (O(1) "
                         "memory); default is rematerialised backprop "
                         "through the scan (exact gradients)")
parser.add_argument('--dt', type=float, default=0.1)

# training arguments (reference main.py:92-109)
parser.add_argument('--Nepoch', type=int, default=5000)
parser.add_argument('--lr', type=float, default=0.001)
parser.add_argument('--eval_sample_size', type=int, default=128)
parser.add_argument('--save', type=str, default='results/mnist')
parser.add_argument('--seed', type=int, default=121)
parser.add_argument('--log_freq', type=int, default=5)
parser.add_argument('--device', type=str, default='tpu',
                    help="placeholder for device (JAX manages placement)")
parser.add_argument('--continue_training', type=eval, default=False)
parser.add_argument('--model_path', type=str, default='None')
parser.add_argument('--eps_guard', type=eval, default=True,
                    help="DELIBERATE DEVIATION from the reference default: "
                         "True uses the EPSILON-guarded Bernoulli log-prob "
                         "log(1e-3+z)x + log(1e-3+1-z)(1-x) (the "
                         "reference's dead except-branch, vae.py:149). The "
                         "reference's live objective (False; vae.py:147) "
                         "is UNBOUNDED ABOVE on mean/std-normalised pixels "
                         "(X>1 makes log(1-z)(1-X) -> +inf as z -> 1): "
                         "measured to diverge to NaN within 2 epochs "
                         "out-of-box - which is why the reference ships a "
                         "NaN bailout. --eps_guard False restores the "
                         "exact reference objective (parity-tested)")
parser.add_argument('--nan_policy', type=str, default='bailout',
                    choices=['bailout', 'skip'],
                    help="on a non-finite loss: 'bailout' reloads the last "
                         "checkpoint, plots and exits (exact reference "
                         "protocol, main.py:116-129,205-207); 'skip' "
                         "discards the bad step's update (the in-scan "
                         "guard already carries state through unchanged), "
                         "logs it, and keeps training - resilient mode "
                         "for long unattended runs")
parser.add_argument('--plot_freq', type=int, default=10,
                    help="epochs between eval plots/checkpoints. The "
                         "reference plots+checkpoints every epoch "
                         "(main.py:243-244) but OVERWRITES the same "
                         "plot/ckpt file each time, so a coarser cadence "
                         "loses only mid-run checkpoint recency (<= "
                         "plot_freq-1 epochs) - while per-epoch artifacts "
                         "force a per-epoch host fetch that defeats "
                         "--epochs_per_fetch (host-side matplotlib also "
                         "dominates fast TPU runs). DEFAULT 10 since "
                         "round 4, aligned with --epochs_per_fetch so "
                         "plain `python main.py` actually runs the "
                         "chained-fetch path bench.py headlines; set 1 "
                         "for the reference-faithful cadence")
parser.add_argument('--data_parallel', type=eval, default=False,
                    help="shard the batch over all devices (mesh data "
                         "axis); single-device when only one chip")
parser.add_argument('--dp_impl', type=str, default='auto',
                    choices=['auto', 'shardmap', 'gspmd'],
                    help="data-parallel implementation: 'shardmap' runs "
                         "the step per-shard (keeps the fused Pallas "
                         "kernels; needs batch %% n_devices == 0), "
                         "'gspmd' lets the XLA partitioner shard the jnp "
                         "graph; 'auto' picks shardmap when the Pallas "
                         "fast paths are active and the batch divides")
parser.add_argument('--fast_epoch', type=eval, default=True,
                    help="scan whole epochs on device (one dispatch per "
                         "epoch; metrics fetched as arrays). Drops the "
                         "ragged tail batch when Ndata %% batch != 0 "
                         "(static scan shapes). False reproduces the "
                         "reference's per-iteration loop (sees every "
                         "sequence)")
parser.add_argument('--epochs_per_dispatch', type=int, default=1,
                    help="fast-epoch, single-device only: run this many "
                         "whole epochs - train scan, ragged tail, AND the "
                         "per-epoch monitoring eval - as ONE device "
                         "dispatch (lax.scan over epochs; batch "
                         "permutations precomputed on host from the same "
                         "RNG stream and keys split in the same order, so "
                         "the trajectory matches the per-epoch path up to "
                         "XLA fusion rounding ~1e-6). Epochs that must run "
                         "singly (artifact epochs, the L schedule switch, "
                         "the final epoch, any remainder) fall back to "
                         "the per-epoch dispatch automatically. Metric "
                         "fetch cadence becomes max(this, "
                         "--epochs_per_fetch)")
parser.add_argument('--epochs_per_fetch', type=int, default=10,
                    help="fast-epoch only: chain this many whole-epoch "
                         "dispatches on device between host metric "
                         "fetches (one tunnel round-trip amortised over "
                         "the chain - bench.py's chained-dispatch "
                         "protocol). The training trajectory is "
                         "bit-identical for any value; only the cadence "
                         "of logging, meters, the NaN check and the "
                         "frozen-VAE assert coarsens to the flush "
                         "boundary, and plots/checkpoints force a flush "
                         "at their epoch. DEFAULT 10 since round 4: a "
                         "measured 1.54x trainer wall-clock win "
                         "(results/epf_ab_r3.json) at identical "
                         "numbers. 1 = fetch every epoch (the "
                         "reference-faithful cadence)")

# plotting arguments (reference main.py:113-114)
parser.add_argument('--Troll', type=int, default=2)

# observability (TPU-native addition: jax.profiler traces)
parser.add_argument('--profile', type=eval, default=False,
                    help="capture a jax.profiler trace of training steps "
                         "into <run_dir>/profile")


def final_plots(logger, args, model, state, trainset, testset, meters,
                roll_step, key):
    """Latent-dynamics PCA, loss traces, hyperparameter trace, 2x-horizon
    rollout (reference create_plots.py:6-23)."""
    from vae_gp_ode_tpu.utils import plotting

    elbo_m, nll_m, zkl_m, ukl_m, hyp_m = meters
    plotting.plot_trace(elbo_m, nll_m, zkl_m, ukl_m, args.save)
    plotting.plot_params(hyp_m, args.save)

    for name, loader in (('train', trainset), ('test', testset)):
        batch = loader.first()
        ztL = latent_trajectories(model, state, batch, key)
        plotting.plot_latent_dynamics(
            np.asarray(ztL), order=args.ode,
            fname=os.path.join(args.save, f'plots/dynamics_{name}'))

    test_batch = testset.first()[:3]
    plotting.plot_data(np.asarray(test_batch),
                       fname=os.path.join(args.save,
                                          'plots/rollout_original.png'),
                       size=3)
    Xrec_roll, _ = roll_step(state, test_batch, key, 1)
    plotting.plot_rollout(np.asarray(Xrec_roll),
                          fname=os.path.join(args.save, 'plots/rollout.png'))
    logger.info('Final plots written to %s', os.path.join(args.save, 'plots'))


def latent_trajectories(model, state, batch, key):
    """Encode + integrate (no decode) for latent-dynamics plots
    (reference plot_utils.py:83-99 protocol)."""
    variables = {'params': state.vae_params,
                 'batch_stats': state.batch_stats}
    z0, _, _ = model.apply(variables, batch, key, False,
                           method=model.encode)
    ztL, _ = model.apply(variables, state.gp, z0, batch.shape[1], key, 1,
                         method=model.sample_trajectories)
    return ztL


def main():
    args = parser.parse_args()

    # ---- run dir + logger (reference main.py:134-139)
    stamp = datetime.now().strftime('_%d_%m_%Y-%H:%M:%S')
    args.save = os.path.abspath(args.save + stamp)
    from vae_gp_ode_tpu.utils import io as io_utils
    io_utils.makedirs(args.save)
    io_utils.makedirs(os.path.join(args.save, 'plots'))
    logger = io_utils.get_logger(logpath=os.path.join(args.save, 'logs'))
    logger.info('Results stored in %s', args.save)
    io_utils.save_args(args, os.path.join(args.save, 'args.json'))

    import jax
    import jax.numpy as jnp
    if args.device == 'cpu':
        # this jax build pins jax_platforms='axon,cpu'; honour --device cpu
        jax.config.update('jax_platforms', 'cpu')
    from vae_gp_ode_tpu.core.settings import enable_compilation_cache
    enable_compilation_cache()   # reuse compiled steps across restarts
    logger.info('JAX devices: %s', jax.devices())

    from vae_gp_ode_tpu.data.mnist import load_data
    from vae_gp_ode_tpu.models.odegpvae import init_model
    from vae_gp_ode_tpu.core.transforms import invsoftplus
    from vae_gp_ode_tpu.training.trainer import (
        create_train_state, make_train_step, make_eval_step,
        make_epoch_eval_step, run_epoch_with_tail)
    from vae_gp_ode_tpu.training import checkpoint as ckpt
    from vae_gp_ode_tpu.training.meters import (
        CachedRunningAverageMeter, CachedAverageMeter, CachedHyperparams)
    from vae_gp_ode_tpu.kernels.rbf import rbf_variance, rbf_lengthscales
    from vae_gp_ode_tpu.utils import plotting

    # ---- seed (reference main.py:142)
    from vae_gp_ode_tpu.core.prng import seed_everything
    root_key = seed_everything(args.seed)

    # ---- data (reference main.py:149)
    trainset, testset = load_data(args)
    logger.info('Data source: %s | train %s | test %s', trainset.source,
                trainset.X.shape, testset.X.shape)
    plotting.plot_data(np.asarray(trainset.first()),
                       fname=os.path.join(args.save, 'plots/data.png'))

    # ---- model (reference main.py:152-154)
    k_init, k_run = jax.random.split(root_key)
    model, variables, gp = init_model(
        k_init, latent_dim=args.latent_dim, n_filt=args.n_filt,
        order=args.ode, frames=args.frames, dt=args.dt, solver=args.solver,
        dense=args.ts_dense_scale, num_features=args.num_features,
        num_inducing=args.num_inducing, kernel=args.kernel,
        q_diag=args.q_diag, dimwise=args.dimwise,
        D_in=args.D_in, D_out=args.D_out, batch=min(2, args.batch),
        T=args.T, use_adjoint=args.use_adjoint)

    # kernel hyperparameter re-initialisation (reference
    # initialization.py:5-22 + main.py:154: overwrite with CLI values)
    kern = gp.kernel
    gp = gp.replace(kernel=kern.replace(
        unconstrained_lengthscales=jnp.full_like(
            kern.unconstrained_lengthscales,
            invsoftplus(jnp.asarray(args.lengthscale, jnp.float32))),
        unconstrained_variance=jnp.full_like(
            kern.unconstrained_variance,
            invsoftplus(jnp.asarray(args.variance, jnp.float32)))))

    # ---- pretrained VAE (reference main.py:157-171); accepts either our
    # encoder.ckpt/decoder.ckpt or reference torch encoder.pt/decoder.pt
    if args.pretrained:
        if os.path.exists(os.path.join(args.vae_path, 'encoder.pt')):
            from vae_gp_ode_tpu.utils import torch_import as ti
            enc_sd = ti.load_torch_checkpoint(
                os.path.join(args.vae_path, 'encoder.pt'))
            dec_sd = ti.load_torch_checkpoint(
                os.path.join(args.vae_path, 'decoder.pt'))
            ep, es = ti.encoder_from_torch(enc_sd, args.n_filt)
            dp, ds = ti.decoder_from_torch(dec_sd, args.n_filt)
            enc = {'params': ep, 'batch_stats': es}
            dec = {'params': dp, 'batch_stats': ds}
        else:
            enc, dec = ckpt.load_vae_weights(
                os.path.join(args.vae_path, 'encoder.ckpt'),
                os.path.join(args.vae_path, 'decoder.ckpt'))
        variables = dict(variables)
        params = dict(variables['params'])
        params['encoder'] = enc['params']
        params['decoder'] = dec['params']
        variables['params'] = params
        bs = dict(variables.get('batch_stats', {}))
        bs['encoder'] = enc['batch_stats']
        bs['decoder'] = dec['batch_stats']
        variables['batch_stats'] = bs
        logger.info('***** Loaded pretrained VAE from %s *****',
                    args.vae_path)

    state, tx = create_train_state(model, variables, gp, lr=args.lr,
                                   freeze_vae=args.pretrained,
                                   fix_kernel=args.fix_kernel)
    if args.pretrained:
        # device-side equality check: ONE boolean fetch per epoch instead
        # of one fetch per parameter leaf (each costs a tunnel round-trip)
        frozen_vae_dev = state.vae_params

        @jax.jit
        def frozen_vae_unchanged(cur):
            eq = [jnp.array_equal(a, b) for a, b in
                  zip(jax.tree_util.tree_leaves(cur),
                      jax.tree_util.tree_leaves(frozen_vae_dev))]
            return jnp.all(jnp.stack(eq))

    from vae_gp_ode_tpu.utils.summary import summarize
    logger.info('\n%s\n%s', summarize(state.vae_params, 'vae params'),
                summarize(state.gp, 'gp params'))
    logger.info('********** Model Built %s ODE **********', args.ode)
    logger.info(
        'Model parameters: num features %d | num inducing %d | num epochs '
        '%d | lr %g | ode %d | D_in %d | D_out %d | dt %g | kernel %s | '
        'latent_dim %d | variance %g | lengthscale %g | rotrand %s',
        args.num_features, args.num_inducing, args.Nepoch, args.lr,
        args.ode, args.D_in, args.D_out, args.dt, args.kernel,
        args.latent_dim, args.variance, args.lengthscale, args.rotrand)

    # ---- resume (reference main.py:178-181)
    ckpt_path = os.path.join(args.save, 'odegpvae_mnist.ckpt')
    if args.continue_training and args.model_path != 'None':
        prev = os.path.join(args.model_path, 'odegpvae_mnist.ckpt')
        state = ckpt.restore_checkpoint(prev, like=state)
        logger.info('Resume training from %s (step %d, optimizer state '
                    'included)', prev, int(state.step))

    # ---- meters (reference main.py:185-191)
    elbo_meter = CachedRunningAverageMeter(10)
    nll_meter = CachedRunningAverageMeter(10)
    reg_kl_meter = CachedRunningAverageMeter(10)
    inducing_kl_meter = CachedRunningAverageMeter(10)
    mse_meter = CachedAverageMeter()
    time_meter = CachedAverageMeter()
    hyperparam_meter = CachedHyperparams()
    meters = (elbo_meter, nll_meter, reg_kl_meter, inducing_kl_meter,
              hyperparam_meter)

    use_fast = args.fast_epoch
    dp_active = args.data_parallel and len(jax.devices()) > 1
    dp_impl_resolved = None
    if dp_active:
        from vae_gp_ode_tpu.ops import config as ops_config
        from vae_gp_ode_tpu.parallel import (
            make_mesh, make_parallel_train_step, make_parallel_train_epoch,
            make_shardmap_train_step, make_shardmap_train_epoch,
            replicate, shard_batch, shard_epoch)
        mesh = make_mesh()
        ndev = mesh.devices.size
        impl = args.dp_impl
        if impl == 'auto':
            impl = ('shardmap' if ops_config.use_pallas()
                    and args.batch % ndev == 0 else 'gspmd')
        elif impl == 'shardmap' and args.batch % ndev:
            logger.warning('dp_impl=shardmap needs batch %% n_devices == '
                           '0 (got %d %% %d); falling back to gspmd',
                           args.batch, ndev)
            impl = 'gspmd'
        dp_impl_resolved = impl
        if impl == 'shardmap':
            # per-shard step: keeps the fused Pallas kernels on every chip
            make_step, make_epoch = (make_shardmap_train_step,
                                     make_shardmap_train_epoch)
        else:
            make_step, make_epoch = (make_parallel_train_step,
                                     make_parallel_train_epoch)
        train_step_p = make_step(
            model, tx, num_observations=args.Ndata, mesh=mesh,
            eps_guard=args.eps_guard, freeze_vae=args.pretrained)
        state = replicate(state, mesh)
        logger.info('Data-parallel (%s) over %d devices (mesh %s)',
                    impl, ndev, mesh.axis_names)

        def train_step(state, batch, key, L):
            return train_step_p(state, shard_batch(batch, mesh), key, L)

        if use_fast:
            # whole-epoch scan composed with mesh shardings: multi-chip
            # training keeps the one-dispatch-per-epoch property
            train_epoch_p = make_epoch(
                model, tx, num_observations=args.Ndata, mesh=mesh,
                eps_guard=args.eps_guard, freeze_vae=args.pretrained)

            def train_epoch(state, batches, key, L):
                return train_epoch_p(state, shard_epoch(batches, mesh),
                                     key, L)
    else:
        train_step = make_train_step(model, tx,
                                     num_observations=args.Ndata,
                                     eps_guard=args.eps_guard,
                                     freeze_vae=args.pretrained)
        if use_fast:
            from vae_gp_ode_tpu.training.trainer import make_train_epoch
            train_epoch = make_train_epoch(model, tx,
                                           num_observations=args.Ndata,
                                           eps_guard=args.eps_guard,
                                           freeze_vae=args.pretrained)
    eval_step = make_eval_step(model)
    if args.pretrained:
        # frozen VAE: the reference keeps encoder/decoder in eval() mode
        # (main.py:163-164), so the monitoring eval uses running stats too
        def epoch_eval(st, batch, k, L):
            Xrec_, mse_ = eval_step(st, batch, k, L)
            return Xrec_, mse_, st.batch_stats
    else:
        # reference main.py:236-246: per-epoch eval never leaves train
        # mode - batch-stat BN, running stats updated (folded into state)
        epoch_eval = make_epoch_eval_step(model)
    roll_step = make_eval_step(model, T_custom=args.Troll * args.T)

    logger.info('********** Started Training **********')
    begin = time.time()
    global_itr = 0
    key = k_run
    profiling = False

    def nan_bailout(ep):
        """Reference main.py:116-129, 205-207."""
        logger.info('*** NaN loss at epoch %d/%d: reloading last '
                    'checkpoint and writing plots ***', ep, args.Nepoch)
        st = state
        if os.path.exists(ckpt_path):
            st = ckpt.restore_checkpoint(ckpt_path, like=state)
        logger.info('Kernel lengthscales %s',
                    np.asarray(rbf_lengthscales(st.gp.kernel)))
        logger.info('Kernel variance %s',
                    np.asarray(rbf_variance(st.gp.kernel)))
        final_plots(logger, args, model, st, trainset, testset,
                    meters, roll_step, key)
        sys.exit()

    def record_iter(itr, loss, nll, kl_reg, kl_u, variance):
        nonlocal global_itr
        elbo_meter.update(loss, global_itr)
        nll_meter.update(nll, global_itr)
        reg_kl_meter.update(kl_reg, global_itr)
        inducing_kl_meter.update(kl_u, global_itr)
        time_meter.update(time.time() - begin, global_itr)
        hyperparam_meter.update(variance, global_itr)
        global_itr += 1
        if itr % args.log_freq == 0:
            logger.info(
                'Iter:%-3d | Time %s | elbo %8.2f(%8.2f) | '
                'nlhood:%8.2f(%8.2f) | kl_reg:%-8.2f(%-8.2f) | '
                'kl_u:%8.5f(%8.5f)',
                itr, timedelta(seconds=int(time_meter.val)),
                elbo_meter.val, elbo_meter.avg, nll_meter.val,
                nll_meter.avg, reg_kl_meter.val, reg_kl_meter.avg,
                inducing_kl_meter.val, inducing_kl_meter.avg)

    pending = []        # device-side epoch rows queued between fetches
    pending_epochs = 0  # epochs covered by the queued rows

    def host_epoch(ep_r, losses, nlls, kl_regs, kl_us, var_iters, mse):
        """Host-side bookkeeping for ONE fetched epoch: NaN policy,
        meters, the epoch log line."""
        finite = np.isfinite(losses)
        if not finite.all():
            if args.nan_policy == 'bailout':
                nan_bailout(ep_r)
            logger.warning(
                'epoch %d: %d/%d steps produced a non-finite loss; '
                'their updates were discarded (--nan_policy skip)',
                ep_r, int((~finite).sum()), len(losses))
        for itr in range(len(losses)):
            if not finite[itr]:
                continue           # skipped step: keep meters finite
            record_iter(itr, float(losses[itr]), float(nlls[itr]),
                        float(kl_regs[itr]), float(kl_us[itr]),
                        var_iters[itr])
        mse_meter.reset()
        mse_meter.update(float(mse), 0)
        logger.info('Epoch:%4d/%4d| tr_elbo:%8.2f(%8.2f) | '
                    'test_mse:%5.3f(%5.3f)\n', ep_r, args.Nepoch,
                    elbo_meter.val, elbo_meter.avg, mse_meter.val,
                    mse_meter.avg)

    def flush_pending():
        """Fetch every queued row's metrics in ONE transfer, then run the
        host-side bookkeeping in epoch order. A row covers one epoch
        ('ep', 1D metric arrays) or a whole --epochs_per_dispatch segment
        ('eps', 2D arrays with the epoch axis leading). With the default
        cadence this runs every epoch - reference-faithful; larger
        --epochs_per_fetch/--epochs_per_dispatch amortise the tunnel
        round-trip over a chain of un-fetched dispatches (the data
        dependence through the train state serialises them on device)."""
        nonlocal pending, pending_epochs
        if not pending:
            return
        rows = jax.device_get(pending)
        pending = []
        pending_epochs = 0
        for row in rows:
            vals = [np.asarray(row[k]) for k in
                    ('loss', 'nll', 'kl_reg', 'kl_u', 'kernel_var', 'mse')]
            if 'eps' in row:
                for i, ep_r in enumerate(row['eps']):
                    host_epoch(ep_r, *[v[i] for v in vals])
            else:
                host_epoch(row['ep'], *vals)
            if 'frozen_ok' in row:
                # reference main.py:230-234 (for a segment row the check
                # is on the final state; equality there covers every
                # epoch in the segment)
                assert bool(row['frozen_ok']), 'frozen VAE weights changed!'

    # multi-epoch segments: train + tail + monitoring eval for E epochs
    # in ONE device dispatch (single-device, or shard_map data-parallel
    # with per-shard Pallas kernels; profiling wants per-epoch trace
    # boundaries; the GSPMD DP path stays per-epoch)
    E_disp = max(args.epochs_per_dispatch, 1)
    multi_ok = (use_fast and E_disp > 1 and not args.profile
                and (not dp_active or dp_impl_resolved == 'shardmap'))
    if args.plot_freq == 1 and (E_disp > 1
                                or args.epochs_per_fetch > 1):
        # every epoch is an artifact epoch at plot_freq=1: artifacts
        # force a per-epoch flush, so the requested chaining never fires
        logger.warning(
            '--epochs_per_dispatch/--epochs_per_fetch > 1 have no effect '
            'at --plot_freq 1 (every epoch plots + checkpoints, forcing '
            'a per-epoch flush); raise --plot_freq to engage them')
    if multi_ok and dp_active:
        from vae_gp_ode_tpu.parallel import make_shardmap_train_segment
        train_segment = make_shardmap_train_segment(
            model, tx, num_observations=args.Ndata, mesh=mesh,
            eps_guard=args.eps_guard, freeze_vae=args.pretrained)
    elif multi_ok:
        from vae_gp_ode_tpu.training.trainer import make_train_segment
        train_segment = make_train_segment(
            model, tx, num_observations=args.Ndata,
            eps_guard=args.eps_guard, freeze_vae=args.pretrained)

    ep = 0
    while ep < args.Nepoch:
        if args.profile and ep == min(1, args.Nepoch - 1) and not profiling:
            jax.profiler.start_trace(os.path.join(args.save, 'profile'))
            profiling = True
        L = 1 if ep < args.Nepoch // 2 else 5   # reference main.py:200

        if multi_ok and not (ep % args.plot_freq == 0
                             or ep == args.Nepoch - 1):
            # distance to the next epoch that must run singly: an
            # artifact epoch (ep % plot_freq == 0 and the final epoch,
            # which plot + checkpoint) or the L schedule switch
            nxt = args.Nepoch - 1
            half = args.Nepoch // 2
            if ep < half:
                nxt = min(nxt, half)
            nxt = min(nxt, ((ep // args.plot_freq) + 1) * args.plot_freq)
            if nxt - ep >= E_disp:
                heads, tails = trainset.epoch_index_batches(E_disp)
                test_idx = testset.first_index(E_disp)
                if tails is not None and dp_active \
                        and tails.shape[1] % len(jax.devices()):
                    # same regime as the per-epoch DP path: a ragged
                    # tail cannot shard over the mesh
                    if not getattr(main, '_dp_tail_warned', False):
                        logger.warning(
                            'data-parallel segment: dropping ragged '
                            'tail batch of %d sequences (not divisible '
                            'by %d devices)', tails.shape[1],
                            len(jax.devices()))
                        main._dp_tail_warned = True
                    tails = None
                state, metrics, mses, key = train_segment(
                    state, trainset.X, heads, tails, testset.X,
                    test_idx, key, L)
                row = {'eps': list(range(ep, ep + E_disp)),
                       'loss': metrics['loss'], 'nll': metrics['nll'],
                       'kl_reg': metrics['kl_reg'],
                       'kl_u': metrics['kl_u'],
                       'kernel_var': metrics['kernel_var'], 'mse': mses}
                if args.pretrained:
                    row['frozen_ok'] = frozen_vae_unchanged(
                        state.vae_params)
                pending.append(row)
                pending_epochs += E_disp
                if pending_epochs >= max(args.epochs_per_fetch, 1):
                    flush_pending()
                ep += E_disp
                continue

        if use_fast:
            # whole-epoch scan: one device dispatch, metrics as arrays
            # queued device-side and fetched at the flush boundary (all
            # rows in ONE transfer - each host round-trip over the
            # remote-TPU link costs ~ms-30ms)
            key, k_ep = jax.random.split(key)
            batches, tail = trainset.epoch_batches_with_tail()
            if tail is not None and args.data_parallel \
                    and tail.shape[0] % max(len(jax.devices()), 1):
                # a ragged tail cannot shard over the mesh; DP users
                # should pick a divisor batch size
                if not getattr(main, '_dp_tail_warned', False):
                    logger.warning(
                        'data-parallel epoch: dropping ragged tail batch '
                        'of %d sequences (not divisible by %d devices)',
                        tail.shape[0], len(jax.devices()))
                    main._dp_tail_warned = True
                tail = None
            state, metrics = run_epoch_with_tail(
                train_epoch, train_step, state, batches, tail, k_ep, L)
            row = {'ep': ep, 'loss': metrics['loss'],
                   'nll': metrics['nll'], 'kl_reg': metrics['kl_reg'],
                   'kl_u': metrics['kl_u'],
                   'kernel_var': metrics['kernel_var']}
            if args.pretrained:
                # device-side equality: one boolean per epoch, fetched
                # with the rest of the row at the flush boundary
                row['frozen_ok'] = frozen_vae_unchanged(state.vae_params)

            if profiling:
                # the dispatch returns before the device finishes (async,
                # and block_until_ready lies over the axon tunnel): force
                # a value fetch so the trace captures the whole epoch
                float(metrics['loss'][-1])
                jax.profiler.stop_trace()
                profiling = False
                logger.info('Profiler trace written to %s',
                            os.path.join(args.save, 'profile'))

            # per-epoch monitoring eval: first test batch only (reference
            # main.py:236-246); its scalar joins the queued row
            key, k_ev = jax.random.split(key)
            test_batch = testset.first()
            Xrec, test_mse, new_bs = epoch_eval(state, test_batch, k_ev, 1)
            state = state.replace(batch_stats=new_bs)
            row['mse'] = test_mse
            pending.append(row)
            pending_epochs += 1

            need_artifacts = (ep % args.plot_freq == 0
                              or ep == args.Nepoch - 1)
            if need_artifacts \
                    or pending_epochs >= max(args.epochs_per_fetch, 1):
                # flush BEFORE writing artifacts so a NaN bailout reloads
                # the previous checkpoint, not this epoch's
                flush_pending()
            if need_artifacts:
                plotting.plot_rot_mnist(
                    np.asarray(test_batch), np.asarray(Xrec[0]), False,
                    fname=os.path.join(args.save, 'plots/rot_mnist.png'))
                ckpt.save_checkpoint(state, ckpt_path)
            ep += 1
            continue
        else:
            for itr, minibatch in enumerate(trainset):
                if args.data_parallel and \
                        minibatch.shape[0] % max(len(jax.devices()), 1):
                    # the shard_map/GSPMD steps need the batch divisible
                    # by the mesh; the ragged tail (drop_last=False)
                    # cannot shard - skip it like the fast-epoch DP path
                    if not getattr(main, '_dp_tail_warned', False):
                        logger.warning(
                            'data-parallel: skipping ragged tail batch '
                            'of %d sequences (not divisible by %d '
                            'devices); use a divisor batch size',
                            minibatch.shape[0], len(jax.devices()))
                        main._dp_tail_warned = True
                    continue
                key, k_step = jax.random.split(key)
                new_state, metrics = train_step(state, minibatch, k_step,
                                                L)
                loss = float(metrics['loss'])
                if not np.isfinite(loss):
                    if args.nan_policy == 'bailout':
                        nan_bailout(ep)
                    logger.warning(
                        'epoch %d iter %d: non-finite loss; update '
                        'discarded (--nan_policy skip)', ep, itr)
                    continue       # keep the pre-step state
                state = new_state
                record_iter(itr, loss, float(metrics['nll']),
                            float(metrics['kl_reg']),
                            float(metrics['kl_u']),
                            np.asarray(rbf_variance(state.gp.kernel)))

        # frozen-VAE sanity assertion (reference main.py:230-234);
        # evaluated on device, one boolean fetch
        if args.pretrained:
            assert bool(frozen_vae_unchanged(state.vae_params)), \
                'frozen VAE weights changed!'

        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            logger.info('Profiler trace written to %s',
                        os.path.join(args.save, 'profile'))

        # per-epoch eval: first test batch only (reference main.py:236-246)
        mse_meter.reset()
        for itr_test, test_batch in enumerate(testset):
            key, k_ev = jax.random.split(key)
            Xrec, test_mse, new_bs = epoch_eval(state, test_batch,
                                                k_ev, 1)
            state = state.replace(batch_stats=new_bs)
            if ep % args.plot_freq == 0 or ep == args.Nepoch - 1:
                plotting.plot_rot_mnist(
                    np.asarray(test_batch), np.asarray(Xrec[0]), False,
                    fname=os.path.join(args.save, 'plots/rot_mnist.png'))
                ckpt.save_checkpoint(state, ckpt_path)
            mse_meter.update(float(test_mse), itr_test)
            break
        logger.info('Epoch:%4d/%4d| tr_elbo:%8.2f(%8.2f) | '
                    'test_mse:%5.3f(%5.3f)\n', ep, args.Nepoch,
                    elbo_meter.val, elbo_meter.avg, mse_meter.val,
                    mse_meter.avg)
        ep += 1

    logger.info('********** Optimization completed **********')
    logger.info('Kernel lengthscales %s',
                np.asarray(rbf_lengthscales(state.gp.kernel)))
    logger.info('Kernel variance %s',
                np.asarray(rbf_variance(state.gp.kernel)))
    final_plots(logger, args, model, state, trainset, testset, meters,
                roll_step, key)


if __name__ == '__main__':
    main()
