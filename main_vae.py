"""VAE pretraining entry point.

Flag-compatible rebuild of the reference pretrainer (reference:
experiments/main_vae.py:18-200): create-or-load a rotating-digit frame
dataset, train encoder+decoder on the plain ELBO (KL - Bernoulli
log-likelihood on [0,1] pixels, pretrain mode: no L repeat), save
encoder/decoder separately for main.py --pretrained, then emit
reconstruction / PCA / t-SNE diagnostics.
"""

import argparse
import os
import time
from datetime import datetime, timedelta

import numpy as np

parser = argparse.ArgumentParser('Learning Latent Encoding with VAE (TPU)')

# data arguments (reference main_vae.py:21-30)
parser.add_argument('--digit', type=int, default=3)
parser.add_argument('--n_angle', type=int, default=16)
parser.add_argument('--n_train', type=int, default=180)
parser.add_argument('--n_test', type=int, default=121)
parser.add_argument('--batch', type=int, default=64)

# vae arguments (reference main_vae.py:33-34)
parser.add_argument('--latent_dim', type=int, default=6)
parser.add_argument('--n_filt', type=int, default=8)

# training arguments (reference main_vae.py:37-44)
parser.add_argument('--device', type=str, default='tpu')
parser.add_argument('--lr', type=float, default=0.001)
parser.add_argument('--seed', type=int, default=121)
parser.add_argument('--vae_epochs', type=int, default=300)

# misc arguments (reference main_vae.py:47-52)
parser.add_argument('--output_path', type=str, default='results/vae')
parser.add_argument('--save', type=str, default='data/moving_mnist')
parser.add_argument('--log_freq', type=int, default=20)
parser.add_argument('--eps_guard', type=eval, default=True,
                    help="EPSILON-guarded Bernoulli log-prob (the "
                         "reference's dead except-branch; guards against "
                         "log(0) on saturated sigmoids). False = the "
                         "reference's live unguarded objective (vae.py:147)")
parser.add_argument('--fast_epoch', type=eval, default=True,
                    help='scan whole epochs on device (one dispatch per '
                         'epoch instead of per step; a ragged tail batch '
                         'when N %% batch != 0 trains in one extra '
                         'dispatch - every frame seen, drop_last=False '
                         'parity). False = the per-step reference loop')


def main():
    args = parser.parse_args()

    stamp = datetime.now().strftime('_%d_%m_%Y-%H:%M:%S')
    args.output_path = os.path.abspath(args.output_path + stamp)
    from vae_gp_ode_tpu.utils import io as io_utils
    io_utils.makedirs(args.output_path)
    io_utils.makedirs(os.path.join(args.output_path, 'plots'))
    logger = io_utils.get_logger(
        logpath=os.path.join(args.output_path, 'logs'))
    logger.info('Results stored in %s', args.output_path)
    io_utils.save_args(args, os.path.join(args.output_path, 'args.json'))

    import jax
    import jax.numpy as jnp
    import optax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from vae_gp_ode_tpu.core.settings import enable_compilation_cache
    enable_compilation_cache()

    from vae_gp_ode_tpu.data import mnist as dm
    from vae_gp_ode_tpu.models.vae import (
        Encoder, Decoder, bernoulli_log_prob, gaussian_kl_standard,
        reparam_sample)
    from vae_gp_ode_tpu.training.meters import (
        CachedRunningAverageMeter, CachedAverageMeter)
    from vae_gp_ode_tpu.training import checkpoint as ckpt
    from vae_gp_ode_tpu.utils import plotting

    from vae_gp_ode_tpu.core.prng import seed_everything
    key = seed_everything(args.seed)

    # ---- dataset create-or-load (reference main_vae.py:155-165)
    io_utils.makedirs(args.save)
    train_path = os.path.join(
        args.save, f'rotating_mnist_train_{args.digit}_'
                   f'{args.n_angle}_angles.npy')
    test_path = os.path.join(
        args.save, f'rotating_mnist_test_{args.digit}_'
                   f'{args.n_angle}_angles.npy')
    if os.path.exists(train_path) and os.path.exists(test_path):
        pass
    else:
        train_arr, test_arr = dm.create_rotating_dataset(
            args.save, digit=args.digit, train_n=args.n_train,
            test_n=args.n_test, n_angles=args.n_angle, seed=args.seed)
        np.save(train_path, train_arr)
        np.save(test_path, test_arr)
    train_loader = dm.load_rotating_mnist_data(train_path, args.n_angle,
                                               args.batch, seed=args.seed)
    logger.info('Model parameters: num epochs %d | lr %g | latent_dim %d '
                '| n_angles %d', args.vae_epochs, args.lr, args.latent_dim,
                args.n_angle)

    # ---- model
    enc = Encoder(latent_dim=args.latent_dim, n_filt=args.n_filt)
    dec = Decoder(latent_dim=args.latent_dim, n_filt=args.n_filt)
    k_e, k_d, key = jax.random.split(key, 3)
    x0 = jnp.zeros((2, 28, 28, 1))
    enc_vars = enc.init(k_e, x0, train=True)
    dec_vars = dec.init(k_d, jnp.zeros((2, args.latent_dim)), train=True)

    tx = optax.adam(args.lr)
    params = (enc_vars['params'], dec_vars['params'])
    bstats = (enc_vars.get('batch_stats', {}),
              dec_vars.get('batch_stats', {}))
    opt_state = tx.init(params)

    def step_core(params, bstats, opt_state, x_nchw, k):
        """One VAE ELBO step (reference main_vae.py:91-105):
        loss = KL(q(z)||N(0,I)) - Bernoulli lhood (pretrain: no L axis)."""
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))   # NHWC

        def loss_fn(ps):
            ep, dp = ps
            (mu, logv), enc_ups = enc.apply(
                {'params': ep, 'batch_stats': bstats[0]}, x, train=True,
                mutable=['batch_stats'])
            z = reparam_sample(k, mu, logv)
            y, dec_ups = dec.apply(
                {'params': dp, 'batch_stats': bstats[1]}, z, train=True,
                mutable=['batch_stats'])
            kl_reg = jnp.mean(gaussian_kl_standard(mu, logv))
            lp = bernoulli_log_prob(x, y, eps_guard=args.eps_guard)
            lhood = jnp.mean(jnp.sum(lp, axis=(1, 2, 3)))
            loss = kl_reg - lhood
            return loss, (lhood, kl_reg, enc_ups['batch_stats'],
                          dec_ups['batch_stats'])

        (loss, (lh, klr, ebs, dbs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, (ebs, dbs), opt_state2, loss, lh, klr

    train_step = jax.jit(step_core)

    @jax.jit
    def train_epoch(params, bstats, opt_state, Xep, k):
        """One whole epoch as a single on-device lax.scan over the
        stacked batches (I, B, 1, 28, 28) - one dispatch per epoch
        instead of per step (the remote-TPU round trip otherwise
        dominates at these sizes; same rationale as
        training/trainer.make_train_epoch)."""
        def body(carry, x):
            params, bstats, opt_state, k = carry
            k, ks = jax.random.split(k)
            params, bstats, opt_state, loss, lh, klr = step_core(
                params, bstats, opt_state, x, ks)
            return (params, bstats, opt_state, k), (loss, lh, klr)

        (params, bstats, opt_state, _), trace = jax.lax.scan(
            body, (params, bstats, opt_state, k), Xep)
        return params, bstats, opt_state, trace

    elbo_meter = CachedRunningAverageMeter(10)
    nll_meter = CachedRunningAverageMeter(10)
    reg_kl_meter = CachedRunningAverageMeter(10)
    time_meter = CachedAverageMeter()

    logger.info('--------------- VAE Train ---------------')
    begin = time.time()
    global_itr = 0

    def record(itr, loss, lh, klr):
        nonlocal global_itr
        elbo_meter.update(float(loss), global_itr)
        nll_meter.update(-float(lh), global_itr)
        reg_kl_meter.update(float(klr), global_itr)
        time_meter.update(time.time() - begin, global_itr)
        global_itr += 1
        if itr % args.log_freq == 0:
            logger.info(
                'Iter:%-3d | Time %s | elbo %8.2f(%8.2f) | '
                'nlhood:%8.2f(%8.2f) | kl_reg:%-8.2f(%-8.2f)',
                itr, timedelta(seconds=int(time_meter.val)),
                elbo_meter.val, elbo_meter.avg, nll_meter.val,
                nll_meter.avg, reg_kl_meter.val, reg_kl_meter.avg)

    for ep in range(args.vae_epochs):
        if args.fast_epoch:
            # tail batch (N % batch != 0) trained with one extra per-step
            # dispatch so the scanned regime matches the reference
            # DataLoader's drop_last=False (every frame seen each epoch)
            Xep, tail = train_loader.epoch_batches_with_tail()
            key, k_s = jax.random.split(key)
            params, bstats, opt_state, (losses, lhs, klrs) = train_epoch(
                params, bstats, opt_state, Xep, k_s)
            if tail is not None:
                key, k_t = jax.random.split(key)
                params, bstats, opt_state, tlo, tlh, tkr = train_step(
                    params, bstats, opt_state, tail, k_t)
                losses = jnp.concatenate([losses, tlo[None]])
                lhs = jnp.concatenate([lhs, tlh[None]])
                klrs = jnp.concatenate([klrs, tkr[None]])
            for itr, (lo, lh, kr) in enumerate(zip(
                    np.asarray(losses), np.asarray(lhs),
                    np.asarray(klrs))):
                record(itr, lo, lh, kr)
        else:
            for itr, (x, _) in enumerate(train_loader):
                key, k_s = jax.random.split(key)
                params, bstats, opt_state, loss, lh, klr = train_step(
                    params, bstats, opt_state, x, k_s)
                record(itr, loss, lh, klr)
        logger.info('Epoch:%4d/%4d| tr_elbo:%8.2f(%8.2f)\n', ep,
                    args.vae_epochs, elbo_meter.val, elbo_meter.avg)

    # ---- save encoder/decoder (reference vae.py:32-35, main_vae.py:127)
    model_dir = io_utils.makedirs(
        os.path.join(args.output_path, 'MNIST-VAE'))
    ckpt.save_vae_weights(
        {'encoder': params[0], 'decoder': params[1]},
        {'encoder': bstats[0], 'decoder': bstats[1]},
        os.path.join(model_dir, 'encoder.ckpt'),
        os.path.join(model_dir, 'decoder.ckpt'))
    logger.info('Saved encoder/decoder to %s', model_dir)

    # ---- diagnostics (reference main_vae.py:186-200)
    test_loader = dm.load_rotating_mnist_data(test_path, args.n_angle,
                                              args.batch, seed=args.seed)
    x, labels = test_loader.first()
    xh = jnp.transpose(x, (0, 2, 3, 1))
    mu, logv = enc.apply({'params': params[0], 'batch_stats': bstats[0]},
                         xh, train=False)
    key, k_s = jax.random.split(key)
    z = reparam_sample(k_s, mu, logv)
    y = dec.apply({'params': params[1], 'batch_stats': bstats[1]}, z,
                  train=False)
    mse = plotting.visualize_output(
        np.asarray(x)[:16, 0], np.transpose(np.asarray(y), (0, 3, 1, 2))
        [:16, 0], args.output_path)
    logger.info('VAE test reconstruction MSE: %.4f', mse)

    # embeddings over up to 1000 test frames
    mus, labs = [], []
    count = 0
    for xb, lb in test_loader:
        m, _ = enc.apply({'params': params[0], 'batch_stats': bstats[0]},
                         jnp.transpose(xb, (0, 2, 3, 1)), train=False)
        mus.append(np.asarray(m))
        labs.append(np.asarray(lb))
        count += xb.shape[0]
        if count >= 1000:
            break
    mus = np.concatenate(mus)
    labs = np.concatenate(labs)
    plotting.visualize_embeddings(mus, labs, args.n_angle, args.output_path)
    plotting.plot_vae_embeddings(mus, labs, args.n_angle, args.output_path)
    plotting.plot_trace_vae(elbo_meter, nll_meter, reg_kl_meter,
                            args.output_path)
    logger.info('Done.')


if __name__ == '__main__':
    main()
