"""Import reference PyTorch checkpoints into this framework.

A user of the reference trains `encoder.pt` / `decoder.pt`
(reference vae.py:32-35) and full-model `odegpvae_mnist.pth` state_dicts
(reference main.py:244). These converters map those tensors onto our flax
parameter trees so trained reference models can be evaluated/fine-tuned
here directly.

Layout conversions (torch -> flax):
  Conv2d weight (O, I, kH, kW)           -> (kH, kW, I, O)
  ConvTranspose2d weight (I, O, kH, kW)  -> spatially flipped (kH, kW, I, O)
  Linear weight (out, in)                -> (in, out), with the channel-major
      <-> channel-minor flatten permutation at the conv/dense boundary
  BatchNorm weight/bias/running_*        -> scale/bias + batch_stats
  GP Params (reference param.py optvar + LowerTriangular packing)
      -> SVGPParams leaves (the tril packing order is identical:
      np.tril_indices row-major)

Tensors are accepted as numpy arrays or anything with .numpy()/.detach().
No torch import is required at module level.
"""

import numpy as np
import jax.numpy as jnp


def _np(t):
    if hasattr(t, 'detach'):
        t = t.detach()
    if hasattr(t, 'numpy'):
        t = t.numpy()
    return np.asarray(t)


def _conv_kernel(w):
    return jnp.asarray(np.transpose(_np(w), (2, 3, 1, 0)))


def _convT_kernel(w):
    wn = np.transpose(_np(w), (2, 3, 0, 1))   # (kH, kW, I, O)
    return jnp.asarray(wn[::-1, ::-1].copy())


def _bn(sd, prefix):
    params = {'scale': jnp.asarray(_np(sd[f'{prefix}.weight'])),
              'bias': jnp.asarray(_np(sd[f'{prefix}.bias']))}
    stats = {'mean': jnp.asarray(_np(sd[f'{prefix}.running_mean'])),
             'var': jnp.asarray(_np(sd[f'{prefix}.running_var']))}
    return params, stats


def encoder_from_torch(sd, n_filt=8):
    """Convert a reference Encoder state_dict (keys cnn.0..cnn.6, fc) to
    (params, batch_stats) for models.vae.Encoder."""
    params, stats = {}, {}
    for i, (ci, bi) in enumerate([(0, 1), (3, 4)]):
        params[f'Conv_{i}'] = {
            'kernel': _conv_kernel(sd[f'cnn.{ci}.weight']),
            'bias': jnp.asarray(_np(sd[f'cnn.{ci}.bias']))}
        bnp, bns = _bn(sd, f'cnn.{bi}')
        params[f'BatchNorm_{i}'] = bnp
        stats[f'BatchNorm_{i}'] = bns
    params['Conv_2'] = {'kernel': _conv_kernel(sd['cnn.6.weight']),
                        'bias': jnp.asarray(_np(sd['cnn.6.bias']))}
    # dense: torch flattens (C=4nf, 4, 4) channel-major; flax flattens
    # (4, 4, C) channel-minor
    C = n_filt * 4
    W = _np(sd['fc.weight'])                    # (2q, 512)
    Wp = W.reshape(-1, C, 4, 4).transpose(0, 2, 3, 1).reshape(W.shape[0], -1)
    params['Dense_0'] = {'kernel': jnp.asarray(Wp.T),
                         'bias': jnp.asarray(_np(sd['fc.bias']))}
    return params, stats


def decoder_from_torch(sd, n_filt=8):
    """Convert a reference Decoder state_dict (keys fc, decnn.1/2/4/5/7/8/
    10) to (params, batch_stats) for models.vae.Decoder."""
    params, stats = {}, {}
    C = n_filt * 4
    W = _np(sd['fc.weight'])                    # (512, q), rows (C,4,4)
    b = _np(sd['fc.bias'])
    Wp = W.reshape(C, 4, 4, -1).transpose(1, 2, 0, 3).reshape(-1, W.shape[1])
    bp = b.reshape(C, 4, 4).transpose(1, 2, 0).reshape(-1)
    # Wp is (512 in flax order, q); flax Dense kernel is (q, 512)
    params['Dense_0'] = {'kernel': jnp.asarray(Wp.T),
                         'bias': jnp.asarray(bp)}
    conv_idx = [1, 4, 7, 10]
    bn_idx = [2, 5, 8]
    for i, ci in enumerate(conv_idx):
        params[f'ConvTranspose_{i}'] = {
            'kernel': _convT_kernel(sd[f'decnn.{ci}.weight']),
            'bias': jnp.asarray(_np(sd[f'decnn.{ci}.bias']))}
    for i, bi in enumerate(bn_idx):
        bnp, bns = _bn(sd, f'decnn.{bi}')
        params[f'BatchNorm_{i}'] = bnp
        stats[f'BatchNorm_{i}'] = bns
    return params, stats


def svgp_from_torch(sd, gp_template, prefix='flow.odefunc.diffeq'):
    """Convert the GP part of a reference odegpvae state_dict onto an
    SVGPParams template (shapes/flags taken from the template).

    Reference parameter names (svpy.py:76-86, param.py:20):
      <prefix>.kern.unconstrained_lengthscales / unconstrained_variance
      <prefix>.inducing_loc.optvar, .Um.optvar, .Us_sqrt.optvar
    """
    kern = gp_template.kernel.replace(
        unconstrained_lengthscales=jnp.asarray(
            _np(sd[f'{prefix}.kern.unconstrained_lengthscales'])),
        unconstrained_variance=jnp.asarray(
            _np(sd[f'{prefix}.kern.unconstrained_variance'])))
    return gp_template.replace(
        kernel=kern,
        inducing_loc=jnp.asarray(_np(sd[f'{prefix}.inducing_loc.optvar'])),
        Um=jnp.asarray(_np(sd[f'{prefix}.Um.optvar'])),
        Us_sqrt=jnp.asarray(_np(sd[f'{prefix}.Us_sqrt.optvar'])))


def odegpvae_from_torch(sd, variables, gp_template, n_filt=8, order=1):
    """Convert a full reference odegpvae_mnist.pth state_dict into
    (variables, gp). Unrecognised extra keys are ignored."""
    enc_sd = {k[len('vae.encoder.'):]: v for k, v in sd.items()
              if k.startswith('vae.encoder.')}
    dec_sd = {k[len('vae.decoder.'):]: v for k, v in sd.items()
              if k.startswith('vae.decoder.')}
    enc_p, enc_s = encoder_from_torch(enc_sd, n_filt)
    dec_p, dec_s = decoder_from_torch(dec_sd, n_filt)

    params = dict(variables['params'])
    stats = dict(variables.get('batch_stats', {}))
    params['encoder'] = enc_p
    params['decoder'] = dec_p
    stats['encoder'] = enc_s
    stats['decoder'] = dec_s
    if order == 2:
        env_sd = {k[len('vae.encoder_v.'):]: v for k, v in sd.items()
                  if k.startswith('vae.encoder_v.')}
        if env_sd:
            env_p, env_s = encoder_from_torch(env_sd, n_filt)
            params['encoder_v'] = env_p
            stats['encoder_v'] = env_s

    gp = svgp_from_torch(sd, gp_template)
    new_vars = {'params': params, 'batch_stats': stats}
    return new_vars, gp


def load_torch_checkpoint(path):
    """Load a .pt/.pth state_dict (requires torch)."""
    import torch
    return torch.load(path, map_location='cpu')
