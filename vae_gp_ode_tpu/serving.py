"""AOT export / serving path: package a trained model as a standalone,
self-contained artifact.

The reference has no serving story at all - its checkpoints are raw
``torch.save(state_dict())`` blobs that need the full source tree, the
exact module topology, and a Python process to run (reference
experiments/main.py:244). This module is the TPU-native production
counterpart: a trained forecaster is exported once with ``jax.export``
into a serialized StableHLO artifact that

  * bakes the trained weights in as constants (no checkpoint, no model
    code, no flax needed at serving time - only jax),
  * runs in eval mode (BatchNorm running statistics; the published-number
    protocol of evaluate.py / reference plots_dynamics.ipynb cell 8),
  * takes ``(X, seed)`` - the PRNG for the z0 reparameterisation and the
    L pathwise GP draws is derived in-graph from an int32 seed scalar, so
    the serving API is framework-agnostic,
  * optionally has a *symbolic batch dimension* (shape polymorphism), so
    one artifact serves any request batch size,
  * can be lowered for several platforms at once (e.g. export on a CPU
    build box, serve on TPU) via ``platforms=('cpu', 'tpu')``.

The export traces a fully PORTABLE compute path: ``ops.config.forced_jnp``
(Pallas kernels are runtime-specialised TPU programs and do not belong in
a portable serialized artifact) plus ``core.linalg.portable_lowering``
(LAPACK custom calls segfault when executed from a deserialized export on
this jaxlib's CPU backend - Cholesky/triangular solves trace as pure-HLO
substitutions instead). At the serving batch sizes that matter the
whole-trajectory scan is XLA-fused anyway (RESULTS.md round-2 A/B: the
train step is latency-floor-bound, and serving runs forward-only).

CLI:  python -m vae_gp_ode_tpu.serving --model_path results/<run> \
          --out forecaster.jaxexport [--L 5] [--Troll 2] [--batch 0]
"""

import json
import os
import types

import jax
import jax.numpy as jnp
from jax import export as jax_export

from vae_gp_ode_tpu.core.linalg import portable_lowering
from vae_gp_ode_tpu.ops import config as ops_config

_IMG = 28  # reference data is 28x28 rot-MNIST (SURVEY.md section 2 C13)


def make_forecast_fn(model, variables, gp, *, L=1, T_custom=None,
                     mc_reduce='none', normalize_input=False,
                     dtype='f32'):
    """Close a trained (model, variables, gp) over a pure serving
    function ``fn(X, seed) -> Xrec``.

    X: (N, T, 1, d, d) sequences in the model's input normalisation -
    or raw [0,1] pixels with normalize_input=True, which bakes the
    training normalisation ``(x - 0.1307)/0.3081`` (reference
    data/utils.py:12-15) into the graph so serving callers never need
    to know the constants. The decoder output is sigmoid (0,1) frames
    either way.
    seed: int32 scalar; drives the z0 reparameterisation and the L
    pathwise GP function draws (the same in-forward randomness the
    reference draws from hidden global state, SURVEY.md section 7).

    mc_reduce: 'none'  -> Xrec (L, N, T, 1, d, d) - all MC samples;
               'mean'  -> Xrec (N, T, 1, d, d)    - the MC-mean
               reconstruction, i.e. the quantity the published MSE
               protocol scores against (evaluate.py compute_mse_std).

    dtype: 'f32' (default) or 'bf16' - half-precision serving: the
    conv-dominated encoder/decoder compute in bfloat16 (the MXU's
    native half precision - 2x its f32 throughput and half the HBM
    traffic for activations), while the GP/ODE dynamics and the
    returned frames stay float32 (models.odegpvae upcasts the latent
    statistics before the reparameterisation). Weights stay f32 in the
    artifact; only the compute dtype changes.

    bf16 quality (measured on the shipped DF checkpoint): the damage
    is accumulation-dtype, not operand rounding. With bf16 operands
    and f32 accumulation - exactly what the TPU MXU does for a bf16
    conv - test MSE is 0.0328 vs f32's 0.0326 (essentially free; a
    per-layer ablation localised the sensitivity to the 13x13->28x28
    ConvTranspose and an operand-round/accum-round split cleared the
    operands). A CPU backend that accumulates bf16 convs in bf16
    measured +0.008 MSE (0.0326 -> 0.0409) end-to-end: bf16 artifacts
    are intended for TPU serving; prefer f32 for CPU targets.
    """
    if mc_reduce not in ('none', 'mean'):
        raise ValueError(f'mc_reduce must be none|mean, got {mc_reduce!r}')
    if dtype not in ('f32', 'bf16'):
        raise ValueError(f'dtype must be f32|bf16, got {dtype!r}')
    from vae_gp_ode_tpu.data.mnist import MNIST_MEAN, MNIST_STD
    if dtype == 'bf16':
        model = model.clone(dtype=jnp.bfloat16)
    var_consts = {'params': variables['params'],
                  'batch_stats': variables.get('batch_stats', {})}

    def fn(X, seed):
        if normalize_input:
            X = (X - MNIST_MEAN) / MNIST_STD
        key = jax.random.PRNGKey(seed)
        Xrec, _, _, _ = model.apply(var_consts, X, gp, key, L=L,
                                    T_custom=T_custom, train=False)
        if mc_reduce == 'mean':
            Xrec = jnp.mean(Xrec, axis=0)
        return Xrec.astype(jnp.float32)

    return fn


def export_forecaster(model, variables, gp, *, T, img=_IMG, batch=None,
                      L=1, T_custom=None, mc_reduce='none',
                      normalize_input=False, platforms=None,
                      dtype='f32'):
    """Export the forecaster as a ``jax.export.Exported``.

    batch: serving batch size; None exports a symbolic batch dimension
    ('b') so one artifact serves any N >= 1.
    T: the INPUT horizon (frames the encoder sees). T_custom, if set,
    is the integration/output horizon (forecasting past the input, the
    reference's T_custom rollout, odegpvae.py:51-53).
    platforms: e.g. ('cpu', 'tpu') for a cross-platform artifact;
    None lowers for the current default platform only.
    """
    fn = make_forecast_fn(model, variables, gp, L=L, T_custom=T_custom,
                          mc_reduce=mc_reduce,
                          normalize_input=normalize_input, dtype=dtype)
    if batch is None:
        batch, = jax_export.symbolic_shape('b')
    x_spec = jax.ShapeDtypeStruct((batch, T, 1, img, img), jnp.float32)
    seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = tuple(platforms)
    # the traced body must be fully portable: never pallas_call
    # (runtime-specialised TPU programs), and never LAPACK custom calls -
    # this jaxlib's CPU backend SEGFAULTS executing lapack_potrf/trsm
    # from a DESERIALIZED export in a fresh process (core/linalg.py).
    # Single-platform exports lower linalg per platform (TPU keeps its
    # native pure-HLO primitives, CPU gets the scan substitutions);
    # multi-platform artifacts use the all-scan arrangement so no
    # custom call appears in ANY branch (see portable_lowering)
    single = platforms is None or len(tuple(platforms)) <= 1
    with ops_config.forced_jnp(), portable_lowering(tpu_native=single):
        return jax_export.export(jax.jit(fn), **kwargs)(x_spec, seed_spec)


class Forecaster:
    """Callable wrapper around a (de)serialized exported forecaster."""

    def __init__(self, exported, manifest=None):
        self.exported = exported
        self.manifest = manifest   # sidecar provenance (may be None)

    @property
    def input_shape(self):
        return self.exported.in_avals[0].shape

    @property
    def platforms(self):
        return self.exported.platforms

    def __call__(self, X, seed=0):
        X = jnp.asarray(X, jnp.float32)
        return self.exported.call(X, jnp.asarray(seed, jnp.int32))


def _manifest_path(path):
    return f'{path}.manifest.json'


def save_forecaster(exported, path):
    """Serialize an Exported (or Forecaster) to a standalone file, plus a
    small sidecar manifest (``<path>.manifest.json``: jax version,
    lowering platforms, calling-convention version, input shapes) so a
    mismatched serving host fails with provenance instead of a bare
    deserialization trace (VERDICT r4 #7)."""
    if isinstance(exported, Forecaster):
        exported = exported.exported
    blob = exported.serialize()
    with open(path, 'wb') as f:
        f.write(blob)
    manifest = {
        'format': 'vae_gp_ode_tpu.jaxexport', 'manifest_version': 1,
        'jax_version': jax.__version__,
        'calling_convention_version':
            exported.calling_convention_version,
        'platforms': list(exported.platforms),
        'in_avals': [{'shape': [str(d) for d in a.shape],
                      'dtype': str(a.dtype)} for a in exported.in_avals],
        'out_avals': [{'shape': [str(d) for d in a.shape],
                       'dtype': str(a.dtype)} for a in exported.out_avals],
        'nbytes': len(blob),
    }
    with open(_manifest_path(path), 'w') as f:
        json.dump(manifest, f, indent=1)
    return len(blob)


def load_forecaster(path, check_platform=True):
    """Load a serialized artifact; returns a callable Forecaster.

    When the sidecar manifest written by :func:`save_forecaster` is
    present, two failure modes become actionable errors instead of
    low-level traces:

    * the current backend is not among the artifact's lowering platforms
      (the call would fail at execution time) -> RuntimeError naming both
      and pointing at ``--platforms``; pass ``check_platform=False`` to
      load anyway (e.g. to inspect shapes on a build box);
    * deserialization itself fails (typically a jax version /
      calling-convention gap) -> RuntimeError carrying the exporting
      jax version vs this process's.

    Artifacts without a manifest (pre-round-5, or hand-copied without the
    sidecar) load exactly as before.
    """
    with open(path, 'rb') as f:
        blob = f.read()
    manifest = None
    try:
        with open(_manifest_path(path)) as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        pass
    if manifest is not None and check_platform:
        plats = [p.lower() for p in manifest.get('platforms', [])]
        backend = jax.default_backend().lower()
        # jax lowers for 'tpu'/'cpu'/'cuda'; treat the experimental axon
        # tunnel backend as tpu for this purpose
        backend = 'tpu' if backend == 'axon' else backend
        if plats and backend not in plats:
            raise RuntimeError(
                f'artifact {os.path.basename(path)!r} was lowered for '
                f'platform(s) {plats} but this process runs on '
                f'{backend!r}: calling it would fail at execution time. '
                f'Re-export with --platforms {backend} (or multiple '
                f'platforms), or pass check_platform=False to load '
                f'anyway (inspection only).')
    try:
        exported = jax_export.deserialize(blob)
    except Exception as e:
        prov = ''
        if manifest is not None:
            prov = (f" (artifact exported with jax "
                    f"{manifest.get('jax_version')}, calling convention "
                    f"v{manifest.get('calling_convention_version')}; this "
                    f"process runs jax {jax.__version__})")
        raise RuntimeError(
            f'failed to deserialize {os.path.basename(path)!r}{prov}: '
            f'{type(e).__name__}: {e}') from e
    fc = Forecaster(exported)
    fc.manifest = manifest
    return fc


def load_run_dir(model_path):
    """Rebuild (model, state) from a training run directory (args.json +
    odegpvae_mnist.ckpt) without touching the dataset - the serving-side
    twin of evaluate.evaluate_one's loader."""
    from vae_gp_ode_tpu.models.odegpvae import init_model
    from vae_gp_ode_tpu.training.trainer import create_train_state
    from vae_gp_ode_tpu.training import checkpoint as ckpt

    with open(os.path.join(model_path, 'args.json')) as f:
        ta = types.SimpleNamespace(**json.load(f))

    model, variables, gp = init_model(
        jax.random.PRNGKey(0), latent_dim=ta.latent_dim, n_filt=ta.n_filt,
        order=ta.ode, frames=ta.frames, dt=ta.dt, solver=ta.solver,
        dense=getattr(ta, 'ts_dense_scale', 1),
        num_features=ta.num_features, num_inducing=ta.num_inducing,
        kernel=ta.kernel, q_diag=ta.q_diag, dimwise=ta.dimwise,
        D_in=ta.D_in, D_out=ta.D_out, batch=2, T=ta.T)
    state, _ = create_train_state(
        model, variables, gp,
        freeze_vae=bool(getattr(ta, 'pretrained', False)),
        fix_kernel=bool(getattr(ta, 'fix_kernel', False)))
    state = ckpt.restore_checkpoint(
        os.path.join(model_path, 'odegpvae_mnist.ckpt'), like=state)
    return model, state, ta


def export_run_dir(model_path, out_path, *, L=1, Troll=0, batch=None,
                   mc_reduce='none', normalize_input=False,
                   platforms=None, dtype='f32'):
    """One-call export of a finished training run to a serving artifact.

    Troll > 0 exports a forecaster that integrates Troll*T steps from a
    T-frame input (the reference's 2x-horizon rollout protocol,
    create_plots.py:19-23)."""
    model, state, ta = load_run_dir(model_path)
    variables = {'params': state.vae_params, 'batch_stats': state.batch_stats}
    T_custom = Troll * ta.T if Troll else None
    exported = export_forecaster(
        model, variables, state.gp, T=ta.T, batch=batch, L=L,
        T_custom=T_custom, mc_reduce=mc_reduce,
        normalize_input=normalize_input, platforms=platforms,
        dtype=dtype)
    nbytes = save_forecaster(exported, out_path)
    return exported, nbytes


def _main():
    import argparse
    p = argparse.ArgumentParser(
        'Export a trained VAE-GP-ODE run as a standalone serving artifact')
    p.add_argument('--model_path', type=str, required=True,
                   help='run dir containing odegpvae_mnist.ckpt + args.json')
    p.add_argument('--out', type=str, required=True,
                   help='output artifact path (.jaxexport)')
    p.add_argument('--L', type=int, default=1, help='MC samples baked in')
    p.add_argument('--Troll', type=int, default=0,
                   help='if >0, forecast Troll*T steps from T input frames')
    p.add_argument('--batch', type=int, default=0,
                   help='serving batch size (0: symbolic - any batch)')
    p.add_argument('--mc_reduce', type=str, default='none',
                   choices=['none', 'mean'])
    p.add_argument('--dtype', type=str, default='f32',
                   choices=['f32', 'bf16'],
                   help='bf16: half-precision encoder/decoder compute '
                        '(2x MXU throughput), f32 dynamics + outputs')
    p.add_argument('--normalize_input', action='store_true',
                   help='artifact takes raw [0,1] pixels and applies the '
                        'training normalisation in-graph')
    p.add_argument('--platforms', type=str, nargs='*', default=None,
                   help="e.g. --platforms cpu tpu for a cross-platform "
                        "artifact (default: current platform only)")
    p.add_argument('--device', type=str, default=None,
                   help="force the export-time jax platform (e.g. cpu)")
    a = p.parse_args()
    if a.device:
        jax.config.update('jax_platforms', a.device)
    from vae_gp_ode_tpu.core.settings import enable_compilation_cache
    enable_compilation_cache()
    exported, nbytes = export_run_dir(
        a.model_path, a.out, L=a.L, Troll=a.Troll, batch=a.batch or None,
        mc_reduce=a.mc_reduce, normalize_input=a.normalize_input,
        platforms=a.platforms, dtype=a.dtype)
    print(json.dumps({
        'out': a.out, 'bytes': nbytes,
        'input_shape': [str(d) for d in exported.in_avals[0].shape],
        'platforms': list(exported.platforms),
    }))


if __name__ == '__main__':
    _main()
