"""Pin evaluate.py's compute_mse_std to the reference notebook protocol.

The published-number generator is plots_dynamics.ipynb cell 13:
    se = (Xrec - test_batch)**2          # per-MC-sample, (L,N,T,c,d,d)
    se_all = torch.stack(se_all)
    mse, std = torch.mean(se_all), torch.std(se_all)   # std: ddof=1
This test feeds identical fake reconstructions through evaluate.py's
compute_mse_std and the verbatim torch computation and asserts equality.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402

import evaluate  # noqa: E402

L, N, T, D = 3, 4, 5, 8


def test_compute_mse_std_matches_notebook_cell13(monkeypatch):
    rng = np.random.RandomState(0)
    batches = [rng.rand(N, T, 1, D, D).astype(np.float32) for _ in range(3)]
    recs = [rng.rand(L, N, T, 1, D, D).astype(np.float32) for _ in range(3)]

    calls = {'i': 0}

    def fake_make_eval_step(model, T_custom=None):
        def ev(state, batch, key, Ls):
            i = calls['i']
            calls['i'] += 1
            return recs[i], None
        return ev

    import vae_gp_ode_tpu.training.trainer as trainer
    monkeypatch.setattr(trainer, 'make_eval_step', fake_make_eval_step)

    mse, std = evaluate.compute_mse_std(
        None, None, batches, L, jax.random.PRNGKey(0))

    # the notebook computation, verbatim (cell 13)
    se_all = []
    for b, r in zip(batches, recs):
        se = (torch.tensor(r) - torch.tensor(b)) ** 2
        se_all.append(se)
    se_all = torch.stack(se_all)
    np.testing.assert_allclose(mse, float(torch.mean(se_all)), rtol=1e-6)
    np.testing.assert_allclose(std, float(torch.std(se_all)), rtol=1e-6)


def test_per_mc_sample_not_mc_mean():
    """The metric must NOT collapse the L axis before squaring: with
    high-variance MC reconstructions the two protocols differ a lot."""
    rng = np.random.RandomState(1)
    batch = np.zeros((N, T, 1, D, D), np.float32)
    rec = rng.randn(L, N, T, 1, D, D).astype(np.float32)

    per_sample = float(((rec - batch[None]) ** 2).mean())
    mc_mean = float(((rec.mean(0) - batch) ** 2).mean())
    assert per_sample > 2 * mc_mean  # sanity: they really differ here

    import vae_gp_ode_tpu.training.trainer as trainer
    orig = trainer.make_eval_step
    try:
        trainer.make_eval_step = lambda m, T_custom=None: (
            lambda s, b, k, Ls: (rec, None))
        mse, _ = evaluate.compute_mse_std(
            None, None, [batch], L, jax.random.PRNGKey(0))
    finally:
        trainer.make_eval_step = orig
    np.testing.assert_allclose(mse, per_sample, rtol=1e-6)


def test_sigmoid_floor_mse():
    """The metric floor is the pointwise-clip optimum: zero for data
    inside the sigmoid range, exact quadratic excess outside."""
    import numpy as np
    from evaluate import sigmoid_floor_mse

    inside = np.array([0.0, 0.25, 0.5, 1.0])
    floor, _ = sigmoid_floor_mse(inside)
    assert floor == 0.0

    outside = np.array([-0.5, 2.0, 0.5, 1.0])
    floor, std = sigmoid_floor_mse(outside)
    np.testing.assert_allclose(floor, (0.25 + 1.0) / 4.0)
    assert std > 0

    # no model output in (0,1) can beat the floor
    rng = np.random.RandomState(0)
    x = rng.uniform(-0.42, 2.82, size=10000)
    floor, _ = sigmoid_floor_mse(x)
    z = rng.uniform(0, 1, size=10000)          # any sigmoid-range model
    assert ((z - x) ** 2).mean() >= floor
