"""Blackbox capabilities: BBO on test functions; NN-weight diffusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbd_tpu.blackbox import bbo, mnist


@pytest.mark.parametrize("fn_name", ["Ackley", "Rastrigin", "Levy"])
def test_objectives_at_optimum(fn_name):
    dim = 16
    fn = bbo.make_objective(fn_name, dim)
    x_min, x_max = (-5.0, 10.0) if fn_name == "Ackley" else (-5.0, 5.0)
    # map the known optimum into search coords Y ∈ [-1, 1]
    x_opt = 0.0 if fn_name != "Levy" else 1.0
    y_opt = 2.0 * (x_opt - x_min) / (x_max - x_min) - 1.0
    val = float(fn(jnp.full((dim,), y_opt)))
    assert val == pytest.approx(0.0, abs=1e-4)


def test_bbo_improves_objective():
    cfg = bbo.BBOConfig(fn_name="Rastrigin", dim=64, Nsample=64, Ndiffuse=100)
    res = bbo.optimize(cfg, jax.random.PRNGKey(0))
    J = np.asarray(res.J_trace)
    assert res.evals.shape == (99,)
    # J is max of -f; should improve substantially over the run
    assert J[-1] > J[0] + 100.0
    # final population collapsed near its barycenter
    mu = np.asarray(res.mu_final)
    assert mu.std(axis=0).max() < 1e-3


@pytest.mark.slow
def test_mnist_weight_diffusion_learns():
    cfg = mnist.MnistDiffusionConfig(Nsample=64, Ndiffuse=100)
    params, (J, acc) = mnist.train(cfg, jax.random.PRNGKey(0))
    acc = np.asarray(acc)
    # learns far above chance (10 classes) on the offline digits fallback
    assert acc[-1] > 0.5, acc[-1]
    assert acc[-1] > acc[0]
