"""Training NN weights by diffusion instead of SGD (reference:
mbd/blackbox/mbd_mnist.py).

Semantics: a 784-32-32-10 MLP classifier whose parameters are optimized by
the MBD reverse process — each step perturbs a population of Nsample
parameter pytrees with per-parameter Gaussian noise gated by a
Bernoulli(0.2) Gibbs-style mask (first-layer noise scaled ×0.1,
mbd_mnist.py:123-142), scores each member by cross-entropy on a random
Nsample-row data batch, and collapses to the softmax-weighted parameter
average (mbd_mnist.py:145-155). Schedule: betas linspace(3e-5, 1e-3, 500),
temp 0.3.

Data: the reference downloads MNIST over HTTP. This environment has no
egress, so the loader tries (in order): an explicit local MNIST directory
(``MBD_TPU_MNIST_DIR`` with the standard idx-ubyte.gz files), then falls
back to scikit-learn's bundled 8×8 digits dataset upsampled to 28×28 —
same API, same 784-dim input, fully offline.
"""

from __future__ import annotations

import array
import gzip
import os
import struct
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _load_idx_dir(d: str):
    def parse_labels(fn):
        with gzip.open(fn, "rb") as fh:
            struct.unpack(">II", fh.read(8))
            return np.array(array.array("B", fh.read()), dtype=np.uint8)

    def parse_images(fn):
        with gzip.open(fn, "rb") as fh:
            _, num, rows, cols = struct.unpack(">IIII", fh.read(16))
            return np.array(array.array("B", fh.read()),
                            dtype=np.uint8).reshape(num, rows * cols)

    return (parse_images(os.path.join(d, "train-images-idx3-ubyte.gz")),
            parse_labels(os.path.join(d, "train-labels-idx1-ubyte.gz")),
            parse_images(os.path.join(d, "t10k-images-idx3-ubyte.gz")),
            parse_labels(os.path.join(d, "t10k-labels-idx1-ubyte.gz")))


def _load_digits_as_mnist():
    from sklearn.datasets import load_digits

    X, y = load_digits(return_X_y=True)        # (1797, 64) in [0, 16]
    X = (X / 16.0).reshape(-1, 8, 8)
    X28 = np.repeat(np.repeat(X, 4, axis=1), 4, axis=2)  # nearest-up to 28²?
    # 8*4 = 32 — crop center 28
    X28 = X28[:, 2:30, 2:30].reshape(-1, 784)
    n = len(X28)
    n_train = int(0.8 * n)
    rng = np.random.RandomState(0)
    perm = rng.permutation(n)
    tr, te = perm[:n_train], perm[n_train:]
    return (X28[tr] * 255, y[tr], X28[te] * 255, y[te])


def load_dataset() -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    d = os.environ.get("MBD_TPU_MNIST_DIR")
    if d and os.path.isdir(d):
        tr_x, tr_y, te_x, te_y = _load_idx_dir(d)
    else:
        tr_x, tr_y, te_x, te_y = _load_digits_as_mnist()
    one_hot = lambda y: np.eye(10, dtype=np.float32)[np.asarray(y, int)]  # noqa
    return (np.asarray(tr_x, np.float32) / 255.0, one_hot(tr_y),
            np.asarray(te_x, np.float32) / 255.0, one_hot(te_y))


# --- tiny MLP (replaces jax.example_libraries.stax usage in the reference) --

LAYER_SIZES = (784, 32, 32, 10)


def init_params(rng: jax.Array):
    params = []
    for i in range(len(LAYER_SIZES) - 1):
        rng, kw, kb = jax.random.split(rng, 3)
        fan_in, fan_out = LAYER_SIZES[i], LAYER_SIZES[i + 1]
        W = jax.random.normal(kw, (fan_in, fan_out)) * jnp.sqrt(1.0 / fan_in)
        b = jnp.zeros((fan_out,))
        params.append((W, b))
    return params


def predict(params, x):
    for W, b in params[:-1]:
        x = jax.nn.relu(x @ W + b)
    W, b = params[-1]
    return jax.nn.log_softmax(x @ W + b)


def loss(params, batch):
    inputs, targets = batch
    return -jnp.mean(jnp.sum(predict(params, inputs) * targets, axis=1))


def accuracy(params, batch):
    inputs, targets = batch
    return jnp.mean(jnp.argmax(predict(params, inputs), axis=1)
                    == jnp.argmax(targets, axis=1))


@dataclass
class MnistDiffusionConfig:
    Nsample: int = 256
    Ndiffuse: int = 500
    temp_sample: float = 0.3
    beta0: float = 3e-5
    betaT: float = 1e-3
    gibbs_p: float = 0.2       # Bernoulli mask rate on noise
    first_layer_scale: float = 0.1
    batch_size: int = 256      # data rows per objective evaluation


def train(cfg: MnistDiffusionConfig, rng: jax.Array, data=None,
          progress_every: int = 0):
    """Diffuse MLP weights; returns (params, trace of (J, test_acc))."""
    if data is None:
        data = load_dataset()
    train_x, train_y, test_x, test_y = [jnp.asarray(a) for a in data]
    ndata = train_x.shape[0]

    from ..core.schedule import make_schedule
    sched = make_schedule(cfg.Ndiffuse, cfg.beta0, cfg.betaT)

    def perturb(params, sigma, rng):
        out = []
        for li, (W, b) in enumerate(params):
            scale = cfg.first_layer_scale if li == 0 else 1.0
            rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
            nW = jax.random.normal(k1, (cfg.Nsample,) + W.shape) * sigma * scale
            mW = jax.random.bernoulli(k2, cfg.gibbs_p,
                                      (cfg.Nsample,) + W.shape)
            nb = jax.random.normal(k3, (cfg.Nsample,) + b.shape) * sigma
            mb = jax.random.bernoulli(k4, cfg.gibbs_p,
                                      (cfg.Nsample,) + b.shape)
            out.append((W + nW * mW, b + nb * mb))
        return out

    def reverse_once(carry, t):
        rng, params = carry
        rng, k_noise, k_batch = jax.random.split(rng, 3)
        batch_idx = jax.random.choice(
            k_batch, ndata, (min(cfg.batch_size, ndata),), replace=False)
        batch = (train_x[batch_idx], train_y[batch_idx])
        Y0s = perturb(params, sched.sigmas[t], k_noise)
        Js = -jax.vmap(loss, in_axes=(0, None))(Y0s, batch)
        logp0 = (Js - Js.mean()) / jnp.maximum(Js.std(), 1e-8) \
            / cfg.temp_sample
        w = jax.nn.softmax(logp0)
        new_params = [
            (jnp.tensordot(w, Wb[0], axes=[0, 0]),
             jnp.tensordot(w, Wb[1], axes=[0, 0]))
            for Wb in Y0s]
        new_params = [tuple(p) for p in new_params]
        J = Js.mean()
        acc = accuracy(new_params, (test_x, test_y))
        return (rng, new_params), (J, acc)

    rng, k_init = jax.random.split(rng)
    params = init_params(k_init)

    @jax.jit
    def run(rng, params):
        steps = jnp.arange(cfg.Ndiffuse - 1, 0, -1)
        (_, params), trace = jax.lax.scan(reverse_once, (rng, params), steps)
        return params, trace

    params, trace = run(rng, params)
    return params, trace
