"""Combined dp x pp x tp mesh: forward equivalence + joint train step.

The single-axis parallel tests prove each collective pattern alone;
these prove the COMPOSITION — one shard_map program using dp batch
sharding, 2-stage GPipe pipelining over pp, and Megatron-style tp fc
layers simultaneously on a 2x2x2 mesh of 8 virtual CPU devices —
matches the unsharded model forward and backward.
"""

import jax
import numpy as np
import optax
import pytest

from resnet_accel_tpu.parallel.combined import (
    make_combined_forward, make_combined_mesh, make_combined_train_step)
from resnet_accel_tpu.train import init_mnist_params
from resnet_accel_tpu.train.mnist import mnist_forward_fp32

import jax.numpy as jnp


@pytest.fixture(scope="module")
def mesh(cpu_devices):
    if len(cpu_devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_combined_mesh(cpu_devices, dp=2, pp=2, tp=2)


@pytest.fixture(scope="module")
def params():
    return init_mnist_params(seed=3)


def _batch(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, 1, 28, 28)).astype(np.float32)
    y = rng.integers(0, 10, n).astype(np.int32)
    return x, y


def test_combined_forward_matches_unsharded(mesh, params):
    x, _ = _batch(8)
    fwd = make_combined_forward(mesh, microbatch=2)
    got = np.asarray(fwd(
        {k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x)))
    want = np.asarray(mnist_forward_fp32(
        {k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x)))
    assert got.shape == (8, 10)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_combined_forward_batch_not_multiple_raises(mesh, params):
    # B=8 over dp=2 -> 4 per shard; microbatch=3 does not divide it.
    x, _ = _batch(8)
    fwd = make_combined_forward(mesh, microbatch=3)
    with pytest.raises(ValueError, match="microbatch"):
        fwd({k: jnp.asarray(v) for k, v in params.items()},
            jnp.asarray(x))


def test_combined_train_step_matches_unsharded(mesh, params):
    """One Adam step through the 3-axis program == the plain jit step."""
    x, y = _batch(8, seed=1)
    init_fn, step_fn, shard_batch = make_combined_train_step(
        mesh, microbatch=2, lr=1e-3)
    p_sh, opt_sh = init_fn(params)
    xs, ys = shard_batch(x, y)
    p_sh, opt_sh, loss_sh = step_fn(p_sh, opt_sh, xs, ys)
    loss_sh = float(loss_sh)

    # Unsharded oracle: identical loss and updated params.
    opt = optax.adam(1e-3)
    p0 = {k: jnp.asarray(v) for k, v in params.items()}
    st0 = opt.init(p0)

    def loss_fn(p):
        logits = mnist_forward_fp32(p, jnp.asarray(x))
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(y)).mean()

    loss0, g0 = jax.value_and_grad(loss_fn)(p0)
    upd, _ = opt.update(g0, st0)
    p1 = optax.apply_updates(p0, upd)

    assert np.isfinite(loss_sh)
    np.testing.assert_allclose(loss_sh, float(loss0), rtol=1e-5)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p_sh[k]), np.asarray(p1[k]), rtol=2e-4, atol=5e-5,
            err_msg=f"param {k} diverged after one combined-mesh step")


def test_combined_two_steps_reduce_loss(mesh, params):
    x, y = _batch(16, seed=2)
    init_fn, step_fn, shard_batch = make_combined_train_step(
        mesh, microbatch=2, lr=1e-3)
    p, st = init_fn(params)
    xs, ys = shard_batch(x, y)
    losses = []
    for _ in range(8):                # Adam overshoots ~steps 1-4 on
        p, st, loss = step_fn(p, st, xs, ys)   # random data, recovers
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_combined_mesh_validation(cpu_devices):
    if len(cpu_devices) < 8:
        pytest.skip("needs 8 virtual devices")
    with pytest.raises(ValueError, match="needs"):
        make_combined_mesh(cpu_devices[:4], dp=2, pp=2, tp=2)
    mesh = make_combined_mesh(cpu_devices, dp=2, pp=2, tp=2)
    assert dict(mesh.shape) == {"dp": 2, "pp": 2, "tp": 2}
