"""Pipeline-parallel MNIST forward over a 'pp' mesh axis."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from resnet_accel_tpu.parallel.pipeline import make_pipeline_forward
from resnet_accel_tpu.train import init_mnist_params, mnist_forward_fp32


@pytest.fixture(scope="module")
def pp_mesh():
    devs = jax.devices("cpu")
    if len(devs) < 2:
        pytest.skip("need 2 virtual CPU devices")
    return Mesh(np.array(devs[:2]), ("pp",))


class TestPipeline:
    def test_matches_single_device_forward(self, pp_mesh):
        params = init_mnist_params(seed=0)
        fwd = make_pipeline_forward(pp_mesh, params, microbatch=4)
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (16, 1, 28, 28)).astype(np.float32)
        got = np.asarray(fwd(jnp.asarray(x)))
        exp = np.asarray(mnist_forward_fp32(
            {k: jnp.asarray(v) for k, v in params.items()},
            jnp.asarray(x)))
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)

    def test_single_microbatch(self, pp_mesh):
        params = init_mnist_params(seed=2)
        fwd = make_pipeline_forward(pp_mesh, params, microbatch=8)
        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, (8, 1, 28, 28)).astype(np.float32)
        got = np.asarray(fwd(jnp.asarray(x)))
        exp = np.asarray(mnist_forward_fp32(
            {k: jnp.asarray(v) for k, v in params.items()},
            jnp.asarray(x)))
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)

    def test_requires_pp_axis(self):
        devs = jax.devices("cpu")[:2]
        mesh = Mesh(np.array(devs), ("dp",))
        with pytest.raises(ValueError):
            make_pipeline_forward(mesh, init_mnist_params(0), 4)

    def test_differentiable_through_pipe(self, pp_mesh):
        # ppermute is differentiable: grads flow back through the pipe,
        # enabling pipeline-parallel training.
        params = init_mnist_params(seed=4)
        fwd = make_pipeline_forward(pp_mesh, params, microbatch=4)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(0, 1, (4, 1, 28, 28)).astype(np.float32))
        g = jax.grad(lambda v: fwd(v).sum())(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
