"""Pipeline-parallel forwards over a 'pp' mesh axis.

General stage-list pipeline (parallel.pipeline): arbitrary depth,
shape-changing stages, applied to the MNIST CNN (pp=2/3/4) and the INT8
transformer encoder stack (pp=2/4), checked against the unsharded
forwards.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from resnet_accel_tpu.parallel.pipeline import (
    make_pipeline_forward, mnist_pipeline_stages,
    transformer_pipeline_stages)
from resnet_accel_tpu.train import init_mnist_params, mnist_forward_fp32


def _mesh(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} virtual CPU devices")
    return Mesh(np.array(devs[:n]), ("pp",))


def _mnist_ref(params, x):
    return np.asarray(mnist_forward_fp32(
        {k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x)))


class TestPipelineMNIST:
    @pytest.mark.parametrize("depth", [2, 3, 4])
    def test_matches_single_device_forward(self, depth):
        mesh = _mesh(depth)
        params = init_mnist_params(seed=0)
        stages = mnist_pipeline_stages(params, n_stages=depth)
        fwd = make_pipeline_forward(mesh, stages, microbatch=4)
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (16, 1, 28, 28)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(fwd(jnp.asarray(x))), _mnist_ref(params, x),
            rtol=1e-5, atol=1e-5)

    def test_single_microbatch(self):
        mesh = _mesh(2)
        params = init_mnist_params(seed=2)
        stages = mnist_pipeline_stages(params, n_stages=2)
        fwd = make_pipeline_forward(mesh, stages, microbatch=8)
        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, (8, 1, 28, 28)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(fwd(jnp.asarray(x))), _mnist_ref(params, x),
            rtol=1e-5, atol=1e-5)

    def test_requires_pp_axis(self):
        devs = jax.devices("cpu")[:2]
        mesh = Mesh(np.array(devs), ("dp",))
        stages = mnist_pipeline_stages(init_mnist_params(0), 2)
        with pytest.raises(ValueError, match="pp"):
            make_pipeline_forward(mesh, stages, 4)

    def test_stage_count_must_match_axis(self):
        mesh = _mesh(2)
        stages = mnist_pipeline_stages(init_mnist_params(0), 3)
        with pytest.raises(ValueError, match="stage"):
            make_pipeline_forward(mesh, stages, 4)

    def test_differentiable_through_pipe(self):
        # ppermute is differentiable: grads flow back through the pipe,
        # enabling pipeline-parallel training.
        mesh = _mesh(2)
        params = init_mnist_params(seed=4)
        stages = mnist_pipeline_stages(params, n_stages=2)
        fwd = make_pipeline_forward(mesh, stages, microbatch=4)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(0, 1, (4, 1, 28, 28)).astype(np.float32))
        g = jax.grad(lambda v: fwd(v).sum())(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestPipelineTransformer:
    @pytest.mark.parametrize("depth", [2, 4])
    def test_matches_unsharded_stack(self, depth):
        from resnet_accel_tpu.models import TransformerBlockInt8
        mesh = _mesh(depth)
        blocks = [TransformerBlockInt8.from_random(seed=i, d_model=64,
                                                   n_heads=4, d_ff=128)
                  for i in range(4)]
        stages = transformer_pipeline_stages(blocks, n_stages=depth)
        mb = 2
        fwd = make_pipeline_forward(mesh, stages, microbatch=mb)
        rng = np.random.default_rng(7)
        x = rng.normal(0, 1, (8, 64)).astype(np.float32)
        # The blocks quantize activations dynamically per tensor, so the
        # reference runs per microbatch (the pipeline's semantics).
        exps = []
        for i in range(0, len(x), mb):
            e = jnp.asarray(x[i:i + mb])
            for blk in blocks:
                e = blk(e)
            exps.append(np.asarray(e))
        np.testing.assert_allclose(
            np.asarray(fwd(jnp.asarray(x))), np.concatenate(exps),
            rtol=2e-5, atol=2e-5)

    def test_uneven_grouping(self):
        # 5 blocks over 2 stages -> 3 + 2
        from resnet_accel_tpu.models import TransformerBlockInt8
        mesh = _mesh(2)
        blocks = [TransformerBlockInt8.from_random(seed=10 + i,
                                                   d_model=64,
                                                   n_heads=4, d_ff=128)
                  for i in range(5)]
        stages = transformer_pipeline_stages(blocks, n_stages=2)
        fwd = make_pipeline_forward(mesh, stages, microbatch=4)
        rng = np.random.default_rng(8)
        x = rng.normal(0, 1, (4, 64)).astype(np.float32)
        exp = jnp.asarray(x)          # one microbatch: scales identical
        for blk in blocks:
            exp = blk(exp)
        np.testing.assert_allclose(
            np.asarray(fwd(jnp.asarray(x))), np.asarray(exp),
            rtol=2e-5, atol=2e-5)
