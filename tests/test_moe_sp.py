"""Sequence-parallel transformer + expert-parallel MoE tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from resnet_accel_tpu.models.moe import MoEBlockInt8
from resnet_accel_tpu.models.transformer import TransformerBlockInt8
from resnet_accel_tpu.parallel.experts import make_ep_moe_forward
from resnet_accel_tpu.parallel.sequence import make_sp_transformer_forward


@pytest.fixture(scope="module")
def cpu_devs():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need 4 virtual CPU devices")
    return devs


class TestSequenceParallel:
    def test_matches_single_device(self, cpu_devs):
        mesh = Mesh(np.array(cpu_devs[:4]), ("sp",))
        block = TransformerBlockInt8.from_random(
            d_model=128, n_heads=4, d_ff=256, sparsity=0.8, seed=0)
        fwd = make_sp_transformer_forward(mesh, block)
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (16, 128)).astype(np.float32)
        got = np.asarray(fwd(jnp.asarray(x)))
        exp = np.asarray(block(jnp.asarray(x)))
        # Same arithmetic incl. the pmax-global quantization scale;
        # tiny fp32 reduction-order tolerance in LN/softmax.
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)

    def test_requires_sp_axis(self, cpu_devs):
        mesh = Mesh(np.array(cpu_devs[:2]), ("dp",))
        block = TransformerBlockInt8.from_random(seed=0)
        with pytest.raises(ValueError):
            make_sp_transformer_forward(mesh, block)


class TestExpertParallel:
    def test_matches_single_device(self, cpu_devs):
        mesh = Mesh(np.array(cpu_devs[:2]), ("ep",))
        moe = MoEBlockInt8.from_random(n_experts=4, seed=0)
        fwd = make_ep_moe_forward(mesh, moe)
        rng = np.random.default_rng(2)
        x = rng.normal(0, 1, (32, 128)).astype(np.float32)
        got = np.asarray(fwd(jnp.asarray(x)))
        exp = np.asarray(moe(jnp.asarray(x)))
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)

    def test_matches_golden(self, cpu_devs):
        mesh = Mesh(np.array(cpu_devs[:4]), ("ep",))
        moe = MoEBlockInt8.from_random(n_experts=4, seed=3)
        fwd = make_ep_moe_forward(mesh, moe)
        rng = np.random.default_rng(4)
        x = rng.normal(0, 1, (16, 128)).astype(np.float32)
        got = np.asarray(fwd(jnp.asarray(x)))
        exp = moe.forward_golden(x)
        np.testing.assert_allclose(got, exp, rtol=2e-3, atol=2e-3)

    def test_all_experts_used(self):
        moe = MoEBlockInt8.from_random(n_experts=4, seed=5)
        rng = np.random.default_rng(6)
        x = rng.normal(0, 1, (128, 128)).astype(np.float32)
        sel = np.asarray(moe.route(jnp.asarray(x)))
        assert len(np.unique(sel)) >= 3  # router spreads tokens

    def test_experts_not_divisible_raises(self, cpu_devs):
        mesh = Mesh(np.array(cpu_devs[:3]), ("ep",))
        moe = MoEBlockInt8.from_random(n_experts=4, seed=0)
        with pytest.raises(ValueError):
            make_ep_moe_forward(mesh, moe)

    def test_sparsity_report(self):
        moe = MoEBlockInt8.from_random(n_experts=2, sparsity=0.8, seed=0)
        rep = moe.sparsity_report()
        assert len(rep) == 2 and all(0.7 < v < 0.9 for v in rep.values())
