"""Head (tensor) parallel transformer block vs single device."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from resnet_accel_tpu.models.transformer import TransformerBlockInt8
from resnet_accel_tpu.parallel.heads import make_tp_transformer_forward


@pytest.fixture(scope="module")
def cpu_devs():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need 4 virtual CPU devices")
    return devs


@pytest.fixture(scope="module")
def block():
    return TransformerBlockInt8.from_random(
        d_model=128, n_heads=4, d_ff=256, sparsity=0.7, block=8, seed=5)


class TestHeadParallel:
    @pytest.mark.parametrize("tp", [2, 4])
    def test_matches_single_device(self, cpu_devs, block, tp):
        # Integer decisions are exact; the residual is fp32
        # reassociation across compilations (documented FMA behavior).
        mesh = Mesh(np.array(cpu_devs[:tp]), ("tp",))
        fwd = make_tp_transformer_forward(mesh, block)
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (12, 128)).astype(np.float32)
        got = np.asarray(fwd(jnp.asarray(x)))
        want = np.asarray(block(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_heads_not_divisible_raises(self, cpu_devs, block):
        mesh = Mesh(np.array(cpu_devs[:3]), ("tp",))
        with pytest.raises(ValueError, match="divisible"):
            make_tp_transformer_forward(mesh, block)

    def test_requires_tp_axis(self, cpu_devs, block):
        mesh = Mesh(np.array(cpu_devs[:2]), ("dp",))
        with pytest.raises(ValueError, match="'tp' axis"):
            make_tp_transformer_forward(mesh, block)
