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


class TestHeadParallelDecode:
    """tp-sharded CACHED decode (the multi-chip serving layout): each
    rank holds its heads' KV slice; one int32 psum per projection."""

    @pytest.mark.parametrize("tp", [2, 4])
    def test_matches_single_device_decode(self, cpu_devs, block, tp):
        from resnet_accel_tpu.parallel.heads import make_tp_decode_step
        rng = np.random.default_rng(0)
        x_seq = rng.normal(0, 1, (10, 128)).astype(np.float32)
        scales = block.calibrate_scales(x_seq)
        mesh = Mesh(np.array(cpu_devs[:tp]), ("tp",))
        init, step = make_tp_decode_step(mesh, block, scales,
                                         max_len=16)
        cache_tp, cache_ref = init(), block.init_cache(16)
        for t in range(10):
            xt = jnp.asarray(x_seq[t:t + 1])
            y_tp, cache_tp = step(cache_tp, xt)
            y_ref, cache_ref = block.decode_step(cache_ref, xt, scales)
            # fp32 K/V caches agree to reassociation noise; the output
            # tolerance admits the documented +-1 int8 LSB rint-tie
            # class (a 1e-7 fp difference can flip one quantized
            # activation, worth one dequant step ~5e-3 here)
            np.testing.assert_allclose(
                np.asarray(cache_tp["k"]), np.asarray(cache_ref["k"]),
                rtol=0, atol=2e-5)
            np.testing.assert_allclose(np.asarray(y_tp),
                                       np.asarray(y_ref),
                                       rtol=0, atol=1e-2)
        assert int(cache_tp["len"]) == 10

    def test_kv_cache_is_sharded(self, cpu_devs, block):
        from resnet_accel_tpu.parallel.heads import make_tp_decode_step
        rng = np.random.default_rng(0)
        scales = block.calibrate_scales(
            rng.normal(0, 1, (8, 128)).astype(np.float32))
        mesh = Mesh(np.array(cpu_devs[:4]), ("tp",))
        init, _ = make_tp_decode_step(mesh, block, scales, max_len=16)
        cache = init()
        # each device holds 1/tp of the KV features
        shard_shapes = {s.data.shape
                        for s in cache["k"].addressable_shards}
        assert shard_shapes == {(16, 128 // 4)}


class TestFullLMTensorParallel:
    """make_tp_lm_generate: the FULL LM (embedding -> N blocks with
    per-rank KV -> tied readout) tp-sharded, token-identical to the
    single-device generate; plus the dp x tp batched-serving
    composition."""

    @pytest.fixture(scope="class")
    def lm(self):
        from resnet_accel_tpu.models.lm import TransformerLMInt8
        model = TransformerLMInt8.from_random(
            seed=3, vocab=47, d_model=64, n_heads=4, n_layers=2,
            d_ff=128, max_len=32, sparsity=0.5)
        rng = np.random.default_rng(2)
        scales = model.calibrate(rng.integers(0, 47, 20))
        return model, scales

    @pytest.mark.parametrize("tp", [2, 4])
    def test_tokens_match_single_device(self, cpu_devs, lm, tp):
        from resnet_accel_tpu.parallel.heads import make_tp_lm_generate
        model, scales = lm
        mesh = Mesh(np.array(cpu_devs[:tp]), ("tp",))
        gen = make_tp_lm_generate(mesh, model, scales, n_new=8)
        prompt = np.array([5, 9, 2, 11, 7], np.int32)
        got = np.asarray(gen(prompt))
        want = np.asarray(model.generate(prompt, 8, scales, jit=True))
        np.testing.assert_array_equal(got, want)

    def test_dp_tp_batched_serving_step(self, cpu_devs, lm):
        from resnet_accel_tpu.parallel.heads import make_tp_lm_generate
        if len(jax.devices("cpu")) < 4:
            pytest.skip("need 4 devices for dp2 x tp2")
        model, scales = lm
        mesh = Mesh(np.array(jax.devices("cpu")[:4]).reshape(2, 2),
                    ("dp", "tp"))
        gen = make_tp_lm_generate(mesh, model, scales, n_new=6,
                                  batched=True)
        prompts = np.array([[5, 9, 2, 11], [3, 3, 8, 1],
                            [7, 0, 40, 2], [12, 12, 12, 12]], np.int32)
        got = np.asarray(gen(prompts))                  # [4, 6]
        for b in range(4):
            want = np.asarray(model.generate(prompts[b], 6, scales,
                                             jit=True))
            np.testing.assert_array_equal(got[b], want, err_msg=str(b))

    def test_validation(self, cpu_devs, lm):
        from resnet_accel_tpu.parallel.heads import make_tp_lm_generate
        model, scales = lm
        mesh = Mesh(np.array(cpu_devs[:2]), ("dp",))
        with pytest.raises(ValueError, match="'tp' axis"):
            make_tp_lm_generate(mesh, model, scales, n_new=4)
        mesh = Mesh(np.array(cpu_devs[:2]), ("tp",))
        with pytest.raises(ValueError, match="'dp' axis"):
            make_tp_lm_generate(mesh, model, scales, n_new=4,
                                batched=True)
        with pytest.raises(ValueError, match="position table"):
            make_tp_lm_generate(mesh, model, scales, n_new=4,
                                max_len=999)
