"""Sparse ResNet-18 serving: block-pruned weights through the zero-skip
kernel, bit-exact vs the dense compute on the same (pruned) weights."""

import numpy as np
import jax.numpy as jnp
import pytest

from resnet_accel_tpu.models.resnet18 import (
    attach_bsr,
    init_resnet18_fp32,
    make_forward,
    forward_golden,
    prune_params_blockwise,
    quantize_resnet18,
)


@pytest.fixture(scope="module")
def sparse_model():
    params = init_resnet18_fp32(seed=0, num_classes=10, small_input=True)
    pruned = prune_params_blockwise(params, sparsity=0.7, block=64)
    rng = np.random.default_rng(1)
    calib = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    model = quantize_resnet18(pruned, calib, 10, small_input=True)
    sparse = attach_bsr(model, block=64, min_sparsity=0.25, chunk=8)
    return model, sparse


class TestSparseResnet:
    def test_bsr_attached_where_sparse(self, sparse_model):
        _, sparse = sparse_model
        rep = sparse.sparsity_report()
        assert len(rep) >= 8, f"only {len(rep)} sparse layers: {rep}"
        assert all(0.25 <= v <= 0.95 for v in rep.values())
        # stem stays dense (never pruned)
        assert "stem" not in rep

    def test_pruning_actually_zeroed_blocks(self, sparse_model):
        model, _ = sparse_model
        w = model.blocks[3].conv2.w2d  # [O, I*9]
        # At 70% target, most 64x64 blocks of this layer are zero.
        t = w[:w.shape[0] // 64 * 64, :w.shape[1] // 64 * 64]
        t = t.reshape(t.shape[0] // 64, 64, t.shape[1] // 64, 64)
        zero_frac = (np.abs(t).sum(axis=(1, 3)) == 0).mean()
        assert zero_frac > 0.4

    def test_sparse_forward_bit_exact_vs_dense_forward(self, sparse_model):
        model, sparse = sparse_model
        rng = np.random.default_rng(2)
        x = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
        dense_out = np.asarray(make_forward(model, use_pallas=True)(
            model.as_device_params(), jnp.asarray(x)))
        sparse_out = np.asarray(make_forward(sparse, use_pallas=True)(
            sparse.as_device_params(), jnp.asarray(x)))
        np.testing.assert_array_equal(sparse_out, dense_out)

    def test_sparse_forward_bit_exact_vs_golden(self, sparse_model):
        _, sparse = sparse_model
        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, (1, 3, 32, 32)).astype(np.float32)
        got = np.asarray(make_forward(sparse, use_pallas=True)(
            sparse.as_device_params(), jnp.asarray(x)))
        exp = forward_golden(sparse, x)
        np.testing.assert_array_equal(got, exp)

    def test_engine_reports_sparsity(self, sparse_model):
        _, sparse = sparse_model
        from resnet_accel_tpu.runtime import InferenceEngine
        eng = InferenceEngine(sparse, make_forward, backend="cpu")
        rep = eng.get_model_sparsity()
        assert rep and all(isinstance(v, float) for v in rep.values())
