"""Verify our loaders + goldens against the reference's checked-in artifacts.

These are the reference's own exported data (data/bsr_export_14x14,
data/fixtures, data/int8) used as free test vectors — the same role they
play for its Verilator e2e test (hw/sim/test_mnist_bsr.cpp load_bsr_layer).
"""

import json
import os

import numpy as np
import pytest

from resnet_accel_tpu.golden import bsr_matmul_int8_wt, matmul_int8
from resnet_accel_tpu.sparse import load_layer_dir, load_layer_scales_bias

from conftest import requires_reference_data, REFERENCE_DATA


@requires_reference_data
class TestBsrExport14x14:
    def test_fc1_loads_and_matches_meta(self):
        d = os.path.join(REFERENCE_DATA, "bsr_export_14x14/fc1")
        bsr = load_layer_dir(d)
        meta = json.load(open(os.path.join(d, "weights.meta.json")))
        assert bsr.nnz_blocks == meta["num_blocks"] == 6590
        assert bsr.block_h == bsr.block_w == 14
        assert list(bsr.padded_shape) == meta["padded_shape"]
        assert bsr.num_block_rows == meta["num_block_rows"]
        bsr.validate()

    def test_fc1_golden_gemm_matches_dense_reconstruction(self):
        d = os.path.join(REFERENCE_DATA, "bsr_export_14x14/fc1")
        bsr = load_layer_dir(d)
        K = bsr.padded_shape[1]
        # The reference e2e test's activation pattern (test_mnist_bsr.cpp
        # / golden_fc1_test.py:130-134): (i % 256) - 128.
        act = ((np.arange(K) % 256) - 128).astype(np.int8).reshape(1, K)
        C = bsr_matmul_int8_wt(act, bsr.data, bsr.row_ptr, bsr.col_idx,
                               14, 14)
        W = bsr.to_dense(padded=True)
        expected = matmul_int8(act, W.T.astype(np.int8))
        np.testing.assert_array_equal(C, expected)
        assert np.any(C != 0)

    @pytest.mark.parametrize("layer", ["conv1", "conv2", "fc2"])
    def test_other_layers_load(self, layer):
        d = os.path.join(REFERENCE_DATA, "bsr_export_14x14", layer)
        bsr = load_layer_dir(d)
        bsr.validate()
        assert bsr.nnz_blocks > 0


@requires_reference_data
class TestFixtures:
    @pytest.mark.parametrize("rel", [
        "fixtures/mlp/fc_9216_128",
        "fixtures/mlp/fc_512_128",
        "fixtures/conv/conv_32_64_k3",
        "fixtures/transformer/90pct",
    ])
    def test_fixture_loads(self, rel):
        d = os.path.join(REFERENCE_DATA, rel)
        if not os.path.isdir(d):
            # transformer fixtures nest per-matrix dirs
            subs = [os.path.join(d, s) for s in sorted(os.listdir(
                os.path.dirname(d))) if False]
            pytest.skip(f"{rel} not present")
        metas = []
        if os.path.isfile(os.path.join(d, "weights.meta.json")):
            dirs = [d]
        else:
            dirs = [os.path.join(d, s) for s in sorted(os.listdir(d))
                    if os.path.isfile(os.path.join(d, s, "weights.meta.json"))]
        assert dirs, f"no fixture dirs under {rel}"
        for fd in dirs:
            bsr = load_layer_dir(fd)
            bsr.validate()
            meta = json.load(open(os.path.join(fd, "weights.meta.json")))
            assert abs(bsr.sparsity_pct - meta["sparsity_pct"]) < 1e-6
            metas.append(meta)

    def test_fixture_sparsity_level(self):
        d = os.path.join(REFERENCE_DATA, "fixtures/mlp/fc_9216_128")
        bsr = load_layer_dir(d)
        # The 90% fixture should be ~90% block sparse.
        assert 85.0 < bsr.sparsity_pct < 95.0

    def test_fixture_scales_bias(self):
        d = os.path.join(REFERENCE_DATA, "fixtures/mlp/fc_9216_128")
        scales, bias = load_layer_scales_bias(d)
        assert scales is not None and scales.shape == (128,)
        assert bias is not None and bias.shape == (128,)


@requires_reference_data
class TestInt8Export:
    def test_mnist_int8_weights_load(self):
        d = os.path.join(REFERENCE_DATA, "int8")
        for layer, shape in [
            ("conv1", (32, 1, 3, 3)), ("conv2", (64, 32, 3, 3)),
            ("fc1", (128, 9216)), ("fc2", (10, 128)),
        ]:
            w = np.load(os.path.join(d, f"{layer}_weight_int8.npy"))
            s = np.load(os.path.join(d, f"{layer}_weight_scales.npy"))
            assert w.shape == shape and w.dtype == np.int8
            assert s.shape == (shape[0],)
            # Per-channel symmetric: every channel should use its range.
            assert np.abs(w.reshape(shape[0], -1)).max(axis=1).min() >= 100
