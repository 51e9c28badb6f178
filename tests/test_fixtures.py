"""Fixture generator tests (sw/tests/test_exporters.py parity)."""

import numpy as np
import pytest

from resnet_accel_tpu.golden import bsr_matmul_int8_wt, matmul_int8
from resnet_accel_tpu.sparse import load_layer_dir, load_layer_scales_bias
from resnet_accel_tpu.sparse.fixtures import (
    create_sparse_mask,
    make_sparse_weight,
    export_fixture,
    generate_all_fixtures,
)


class TestSparseMask:
    @pytest.mark.parametrize("sparsity", [0.0, 0.5, 0.8, 0.9, 1.0])
    def test_exact_sparsity(self, sparsity):
        mask = create_sparse_mask((128, 512), 8, sparsity, seed=0)
        nbr, nbc = 16, 64
        blocks = mask.reshape(nbr, 8, nbc, 8).all(axis=(1, 3))
        got = 1.0 - blocks.mean()
        assert abs(got - sparsity) < 1.5 / (nbr * nbc) + 1e-9

    def test_seed_reproducible(self):
        a = create_sparse_mask((64, 64), 8, 0.5, seed=3)
        b = create_sparse_mask((64, 64), 8, 0.5, seed=3)
        np.testing.assert_array_equal(a, b)
        c = create_sparse_mask((64, 64), 8, 0.5, seed=4)
        assert not np.array_equal(a, c)

    def test_block_alignment(self):
        mask = create_sparse_mask((64, 64), 8, 0.5, seed=0)
        t = mask.reshape(8, 8, 8, 8)
        # every 8x8 block is uniformly kept or dropped
        per_block = t.transpose(0, 2, 1, 3).reshape(64, 64)
        for blk in per_block:
            assert blk.all() or not blk.any()

    def test_non_divisible_shape(self):
        mask = create_sparse_mask((30, 50), 8, 0.5, seed=0)
        assert mask.shape == (30, 50)


class TestExport:
    def test_fixture_roundtrip(self, tmp_path):
        w = make_sparse_weight((64, 128), 8, 0.75, seed=1)
        export_fixture("t", w, str(tmp_path), 8)
        bsr = load_layer_dir(str(tmp_path))
        bsr.validate()
        assert abs(bsr.sparsity_pct - 75.0) < 2.0
        scales, bias = load_layer_scales_bias(str(tmp_path))
        assert scales.shape == (64,) and bias.shape == (64,)
        # Artifact runs through the golden sparse GEMM.
        act = np.ones((1, 128), np.int8)
        out = bsr_matmul_int8_wt(act, bsr.data, bsr.row_ptr, bsr.col_idx,
                                 8, 8)
        assert out.shape == (1, 64)

    def test_generate_all(self, tmp_path):
        made = generate_all_fixtures(str(tmp_path), seed=0)
        assert len(made) == 12
        fc = load_layer_dir(str(tmp_path / "mlp" / "fc_9216_128"))
        assert 85 < fc.sparsity_pct < 95
        tr = load_layer_dir(str(tmp_path / "transformer" / "80pct" / "q"))
        assert 75 < tr.sparsity_pct < 85
