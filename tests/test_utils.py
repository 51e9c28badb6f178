"""Utils tests: systolic simulator, checkpoint manager, tile math."""

import numpy as np
import pytest

from resnet_accel_tpu.config import cdiv, round_up
from resnet_accel_tpu.utils.systolic_sim import (
    simulate_ws_array,
    skew_activations,
    verify_wavefront_latency,
)
from resnet_accel_tpu.train.checkpoint import (
    CheckpointManager, HAS_ORBAX, save_orbax, load_orbax)


class TestTileMath:
    def test_cdiv(self):
        assert cdiv(10, 3) == 4 and cdiv(9, 3) == 3 and cdiv(1, 128) == 1

    def test_round_up(self):
        assert round_up(100, 128) == 128 and round_up(128, 128) == 128


class TestSystolicSim:
    def test_bit_exact_vs_matmul(self):
        rng = np.random.default_rng(0)
        A = rng.integers(-128, 128, (8, 20)).astype(np.int8)
        B = rng.integers(-128, 128, (20, 12)).astype(np.int8)
        res = simulate_ws_array(A, B, rows=16, cols=16)
        np.testing.assert_array_equal(
            res.output, A.astype(np.int64) @ B.astype(np.int64))

    def test_wavefront_latency(self):
        assert verify_wavefront_latency(16, 16)
        res = simulate_ws_array(
            np.ones((4, 4), np.int8), np.ones((4, 4), np.int8),
            rows=16, cols=16)
        assert res.wavefront_latency == 30

    def test_skew_shape(self):
        s = skew_activations(np.ones((4, 10), np.int8), 16)
        assert s.shape == (25, 16)
        assert s[0, 0] == 1 and s[0, 1] == 0  # row 1 delayed

    def test_tile_too_big(self):
        with pytest.raises(ValueError):
            simulate_ws_array(np.ones((20, 4), np.int8),
                              np.ones((4, 4), np.int8), rows=16, cols=16)


class TestCheckpoint:
    def test_manager_npz_roundtrip(self, tmp_path, monkeypatch):
        # Force npz fallback path regardless of orbax availability.
        import resnet_accel_tpu.train.checkpoint as ckpt
        monkeypatch.setattr(ckpt, "HAS_ORBAX", False)
        mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
        mgr._mgr = None
        tree = {"w": np.arange(6, dtype=np.float32)}
        mgr.save(1, tree)
        mgr.save(2, {"w": np.arange(6, dtype=np.float32) * 2})
        assert mgr.latest_step() == 2
        out = mgr.restore()
        np.testing.assert_array_equal(out["w"], tree["w"] * 2)

    @pytest.mark.skipif(not HAS_ORBAX, reason="orbax not installed")
    def test_orbax_roundtrip(self, tmp_path):
        tree = {"params": {"w": np.ones((3, 3), np.float32)},
                "step": np.int32(7)}
        path = str(tmp_path / "ob")
        save_orbax(path, tree)
        out = load_orbax(path)
        np.testing.assert_array_equal(out["params"]["w"],
                                      tree["params"]["w"])
