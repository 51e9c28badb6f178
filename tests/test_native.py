"""Cross-language parity: the C++ native runtime vs the numpy goldens.

Mirrors the reference's dual C++/Python golden discipline: the same
inputs through both implementations must agree bit-for-bit.  Skips when
the library isn't built (make -C native).
"""

import os
import subprocess

import numpy as np
import pytest

from resnet_accel_tpu import golden, native
from resnet_accel_tpu.sparse import build_bsr_int8_direct, serialize_hw_stream

needs_native = pytest.mark.skipif(
    not native.is_available(),
    reason="native library not built (make -C native)")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAT_TOOL = os.path.join(REPO, "native", "build", "rat_tool")


@needs_native
class TestNativeGoldenParity:
    def test_self_test(self):
        assert native.self_test() == 0
        assert "native" in native.version()

    def test_matmul(self):
        rng = np.random.default_rng(0)
        A = rng.integers(-128, 128, (7, 33)).astype(np.int8)
        B = rng.integers(-128, 128, (33, 12)).astype(np.int8)
        np.testing.assert_array_equal(
            native.matmul_int8(A, B), golden.matmul_int8(A, B))

    def test_bsr_matmul_wt(self):
        rng = np.random.default_rng(1)
        W = rng.integers(-128, 128, (42, 70)).astype(np.int8)
        W[0:14, 14:42] = 0
        A = rng.integers(-128, 128, (3, 70)).astype(np.int8)
        bsr = build_bsr_int8_direct(W, 14)
        got = native.bsr_matmul_int8_wt(
            A, bsr.data, bsr.row_ptr, bsr.col_idx, 14, 14, 42)
        exp = golden.bsr_matmul_int8_wt(
            A, bsr.data, bsr.row_ptr, bsr.col_idx, 14, 14, N=42)
        np.testing.assert_array_equal(got, exp)

    def test_requantize(self):
        rng = np.random.default_rng(2)
        x = rng.integers(-(2**20), 2**20, 1000).astype(np.int32)
        got = native.requantize_int32_to_int8(x, 0.013, 0.07)
        exp = golden.requantize_int32_to_int8(x, 0.013, 0.07)
        np.testing.assert_array_equal(got, exp)

    def test_requantize_q16(self):
        rng = np.random.default_rng(21)
        x = rng.integers(-(2**31), 2**31, 4096).astype(np.int64)
        x = np.concatenate(
            [x, [2**31 - 1, -(2**31), 0, -1, -65537]]).astype(np.int32)
        for s in [0x0001, 0x8000, 0xFFFF, 0x18000]:
            for relu in (False, True):
                got = native.requantize_q16(x, s, relu=relu)
                exp = golden.requantize_q16(x, s, relu=relu)
                np.testing.assert_array_equal(got, exp)

    def test_residual(self):
        rng = np.random.default_rng(3)
        m = rng.integers(-128, 128, 512).astype(np.int8)
        r = rng.integers(-128, 128, 512).astype(np.int8)
        got = native.add_residual_int8(m, r, 0.03, 0.05, 0.04)
        exp = golden.add_residual_int8(m, r, 0.03, 0.05, 0.04)
        np.testing.assert_array_equal(got, exp)

    def test_pools(self):
        rng = np.random.default_rng(4)
        x = rng.integers(-128, 128, (3, 9, 9)).astype(np.int8)
        np.testing.assert_array_equal(
            native.maxpool2d_int8(x, 3, 2, 1),
            golden.maxpool2d_int8(x, 3, 2, padding=1))
        np.testing.assert_array_equal(
            native.avgpool_global_int8(x), golden.avgpool_global_int8(x))

    def test_conv(self):
        rng = np.random.default_rng(5)
        x = rng.integers(-128, 128, (3, 8, 8)).astype(np.int8)
        w = rng.integers(-128, 128, (6, 3, 3, 3)).astype(np.int8)
        b = rng.integers(-500, 500, 6).astype(np.int32)
        np.testing.assert_array_equal(
            native.conv2d_int8(x, w, b, 1, 1),
            golden.conv2d_int8_simple(x, w, b, 1, 1))

    def test_bsr_pack_matches_python_packer(self):
        rng = np.random.default_rng(6)
        W = rng.integers(-128, 128, (60, 90)).astype(np.int8)
        W[14:28] = 0
        blocks, row_ptr, col_idx = native.bsr_pack(W, 14, 14)
        bsr = build_bsr_int8_direct(W, 14)
        np.testing.assert_array_equal(blocks, bsr.data)
        np.testing.assert_array_equal(row_ptr, bsr.row_ptr)
        np.testing.assert_array_equal(col_idx, bsr.col_idx)

    def test_hw_stream_matches_python(self):
        rng = np.random.default_rng(7)
        W = rng.integers(-128, 128, (28, 56)).astype(np.int8)
        bsr = build_bsr_int8_direct(W, 14)
        got = native.bsr_serialize_hw(
            bsr.data, bsr.row_ptr, bsr.col_idx, bsr.num_block_cols)
        assert got == serialize_hw_stream(bsr)


@pytest.mark.skipif(not os.path.isfile(RAT_TOOL),
                    reason="rat_tool not built")
class TestRatTool:
    def test_pack_golden_roundtrip(self, tmp_path):
        rng = np.random.default_rng(8)
        W = rng.integers(-128, 128, (28, 42)).astype(np.int8)
        W[14:28, 0:14] = 0
        wpath = str(tmp_path / "w.npy")
        np.save(wpath, W)
        out = subprocess.run(
            [RAT_TOOL, "pack", "--input", wpath, "--output",
             str(tmp_path)],
            capture_output=True, text=True)
        assert out.returncode == 0, out.stderr
        assert "packed" in out.stdout

        # golden subcommand on the packed artifact matches python golden.
        gout = subprocess.run(
            [RAT_TOOL, "golden", "--artifact", str(tmp_path),
             "--output", str(tmp_path / "g.npy")],
            capture_output=True, text=True)
        assert gout.returncode == 0, gout.stderr
        got = np.load(tmp_path / "g.npy")

        from resnet_accel_tpu.sparse import load_layer_dir  # noqa: F401
        K = 42
        act = ((np.arange(K) % 256) - 128).astype(np.int8).reshape(1, K)
        bsr = build_bsr_int8_direct(W, 14)
        exp = golden.bsr_matmul_int8_wt(
            act, bsr.data, bsr.row_ptr, bsr.col_idx, 14, 14)
        np.testing.assert_array_equal(got, exp)

    def test_unpack_roundtrip(self, tmp_path):
        rng = np.random.default_rng(9)
        W = rng.integers(-128, 128, (28, 28)).astype(np.int8)
        np.save(str(tmp_path / "w.npy"), W)
        subprocess.run([RAT_TOOL, "pack", "--input",
                        str(tmp_path / "w.npy"), "--output",
                        str(tmp_path)], check=True, capture_output=True)
        subprocess.run([RAT_TOOL, "unpack", "--artifact", str(tmp_path),
                        "--output", str(tmp_path / "back.npy")],
                       check=True, capture_output=True)
        back = np.load(tmp_path / "back.npy")
        np.testing.assert_array_equal(back, W)


@needs_native
class TestBatchLoader:
    def _make(self, **kw):
        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 256, (17, 1, 4, 4)).astype(np.uint8)
        labs = np.arange(17, dtype=np.int32)
        args = dict(batch=4, mean=[0.1307], std=[0.3081],
                    quant_scale=0.02, shuffle=False, seed=9,
                    n_threads=2, depth=2)
        args.update(kw)
        return imgs, labs, native.BatchLoader(imgs, labs, **args)

    def test_matches_numpy_reference(self):
        imgs, labs, ld = self._make()
        with ld:
            x, y = ld.next()
            ref = np.clip(np.rint(
                ((imgs[:4] / 255.0) - 0.1307) / 0.3081 / 0.02),
                -128, 127).astype(np.int8)
            np.testing.assert_array_equal(x, ref)
            np.testing.assert_array_equal(y, labs[:4])
            assert ld.batches_per_epoch == 4  # drop-last: 17 // 4

    def test_thread_count_invariant_stream(self):
        _, _, a = self._make(shuffle=True, n_threads=1, depth=2)
        _, _, b = self._make(shuffle=True, n_threads=4, depth=3)
        with a, b:
            for _ in range(9):  # crosses two epoch boundaries
                xa, ya = a.next()
                xb, yb = b.next()
                np.testing.assert_array_equal(xa, xb)
                np.testing.assert_array_equal(ya, yb)

    def test_shuffle_covers_epoch(self):
        _, labs, ld = self._make(shuffle=True)
        with ld:
            seen = []
            for _ in range(ld.batches_per_epoch):
                _, y = ld.next()
                seen.extend(y.tolist())
        assert len(set(seen)) == len(seen)  # a permutation prefix
        assert set(seen) <= set(labs.tolist())

    def test_different_seeds_differ(self):
        _, _, a = self._make(shuffle=True, seed=1)
        _, _, b = self._make(shuffle=True, seed=2)
        with a, b:
            ya = np.concatenate([a.next()[1] for _ in range(3)])
            yb = np.concatenate([b.next()[1] for _ in range(3)])
        assert not np.array_equal(ya, yb)

    def test_invalid_config_raises(self):
        imgs = np.zeros((4, 1, 2, 2), np.uint8)
        with pytest.raises(ValueError):
            native.BatchLoader(imgs, None, batch=5, mean=[0.0],
                               std=[1.0], quant_scale=0.1)
