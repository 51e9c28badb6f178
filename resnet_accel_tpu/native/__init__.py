"""ctypes bindings for the native host runtime (native/libresnet_accel.so).

The compute path of the framework is JAX/XLA/Pallas; this module binds the
C++ host-side library (golden models, BSR packer, serializers, arena) for
cross-language verification and fast artifact preparation.  Build with
``make -C native``.  All entry points verify availability first —
``is_available()`` — and tests skip gracefully when the library isn't
built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    "native", "build", "libresnet_accel.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.isfile(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    c = ctypes
    i8p, i32p, f32p, u8p = (
        c.POINTER(c.c_int8), c.POINTER(c.c_int32),
        c.POINTER(c.c_float), c.POINTER(c.c_uint8))
    i64 = c.c_int64
    sigs = {
        "rat_matmul_int8": (None, [i8p, i8p, i32p, i64, i64, i64]),
        "rat_bsr_matmul_int8": (
            None, [i8p, i8p, i32p, i32p, i32p, i64, i64, i64, i64, i64,
                   i64]),
        "rat_bsr_matmul_int8_wt": (
            None, [i8p, i8p, i32p, i32p, i32p, i64, i64, i64, i64, i64,
                   i64]),
        "rat_relu_int8": (None, [i8p, i64]),
        "rat_requantize_int32_to_int8": (
            None, [i32p, i8p, i64, c.c_float, c.c_float]),
        "rat_requantize_q16": (
            None, [i32p, i8p, i64, c.c_uint32, c.c_int]),
        "rat_requantize_per_channel": (
            None, [i32p, i8p, i64, f32p, i64, i64]),
        "rat_add_residual_int8": (
            None, [i8p, i8p, i8p, i64, c.c_float, c.c_float, c.c_float]),
        "rat_maxpool2d_int8": (
            None, [i8p, i8p, i64, i64, i64, i64, i64, i64]),
        "rat_avgpool_global_int8": (None, [i8p, i8p, i64, i64, i64]),
        "rat_im2col_int8": (
            None, [i8p, i8p, i64, i64, i64, i64, i64, i64]),
        "rat_conv2d_int8": (
            None, [i8p, i8p, i32p, i32p, i64, i64, i64, i64, i64, i64,
                   i64]),
        "rat_bsr_pack_count": (i64, [i8p, i64, i64, i64, i64]),
        "rat_bsr_pack_fill": (
            i64, [i8p, i64, i64, i64, i64, i8p, i32p, i32p]),
        "rat_bsr_unpack": (
            None, [i8p, i32p, i32p, i8p, i64, i64, i64, i64]),
        "rat_bsr_serialize_hw_size": (i64, [i64, i64, i64, i64]),
        "rat_bsr_serialize_hw": (
            i64, [i8p, i32p, i32p, u8p, i64, i64, i64, i64, i64]),
        "rat_loader_create": (
            c.c_void_p, [u8p, i64, i64, i32p, i64, i64, f32p, f32p,
                         c.c_float, c.c_int, c.c_uint64, c.c_int,
                         c.c_int]),
        "rat_loader_next": (i64, [c.c_void_p, i8p, i32p]),
        "rat_loader_batches_per_epoch": (i64, [c.c_void_p]),
        "rat_loader_destroy": (None, [c.c_void_p]),
        "rat_self_test": (c.c_int, []),
        "rat_version": (c.c_char_p, []),
    }
    for name, (res, args) in sigs.items():
        fn = getattr(lib, name)
        fn.restype = res
        fn.argtypes = args
    _LIB = lib
    return lib


def is_available() -> bool:
    return _load() is not None


def version() -> str:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    return lib.rat_version().decode()


def self_test() -> int:
    return _load().rat_self_test()


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def matmul_int8(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, np.int8)
    b = np.ascontiguousarray(b, np.int8)
    m, k = a.shape
    _, n = b.shape
    c = np.zeros((m, n), np.int32)
    lib.rat_matmul_int8(_p(a, ctypes.c_int8), _p(b, ctypes.c_int8),
                        _p(c, ctypes.c_int32), m, k, n)
    return c


def bsr_matmul_int8_wt(a, blocks, row_ptr, col_idx, bh, bw, n_out):
    lib = _load()
    a = np.ascontiguousarray(a, np.int8)
    blocks = np.ascontiguousarray(blocks, np.int8)
    row_ptr = np.ascontiguousarray(row_ptr, np.int32)
    col_idx = np.ascontiguousarray(col_idx, np.int32)
    m, k = a.shape
    c = np.zeros((m, n_out), np.int32)
    lib.rat_bsr_matmul_int8_wt(
        _p(a, ctypes.c_int8), _p(blocks, ctypes.c_int8),
        _p(row_ptr, ctypes.c_int32), _p(col_idx, ctypes.c_int32),
        _p(c, ctypes.c_int32), m, k, n_out, bh, bw, len(row_ptr) - 1)
    return c


def requantize_int32_to_int8(x, in_scale, out_scale):
    lib = _load()
    x = np.ascontiguousarray(x, np.int32)
    out = np.empty(x.shape, np.int8)
    lib.rat_requantize_int32_to_int8(
        _p(x, ctypes.c_int32), _p(out, ctypes.c_int8), x.size,
        in_scale, out_scale)
    return out


def requantize_q16(x, scale_q16, relu=False):
    lib = _load()
    x = np.ascontiguousarray(x, np.int32)
    out = np.empty(x.shape, np.int8)
    lib.rat_requantize_q16(
        _p(x, ctypes.c_int32), _p(out, ctypes.c_int8), x.size,
        int(scale_q16) & 0xFFFFFFFF, int(bool(relu)))
    return out


def add_residual_int8(m, r, ms, rs, os_):
    lib = _load()
    m = np.ascontiguousarray(m, np.int8)
    r = np.ascontiguousarray(r, np.int8)
    out = np.empty(m.shape, np.int8)
    lib.rat_add_residual_int8(
        _p(m, ctypes.c_int8), _p(r, ctypes.c_int8),
        _p(out, ctypes.c_int8), m.size, ms, rs, os_)
    return out


def maxpool2d_int8(x, pool, stride, padding=0):
    lib = _load()
    x = np.ascontiguousarray(x, np.int8)
    c, h, w = x.shape
    ho = (h + 2 * padding - pool) // stride + 1
    wo = (w + 2 * padding - pool) // stride + 1
    out = np.empty((c, ho, wo), np.int8)
    lib.rat_maxpool2d_int8(_p(x, ctypes.c_int8), _p(out, ctypes.c_int8),
                           c, h, w, pool, stride, padding)
    return out


def avgpool_global_int8(x):
    lib = _load()
    x = np.ascontiguousarray(x, np.int8)
    c, h, w = x.shape
    out = np.empty(c, np.int8)
    lib.rat_avgpool_global_int8(_p(x, ctypes.c_int8),
                                _p(out, ctypes.c_int8), c, h, w)
    return out


def conv2d_int8(x, weight, bias, stride=1, padding=0):
    lib = _load()
    x = np.ascontiguousarray(x, np.int8)
    weight = np.ascontiguousarray(weight, np.int8)
    c_out, c_in, k, _ = weight.shape
    c, h, w = x.shape
    ho = (h + 2 * padding - k) // stride + 1
    wo = (w + 2 * padding - k) // stride + 1
    out = np.zeros((c_out, ho, wo), np.int32)
    bias_p = (_p(np.ascontiguousarray(bias, np.int32), ctypes.c_int32)
              if bias is not None else None)
    lib.rat_conv2d_int8(_p(x, ctypes.c_int8), _p(weight, ctypes.c_int8),
                        bias_p, _p(out, ctypes.c_int32), c_in, h, w,
                        c_out, k, stride, padding)
    return out


def bsr_pack(dense: np.ndarray, bh: int, bw: int
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """dense int8 [H, W] -> (blocks, row_ptr, col_idx)."""
    lib = _load()
    dense = np.ascontiguousarray(dense, np.int8)
    h, w = dense.shape
    nnz = lib.rat_bsr_pack_count(_p(dense, ctypes.c_int8), h, w, bh, bw)
    nbr = -(-h // bh)
    blocks = np.zeros((nnz, bh, bw), np.int8)
    row_ptr = np.zeros(nbr + 1, np.int32)
    col_idx = np.zeros(max(nnz, 1), np.int32)
    lib.rat_bsr_pack_fill(_p(dense, ctypes.c_int8), h, w, bh, bw,
                          _p(blocks, ctypes.c_int8),
                          _p(row_ptr, ctypes.c_int32),
                          _p(col_idx, ctypes.c_int32))
    return blocks, row_ptr, col_idx[:nnz]


def bsr_serialize_hw(blocks, row_ptr, col_idx, nbc):
    lib = _load()
    blocks = np.ascontiguousarray(blocks, np.int8)
    row_ptr = np.ascontiguousarray(row_ptr, np.int32)
    col_idx = np.ascontiguousarray(col_idx, np.int32)
    nnz, bh, bw = blocks.shape
    nbr = len(row_ptr) - 1
    size = lib.rat_bsr_serialize_hw_size(nnz, nbr, bh, bw)
    buf = np.zeros(size, np.uint8)
    written = lib.rat_bsr_serialize_hw(
        _p(blocks, ctypes.c_int8), _p(row_ptr, ctypes.c_int32),
        _p(col_idx, ctypes.c_int32), _p(buf, ctypes.c_uint8),
        nnz, nbr, nbc, bh, bw)
    if written < 0:
        raise ValueError("hw stream: u16 overflow")
    return buf.tobytes()


class BatchLoader:
    """Threaded native batch loader (act_dma / ping-pong buffer analog).

    Background C++ workers gather, normalize and INT8-quantize batches
    into a bounded ring ahead of the consumer:

        out = clip(rint(((u8/255) - mean[c]) / std[c] / quant_scale))

    Deterministic: batch j depends only on (seed, j); delivery is in
    sequence order regardless of thread count.  Drop-last semantics.
    """

    def __init__(self, images_u8: np.ndarray, labels, batch: int,
                 mean, std, quant_scale: float, shuffle: bool = True,
                 seed: int = 0, n_threads: int = 2, depth: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        imgs = np.ascontiguousarray(images_u8, np.uint8)
        if imgs.ndim < 2:
            raise ValueError("images must be [n, ...]")
        n = imgs.shape[0]
        self.item_shape = imgs.shape[1:]
        item_len = int(np.prod(self.item_shape))
        channels = int(np.asarray(mean).size)
        mean_f = np.ascontiguousarray(mean, np.float32).reshape(-1)
        std_f = np.ascontiguousarray(std, np.float32).reshape(-1)
        lab = None
        lab_p = None
        self.has_labels = labels is not None
        if labels is not None:
            lab = np.ascontiguousarray(labels, np.int32)
            lab_p = _p(lab, ctypes.c_int32)
        self._lib = lib
        self._h = lib.rat_loader_create(
            _p(imgs.reshape(n, item_len), ctypes.c_uint8), n, item_len,
            lab_p, batch, channels, _p(mean_f, ctypes.c_float),
            _p(std_f, ctypes.c_float), ctypes.c_float(quant_scale),
            int(shuffle), seed, n_threads, depth)
        if not self._h:
            raise ValueError("invalid loader configuration")
        self.batch = batch
        self.item_len = item_len
        self.batches_per_epoch = int(
            lib.rat_loader_batches_per_epoch(self._h))

    def next(self):
        """Returns (images int8 [batch, *item_shape], labels int32)."""
        out = np.empty((self.batch, self.item_len), np.int8)
        lab = np.empty(self.batch, np.int32)
        seq = self._lib.rat_loader_next(
            self._h, _p(out, ctypes.c_int8), _p(lab, ctypes.c_int32))
        if seq < 0:
            raise RuntimeError("loader next failed")
        return out.reshape((self.batch,) + self.item_shape), lab

    def close(self):
        if getattr(self, "_h", None):
            self._lib.rat_loader_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
