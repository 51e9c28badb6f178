"""Real-TPU measurement sweep: resident-GEMM tiles + strided sparse conv.

Run on the tunneled chip (background; each program compiles remotely in
40-90 s):

    python tools/tune_tpu.py [gemm|conv|all]

Prints one JSON line per measurement so results can be grepped into
docs.  Uses runtime.perf.measure_chained to subtract the ~1 ms
per-dispatch relay latency.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from resnet_accel_tpu.ops.matmul_int8 import matmul_int8  # noqa: E402
from resnet_accel_tpu.ops.sparse_conv import (  # noqa: E402
    pack_conv_bsr, sparse_conv2d_int8)
from resnet_accel_tpu.ops.conv import conv2d_int8  # noqa: E402
from resnet_accel_tpu.runtime.perf import measure_chained  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def sweep_gemm():
    rng = np.random.default_rng(0)
    shapes = [(2048, 2048, 2048), (4096, 4096, 4096)]
    f = np.float32(0.001)
    for (M, K, N) in shapes:
        a = jnp.asarray(rng.integers(-128, 128, (M, K)), jnp.int8)
        b = jnp.asarray(rng.integers(-128, 128, (K, N)), jnp.int8)
        for tm in (128, 256, 512):
            for tk in (256, 512, 1024):
                def fn(x, tm=tm, tk=tk):
                    return matmul_int8(x, b, factors=f, tile_m=tm,
                                       tile_k=tk)

                def fb(prev, out):
                    # int8 out feeds back as next A (data dependency)
                    return out[:, :K] if out.shape[1] >= K else jnp.pad(
                        out, ((0, 0), (0, K - out.shape[1])))

                try:
                    t = measure_chained(fn, a, fb, chain=16)
                except Exception as e:  # noqa: BLE001
                    emit(kind="gemm", M=M, K=K, N=N, tile_m=tm,
                         tile_k=tk, error=str(e)[:120])
                    continue
                tops = 2 * M * K * N / t / 1e12
                emit(kind="gemm", M=M, K=K, N=N, tile_m=tm, tile_k=tk,
                     us=round(t * 1e6, 1), tops=round(tops, 1))


def tap_sparse_weight(rng, o, c, k, sparsity, block_o=128, block_c=None):
    block_c = block_c or min(c, 128)
    w = rng.integers(-128, 128, (o, c, k, k)).astype(np.int8)
    for kh in range(k):
        for kw in range(k):
            for cb in range(c // block_c):
                for ob in range(-(-o // block_o)):
                    if rng.random() < sparsity:
                        w[ob * block_o:(ob + 1) * block_o,
                          cb * block_c:(cb + 1) * block_c, kh, kw] = 0
    return w


def sweep_conv():
    rng = np.random.default_rng(1)
    # (name, C, O, H, k, stride, pad) — ResNet-18 ImageNet geometry.
    cases = [
        ("l3.c1 3x3 s2", 128, 256, 28, 3, 2, 1),
        ("l3.ds 1x1 s2", 128, 256, 28, 1, 2, 0),
        ("l4.c1 3x3 s2", 256, 512, 14, 3, 2, 1),
        ("l4.ds 1x1 s2", 256, 512, 14, 1, 2, 0),
    ]
    N = 64
    for (name, C, O, H, k, s, p) in cases:
        x = jnp.asarray(rng.integers(-128, 128, (N, C, H, H)), jnp.int8)
        w = tap_sparse_weight(rng, O, C, k, 0.7)
        fct = np.full(O, 0.001, np.float32)

        def fb(prev, out):
            # out [N, O, Ho, Wo] int8 -> reshape/crop back to input shape
            flat = out.reshape(out.shape[0], -1)
            need = C * H * H
            if flat.shape[1] < need:
                reps = -(-need // flat.shape[1])
                flat = jnp.tile(flat, (1, reps))
            return flat[:, :need].reshape(N, C, H, H)

        wd = jnp.asarray(w)

        def dense_fn(a):
            return conv2d_int8(a, wd, kernel=k, stride=s, padding=p,
                               factors=fct, relu=True)

        td = measure_chained(dense_fn, x, fb, chain=8)
        emit(kind="conv", case=name, path="dense-native",
             us=round(td * 1e6, 1))

        cbsr = pack_conv_bsr(w, padding=p)

        def sparse_fn(a):
            return sparse_conv2d_int8(a, cbsr, factors=fct, relu=True,
                                      stride=s)

        try:
            ts = measure_chained(sparse_fn, x, fb, chain=8)
            emit(kind="conv", case=name, path="fused-gather-sparse",
                 sparsity=round(cbsr.sparsity, 3),
                 us=round(ts * 1e6, 1),
                 speedup_vs_dense=round(td / ts, 2))
        except Exception as e:  # noqa: BLE001
            emit(kind="conv", case=name, path="fused-gather-sparse",
                 error=str(e)[:200])


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    emit(devices=str(jax.devices()))
    if what in ("gemm", "all"):
        sweep_gemm()
    if what in ("conv", "all"):
        sweep_conv()
