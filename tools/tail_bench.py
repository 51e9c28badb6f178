"""On-chip benchmark for the deep ResNet-18 tail layers (b4-b7).

Measures the candidate reroutes per layer shape, bit-exactness checked
first (all variants are int8 x int8 -> int32, order-independent):

  native   : lax.conv_general_dilated NCHW (today's default)
  im2colP  : explicit im2col -> Pallas resident int8 GEMM + fused epilogue
  im2colX  : explicit im2col -> XLA dot_general int32 GEMM
  nhwcT    : NCHW->NHWC transpose + native NHWC conv + transpose back
  nhwc     : native NHWC conv alone (the steady-state cost if the whole
             tail runs channel-minor with one entry transpose)

plus a full tail chain (b6.c1 .. avgpool) in NCHW vs NHWC-entry form.

Run on the tunneled TPU:  python tools/tail_bench.py
Timing: chained-median protocol (runtime/perf.median_pair_time) with a
real data dependency between iterations, same basis as bench.py.

MEASURED (v5e, batch 128, 2026-08-18) — all variants bit-exact:

    b4.c2 256x14s1   native 29us   im2col 6.7-7.1ms  nhwc 64us
    b6.c1 256>512s2  native 118us  im2col 1.4ms      nhwcT 85us
    b6.c2 512x7s1    native 48us   im2col 2.4-2.5ms  nhwcT 28us
    tail chain       NCHW 275us    NHWC-entry 330us

(Chained-median at chain=16 under-reports small kernels behind the
~23 ms tunnel dispatch floor — raw marginal cost of b6.c2 native is
~92 us/conv at chain 64, i.e. ~83% MXU util.)  Conclusions: the deep
tail already runs near roofline under XLA's native NCHW conv; explicit
im2col->GEMM loses 20-200x to HBM patch materialization; NHWC wins
isolated-per-layer but loses as a chain (relayout pressure).  The
in-model per-layer profile (tools/profile_tpu.py) puts the real
batch-128 hot spots in the stem + 64-channel layer1 convs instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from resnet_accel_tpu.ops.conv import conv2d_int8, conv2d_int8_nhwc
    from resnet_accel_tpu.runtime.perf import median_pair_time

    N = int(os.environ.get("TAIL_BATCH", "128"))
    rng = np.random.default_rng(0)

    # (name, C_in, C_out, H_in, stride)  — 3x3 pad 1 throughout.
    SHAPES = [
        ("b4.c2 256x14s1", 256, 256, 14, 1),
        ("b6.c1 256>512s2", 256, 512, 14, 2),
        ("b6.c2 512x7s1", 512, 512, 7, 1),
    ]

    def time_shape_preserving(fn, x, chain=16):
        def chained(n):
            @jax.jit
            def loop(x0):
                def body(i, c):
                    y = fn(c)
                    # cheap data dependency that keeps the carry shape
                    return c ^ jnp.min(y)
                return jax.lax.fori_loop(0, n, body, x0)[0, 0, 0, 0]
            _ = np.asarray(loop(x))
            return loop
        l1, lc = chained(1), chained(chain)
        return median_pair_time(l1, lc, x, chain, 9) * 1e6

    for name, ci, co, hi, st in SHAPES:
        w2d = jnp.asarray(
            rng.integers(-128, 128, (co, ci * 9), dtype=np.int8))
        bias = jnp.asarray(rng.integers(-2000, 2000, (co,), dtype=np.int32))
        fct = jnp.asarray((rng.random(co) * 5e-5 + 1e-5).astype(np.float32))
        x = jnp.asarray(
            rng.integers(-128, 128, (N, ci, hi, hi), dtype=np.int8))
        w_hwio = jnp.asarray(np.asarray(w2d).reshape(co, ci, 3, 3)
                             .transpose(2, 3, 1, 0))

        def native(a):
            return conv2d_int8(a, w2d, bias=bias, kernel=3, stride=st,
                               padding=1, factors=fct, relu=True,
                               method="native")

        def im2col_p(a):
            return conv2d_int8(a, w2d, bias=bias, kernel=3, stride=st,
                               padding=1, factors=fct, relu=True,
                               method="im2col", use_pallas=True)

        def im2col_x(a):
            return conv2d_int8(a, w2d, bias=bias, kernel=3, stride=st,
                               padding=1, factors=fct, relu=True,
                               method="im2col", use_pallas=False)

        def nhwc_t(a):
            y = conv2d_int8_nhwc(a.transpose(0, 2, 3, 1), w_hwio,
                                 bias=bias, stride=st, padding=1,
                                 factors=fct, relu=True)
            return y.transpose(0, 3, 1, 2)

        xc = x.transpose(0, 2, 3, 1)

        def nhwc_only(a):
            return conv2d_int8_nhwc(a, w_hwio, bias=bias, stride=st,
                                    padding=1, factors=fct, relu=True)

        ref = np.asarray(jax.jit(native)(x))
        for vname, fn in (("im2colP", im2col_p), ("im2colX", im2col_x),
                          ("nhwcT", nhwc_t)):
            got = np.asarray(jax.jit(fn)(x))
            ok = np.array_equal(got, ref)
            print(f"{name} {vname} bit-exact: {ok}", flush=True)
            assert ok, f"{name} {vname} mismatch"
        got = np.asarray(jax.jit(nhwc_only)(xc)).transpose(0, 3, 1, 2)
        assert np.array_equal(got, ref), f"{name} nhwc mismatch"

        if st == 1:
            for vname, fn, xin in (
                    ("native ", native, x), ("im2colP", im2col_p, x),
                    ("im2colX", im2col_x, x), ("nhwcT  ", nhwc_t, x),
                    ("nhwc   ", nhwc_only, xc)):
                t = time_shape_preserving(fn, xin)
                print(f"{name} {vname} {t:9.1f} us", flush=True)
        else:
            # stride-2 changes shape: time a c1->c2 pair that returns to a
            # shape-preserving composite at the OUT geometry, then report.
            w2 = jnp.asarray(
                rng.integers(-128, 128, (co, co * 9), dtype=np.int8))
            w2_hwio = jnp.asarray(np.asarray(w2).reshape(co, co, 3, 3)
                                  .transpose(2, 3, 1, 0))
            ho = hi // 2
            xo = jnp.asarray(
                rng.integers(-128, 128, (N, co, ho, ho), dtype=np.int8))

            def upcast(y8):   # [N,co,ho,ho] -> [N,ci,hi,hi] cheap reshape
                rep = (ci * hi * hi) // (co * ho * ho)
                t = jnp.repeat(y8.reshape(N, -1), rep, axis=1)
                return t.reshape(N, ci, hi, hi)

            def pair(conv1, xin):
                return conv1(upcast(xin))

            for vname, fn in (("native ", native), ("im2colP", im2col_p),
                              ("im2colX", im2col_x), ("nhwcT  ", nhwc_t)):
                t = time_shape_preserving(lambda a, f=fn: pair(f, a), xo)
                print(f"{name} {vname} {t:9.1f} us (incl upcast)",
                      flush=True)

    # ---- full tail chain: b6.c1 .. b7.c2 + ds + adds, NCHW vs NHWC ----
    from resnet_accel_tpu.ops.epilogue import add_residual

    ci, co = 256, 512
    x14 = jnp.asarray(
        rng.integers(-128, 128, (N, ci, 14, 14), dtype=np.int8))

    r = np.random.default_rng(7)
    w61 = jnp.asarray(r.integers(-128, 128, (co, ci * 9), dtype=np.int8))
    wds = jnp.asarray(r.integers(-128, 128, (co, ci), dtype=np.int8))
    ws = [jnp.asarray(r.integers(-128, 128, (co, co * 9), dtype=np.int8))
          for _ in range(3)]
    bs = [jnp.asarray(r.integers(-2000, 2000, (co,), dtype=np.int32))
          for _ in range(5)]
    fs = [jnp.asarray((r.random(co) * 5e-5 + 1e-5).astype(np.float32))
          for _ in range(5)]
    SC = [(0.041237, 0.031911, 0.051733), (0.051123, 0.049731, 0.061317)]

    def tail_nchw(a):
        y = conv2d_int8(a, w61, bias=bs[0], kernel=3, stride=2, padding=1,
                        factors=fs[0], relu=True, method="native")
        y = conv2d_int8(y, ws[0], bias=bs[1], kernel=3, stride=1, padding=1,
                        factors=fs[1], relu=False, method="native")
        d = conv2d_int8(a, wds, bias=None, kernel=1, stride=2, padding=0,
                        factors=fs[4], relu=False, method="native")
        a = add_residual(y, d, *SC[0], relu=True)
        y = conv2d_int8(a, ws[1], bias=bs[2], kernel=3, stride=1, padding=1,
                        factors=fs[2], relu=True, method="native")
        y = conv2d_int8(y, ws[2], bias=bs[3], kernel=3, stride=1, padding=1,
                        factors=fs[3], relu=False, method="native")
        return add_residual(y, a, *SC[1], relu=True)

    hwio = lambda w, cin: jnp.asarray(
        np.asarray(w).reshape(-1, cin, 3, 3).transpose(2, 3, 1, 0))
    w61h = hwio(w61, ci)
    wsh = [hwio(w, co) for w in ws]
    wdsh = jnp.asarray(np.asarray(wds).reshape(co, ci, 1, 1)
                       .transpose(2, 3, 1, 0))

    def tail_nhwc(a):     # a: [N, ci, 14, 14] NCHW in, NCHW out
        a = a.transpose(0, 2, 3, 1)
        y = conv2d_int8_nhwc(a, w61h, bias=bs[0], stride=2, padding=1,
                             factors=fs[0], relu=True)
        y = conv2d_int8_nhwc(y, wsh[0], bias=bs[1], stride=1, padding=1,
                             factors=fs[1], relu=False)
        d = conv2d_int8_nhwc(a, wdsh, bias=None, stride=2, padding=0,
                             factors=fs[4], relu=False)
        a = add_residual(y, d, *SC[0], relu=True)
        y = conv2d_int8_nhwc(a, wsh[1], bias=bs[2], stride=1, padding=1,
                             factors=fs[2], relu=True)
        y = conv2d_int8_nhwc(y, wsh[2], bias=bs[3], stride=1, padding=1,
                             factors=fs[3], relu=False)
        return add_residual(y, a, *SC[1], relu=True).transpose(0, 3, 1, 2)

    ref = np.asarray(jax.jit(tail_nchw)(x14))
    got = np.asarray(jax.jit(tail_nhwc)(x14))
    ok = np.array_equal(got, ref)
    print(f"tail chain nhwc bit-exact: {ok}", flush=True)
    assert ok

    def t_tail(fn):
        def chained(n):
            @jax.jit
            def loop(x0):
                def body(i, c):
                    return c ^ jnp.min(fn(c))
                return jax.lax.fori_loop(0, n, body, x0)[0, 0, 0, 0]
            _ = np.asarray(loop(x14))
            return loop
        l1, lc = chained(1), chained(16)
        return median_pair_time(l1, lc, x14, 16, 9) * 1e6

    print(f"tail chain NCHW: {t_tail(tail_nchw):9.1f} us", flush=True)
    print(f"tail chain NHWC: {t_tail(tail_nhwc):9.1f} us", flush=True)


if __name__ == "__main__":
    main()
