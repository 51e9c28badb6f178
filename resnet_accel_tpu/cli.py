"""Command-line interface — parity with the reference CLIs.

Subcommands (reference hw/sim/cpp/main.cpp:20-24 infer/test/bench/sim,
plus the argparse script CLIs of the sw/ pipeline):

    infer     run INT8 inference on an image/array file
    test      run the self-test suite (goldens + kernels, software model)
    bench     benchmark throughput (dense + sparse)
    quantize  FP32 checkpoint -> per-channel INT8 artifacts
    export    dense/quantized weights -> BSR artifact directories
    train     train the MNIST CNN (optionally with block pruning)
    sim       run the golden software model on an artifact (no TPU)

Usage: python -m resnet_accel_tpu <subcommand> [options]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def cmd_infer(args):
    import jax.numpy as jnp
    from resnet_accel_tpu.runtime import InferenceEngine, preprocess_mnist

    x = np.load(args.input)
    if args.model != "resnet" and args.depth != 18:
        print(f"warning: --depth {args.depth} is ignored with "
              f"--model {args.model} (use --model resnet)",
              file=sys.stderr)
    if args.model == "mnist":
        from resnet_accel_tpu.models.mnist_cnn import (
            MNISTCNNInt8, make_forward)
        model = MNISTCNNInt8.from_int8_dir(args.weights, x)
        xin = preprocess_mnist(x.astype(np.uint8)) if x.ndim == 3 else x
        eng = InferenceEngine(model, make_forward, backend=args.backend)
        res = eng.run_inference(xin[:args.limit])
    else:
        from resnet_accel_tpu.models.resnet import (
            init_resnet_fp32, quantize_resnet)
        from resnet_accel_tpu.models.resnet18 import make_forward
        depth = args.depth if args.model == "resnet" else 18
        fp32 = init_resnet_fp32(depth, seed=0,
                                num_classes=args.num_classes,
                                small_input=args.small_input)
        calib = x[:4].astype(np.float32)
        model = quantize_resnet(fp32, calib, depth, args.num_classes,
                                small_input=args.small_input)
        fwd_builder = make_forward
        if args.pm_trunk:
            import functools
            n_run = min(args.limit, len(x))
            if n_run % 128:
                print(f"warning: --pm-trunk needs a batch that is a "
                      f"multiple of 128; batch {n_run} falls back to "
                      f"the standard conv path", file=sys.stderr)
            fwd_builder = functools.partial(make_forward, pm_trunk=True)
        eng = InferenceEngine(model, fwd_builder, backend=args.backend)
        res = eng.run_inference(x[:args.limit].astype(np.float32))
    for i, (pred, t5) in enumerate(zip(res.predictions, res.top5)):
        top = ", ".join(f"{c}:{p:.3f}" for c, p in t5[:3])
        print(f"sample {i}: class {pred}  (top3: {top})")
    print(f"{res.images_per_s:.1f} images/s")
    return 0


def cmd_test(args):
    import pytest
    tests_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests")
    return pytest.main([tests_dir, "-q"] + (["-x"] if args.fail_fast
                                            else []))


def cmd_bench(args):
    """Dense + sparse GEMM benchmark sweep (benchmark_sparse.py parity:
    sizes x sparsities, GOPS + speedup table vs dense)."""
    import jax.numpy as jnp
    from resnet_accel_tpu.ops.bsr_matmul import (
        pack_kernel_bsr, bsr_matmul_wt)
    from resnet_accel_tpu.sparse import build_bsr_int8_direct
    from resnet_accel_tpu.runtime.perf import measure_chained

    if args.artifact:
        return _bench_artifact(args)

    rng = np.random.default_rng(0)
    sizes = [int(s) for s in args.sizes.split(",")]
    sparsities = [float(s) for s in args.sparsities.split(",")]
    rows = []
    for n in sizes:
        M = args.batch if args.batch > 0 else 512
        base_dt = None
        # numpy int32 CPU baseline, one dense GEMM per size — the
        # reference sweep's reference point (benchmark_sparse.py:
        # 127-217 times accel vs numpy int32 matmul on the host).
        cpu_dt = None
        if not args.no_cpu_baseline:
            import time as _time
            Wc = rng.integers(-128, 128, (n, n)).astype(np.int32)
            Ac = rng.integers(-128, 128, (M, n)).astype(np.int32)
            _ = Ac @ Wc.T  # warm-up: page faults + allocator
            cpu_dt = float("inf")
            for _ in range(3):  # best-of-3, like the accel's median
                t0 = _time.perf_counter()
                _ = Ac @ Wc.T
                cpu_dt = min(cpu_dt, _time.perf_counter() - t0)
        for sp in sparsities:
            W = rng.integers(-128, 128, (n, n)).astype(np.int8)
            nb = n // 128
            mask = rng.random((nb, nb)) < sp
            for br in range(nb):
                for bc in range(nb):
                    if mask[br, bc]:
                        W[br * 128:(br + 1) * 128,
                          bc * 128:(bc + 1) * 128] = 0
            kb = pack_kernel_bsr(build_bsr_int8_direct(W, 128), chunk=16)
            A = jnp.asarray(rng.integers(-128, 128, (M, n)).astype(np.int8))
            dt = measure_chained(
                lambda a, kb=kb: bsr_matmul_wt(a, kb),
                A,
                lambda a, out: jnp.bitwise_and(
                    out[:, :a.shape[1]], 127).astype(jnp.int8),
                outer=args.iters, chain=24)
            if sp == sparsities[0]:
                base_dt = dt
            row = {
                "M": M, "N": n, "K": n, "sparsity": sp,
                "latency_us": round(dt * 1e6, 1),
                "gops": round(2 * M * kb.nnz * 128 * 128 / dt / 1e9, 1),
                "speedup_vs_dense": round(base_dt / dt, 2),
            }
            if cpu_dt is not None:
                row["speedup_vs_cpu"] = round(cpu_dt / dt, 1)
            rows.append(row)
            print(rows[-1])
    if args.output:
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=2)
    return 0


def _bench_artifact(args):
    """Benchmark one exported BSR layer artifact (e.g. the reference's
    FC1: 9,092 cycles @100 MHz = 90.9 us, 28.41 GOPS on its 14x14
    array).  Loads the layer dir, regroups to MXU-sized blocks, checks
    bit-exactness vs the golden on the reference's activation pattern,
    then reports chained-median matvec latency and GOPS with the same
    op accounting as the reference (2 * nnz_blocks * bh * bw * M)."""
    import jax.numpy as jnp
    from resnet_accel_tpu.golden.gemm import bsr_matmul_int8_wt
    from resnet_accel_tpu.ops.bsr_matmul import (
        pack_kernel_bsr, bsr_matmul_wt)
    from resnet_accel_tpu.sparse import load_layer_dir
    from resnet_accel_tpu.sparse.regroup import regroup_bsr

    bsr = load_layer_dir(args.artifact)
    kb = pack_kernel_bsr(regroup_bsr(bsr, 128, 128), chunk=16)
    K, n = bsr.shape[1], bsr.shape[0]
    M = args.batch if args.batch > 0 else 1
    act = ((np.arange(K)[None, :] + np.arange(M)[:, None]) % 256 - 128
           ).astype(np.int8)

    actp = np.pad(act, ((0, 0), (0, bsr.padded_shape[1] - K)))
    ref = bsr_matmul_int8_wt(actp, bsr.data, bsr.row_ptr, bsr.col_idx,
                             bsr.block_h, bsr.block_w)[:, :n]
    out = np.asarray(bsr_matmul_wt(jnp.asarray(act), kb,
                               backend=args.backend))[:, :n]
    exact = bool(np.array_equal(out, ref))

    # Rolled fori chain (256 dependent matvecs per timed call) with
    # median-of-pairs subtraction: for ~5 us kernels the unrolled
    # measure_chained subtraction is noise-dominated (it once reported
    # a sub-roofline 0.5 us), while a long rolled chain amortizes
    # per-dispatch jitter to <1%.
    import jax
    from resnet_accel_tpu.runtime.perf import median_pair_time

    fold = min(K, n)  # feedback width: output may be wider than input

    def _make_loop(k):
        @jax.jit
        def loop(a0):
            def body(i, a):
                out = bsr_matmul_wt(a, kb, backend=args.backend)
                return a.at[:, :fold].add(
                    jnp.bitwise_and(out[:, :fold], 1).astype(a.dtype))
            return jax.lax.fori_loop(0, k, body, a0)[0, 0]
        return loop

    chain = args.chain
    if chain < 2:
        raise SystemExit(f"--chain must be >= 2, got {chain}")
    l1, lc = _make_loop(1), _make_loop(chain)
    a0 = jnp.asarray(act)
    np.asarray(l1(a0)), np.asarray(lc(a0))  # compile
    dt = median_pair_time(l1, lc, a0, chain, args.iters)
    ops = 2 * bsr.nnz_blocks * bsr.block_h * bsr.block_w * M
    row = {
        "artifact": args.artifact, "M": M, "K": K, "N": n,
        "nnz_blocks": bsr.nnz_blocks,
        "block": f"{bsr.block_h}x{bsr.block_w}",
        "bit_exact": exact,
        "latency_us": round(dt * 1e6, 2),
        "gops": round(ops / dt / 1e9, 1),
    }
    print(json.dumps(row))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(row, f, indent=2)
    return 0 if exact else 1


def cmd_quantize(args):
    from resnet_accel_tpu.quant import quantize_params_per_channel
    from resnet_accel_tpu.train.mnist import load_checkpoint

    params = load_checkpoint(args.checkpoint)
    q = quantize_params_per_channel(params)
    os.makedirs(args.output, exist_ok=True)
    metadata = {}
    for pname, pdata in q.items():
        lname = pname.replace(".", "_")
        np.save(os.path.join(args.output, f"{lname}_int8.npy"),
                pdata["data"])
        if "scales" in pdata:
            np.save(os.path.join(args.output, f"{lname}_scales.npy"),
                    pdata["scales"])
        else:
            with open(os.path.join(args.output,
                                   f"{lname}_scale.json"), "w") as f:
                json.dump({"scale": float(pdata["scale"])}, f)
        metadata[pname] = {
            "shape": list(pdata["shape"]),
            "quantization": "per_channel" if "scales" in pdata
            else "per_tensor",
            "error": pdata["error"],
        }
        print(f"quantized {pname}: shape {pdata['shape']} "
              f"SNR {pdata['error']['snr_db']:.1f} dB")
    with open(os.path.join(args.output,
                           "quantization_metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    return 0


def cmd_export(args):
    from resnet_accel_tpu.sparse import (
        build_bsr_int8_direct, build_bsr, save_layer_dir)

    w = np.load(args.weights)
    if w.ndim == 4:
        w = w.reshape(w.shape[0], -1)
    if w.dtype == np.int8:
        bsr = build_bsr_int8_direct(w, args.block_h, args.block_w)
    else:
        scales = (np.load(args.scales) if args.scales
                  else np.maximum(np.abs(w).max(axis=1) / 127.0, 1e-12))
        bsr = build_bsr(w, args.block_h, args.block_w,
                        threshold=args.threshold, quantize=True,
                        scales=scales)
    save_layer_dir(bsr, args.output, args.name)
    print(f"exported {args.name}: {bsr.nnz_blocks} blocks "
          f"({bsr.sparsity_pct:.1f}% sparse), "
          f"compression {bsr.compression_ratio():.1f}x")
    return 0


def cmd_train(args):
    from resnet_accel_tpu.train import train_mnist, save_checkpoint
    from resnet_accel_tpu.utils.mnist_data import load_mnist_split

    imgs, labels = load_mnist_split(args.data, args.split)
    res = train_mnist(imgs, labels, epochs=args.epochs,
                      batch_size=args.batch_size, lr=args.lr,
                      seed=args.seed)
    print(f"best eval acc: {res.best_acc:.4f}")
    if args.prune:
        from resnet_accel_tpu.train import (
            BlockCfg, progressive_prune, sparsity_of_masks)
        cfgs = {"fc1.weight": BlockCfg(128, 128, 0.05),
                "fc2.weight": BlockCfg(8, 8, 0.05)}

        def finetune(params, mask_fn, reg_fn):
            r = train_mnist(imgs, labels, epochs=1,
                            batch_size=args.batch_size, seed=args.seed,
                            mask_fn=mask_fn, reg_fn=reg_fn, params=params)
            print(f"  finetune acc: {r.best_acc:.4f}")
            return r.params

        pruned, masks = progressive_prune(
            res.params, finetune, cfgs,
            schedule=[float(s) for s in args.schedule.split(",")])
        res.params.update(pruned)
        print(f"final block sparsity: {sparsity_of_masks(masks):.1%}")
    if args.output:
        save_checkpoint(res, args.output)
        print(f"saved checkpoint to {args.output}")
    return 0


def cmd_sim(args):
    """Golden software model on a BSR artifact (the Verilator-harness
    role of test_mnist_bsr.cpp: load artifact, run golden, dump)."""
    from resnet_accel_tpu.golden import bsr_matmul_int8_wt
    from resnet_accel_tpu.sparse import load_layer_dir

    bsr = load_layer_dir(args.artifact)
    bsr.validate()
    K = bsr.padded_shape[1]
    act = ((np.arange(K) % 256) - 128).astype(np.int8).reshape(1, K)
    out = bsr_matmul_int8_wt(act, bsr.data, bsr.row_ptr, bsr.col_idx,
                             bsr.block_h, bsr.block_w)
    print(f"artifact: {args.artifact}")
    print(f"  shape {bsr.shape} padded {bsr.padded_shape} "
          f"blocks {bsr.nnz_blocks} ({bsr.sparsity_pct:.1f}% sparse)")
    print(f"  golden output[:8]: {out[0, :8].tolist()}")
    if args.output:
        np.save(args.output, out)
        print(f"  saved golden output to {args.output}")
    return 0


def cmd_verify(args):
    """Element-wise artifact comparison (hw/sim/verify_rtl.py parity):
    tolerance 0 by default, PASS/FAIL report with first mismatches."""
    a = np.load(args.golden)
    b = np.load(args.actual)
    if a.shape != b.shape:
        print(f"FAIL: shape mismatch {a.shape} vs {b.shape}")
        return 1
    diff = np.abs(a.astype(np.int64) - b.astype(np.int64))
    n_bad = int((diff > args.tolerance).sum())
    print(f"compared {a.size} elements, tolerance {args.tolerance}")
    if n_bad == 0:
        print("PASS: outputs match")
        return 0
    idx = np.argwhere(diff > args.tolerance)[:10]
    print(f"FAIL: {n_bad} mismatches (max diff {int(diff.max())})")
    for i in idx:
        t = tuple(i)
        print(f"  at {t}: golden={a[t]} actual={b[t]}")
    return 1


def cmd_fixtures(args):
    """Regenerate the synthetic sparse fixture tree (sw/exporters)."""
    from resnet_accel_tpu.sparse.fixtures import generate_all_fixtures
    made = generate_all_fixtures(args.output, seed=args.seed)
    for k, v in made.items():
        print(f"  {k} -> {v}")
    print(f"generated {len(made)} fixtures under {args.output}")
    return 0


def cmd_generate(args):
    """Greedy decoding demo on the INT8 block-sparse decoder LM:
    calibrated static scales, parallel KV-cache prefill (optional flash
    attention), jitted scan decode."""
    import time as _time

    import jax.numpy as jnp

    from resnet_accel_tpu.models.lm import TransformerLMInt8

    lm = TransformerLMInt8.from_random(
        vocab=args.vocab, d_model=args.d_model, n_heads=args.heads,
        d_ff=2 * args.d_model, n_layers=args.layers,
        max_len=args.max_len, sparsity=args.sparsity, seed=args.seed)
    rng = np.random.default_rng(args.seed)
    calib = rng.integers(0, args.vocab,
                         min(16, args.max_len)).astype(np.int32)
    scales = lm.calibrate(calib)
    prompt = np.asarray(
        [int(t) for t in args.prompt.split(",")], np.int32)
    if prompt.size + args.n_new > args.max_len:
        raise SystemExit("prompt + n_new exceeds --max-len")
    t0 = _time.perf_counter()
    if args.temperature <= 0 and (args.top_k is not None
                                  or args.sample_seed != 0):
        print("warning: --top-k/--sample-seed have no effect with "
              "temperature 0 (greedy decoding); pass --temperature > 0 "
              "to sample", file=sys.stderr)
    spec_steps = None
    if args.speculative:
        # the verify window writes draft+1 K/V entries past the final
        # length; shrink the draft to whatever headroom max_len leaves
        draft = min(args.draft,
                    args.max_len - prompt.size - args.n_new)
        if draft < 1:
            raise SystemExit("--speculative needs at least 1 token of "
                             "--max-len headroom beyond prompt + n_new")
        if draft < args.draft:
            print(f"note: draft shrunk to {draft} (max-len headroom)",
                  file=sys.stderr)
        rng_key = None
        if args.temperature > 0:
            import jax
            rng_key = jax.random.PRNGKey(args.sample_seed)
        toks, spec_steps = lm.generate_speculative(
            jnp.asarray(prompt), args.n_new, scales, draft=draft,
            flash=args.flash, return_stats=True,
            temperature=args.temperature, top_k=args.top_k,
            rng_key=rng_key)
    elif args.temperature > 0:
        import jax
        toks = lm.sample(jnp.asarray(prompt), args.n_new, scales,
                         jax.random.PRNGKey(args.sample_seed),
                         temperature=args.temperature,
                         top_k=args.top_k, flash=args.flash)
    else:
        toks = lm.generate(jnp.asarray(prompt), args.n_new, scales,
                           flash=args.flash)
    toks = np.asarray(toks)
    dt = _time.perf_counter() - t0
    print(f"prompt:    {prompt.tolist()}")
    print(f"generated: {toks.tolist()}")
    if spec_steps is not None:
        basis = ("distribution-exact vs sample()"
                 if args.temperature > 0 else "identical to greedy")
        print(f"speculative: {int(spec_steps)} verify passes for "
              f"{args.n_new} tokens (outputs {basis})")
    mean_sp = float(np.mean(
        list(lm.blocks[0].sparsity_report().values())))
    print(f"{args.n_new} tokens in {dt:.2f}s (incl. compile); "
          f"sparsity {mean_sp:.0%} per projection")
    return 0


def cmd_serve(args):
    """Continuous-batching serving demo on the paged-KV engine: admit
    several requests into lockstep decode lanes over an oversubscribable
    page pool, with every serving knob — sampling, prefix caching, int8
    KV pages, speculative decoding, tensor parallelism — on the command
    line.  Prints each request's stream and the engine counters.

    Role analogue: the reference's host driver loop
    (/root/reference/sw/host/accel.py run-inference path), generalized
    to multi-request LM serving.
    """
    import time as _time

    from resnet_accel_tpu.models.lm import TransformerLMInt8
    from resnet_accel_tpu.runtime.paged import PagedKVBatcher

    lm = TransformerLMInt8.from_random(
        vocab=args.vocab, d_model=args.d_model, n_heads=args.heads,
        d_ff=2 * args.d_model, n_layers=args.layers,
        max_len=args.max_len, sparsity=args.sparsity, seed=args.seed)
    rng = np.random.default_rng(args.seed)
    calib = rng.integers(0, args.vocab,
                         min(16, args.max_len)).astype(np.int32)
    scales = lm.calibrate(calib)

    prompts = [[int(t) for t in p.split(",")]
               for p in args.prompts.split(";")]
    for p in prompts:
        if len(p) + args.n_new > args.max_len:
            raise SystemExit("prompt + n_new exceeds --max-len")

    tp_mesh = None
    if args.tp > 1:
        import jax
        from jax.sharding import Mesh
        devs = jax.devices()
        if len(devs) < args.tp:
            raise SystemExit(f"--tp {args.tp} needs {args.tp} devices, "
                             f"have {len(devs)}")
        tp_mesh = Mesh(np.array(devs[:args.tp]), ("tp",))

    eng = PagedKVBatcher(
        lm, scales, slots=args.slots, page=args.page,
        pool_pages=args.pool_pages, chunk=args.chunk,
        temperature=args.temperature, top_k=args.top_k,
        reserve=args.reserve, prefix_cache=args.prefix_cache,
        kv_dtype=args.kv_dtype, spec_draft=args.spec_draft,
        spec_adaptive=args.spec_adaptive, tp_mesh=tp_mesh)
    rids = [eng.submit(p, args.n_new, seed=args.sample_seed + i)
            for i, p in enumerate(prompts)]
    t0 = _time.perf_counter()
    res = eng.run()
    dt = _time.perf_counter() - t0
    toks = 0
    for i, (p, rid) in enumerate(zip(prompts, rids)):
        print(f"req {i}: prompt {p} -> {res[rid]}")
        toks += len(res[rid])
    bits = [f"{toks} tokens in {dt:.2f}s (incl. compile)",
            f"{eng.steps} engine steps / {eng.micro_steps} micro-steps",
            f"pool {eng.kv_pool_bytes() / 1e6:.2f} MB ({args.kv_dtype})"]
    if args.prefix_cache:
        bits.append(f"cache hits {eng.cache_hits} "
                    f"(+{eng.cache_tokens_skipped} prefill skipped)")
    if eng.preemptions:
        bits.append(f"preemptions {eng.preemptions}")
    if args.spec_adaptive:
        bits.append(f"spec mode switches {eng.spec_switches}")
    if tp_mesh is not None:
        bits.append(f"tp={args.tp} (KV sliced by head)")
    print("; ".join(bits))
    return 0


def cmd_profile(args):
    """Per-layer profile of ResNet-18 INT8: roofline table (default) or
    measured per-HLO device times via --measured (TPU only)."""
    from resnet_accel_tpu.models.resnet import (
        init_resnet_fp32, quantize_resnet)
    from resnet_accel_tpu.models.resnet18 import make_forward
    from resnet_accel_tpu.runtime import InferenceEngine

    rng = np.random.default_rng(0)
    hw = 32 if args.small_input else 224
    depth = getattr(args, "depth", 18)
    fp32 = init_resnet_fp32(depth, seed=0, num_classes=args.num_classes,
                            small_input=args.small_input)
    calib = rng.normal(0, 1, (2, 3, hw, hw)).astype(np.float32)
    model = quantize_resnet(fp32, calib, depth, args.num_classes,
                            args.small_input)
    if args.measured:
        import jax.numpy as jnp
        from resnet_accel_tpu.runtime import xprof

        fwd = make_forward(model)
        params = model.as_device_params()
        x = jnp.asarray(rng.normal(0, 1, (args.batch, 3, hw, hw)),
                        jnp.float32)
        agg, _ = xprof.profile_layers(lambda p, a: fwd(p, a), params, x)
        print(xprof.layer_table(agg))
        return 0
    eng = InferenceEngine(model, make_forward, backend=args.backend)
    x = rng.normal(0, 1, (args.batch, 3, hw, hw)).astype(np.float32)
    print(eng.profile(x, iters=args.iters))
    return 0


def build_parser():
    p = argparse.ArgumentParser(
        prog="resnet_accel_tpu",
        description="TPU-native INT8 block-sparse CNN framework")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("infer", help="run INT8 inference")
    pi.add_argument("--model", choices=["mnist", "resnet18", "resnet"],
                    default="mnist")
    pi.add_argument("--depth", type=int, default=18,
                    help="ResNet depth for --model resnet "
                         "(18/34/50/101/152)")
    pi.add_argument("--weights", default="/root/reference/data/int8")
    pi.add_argument("--input", required=True,
                    help=".npy image array")
    pi.add_argument("--limit", type=int, default=8)
    pi.add_argument("--backend", default=None)
    pi.add_argument("--num-classes", type=int, default=1000)
    pi.add_argument("--small-input", action="store_true")
    pi.add_argument(
        "--pm-trunk", action="store_true",
        help="route eligible 64-channel identity blocks through the "
             "pixel-major pair-plane conv kernels (resnet only; "
             "batches not a multiple of 128 fall back to the "
             "standard path with a warning)")
    pi.set_defaults(fn=cmd_infer)

    pt = sub.add_parser("test", help="run the test suite")
    pt.add_argument("--fail-fast", action="store_true")
    pt.set_defaults(fn=cmd_test)

    pb = sub.add_parser("bench", help="benchmark dense + sparse GEMM")
    pb.add_argument("--sizes", default="2048,4096")
    pb.add_argument("--sparsities", default="0.0,0.5,0.7,0.9")
    pb.add_argument(
        "--batch", type=int, default=0,
        help="rows M (0 = auto: 512 for the sweep, 1 for --artifact "
             "to match the reference's batch-1 FC1 measurement)")
    pb.add_argument("--iters", type=int, default=5)
    pb.add_argument("--output", default=None)
    pb.add_argument(
        "--no-cpu-baseline", action="store_true",
        help="skip the numpy int32 CPU baseline column "
             "(benchmark_sparse.py's speedup reference)")
    pb.add_argument(
        "--chain", type=int, default=256,
        help="chained calls per timed dispatch in --artifact mode")
    pb.add_argument(
        "--backend", default=None,
        help="backend override for --artifact mode (tpu/cpu/golden)")
    pb.add_argument(
        "--artifact", default=None, metavar="DIR",
        help="benchmark one exported BSR layer dir instead of the sweep "
             "(e.g. the reference's data/bsr_export_14x14/fc1; "
             "reference FC1 baseline: 90.9 us, 28.41 GOPS)")
    pb.set_defaults(fn=cmd_bench)

    pq = sub.add_parser("quantize", help="FP32 checkpoint -> INT8")
    pq.add_argument("--checkpoint", required=True)
    pq.add_argument("--output", required=True)
    pq.set_defaults(fn=cmd_quantize)

    pe = sub.add_parser("export", help="weights -> BSR artifact")
    pe.add_argument("--weights", required=True, help=".npy weight matrix")
    pe.add_argument("--scales", default=None)
    pe.add_argument("--output", required=True)
    pe.add_argument("--name", default="layer")
    pe.add_argument("--block-h", type=int, default=14)
    pe.add_argument("--block-w", type=int, default=14)
    pe.add_argument("--threshold", type=float, default=1e-10)
    pe.set_defaults(fn=cmd_export)

    ptr = sub.add_parser("train", help="train the MNIST CNN")
    ptr.add_argument("--data", default="/root/reference/data/MNIST/raw")
    ptr.add_argument("--split", default="t10k")
    ptr.add_argument("--epochs", type=int, default=2)
    ptr.add_argument("--batch-size", type=int, default=128)
    ptr.add_argument("--lr", type=float, default=1e-3)
    ptr.add_argument("--seed", type=int, default=1917)
    ptr.add_argument("--prune", action="store_true")
    ptr.add_argument("--schedule", default="0.5,0.7,0.85,0.9")
    ptr.add_argument("--output", default=None)
    ptr.set_defaults(fn=cmd_train)

    ps = sub.add_parser("sim", help="golden software model on artifact")
    ps.add_argument("--artifact", required=True)
    ps.add_argument("--output", default=None)
    ps.set_defaults(fn=cmd_sim)

    pv = sub.add_parser("verify",
                        help="element-wise output comparison (tol 0)")
    pv.add_argument("--golden", required=True)
    pv.add_argument("--actual", required=True)
    pv.add_argument("--tolerance", type=int, default=0)
    pv.set_defaults(fn=cmd_verify)

    pp = sub.add_parser("profile", help="per-layer roofline profile")
    pp.add_argument("--depth", type=int, default=18,
                    help="ResNet depth (18/34/50/101/152)")
    pp.add_argument("--measured", action="store_true",
                    help="measured per-layer device times from the "
                         "xprof trace (TPU only)")
    pp.add_argument("--batch", type=int, default=32)
    pp.add_argument("--num-classes", type=int, default=1000)
    pp.add_argument("--small-input", action="store_true")
    pp.add_argument("--iters", type=int, default=3)
    pp.add_argument("--backend", default=None)
    pp.set_defaults(fn=cmd_profile)

    pg = sub.add_parser("generate",
                        help="greedy decode on the INT8 sparse LM")
    pg.add_argument("--prompt", default="1,2,3",
                    help="comma-separated token ids")
    pg.add_argument("--n-new", type=int, default=8)
    pg.add_argument("--layers", type=int, default=2)
    pg.add_argument("--d-model", type=int, default=128)
    pg.add_argument("--heads", type=int, default=4)
    pg.add_argument("--vocab", type=int, default=64)
    pg.add_argument("--max-len", type=int, default=64)
    pg.add_argument("--sparsity", type=float, default=0.8)
    pg.add_argument("--seed", type=int, default=0)
    pg.add_argument("--flash", action="store_true",
                    help="flash-attention prefill")
    pg.add_argument("--temperature", type=float, default=0.0,
                    help="sampling temperature (0 = greedy)")
    pg.add_argument("--top-k", type=int, default=None,
                    help="top-k truncation for sampling")
    pg.add_argument("--sample-seed", type=int, default=0)
    pg.add_argument("--speculative", action="store_true",
                    help="prompt-lookup speculative decoding: greedy "
                         "outputs identical to generate; with "
                         "--temperature > 0, rejection-sampled "
                         "(distribution-exact vs sample); fewer "
                         "device steps either way")
    pg.add_argument("--draft", type=int, default=15,
                    help="speculative draft length per verify pass")
    pg.set_defaults(fn=cmd_generate)

    pv2 = sub.add_parser(
        "serve", help="continuous-batching LM serving (paged KV)")
    pv2.add_argument("--prompts", default="1,2,3;4,5;6,7,8,9",
                     help="semicolon-separated requests, each a "
                          "comma-separated token-id prompt")
    pv2.add_argument("--n-new", type=int, default=8)
    pv2.add_argument("--slots", type=int, default=2)
    pv2.add_argument("--page", type=int, default=8)
    pv2.add_argument("--pool-pages", type=int, default=24)
    pv2.add_argument("--chunk", type=int, default=8)
    pv2.add_argument("--reserve", default="full",
                     choices=["full", "ondemand"])
    pv2.add_argument("--prefix-cache", action="store_true")
    pv2.add_argument("--kv-dtype", default="fp32",
                     choices=["fp32", "int8"])
    pv2.add_argument("--spec-draft", type=int, default=0,
                     help="speculative verify window (0 = off)")
    pv2.add_argument("--spec-adaptive", action="store_true",
                     help="auto-disable speculation when the measured "
                          "acceptance EWMA stops beating chunked "
                          "dispatch (greedy only; docs/SERVING.md)")
    pv2.add_argument("--temperature", type=float, default=0.0)
    pv2.add_argument("--top-k", type=int, default=None)
    pv2.add_argument("--sample-seed", type=int, default=0)
    pv2.add_argument("--tp", type=int, default=1,
                     help="shard the engine over a tp mesh of this "
                          "many devices (KV pools sliced by head)")
    pv2.add_argument("--layers", type=int, default=2)
    pv2.add_argument("--d-model", type=int, default=128)
    pv2.add_argument("--heads", type=int, default=4)
    pv2.add_argument("--vocab", type=int, default=64)
    pv2.add_argument("--max-len", type=int, default=64)
    pv2.add_argument("--sparsity", type=float, default=0.8)
    pv2.add_argument("--seed", type=int, default=0)
    pv2.add_argument("--backend", default=None)
    pv2.set_defaults(fn=cmd_serve)

    pf = sub.add_parser("fixtures", help="regenerate sparse test fixtures")
    pf.add_argument("--output", required=True)
    pf.add_argument("--seed", type=int, default=42)
    pf.set_defaults(fn=cmd_fixtures)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # When the user EXPLICITLY asked for a non-TPU backend (flag or env
    # var — never inferred, which would itself dial the tunnel),
    # unregister the tunnel-backed plugin BEFORE any command touches
    # jax: device init blocks forever if the tunnel endpoint is down
    # (see runtime/backend.drop_tunnel_backend).
    explicit = (getattr(args, "backend", None)
                or os.environ.get("RESNET_ACCEL_TPU_BACKEND"))
    if explicit in ("cpu", "golden"):
        from resnet_accel_tpu.runtime.backend import drop_tunnel_backend

        drop_tunnel_backend()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
