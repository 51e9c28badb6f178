"""ResNet family (18/34/50) INT8: depth dispatch, bit-exactness, sparse
bottleneck routing, engine integration.

The family generalizes the reference's ResNet-18 table
(resnet_inference.hpp:121-133) over torchvision stage plans; every depth
must match forward_golden exactly, and QBottleneck's GEMM-shaped 1x1
convs must route through the zero-skip BSR kernel under attach_bsr.
"""

import numpy as np
import pytest

from resnet_accel_tpu.models.resnet import (
    init_resnet_fp32,
    quantize_resnet,
)
from resnet_accel_tpu.models.resnet18 import (
    QBottleneck,
    attach_bsr,
    forward_golden,
    make_forward,
    prune_params_blockwise,
)
from resnet_accel_tpu.runtime.engine import InferenceEngine


def _make(depth, rng, classes=10):
    fp32 = init_resnet_fp32(depth, seed=0, num_classes=classes,
                            small_input=True)
    calib = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    return fp32, quantize_resnet(fp32, calib, depth, classes,
                                 small_input=True)


@pytest.mark.parametrize("depth,n_blocks", [(18, 8), (34, 16), (50, 16)])
def test_depth_bit_exact_vs_golden(depth, n_blocks):
    rng = np.random.default_rng(depth)
    _, model = _make(depth, rng)
    assert len(model.blocks) == n_blocks
    x = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    fwd = make_forward(model, use_pallas=False, backend="cpu")
    out = np.asarray(fwd(model.as_device_params(), x))
    np.testing.assert_array_equal(out, forward_golden(model, x))


def test_resnet50_structure():
    rng = np.random.default_rng(1)
    _, model = _make(50, rng)
    blk0 = model.blocks[0]
    assert isinstance(blk0, QBottleneck)
    # 1x1 -> 3x3 -> 1x1 with expansion 4; stage-1 first block downsamples
    # channel-wise (64 -> 256) at stride 1.
    assert blk0.conv1.kernel == 1 and blk0.conv2.kernel == 3 \
        and blk0.conv3.kernel == 1
    assert blk0.conv3.w2d.shape[0] == 256
    assert blk0.downsample is not None and blk0.downsample.stride == 1
    # fc consumes the expanded 2048... at CIFAR geometry still 512*4.
    assert model.fc_w.shape[1] == 2048
    assert sum(isinstance(b, QBottleneck) for b in model.blocks) == 16


def test_resnet50_sparse_bottleneck_bit_exact():
    rng = np.random.default_rng(2)
    fp32 = init_resnet_fp32(50, seed=0, num_classes=10, small_input=True)
    fp32 = prune_params_blockwise(fp32, 0.7, block=64, seed=0)
    calib = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    model = quantize_resnet(fp32, calib, 50, 10, small_input=True)
    # A few early blocks suffice to prove the bottleneck 1x1 routing
    # (full-model interpret-mode BSR is ~3 min of test time).
    sparse = attach_bsr(
        model, block=64, min_sparsity=0.3,
        layer_filter=lambda p: p.startswith(("b0.", "b1."))
        and p.endswith((".c1", ".c3", ".ds")))
    # pruning must have produced sparse-routable 1x1 layers
    report = sparse.sparsity_report()
    assert any(k.endswith((".c1", ".c3")) for k in report), report
    x = rng.normal(0, 1, (1, 3, 32, 32)).astype(np.float32)
    dense_fwd = make_forward(model, use_pallas=False, backend="cpu")
    sparse_fwd = make_forward(sparse, use_pallas=True, backend="cpu")
    d = np.asarray(dense_fwd(model.as_device_params(), x))
    s = np.asarray(sparse_fwd(sparse.as_device_params(), x))
    np.testing.assert_array_equal(d, s)


def test_engine_runs_resnet50():
    rng = np.random.default_rng(3)
    _, model = _make(50, rng)
    eng = InferenceEngine(model, make_forward, backend="cpu")
    res = eng.run_inference(rng.normal(0, 1, (2, 3, 32, 32))
                            .astype(np.float32))
    assert res.logits.shape == (2, 10)
    assert len(res.predictions) == 2


def test_unsupported_depth_raises():
    with pytest.raises(ValueError, match="unsupported depth"):
        init_resnet_fp32(77)


def test_resnet18_via_family_matches_direct():
    from resnet_accel_tpu.models.resnet18 import (
        init_resnet18_fp32, quantize_resnet18)
    rng = np.random.default_rng(4)
    fp32_a = init_resnet_fp32(18, seed=5, num_classes=10, small_input=True)
    fp32_b = init_resnet18_fp32(seed=5, num_classes=10, small_input=True)
    for k in fp32_b:
        np.testing.assert_array_equal(fp32_a[k], fp32_b[k])
    calib = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    ma = quantize_resnet(fp32_a, calib, 18, 10, small_input=True)
    mb = quantize_resnet18(fp32_b, calib, 10, small_input=True)
    x = rng.normal(0, 1, (1, 3, 32, 32)).astype(np.float32)
    np.testing.assert_array_equal(forward_golden(ma, x),
                                  forward_golden(mb, x))

@pytest.mark.parametrize("depth,n_blocks", [(101, 33), (152, 50)])
def test_deep_bottleneck_variants(depth, n_blocks):
    """ResNet-101/152 stage plans: structure + golden-exact forward.
    (Same machinery as 50 — this pins the deep rows of STAGE_PLANS.)"""
    rng = np.random.default_rng(depth)
    _, model = _make(depth, rng)
    assert len(model.blocks) == n_blocks
    assert all(isinstance(b, QBottleneck) for b in model.blocks)
    x = rng.normal(0, 1, (1, 3, 32, 32)).astype(np.float32)
    fwd = make_forward(model, use_pallas=False, backend="cpu")
    out = np.asarray(fwd(model.as_device_params(), x))
    assert out.shape == (1, 10)
    np.testing.assert_array_equal(out, forward_golden(model, x))
