"""ResNet-18 trainer tests: learning, pruning hooks, quantizer handoff."""

import numpy as np
import pytest

from resnet_accel_tpu.train.resnet18 import (
    train_resnet18,
    export_inference_params,
    resnet18_forward,
    split_params,
)
from resnet_accel_tpu.train import BlockCfg, make_mask_fn, prune_blocks_global
from resnet_accel_tpu.models.resnet18 import (
    init_resnet18_fp32,
    quantize_resnet18,
    make_forward,
    forward_golden,
)


def tiny_data(n=64, classes=4, seed=0):
    """Linearly-separable-ish synthetic CIFAR-shaped data."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, classes, n)
    x = rng.normal(0, 0.3, (n, 3, 32, 32)).astype(np.float32)
    for i in range(n):
        # class-dependent mean pattern in one channel quadrant
        c = y[i]
        x[i, c % 3, (c // 3) * 16:(c // 3) * 16 + 16, :16] += 2.0
    return x, y


class TestTrainer:
    def test_overfits_tiny_set(self):
        x, y = tiny_data(64, 4)
        st = train_resnet18(x, y, epochs=6, batch_size=16, lr=0.02,
                            num_classes=4, seed=0)
        assert st.history[-1]["train_acc"] > 0.8, st.history

    def test_bn_state_updates(self):
        x, y = tiny_data(32, 2)
        flat = init_resnet18_fp32(seed=0, num_classes=2, small_input=True)
        _, s0 = split_params(flat)
        st = train_resnet18(x, y, epochs=1, batch_size=16,
                            num_classes=2, seed=0, init=flat)
        changed = sum(
            not np.allclose(np.asarray(st.bn_state[k]), s0[k])
            for k in s0)
        assert changed > 30  # nearly all running stats moved

    def test_mask_fn_enforced_each_step(self):
        x, y = tiny_data(32, 2)
        flat = init_resnet18_fp32(seed=0, num_classes=2, small_input=True)
        cfgs = {"layer4.0.conv1.weight": BlockCfg(64, 64, 0.0)}
        masks = prune_blocks_global(flat, 0.5, cfgs)
        shapes = {k: flat[k].shape for k in cfgs}
        mask_fn = make_mask_fn(masks, cfgs, shapes)
        st = train_resnet18(x, y, epochs=1, batch_size=16, num_classes=2,
                            seed=0, mask_fn=mask_fn, init=flat)
        w = np.asarray(st.params["layer4.0.conv1.weight"])
        from resnet_accel_tpu.train.blocksparse import expand_mask
        m = expand_mask(masks["layer4.0.conv1.weight"],
                        cfgs["layer4.0.conv1.weight"], w.shape)
        assert np.all(w[m == 0] == 0)
        assert np.any(w[m == 1] != 0)

    def test_trained_model_quantizes_and_runs(self):
        x, y = tiny_data(32, 4)
        st = train_resnet18(x, y, epochs=2, batch_size=16, num_classes=4,
                            seed=1)
        flat = export_inference_params(st)
        model = quantize_resnet18(flat, x[:4], 4, small_input=True)
        import jax.numpy as jnp
        out = np.asarray(make_forward(model, use_pallas=False)(
            model.as_device_params(), jnp.asarray(x[:4])))
        exp = forward_golden(model, x[:4])
        np.testing.assert_array_equal(out, exp)
        # INT8 predictions should match the float model on the training set
        import jax
        with jax.default_device(jax.devices("cpu")[0]):
            logits, _ = resnet18_forward(
                st.params, st.bn_state, jnp.asarray(x[:16]), True, False)
        float_pred = np.asarray(logits).argmax(-1)
        int8_pred = forward_golden(model, x[:16]).argmax(-1)
        assert (float_pred == int8_pred).mean() >= 0.75


def test_train_bottleneck_plan_end_to_end():
    """Family trainer: a tiny bottleneck plan trains, exports, quantizes,
    and the INT8 model matches its golden bit-exactly."""
    import numpy as np

    from resnet_accel_tpu.models.resnet18 import (
        forward_golden, make_forward, quantize_resnet18)
    from resnet_accel_tpu.train.resnet18 import (
        export_inference_params, train_resnet18)

    rng = np.random.default_rng(7)
    stages = [(8, 1, 1), (16, 1, 2)]
    x = rng.normal(0, 1, (32, 3, 32, 32)).astype(np.float32)
    y = (x[:, 0, :8, :8].mean(axis=(1, 2)) > 0).astype(np.int64)
    st = train_resnet18(x, y, epochs=1, batch_size=16, num_classes=2,
                        small_input=True, stages=stages, bottleneck=True)
    assert np.isfinite(st.history[-1]["loss"])
    flat = export_inference_params(st)
    assert "layer1.0.conv3.weight" in flat
    model = quantize_resnet18(flat, x[:4], 2, small_input=True,
                              stages=stages, bottleneck=True)
    fwd = make_forward(model, use_pallas=False, backend="cpu")
    out = np.asarray(fwd(model.as_device_params(), x[:2]))
    np.testing.assert_array_equal(out, forward_golden(model, x[:2]))
