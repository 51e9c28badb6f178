"""Training + pruning tests (mirrors test_exporters/blocksparse coverage)."""

import os

import numpy as np
import pytest

from resnet_accel_tpu.train import (
    BlockCfg,
    compute_block_norms,
    effective_sparsity,
    expand_mask,
    init_mnist_params,
    make_group_lasso_fn,
    make_mask_fn,
    progressive_prune,
    prune_blocks_global,
    sparsity_of_masks,
    train_mnist,
    save_checkpoint,
    load_checkpoint,
)
from resnet_accel_tpu.utils.mnist_data import load_mnist_split

MNIST_RAW = "/root/reference/data/MNIST/raw"
has_mnist = os.path.isdir(MNIST_RAW)


class TestPruning:
    def test_block_norms_shape(self):
        w = np.ones((16, 100), np.float32)
        norms, (nbr, nbc) = compute_block_norms(w, BlockCfg(8, 8, 0.0))
        assert (nbr, nbc) == (2, 13)
        # interior blocks have norm 8 (8x8 of ones)
        assert abs(norms[0, 0] - 8.0) < 1e-6
        # edge block is padded: only 4 real columns
        assert norms[0, 12] < norms[0, 0]

    def test_global_ranking_prunes_weakest(self):
        params = {
            "a": np.full((8, 8), 10.0, np.float32),
            "b": np.full((8, 8), 0.1, np.float32),
        }
        cfgs = {k: BlockCfg(4, 4, 0.0) for k in params}
        masks = prune_blocks_global(params, 0.5, cfgs)
        # all of b (weak) pruned, all of a kept
        assert masks["a"].all() and not masks["b"].any()

    def test_keep_floor_respected(self):
        params = {
            "a": np.full((8, 8), 10.0, np.float32),
            "b": np.full((8, 8), 0.1, np.float32),
        }
        cfgs = {"a": BlockCfg(4, 4, 0.0), "b": BlockCfg(4, 4, 0.5)}
        masks = prune_blocks_global(params, 0.9, cfgs)
        assert masks["b"].sum() >= 2  # floor: 50% of 4 blocks

    def test_target_sparsity_reached(self):
        rng = np.random.default_rng(0)
        params = {"w": rng.normal(size=(128, 256)).astype(np.float32)}
        cfgs = {"w": BlockCfg(8, 8, 0.0)}
        for target in (0.5, 0.9):
            masks = prune_blocks_global(params, target, cfgs)
            assert abs(sparsity_of_masks(masks) - target) < 0.02

    def test_mask_fn_zeroes_blocks(self):
        rng = np.random.default_rng(1)
        params = {"w": rng.normal(size=(16, 16)).astype(np.float32)}
        cfgs = {"w": BlockCfg(8, 8, 0.0)}
        masks = {"w": np.array([[True, False], [False, True]])}
        fn = make_mask_fn(masks, cfgs, {"w": (16, 16)})
        out = np.asarray(fn(params)["w"])
        assert np.all(out[:8, 8:] == 0) and np.all(out[8:, :8] == 0)
        assert np.any(out[:8, :8] != 0)

    def test_normalized_ranking_is_size_fair(self):
        # Same per-element RMS everywhere; the raw ranking would prune
        # ALL small blocks before any big one (bigger raw L2), the RMS
        # ranking treats them equally.
        rng = np.random.default_rng(2)
        params = {
            "big": rng.normal(size=(16, 16)).astype(np.float32),
            "small": rng.normal(size=(16, 16)).astype(np.float32),
        }
        cfgs = {"big": BlockCfg(16, 16, 0.0),
                "small": BlockCfg(4, 4, 0.0)}
        raw = prune_blocks_global(params, 0.05, cfgs)
        # raw: the single big block (norm ~16) survives; weakest small
        # blocks (norm ~4) go first
        assert raw["big"].all()
        norm = prune_blocks_global(params, 0.5, cfgs, normalize=True)
        # normalized at 50%: small blocks span the RMS distribution, so
        # SOME survive even though all big-block raw norms exceed them
        assert norm["small"].any()

    def test_by_params_targets_weight_fraction(self):
        rng = np.random.default_rng(3)
        params = {
            "big": rng.normal(size=(128, 128)).astype(np.float32),
            "small": rng.normal(size=(32, 32)).astype(np.float32),
        }
        cfgs = {"big": BlockCfg(32, 32, 0.0),
                "small": BlockCfg(8, 8, 0.0)}
        shapes = {k: v.shape for k, v in params.items()}
        for target in (0.5, 0.9):
            masks = prune_blocks_global(params, target, cfgs,
                                        normalize=True, by_params=True)
            eff = effective_sparsity(masks, cfgs, shapes)
            assert abs(eff - target) < 0.03, (target, eff)

    def test_effective_sparsity_weights_by_elements(self):
        # one big layer fully pruned + one small fully kept: block count
        # says 50%, parameters say ~94%.
        cfgs = {"big": BlockCfg(32, 32, 0.0),
                "small": BlockCfg(8, 8, 0.0)}
        shapes = {"big": (32, 32), "small": (8, 8)}
        masks = {"big": np.zeros((1, 1), bool),
                 "small": np.ones((1, 1), bool)}
        assert sparsity_of_masks(masks) == 0.5
        eff = effective_sparsity(masks, cfgs, shapes)
        assert abs(eff - 1024 / (1024 + 64)) < 1e-6

    def test_group_lasso_positive_and_differentiable(self):
        import jax
        import jax.numpy as jnp
        cfgs = {"w": BlockCfg(4, 4, 0.0)}
        fn = make_group_lasso_fn(cfgs, weight=1.0)
        w = {"w": jnp.ones((8, 8))}
        val = fn(w)
        assert float(val) > 0
        g = jax.grad(lambda p: fn(p))(w)
        assert np.all(np.isfinite(np.asarray(g["w"])))


@pytest.mark.skipif(not has_mnist, reason="MNIST raw files not mounted")
class TestTrainMnist:
    @pytest.fixture(scope="class")
    def data(self):
        imgs, labels = load_mnist_split(MNIST_RAW, "t10k")
        return imgs[:1500], labels[:1500]

    def test_short_training_learns(self, data):
        imgs, labels = data
        res = train_mnist(imgs, labels, epochs=2, batch_size=64, seed=0)
        assert res.best_acc > 0.7, f"acc {res.best_acc}"
        assert len(res.history) == 2

    def test_checkpoint_roundtrip(self, data, tmp_path):
        imgs, labels = data
        res = train_mnist(imgs, labels, epochs=1, batch_size=64, seed=0)
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(res, path)
        loaded = load_checkpoint(path)
        np.testing.assert_array_equal(loaded["fc1.weight"],
                                      res.params["fc1.weight"])
        assert os.path.isfile(path + ".meta.json")

    def test_progressive_prune_keeps_accuracy_structure(self, data):
        imgs, labels = data
        res = train_mnist(imgs, labels, epochs=1, batch_size=64, seed=0)
        cfgs = {
            "fc1.weight": BlockCfg(128, 128, 0.05),
            "fc2.weight": BlockCfg(8, 8, 0.05),
        }

        def finetune(params, mask_fn, reg_fn):
            r = train_mnist(imgs, labels, epochs=1, batch_size=64,
                            seed=1, mask_fn=mask_fn, reg_fn=reg_fn,
                            params=params)
            return r.params

        pruned, masks = progressive_prune(
            res.params, finetune, cfgs, schedule=[0.5, 0.7])
        sp = sparsity_of_masks(masks)
        assert 0.6 < sp <= 0.75
        # pruned blocks are actually zero in the weights
        from resnet_accel_tpu.train.blocksparse import expand_mask
        m = expand_mask(masks["fc1.weight"], cfgs["fc1.weight"],
                        pruned["fc1.weight"].shape)
        assert np.all(pruned["fc1.weight"][m == 0] == 0)
