"""Sparse INT8 attention projections — using generated + reference fixtures."""

import os

import numpy as np
import pytest

from resnet_accel_tpu.models.attention import (
    SparseAttentionInt8,
    SparseProjection,
)
from resnet_accel_tpu.sparse.fixtures import generate_all_fixtures

from conftest import requires_reference_data, REFERENCE_DATA


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fx")
    generate_all_fixtures(str(root), seed=0)
    return str(root)


class TestSparseAttention:
    def test_loads_and_reports_sparsity(self, fixture_root):
        attn = SparseAttentionInt8.from_fixture_root(
            os.path.join(fixture_root, "transformer", "90pct"))
        rep = attn.sparsity_report()
        assert set(rep) == {"q", "k", "v"}
        assert all(0.85 < v < 0.95 for v in rep.values())

    def test_projection_int8_sparse_matches_dense(self, fixture_root):
        proj = SparseProjection.from_fixture_dir(
            os.path.join(fixture_root, "transformer", "80pct", "q"))
        rng = np.random.default_rng(0)
        x = rng.integers(-128, 128, (16, proj.d_in)).astype(np.int8)
        got = proj.project_golden(x, 0.01)
        # dense reconstruction reference
        W = proj.bsr.to_dense()
        acc = x.astype(np.int64) @ W.T.astype(np.int64)
        exp = acc.astype(np.float32) * (np.float32(0.01)
                                        * proj.scales[None, :])
        exp = exp + proj.bias[None, :]
        np.testing.assert_allclose(got, exp, rtol=1e-6)

    def test_jax_vs_golden(self, fixture_root):
        import jax.numpy as jnp
        attn = SparseAttentionInt8.from_fixture_root(
            os.path.join(fixture_root, "transformer", "90pct"))
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (8, attn.q.d_in)).astype(np.float32)
        got = np.asarray(attn(jnp.asarray(x)))
        exp = attn.forward_golden(x)
        np.testing.assert_allclose(got, exp, rtol=2e-4, atol=2e-5)
        assert got.shape == (8, attn.q.d_out)

    def test_attention_rows_sum_to_one_effect(self, fixture_root):
        # attention output is a convex combination of V rows: bounded by
        # min/max of V.
        import jax.numpy as jnp
        attn = SparseAttentionInt8.from_fixture_root(
            os.path.join(fixture_root, "transformer", "80pct"))
        rng = np.random.default_rng(2)
        x = rng.normal(0, 1, (4, attn.q.d_in)).astype(np.float32)
        x_scale = max(float(np.abs(x).max()) / 127.0, 1e-12)
        xq = np.clip(np.rint(x / x_scale), -128, 127).astype(np.int8)
        v = attn.v.project_golden(xq, x_scale)
        out = attn.forward_golden(x)
        assert out.min() >= v.min() - 1e-4
        assert out.max() <= v.max() + 1e-4


@requires_reference_data
class TestReferenceTransformerFixtures:
    def test_reference_fixture_projections_run(self):
        # The reference's transformer fixtures nest differently; find any
        # directory with weights.meta.json + scales.npy under transformer/.
        root = os.path.join(REFERENCE_DATA, "fixtures", "transformer")
        found = []
        for dirpath, _, files in os.walk(root):
            if "weights.meta.json" in files and "scales.npy" in files:
                found.append(dirpath)
        if not found:
            pytest.skip("no loadable transformer fixture dirs")
        proj = SparseProjection.from_fixture_dir(found[0])
        rng = np.random.default_rng(3)
        x = rng.integers(-128, 128, (4, proj.d_in)).astype(np.int8)
        out = proj.project_golden(x, 0.02)
        assert out.shape == (4, proj.d_out)
        assert np.isfinite(out).all()
