"""Measured-profiler attribution logic (pure parts; no device needed)."""

import numpy as np
import pytest

from resnet_accel_tpu.runtime.xprof import (
    OpTime,
    attribute,
    by_scope,
    layer_table,
    parse_hlo_scopes,
)

HLO = """\
HloModule jit_forward

%fused_computation (p0: s8[128,128]) -> s32[128,128] {
  ...
}

ENTRY %main {
  %copy-start = (s8[10]{0}) copy-start(%a.1), cross_program_prefetch_index=0
  %convolution_maximum_fusion.clone.1 = s32[512,512]{1,0} fusion(%p0, %p1), kind=kOutput, calls=%fused_computation, metadata={op_name="jit(forward)/jit(forward)/b0.c1/dot_general" source_file="x.py" source_line=6}
  ROOT %max.6 = s32[512,512]{1,0} maximum(%c, %d), metadata={op_name="jit(forward)/jit(forward)/b0.add/max" source_file="x.py" source_line=8}
  %fusion.7 = s32[4]{0} fusion(%e), kind=kLoop, calls=%fc2, metadata={op_name="jit(forward)/fc/sub/dot_general" source_line=9}
  %nometa.1 = s8[4]{0} copy(%f)
}
"""


class TestParseHloScopes:
    def test_scopes_extracted(self):
        s = parse_hlo_scopes(HLO)
        assert s["convolution_maximum_fusion.clone.1"] == "b0.c1"
        assert s["max.6"] == "b0.add"
        assert s["fusion.7"] == "fc/sub"

    def test_no_metadata_ops_absent(self):
        s = parse_hlo_scopes(HLO)
        assert "nometa.1" not in s
        assert "copy-start" not in s

    def test_scopeless_op_name_empty(self):
        s = parse_hlo_scopes(
            '%f.1 = s8[4]{0} copy(%x), metadata={op_name="jit(f)/convert"}')
        assert s["f.1"] == ""


class TestAttributeAggregate:
    def test_join_and_aggregate(self):
        ops = [
            OpTime("convolution_maximum_fusion.clone.1", 10e-6, 1),
            OpTime("max.6", 2e-6, 1),
            OpTime("fusion.7", 1e-6, 2),
            OpTime("nometa.1", 5e-6, 1),
        ]
        ops = attribute(ops, parse_hlo_scopes(HLO))
        agg = by_scope(ops, depth=1)
        assert agg["b0.c1"] == pytest.approx(10e-6)
        assert agg["b0.add"] == pytest.approx(2e-6)
        assert agg["fc"] == pytest.approx(1e-6)
        assert agg["<unattributed>"] == pytest.approx(5e-6)

    def test_depth2_keeps_subscope(self):
        ops = attribute([OpTime("fusion.7", 1e-6, 1)],
                        parse_hlo_scopes(HLO))
        assert "fc/sub" in by_scope(ops, depth=2)

    def test_table_sums_to_total(self):
        tbl = layer_table({"a": 3e-6, "b": 1e-6})
        assert "TOTAL" in tbl and "75.00" in tbl


class TestEndToEndOnHost:
    def test_profile_layers_cpu_plane(self):
        """profile_layers against the host CPU device plane (the virtual
        CPU mesh the tests run on has no TPU plane; XLA:CPU publishes
        its ops on '/device:CPU' in recent jax, else we accept the
        documented RuntimeError listing available planes)."""
        import jax
        import jax.numpy as jnp
        from resnet_accel_tpu.runtime.xprof import profile_layers

        def f(a):
            with jax.named_scope("lay1"):
                b = a @ a.T
            with jax.named_scope("lay2"):
                return jnp.maximum(b, 0).sum()

        x = jnp.asarray(np.random.default_rng(0).normal(
            0, 1, (64, 64)).astype(np.float32))
        try:
            agg, ops = profile_layers(f, x, device_substr="/device:")
        except RuntimeError as e:
            assert "plane" in str(e)
            return
        # XLA:CPU publishes no per-op line — empty is the documented
        # host behavior; on TPU the same call returns measured rows
        # (exercised by tools/profile_tpu.py on the real chip).
        assert isinstance(agg, dict)
        assert all(o.duration_s >= 0 for o in ops)
