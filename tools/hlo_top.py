"""Dump the top-N most expensive HLO ops of the ResNet-18 forward.

    python tools/hlo_top.py [batch] [topn]

Joins the xprof per-op device times with the compiled HLO text so each
hot op shows its full instruction line (shape, fusion kind, operands) —
the drill-down view under tools/profile_tpu.py's per-layer table.
"""

import re
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from resnet_accel_tpu.models import resnet18 as r18  # noqa: E402
from resnet_accel_tpu.runtime import xprof  # noqa: E402


def main(batch: int = 128, topn: int = 30) -> None:
    rng = np.random.default_rng(0)
    params_fp32 = r18.init_resnet18_fp32(seed=0, small_input=False)
    calib = rng.normal(0, 1, (8, 3, 224, 224)).astype(np.float32)
    model = r18.quantize_resnet18(params_fp32, calib, small_input=False)
    params = model.as_device_params()
    fwd = r18.make_forward(model)
    x = jnp.asarray(rng.normal(0, 1, (batch, 3, 224, 224)), jnp.float32)

    jfn = jax.jit(lambda p, a: fwd(p, a))
    compiled = jfn.lower(params, x).compile()
    hlo = compiled.as_text()
    jax.block_until_ready(compiled(params, x))
    import tempfile
    logdir = tempfile.mkdtemp(prefix="rat_hlotop_")
    with jax.profiler.trace(logdir):
        jax.block_until_ready(compiled(params, x))
    ops = xprof.parse_xplane_ops(xprof.latest_xplane(logdir))
    ops = xprof.attribute(ops, xprof.parse_hlo_scopes(hlo))

    # instruction name -> its HLO definition line (shortened)
    defs = {}
    for line in hlo.splitlines():
        m = re.match(r"^\s*(?:ROOT\s+)?%([^\s=]+)\s*=\s*(.*)", line)
        if m:
            body = m.group(2)
            body = re.sub(r", metadata=\{.*", "", body)
            body = re.sub(r", backend_config=.*", "", body)
            defs[m.group(1)] = body[:200]

    total = sum(o.duration_s for o in ops)
    print(f"total device: {total * 1e6:.0f} us  batch {batch}\n")
    for o in sorted(ops, key=lambda o: -o.duration_s)[:topn]:
        print(f"{o.duration_s * 1e6:9.1f} us x{o.count:<3d} "
              f"[{o.scope or '-'}] {o.instr}")
        print(f"          {defs.get(o.instr, '?')}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         int(sys.argv[2]) if len(sys.argv) > 2 else 30)
