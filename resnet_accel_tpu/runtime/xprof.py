"""Measured per-layer profiling from the XLA device trace.

The reference reads per-layer hardware counters (perf.sv latched at
done, read per run_layer).  The analytic profiler (runtime.profile)
distributes ONE end-to-end measurement by roofline share; this module
gets the real thing: it captures a ``jax.profiler`` device trace of one
dispatch, reads the per-HLO-op durations from the xplane (the TPU's own
op-level counters), and attributes them back to model layers through
``jax.named_scope`` annotations recovered from the compiled HLO's
``op_name`` metadata.

Pipeline:

    fn, args --jit/lower/compile--> HLO text  (instr -> op_name scope)
             --jax.profiler.trace--> xplane   (instr -> duration)
    join on instruction name, aggregate by scope -> measured layer table

Pure-parsing helpers are separated from the trace capture so the
attribution logic is unit-testable without a device.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import re
import tempfile
from typing import Callable, Dict, List, Optional, Tuple

import jax

# `ROOT %name = ...` or `%name = ...`; metadata={... op_name="..." ...}
_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%([^\s=]+)\s*=")
_OPNAME_RE = re.compile(r'metadata=\{[^}]*op_name="([^"]*)"')
# Trace event names look like `%name = s32[...] fusion(...), ...`.
_EVENT_RE = re.compile(r"^%([^\s=]+)\s*=")
_JIT_SEG = re.compile(r"^(jit|pjit|while|cond|body|checkpoint)\(.*\)$")


# ---------------------------------------------------------------- parsing

def parse_hlo_scopes(hlo_text: str) -> Dict[str, str]:
    """Map HLO instruction name -> named_scope path from metadata.

    The op_name metadata is e.g. ``jit(f)/jit(f)/b0.c1/dot_general``:
    leading jit(...) wrappers and the trailing primitive are dropped, so
    the returned scope is ``b0.c1`` (empty string when the op carries no
    user scope).
    """
    scopes: Dict[str, str] = {}
    for line in hlo_text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        om = _OPNAME_RE.search(line)
        if not om:
            continue
        parts = [p for p in om.group(1).split("/") if p]
        while parts and _JIT_SEG.match(parts[0]):
            parts.pop(0)
        if parts:
            parts.pop()  # trailing primitive (dot_general, max, ...)
        scopes[m.group(1)] = "/".join(parts)
    return scopes


@dataclasses.dataclass
class OpTime:
    """One executed HLO op: summed device time over its occurrences."""

    instr: str
    duration_s: float
    count: int
    scope: str = ""


def parse_xplane_ops(path: str, device_substr: str = "/device:TPU"
                     ) -> List[OpTime]:
    """Read per-op device durations from one ``.xplane.pb`` file."""
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(path)
    plane = None
    for p in pd.planes:
        if device_substr in p.name:
            plane = p
            break
    if plane is None:
        raise RuntimeError(
            f"no '{device_substr}' plane in {path} "
            f"(planes: {[p.name for p in pd.planes]})")
    acc: Dict[str, Tuple[float, int]] = {}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            m = _EVENT_RE.match(ev.name)
            if not m:
                continue
            st = dict(ev.stats)
            dur = st.get("device_duration_ps")
            dur_s = (dur * 1e-12 if dur is not None
                     else ev.duration_ns * 1e-9)
            t, c = acc.get(m.group(1), (0.0, 0))
            acc[m.group(1)] = (t + dur_s, c + 1)
    return [OpTime(instr=k, duration_s=t, count=c)
            for k, (t, c) in acc.items()]


def attribute(ops: List[OpTime], scopes: Dict[str, str]) -> List[OpTime]:
    """Fill each op's scope from the HLO metadata map (joined by
    instruction name; unmatched ops keep scope '')."""
    return [dataclasses.replace(o, scope=scopes.get(o.instr, ""))
            for o in ops]


def by_scope(ops: List[OpTime], depth: int = 1) -> Dict[str, float]:
    """Aggregate measured seconds by the first ``depth`` scope
    components ('' -> '<unattributed>')."""
    out: Dict[str, float] = {}
    for o in ops:
        key = "/".join(o.scope.split("/")[:depth]) if o.scope \
            else "<unattributed>"
        out[key] = out.get(key, 0.0) + o.duration_s
    return out


# ---------------------------------------------------------------- capture

def latest_xplane(logdir: str) -> str:
    files = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    return files[-1]


def profile_layers(
    fn: Callable,
    *args,
    logdir: Optional[str] = None,
    device_substr: str = "/device:TPU",
    depth: int = 1,
) -> Tuple[Dict[str, float], List[OpTime]]:
    """Measured per-scope device time of one jitted dispatch.

    ``fn`` should annotate layers with ``jax.named_scope``.  Returns
    (scope -> seconds, per-op detail).  Runs fn twice: once warm-up
    (compile), once traced.
    """
    jfn = jax.jit(fn)
    compiled = jfn.lower(*args).compile()  # one compile, reused below
    hlo = compiled.as_text()
    jax.block_until_ready(compiled(*args))
    logdir = logdir or tempfile.mkdtemp(prefix="rat_xprof_")
    with jax.profiler.trace(logdir):
        jax.block_until_ready(compiled(*args))
    ops = parse_xplane_ops(latest_xplane(logdir), device_substr)
    ops = attribute(ops, parse_hlo_scopes(hlo))
    return by_scope(ops, depth=depth), ops


def layer_table(scope_s: Dict[str, float]) -> str:
    """Printable measured per-layer table, largest first."""
    total = sum(scope_s.values()) or 1.0
    lines = [f"{'scope':24s} {'us':>10s} {'%':>6s}"]
    for k, v in sorted(scope_s.items(), key=lambda kv: -kv[1]):
        lines.append(f"{k:24s} {v * 1e6:10.1f} {100 * v / total:6.2f}")
    lines.append(f"{'TOTAL':24s} {total * 1e6:10.1f} {100.0:6.2f}")
    return "\n".join(lines)
