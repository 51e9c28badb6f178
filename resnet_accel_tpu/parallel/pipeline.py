"""Pipeline parallelism — GPipe-style staged execution over a 'pp' axis.

Beyond-parity scaling capability (the reference is a single-chip design;
its "v3.0 wish list" mentions multi-accelerator only in passing,
docs/architecture/ARCHITECTURE.md:655-657): a model split into an
arbitrary list of stages, each resident on its own device along the
``pp`` mesh axis.  Microbatches stream through the pipe: at step t,
rank r runs stage r on microbatch t-r while its neighbors work on
adjacent microbatches; inter-stage activations move over ICI with
``jax.lax.ppermute``.  All ranks execute the same SPMD program —
``lax.switch`` on the pipeline rank picks the stage, one fixed-size
buffer (width = the widest inter-stage tensor, inferred with
``jax.eval_shape``) carries activations, and the last stage's outputs
are made replicated with a masked ``psum`` at the end.

The stage list is fully general: any callables ``stage(x) -> y`` over
single-tensor activations (each closing over its own parameters), any
pipeline depth equal to the ``pp`` axis size.  Parameter *storage* is
replicated (each rank's closure constants are broadcast by shard_map);
compute is pipelined — per-rank parameter placement is an orthogonal
memory optimization.

Because every collective used (ppermute) is differentiable, the same
structure backpropagates for pipeline-parallel training (grad flows the
reverse permute automatically).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_pipeline_forward(
    mesh: Mesh,
    stages: Sequence[Callable],
    microbatch: int,
    axis: str = "pp",
) -> Callable:
    """Build an N-stage pipelined forward over mesh axis ``axis``.

    ``stages``: callables ``stage(x) -> y``, one per rank of the axis
    (len(stages) must equal the axis size).  Activations between stages
    are single arrays of one common dtype; shapes are inferred with
    ``jax.eval_shape`` at trace time, so stages may change shape freely
    (flatten, project, reshape...).

    SEMANTICS CAVEAT: each stage sees one MICROBATCH at a time, so the
    pipelined forward equals the unsharded stack only for stages that
    act row-independently (the MNIST CNN does).  Stages that mix rows —
    the transformer blocks attend across the microbatch axis and pick
    dynamic quantization scales per call — produce microbatch-size-
    dependent outputs: fwd(x) with microbatch=2 differs from
    microbatch=4 and from blocks(x) on the full batch.  That mirrors
    the reference's per-microbatch execution; pick ``microbatch`` as a
    model choice (the attention window), not a free throughput knob.

    Returns ``fwd(x) -> out`` where ``x`` is the full batch (leading
    dim a multiple of ``microbatch``) and ``out`` is the last stage's
    output for the full batch, replicated on every rank.
    """
    stages = list(stages)
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh must have a '{axis}' axis")
    S = mesh.shape[axis]
    if len(stages) != S:
        raise ValueError(
            f"{len(stages)} stages for a {S}-deep '{axis}' axis — "
            "the pipeline needs exactly one stage per rank")

    def pp_program(x):               # runs per-rank under shard_map
        r = jax.lax.axis_index(axis)
        B = x.shape[0]
        if B % microbatch:
            raise ValueError(f"batch {B} not divisible by microbatch "
                             f"{microbatch}")
        M = B // microbatch

        # ---- infer every inter-stage shape (trace-time, no FLOPs) ----
        shapes: List = [
            jax.ShapeDtypeStruct((microbatch,) + x.shape[1:], x.dtype)]
        for st in stages:
            shapes.append(jax.eval_shape(st, shapes[-1]))
        dtypes = {s.dtype for s in shapes[1:]}
        if len(dtypes) != 1:
            raise ValueError(
                f"stages must share one activation dtype, got {dtypes}")
        dtype = dtypes.pop()
        widths = [int(np.prod(s.shape[1:])) for s in shapes]
        bufw = max(widths[1:])
        out_shape = shapes[-1].shape
        out_w = widths[-1]

        xs = x.reshape(M, microbatch, *x.shape[1:])

        def step(carry, t):
            buf, outs = carry
            mb_idx = jnp.clip(t - r, 0, M - 1)

            def make_branch(i):
                def branch(b):
                    if i == 0:
                        xin = jax.lax.dynamic_index_in_dim(
                            xs, mb_idx, axis=0, keepdims=False)
                    else:
                        xin = b[:, :widths[i]].reshape(
                            shapes[i].shape).astype(shapes[i].dtype)
                    y = stages[i](xin)
                    flat = y.reshape(microbatch, -1)
                    return jnp.pad(
                        flat, ((0, 0), (0, bufw - widths[i + 1])))
                return branch

            y = jax.lax.switch(r, [make_branch(i) for i in range(S)],
                               buf)

            # Last rank finished microbatch t-(S-1): record it.
            done_idx = t - (S - 1)
            valid = jnp.logical_and(r == S - 1,
                                    jnp.logical_and(done_idx >= 0,
                                                    done_idx < M))
            upd = outs.at[jnp.clip(done_idx, 0, M - 1)].set(
                y[:, :out_w])
            outs = jnp.where(valid, upd, outs)

            # Stream activations one hop down the pipe.
            if S > 1:
                buf = jax.lax.ppermute(
                    y, axis, perm=[(i, i + 1) for i in range(S - 1)])
            else:
                buf = y
            return (buf, outs), None

        buf0 = jnp.zeros((microbatch, bufw), dtype)
        outs0 = jnp.zeros((M, microbatch, out_w), dtype)
        (_, outs), _ = jax.lax.scan(
            step, (buf0, outs0), jnp.arange(M + S - 1))

        # outs is populated on the last rank only; make it replicated.
        outs = jnp.where(r == S - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, axis)
        return outs.reshape((B,) + tuple(out_shape[1:]))

    fwd = shard_map(
        pp_program, mesh=mesh,
        in_specs=P(),                 # input replicated to all stages
        out_specs=P(),                # outputs replicated
        check_vma=False)

    return jax.jit(fwd)


# ======================================================================
# Stage builders for the repo's models
# ======================================================================

def mnist_pipeline_stages(params: Dict[str, np.ndarray],
                          n_stages: int = 2) -> List[Callable]:
    """Split the MNIST CNN (models.mnist_cnn geometry: conv1 -> conv2 ->
    2x2 maxpool -> flatten -> fc1 -> fc2) into ``n_stages`` pipeline
    stages (2, 3 or 4)."""
    p = {k: jnp.asarray(v) for k, v in params.items()}

    def conv(v, w, b):
        y = jax.lax.conv_general_dilated(
            v, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + b[None, :, None, None]

    def s_conv1(x):
        return jnp.maximum(conv(x, p["conv1.weight"], p["conv1.bias"]), 0)

    def s_conv2_pool(a):
        a = jnp.maximum(conv(a, p["conv2.weight"], p["conv2.bias"]), 0)
        N, C, H, W = a.shape
        a = a.reshape(N, C, H // 2, 2, W // 2, 2).max(axis=(3, 5))
        return a.reshape(N, -1)

    def s_fc1(h):
        return jnp.maximum(h @ p["fc1.weight"].T + p["fc1.bias"], 0)

    def s_fc2(a):
        return a @ p["fc2.weight"].T + p["fc2.bias"]

    if n_stages == 2:
        return [lambda x: s_conv2_pool(s_conv1(x)),
                lambda h: s_fc2(s_fc1(h))]
    if n_stages == 3:
        return [lambda x: s_conv2_pool(s_conv1(x)), s_fc1, s_fc2]
    if n_stages == 4:
        return [s_conv1, s_conv2_pool, s_fc1, s_fc2]
    raise ValueError(f"MNIST CNN splits into 2-4 stages, not {n_stages}")


def transformer_pipeline_stages(blocks: Sequence, n_stages: int
                                ) -> List[Callable]:
    """Group a stack of transformer encoder blocks
    (models.transformer.TransformerBlockInt8 or any ``block(x) -> x``
    callables) into ``n_stages`` contiguous pipeline stages."""
    blocks = list(blocks)
    if n_stages < 1 or n_stages > len(blocks):
        raise ValueError(
            f"cannot split {len(blocks)} blocks into {n_stages} stages")
    per, extra = divmod(len(blocks), n_stages)
    stages, i = [], 0
    for s in range(n_stages):
        k = per + (1 if s < extra else 0)
        group = blocks[i:i + k]
        i += k

        def stage(x, _group=tuple(group)):
            for blk in _group:
                x = blk(x)
            return x

        stages.append(stage)
    return stages
