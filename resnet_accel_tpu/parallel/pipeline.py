"""Pipeline parallelism — GPipe-style staged execution over a 'pp' axis.

Beyond-parity scaling demo: the MNIST CNN split into two stages
(stage 0: convs + pool + flatten; stage 1: fc1 + fc2), each resident on
its own device along the ``pp`` mesh axis.  Microbatches stream through
the pipe: at step t, rank 0 runs stage 0 on microbatch t while rank 1
runs stage 1 on the activations it received at t-1; inter-stage
activations move over ICI with ``jax.lax.ppermute``.  All ranks execute
the same SPMD program — ``lax.switch`` on the pipeline rank picks the
stage, a fixed-size buffer carries the inter-stage tensor, and the
logits are made replicated with a masked ``psum`` at the end.

This is the forward path; because every collective used (ppermute) is
differentiable, the same structure backpropagates for pipeline-parallel
training (grad flows the reverse permute automatically).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: Inter-stage buffer width: stage0's output (flatten of 64x12x12).
_FEAT = 9216
_NCLS = 10


def _stage0(params: Dict, x):
    """convs + relu + pool + flatten: [mb, 1, 28, 28] -> [mb, 9216]."""
    def conv(v, w, b):
        y = jax.lax.conv_general_dilated(
            v, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + b[None, :, None, None]

    a = jnp.maximum(conv(x, params["conv1.weight"], params["conv1.bias"]),
                    0)
    a = jnp.maximum(conv(a, params["conv2.weight"], params["conv2.bias"]),
                    0)
    N, C, H, W = a.shape
    a = a.reshape(N, C, H // 2, 2, W // 2, 2).max(axis=(3, 5))
    return a.reshape(N, -1)


def _stage1(params: Dict, h):
    """fc1 + relu + fc2: [mb, 9216] -> [mb, 10]."""
    a = jnp.maximum(h @ params["fc1.weight"].T + params["fc1.bias"], 0)
    return a @ params["fc2.weight"].T + params["fc2.bias"]


def make_pipeline_forward(
    mesh: Mesh,
    params: Dict[str, np.ndarray],
    microbatch: int,
) -> Callable:
    """Build the 2-stage pipelined MNIST forward over mesh axis 'pp'.

    Returns fwd(x [B, 1, 28, 28]) -> logits [B, 10] with B a multiple of
    ``microbatch``.  Parameters are replicated (each rank uses only its
    stage's subset); activations stream rank0 -> rank1 per microbatch.
    """
    if "pp" not in mesh.axis_names:
        raise ValueError("mesh must have a 'pp' axis")
    if mesh.shape["pp"] != 2:
        raise ValueError("this pipeline is 2-stage: pp axis size must be 2")

    params_j = {k: jnp.asarray(v) for k, v in params.items()}

    def pp_program(x):               # runs per-rank under shard_map
        r = jax.lax.axis_index("pp")
        B = x.shape[0]
        M = B // microbatch
        xs = x.reshape(M, microbatch, *x.shape[1:])

        def step(carry, t):
            buf, outs = carry
            # My stage's compute for this step.
            mb_idx = jnp.clip(t, 0, M - 1)

            def run_stage0(_):
                xin = jax.lax.dynamic_index_in_dim(
                    xs, mb_idx, axis=0, keepdims=False)
                return _stage0(params_j, xin)          # [mb, FEAT]

            def run_stage1(b):
                logits = _stage1(params_j, b)          # [mb, 10]
                return jnp.pad(logits,
                               ((0, 0), (0, _FEAT - _NCLS)))

            y = jax.lax.switch(r, [run_stage0, run_stage1], buf)

            # Rank 1 produced logits for microbatch t-1: record them.
            valid = jnp.logical_and(r == 1, t >= 1)
            upd = outs.at[jnp.maximum(t - 1, 0)].set(y[:, :_NCLS])
            outs = jnp.where(valid, upd, outs)

            # Stream stage-0 activations forward along the pipe.
            buf = jax.lax.ppermute(y, "pp", perm=[(0, 1)])
            return (buf, outs), None

        buf0 = jnp.zeros((microbatch, _FEAT), jnp.float32)
        outs0 = jnp.zeros((M, microbatch, _NCLS), jnp.float32)
        (_, outs), _ = jax.lax.scan(
            step, (buf0, outs0), jnp.arange(M + 1))

        # outs is populated on rank 1 only; make it replicated.
        outs = jnp.where(r == 1, outs, 0.0)
        outs = jax.lax.psum(outs, "pp")
        return outs.reshape(B, _NCLS)

    fwd = shard_map(
        pp_program, mesh=mesh,
        in_specs=P(),                 # input replicated to both stages
        out_specs=P(),                # logits replicated
        check_vma=False)

    return jax.jit(fwd)
