"""Expert parallelism — MoE experts sharded over the ``ep`` mesh axis.

Each rank holds E/ep of the experts (weight sharding — the point of
expert parallelism: expert parameters don't fit one chip).  Tokens stay
replicated; every rank runs its LOCAL experts over the token set, masks
the tokens routed to other ranks' experts, and a ``psum`` over ``ep``
assembles the output.  Numerically identical to the single-device MoE
block (same dense-compute-and-mask formulation).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from resnet_accel_tpu.models.moe import MoEBlockInt8


def make_ep_moe_forward(mesh: Mesh, moe: MoEBlockInt8) -> Callable:
    """Jit an expert-parallel forward: fwd(x [T, D]) -> [T, D].

    Experts are partitioned contiguously over the 'ep' axis; the expert
    loop inside each rank covers only its local slice.
    """
    if "ep" not in mesh.axis_names:
        raise ValueError("mesh must have an 'ep' axis")
    ep = mesh.shape["ep"]
    E = moe.n_experts
    if E % ep:
        raise ValueError(f"{E} experts not divisible by ep={ep}")
    per_rank = E // ep

    def ep_program(x):
        r = jax.lax.axis_index("ep")
        sel = moe.route(x)                             # replicated routing
        out = jnp.zeros_like(x)
        # Local experts: global ids r*per_rank .. r*per_rank+per_rank-1.
        # The expert WEIGHTS are python-level (sharded by construction of
        # the branch): lax.switch picks this rank's branch so only its
        # experts' weights are touched at runtime.
        def rank_branch(rank_id):
            def run(_x):
                o = jnp.zeros_like(_x)
                for j in range(per_rank):
                    e = rank_id * per_rank + j
                    y = moe._expert_fwd(e, _x)
                    mask = (sel == e)[:, None]
                    o = jnp.where(mask, y, o)
                return o
            return run

        out = jax.lax.switch(r, [rank_branch(i) for i in range(ep)], x)
        return jax.lax.psum(out, "ep")

    fwd = shard_map(
        ep_program, mesh=mesh,
        in_specs=P(),
        out_specs=P(),
        check_vma=False)
    return jax.jit(fwd)
