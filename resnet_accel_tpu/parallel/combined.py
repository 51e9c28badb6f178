"""Combined multi-axis parallelism — dp x pp x tp in ONE mesh program.

The single-axis modules (sharded.py, pipeline.py, heads.py) each prove
one collective pattern in isolation.  Production meshes compose them:
the batch splits over ``dp``, the layer stack splits over ``pp``
(GPipe microbatch streaming with ``ppermute`` hops), and the wide
matmuls inside a stage split over ``tp`` (Megatron column/row parallel
with one ``psum``).  This module runs all three axes jointly in one
``shard_map`` program over a 3-D mesh, forward AND backward — the
composition the reference's v3.0 wish list gestures at
(/root/reference/docs/architecture/ARCHITECTURE.md:655-657) realized
the TPU-native way: named mesh axes + XLA collectives over ICI.

Model: the MNIST CNN (train_mnist.py:32-50 geometry), split as

  pp stage 0:  conv1 -> relu -> conv2 -> relu -> 2x2 maxpool -> flatten
  pp stage 1:  fc1 (column-parallel over tp) -> relu
               -> fc2 (row-parallel over tp)  -> psum(tp) -> +bias

Parameter storage is replicated (each rank slices its tp shard locally
by ``axis_index``); compute is fully sharded.  Every collective used
(ppermute, psum) is differentiable, so the same program backpropagates
— ``make_combined_train_step`` takes Adam steps through the full
3-axis composition.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_combined_mesh(devices, dp: int = 2, pp: int = 2, tp: int = 2
                       ) -> Mesh:
    """A ('dp','pp','tp') mesh over dp*pp*tp devices."""
    n = dp * pp * tp
    devices = list(devices)
    if len(devices) < n:
        raise ValueError(f"mesh {dp}x{pp}x{tp} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:n]).reshape(dp, pp, tp)
    return Mesh(arr, ("dp", "pp", "tp"))


def _check_mesh(mesh: Mesh, tp_feat: int = 128):
    for ax in ("dp", "pp", "tp"):
        if ax not in mesh.axis_names:
            raise ValueError(f"mesh must have a '{ax}' axis")
    if mesh.shape["pp"] != 2:
        raise ValueError("the MNIST CNN splits into exactly 2 pipeline "
                         f"stages; pp={mesh.shape['pp']}")
    if tp_feat % mesh.shape["tp"]:
        raise ValueError(f"tp={mesh.shape['tp']} must divide the fc1 "
                         f"width {tp_feat}")


def make_combined_forward(mesh: Mesh, microbatch: int = 2):
    """fwd(params, x) -> logits with dp-sharded batch, 2-stage pp
    pipeline, and tp-parallel fc layers — one shard_map program.

    ``x``: [B, 1, 28, 28] with B divisible by dp*microbatch; params are
    the plain MNIST dicts (replicated).  Output matches the unsharded
    ``mnist_forward_fp32`` (the CNN stages are row-independent, so
    GPipe microbatching is exact; tp changes only float summation
    order).
    """
    _check_mesh(mesh)
    S = mesh.shape["pp"]
    TP = mesh.shape["tp"]

    def conv(v, w, b):
        y = jax.lax.conv_general_dilated(
            v, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + b[None, :, None, None]

    def program(params, x):          # per-rank under shard_map
        r = jax.lax.axis_index("pp")
        t = jax.lax.axis_index("tp")
        B = x.shape[0]
        if B % microbatch:
            raise ValueError(f"per-dp batch {B} not divisible by "
                             f"microbatch {microbatch}")
        M = B // microbatch

        f1 = params["fc1.weight"].shape[0] // TP      # tp shard width
        # Inter-stage widths: stage0 emits the flattened conv features,
        # stage1 emits the tp-partial logits (bias added after psum).
        h, wd = x.shape[2] - 4, x.shape[3] - 4        # two valid 3x3 convs
        w_feat = params["conv2.weight"].shape[0] * (h // 2) * (wd // 2)
        n_cls = params["fc2.weight"].shape[0]
        bufw = max(w_feat, n_cls)

        w1 = jax.lax.dynamic_slice_in_dim(
            params["fc1.weight"], t * f1, f1, axis=0)
        b1 = jax.lax.dynamic_slice_in_dim(params["fc1.bias"], t * f1, f1)
        w2 = jax.lax.dynamic_slice_in_dim(
            params["fc2.weight"], t * f1, f1, axis=1)

        def stage0(mb):               # conv trunk (replicated weights)
            a = jnp.maximum(
                conv(mb, params["conv1.weight"], params["conv1.bias"]), 0)
            a = jnp.maximum(
                conv(a, params["conv2.weight"], params["conv2.bias"]), 0)
            N, C, H, W = a.shape
            a = a.reshape(N, C, H // 2, 2, W // 2, 2).max(axis=(3, 5))
            return a.reshape(N, -1)

        def stage1(hin):              # tp column->row parallel fc head
            a = jnp.maximum(hin @ w1.T + b1, 0)       # [mb, f1] local
            return a @ w2.T                           # partial logits

        xs = x.reshape(M, microbatch, *x.shape[1:])

        def step(carry, k):
            buf, outs = carry
            mb_idx = jnp.clip(k - r, 0, M - 1)

            def branch0(b):
                mb = jax.lax.dynamic_index_in_dim(
                    xs, mb_idx, axis=0, keepdims=False)
                y = stage0(mb)
                return jnp.pad(y, ((0, 0), (0, bufw - w_feat)))

            def branch1(b):
                hin = b[:, :w_feat]
                y = stage1(hin)
                return jnp.pad(y, ((0, 0), (0, bufw - n_cls)))

            y = jax.lax.switch(r, [branch0, branch1], buf)

            done_idx = k - (S - 1)
            valid = jnp.logical_and(
                r == S - 1,
                jnp.logical_and(done_idx >= 0, done_idx < M))
            upd = outs.at[jnp.clip(done_idx, 0, M - 1)].set(
                y[:, :n_cls])
            outs = jnp.where(valid, upd, outs)

            buf = jax.lax.ppermute(
                y, "pp", perm=[(i, i + 1) for i in range(S - 1)])
            return (buf, outs), None

        buf0 = jnp.zeros((microbatch, bufw), x.dtype)
        outs0 = jnp.zeros((M, microbatch, n_cls), x.dtype)
        (_, outs), _ = jax.lax.scan(
            step, (buf0, outs0), jnp.arange(M + S - 1))

        # outs lives on the last pp rank: replicate over pp, then sum
        # the tp partials into full logits, then the (once-only) bias.
        outs = jnp.where(r == S - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, "pp")
        outs = jax.lax.psum(outs, "tp")
        logits = outs.reshape(B, n_cls) + params["fc2.bias"]
        return logits

    fwd = shard_map(
        program, mesh=mesh,
        in_specs=(P(), P("dp")),      # params replicated, batch over dp
        out_specs=P("dp"),
        check_vma=False)
    return jax.jit(fwd)


def make_combined_train_step(mesh: Mesh, microbatch: int = 2,
                             lr: float = 1e-3):
    """(init_fn, step_fn, shard_batch) — Adam through the full
    dp x pp x tp composed forward.

    step_fn(params, opt_state, x, y) -> (params, opt_state, loss); the
    gradient flows backward through ppermute (reverse hop), psum
    (identity on the cotangent), switch, and scan — the same SPMD
    program, transposed by jax.
    """
    fwd = make_combined_forward(mesh, microbatch=microbatch)
    opt = optax.adam(lr)
    rep = NamedSharding(mesh, P())
    bs = NamedSharding(mesh, P("dp"))

    def init_fn(params: Dict[str, np.ndarray]):
        params = {k: jax.device_put(jnp.asarray(v), rep)
                  for k, v in params.items()}
        opt_state = jax.jit(opt.init)(params)
        return params, opt_state

    def loss_fn(p, xb, yb):
        logits = fwd(p, xb)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()

    @jax.jit
    def step_fn(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_batch(x: np.ndarray, y: np.ndarray):
        return (jax.device_put(jnp.asarray(x), bs),
                jax.device_put(jnp.asarray(y), bs))

    return init_fn, step_fn, shard_batch
