"""Sharded training and serving — dp/tp over a device mesh.

- ``make_sharded_train_step``: the MNIST trainer's Adam step jitted over
  a ('dp','tp') mesh: batch split over dp (XLA all-reduces gradients),
  fc1's output features split over tp (XLA all-gathers the activations
  column-shards).  This is the "full training step over the mesh" entry
  the framework exposes for multi-chip scaling.
- ``make_data_parallel_forward``: batched INT8 serving with the batch
  sharded over dp — the images/sec/chip north star multiplies by chips
  with no code change.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from resnet_accel_tpu.train.mnist import mnist_forward_fp32


def _param_shardings(mesh: Mesh, params: Dict) -> Dict:
    """fc1.weight [128, 9216] rows over tp; everything else replicated.

    (The conv weights are small; sharding their tiny channel dims over
    ICI would cost more in collectives than it saves.)
    """
    out = {}
    for name in params:
        if name == "fc1.weight":
            out[name] = NamedSharding(mesh, P("tp", None))
        elif name == "fc1.bias":
            out[name] = NamedSharding(mesh, P("tp"))
        else:
            out[name] = NamedSharding(mesh, P())
    return out


def make_sharded_train_step(
    mesh: Mesh,
    lr: float = 1e-3,
    forward: Callable = mnist_forward_fp32,
):
    """Build (init_fn, step_fn) for a dp x tp sharded Adam train step.

    step_fn(params, opt_state, x, y) -> (params, opt_state, loss) with
    x sharded P('dp') on batch and fc1 sharded P('tp') on features.
    """
    opt = optax.adam(lr)

    def init_fn(params: Dict[str, np.ndarray]):
        shardings = _param_shardings(mesh, params)
        params = {k: jax.device_put(jnp.asarray(v), shardings[k])
                  for k, v in params.items()}
        # Adam moments inherit each param's sharding automatically.
        opt_state = jax.jit(opt.init)(params)
        return params, opt_state

    def loss_fn(p, xb, yb):
        logits = forward(p, xb)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()

    @jax.jit
    def step_fn(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_batch(x: np.ndarray, y: np.ndarray):
        bs = NamedSharding(mesh, P("dp"))
        return (jax.device_put(jnp.asarray(x), bs),
                jax.device_put(jnp.asarray(y), bs))

    return init_fn, step_fn, shard_batch


def make_data_parallel_forward(
    model,
    make_forward: Callable,
    mesh: Mesh,
    use_pallas: bool = False,
    backend: Optional[str] = None,
):
    """Jit a model forward with the batch sharded over dp.

    Returns (fwd, put_batch): params are replicated once across the mesh;
    fwd(params, x) runs each dp shard's slice on its own chip.  The XLA
    op path is used under sharding (Pallas kernels are per-chip; they
    compose with shard_map and remain available single-chip).
    """
    forward = make_forward(model, use_pallas=use_pallas, backend=backend)
    rep = NamedSharding(mesh, P())
    params = {k: jax.device_put(v, rep)
              for k, v in model.as_device_params().items()}
    bs = NamedSharding(mesh, P("dp"))
    fwd = jax.jit(forward, in_shardings=(None, bs))

    def put_batch(x: np.ndarray):
        return jax.device_put(jnp.asarray(x, jnp.float32), bs)

    return fwd, params, put_batch
