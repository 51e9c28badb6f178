"""INT8 pooling ops (JAX) — bit-exact with the numpy goldens.

- maxpool2d: window max via lax.reduce_window (scale-preserving, int8).
- global avgpool: int32 sum + the golden's (sum + HW/2) / HW with C
  truncating division (golden_models.cpp:601-628) — lax.div on int32 IS
  C-style truncation, so the semantics carry over exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def maxpool2d_int8(
    x: jnp.ndarray, pool_size: int, stride: int, padding: int = 0
) -> jnp.ndarray:
    """[N, C, H, W] int8 -> window max.  Padding cells hold INT8_MIN so
    they never win (matches golden maxpool2d_int8 with padding)."""
    return jax.lax.reduce_window(
        x,
        jnp.int8(-128),
        jax.lax.max,
        window_dimensions=(1, 1, pool_size, pool_size),
        window_strides=(1, 1, stride, stride),
        padding=((0, 0), (0, 0), (padding, padding), (padding, padding)),
    )


def avgpool_global_int8(x: jnp.ndarray) -> jnp.ndarray:
    """[N, C, H, W] int8 -> [N, C] int8 with golden rounding semantics."""
    N, C, H, W = x.shape
    hw = H * W
    s = jnp.sum(x.astype(jnp.int32), axis=(2, 3)) + jnp.int32(hw // 2)
    avg = jax.lax.div(s, jnp.int32(hw))  # trunc toward zero, like C
    return jnp.clip(avg, -128, 127).astype(jnp.int8)


def maxpool2d_int8_nhwc(
    x: jnp.ndarray, pool_size: int, stride: int, padding: int = 0
) -> jnp.ndarray:
    """[N, H, W, C] variant of maxpool2d_int8 (same semantics)."""
    return jax.lax.reduce_window(
        x,
        jnp.int8(-128),
        jax.lax.max,
        window_dimensions=(1, pool_size, pool_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avgpool_global_int8_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, C] with the golden trunc-div rounding."""
    N, H, W, C = x.shape
    hw = H * W
    s = jnp.sum(x.astype(jnp.int32), axis=(1, 2)) + jnp.int32(hw // 2)
    avg = jax.lax.div(s, jnp.int32(hw))
    return jnp.clip(avg, -128, 127).astype(jnp.int8)
