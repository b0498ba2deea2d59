"""Resizing ops: nearest resize with torch semantics + average-pool downsampling.

``nearest_resize`` replicates torch ``F.interpolate(mode='nearest')`` exactly
(source index = ``floor(i * in / out)``) — required for bit-faithful parity of
the NMI loss preprocessing (reference utils.py:240-254) and the attention-gate
upsample (utils.py:402).

``downsample_avg`` is the pyramid builder: a 2x average pool per level, which
XLA lowers to ``reduce_window`` and is the idiomatic TPU anti-aliased
downsample for coarse-to-fine registration (no reference counterpart — the
reference is single-resolution).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_spatial",))
def nearest_resize(x: jnp.ndarray, out_spatial: Sequence[int]) -> jnp.ndarray:
    """Nearest resize of ``x [N, C, *S]`` to ``out_spatial`` (torch 'nearest')."""
    spatial = x.shape[2:]
    for axis, (s_in, s_out) in enumerate(zip(spatial, out_spatial)):
        if s_in == s_out:
            continue
        idx = (jnp.arange(s_out) * s_in) // s_out
        x = jnp.take(x, idx, axis=2 + axis)
    return x


@partial(jax.jit, static_argnames=("factor",))
def downsample_avg(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Average-pool downsample of ``x [N, C, *S]`` by ``factor`` per spatial dim.

    Trailing remainder voxels (sizes not divisible by ``factor``) are dropped,
    mirroring pooling-with-floor semantics.
    """
    d = x.ndim - 2
    window = (1, 1) + (factor,) * d
    out = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=window,
        window_strides=window,
        padding="VALID",
    )
    return out / float(factor**d)


@partial(jax.jit, static_argnames=("k", "stride"))
def max_pool(x: jnp.ndarray, k: int = 2, stride: int | None = None) -> jnp.ndarray:
    """Max pool over spatial dims of ``x [N, C, *S]`` (torch MaxPoolNd, floor mode)."""
    stride = k if stride is None else stride
    d = x.ndim - 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1) + (k,) * d,
        window_strides=(1, 1) + (stride,) * d,
        padding="VALID",
    )
