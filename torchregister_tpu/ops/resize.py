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

import numpy as np
import jax
import jax.numpy as jnp


def axis_nearest_resize(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    """Nearest resize along one axis via a static one-hot matmul.

    torch-'nearest' semantics (``src = (i * in) // out``). A ``jnp.take`` with
    an index array would lower to an XLA gather — near-scalar throughput on
    TPU, and its transpose (the backward) to a scatter. The index map is
    static, so instead contract with a one-hot ``[out, in]`` selector on the
    MXU: exact (one nonzero per row), fast, and its transpose is just the
    transposed matmul.
    """
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    idx = (np.arange(out_size) * in_size) // out_size
    onehot = jnp.asarray(np.eye(in_size, dtype=np.float32)[idx])  # [out, in]
    xm = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum(
        "...i,oi->...o", xm, onehot, precision=jax.lax.Precision.HIGHEST
    )
    # Selection is exact (one 1.0 per row) and the f32 contraction represents
    # bf16/int(<2^24) values exactly — cast back so the op preserves dtype
    # like torch F.interpolate (a bf16 network's gate maps must stay bf16).
    return jnp.moveaxis(y.astype(x.dtype), -1, axis)


@partial(jax.jit, static_argnames=("out_spatial",))
def nearest_resize(x: jnp.ndarray, out_spatial: Sequence[int]) -> jnp.ndarray:
    """Nearest resize of ``x [N, C, *S]`` to ``out_spatial`` (torch 'nearest')."""
    spatial = x.shape[2:]
    if len(out_spatial) != len(spatial):
        raise ValueError(
            f"nearest_resize: out_spatial {tuple(out_spatial)} has "
            f"{len(out_spatial)} dims for input spatial shape {spatial} "
            f"({len(spatial)} dims) — zip would silently skip axes"
        )
    for axis, (s_in, s_out) in enumerate(zip(spatial, out_spatial)):
        x = axis_nearest_resize(x, 2 + axis, s_out)
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
