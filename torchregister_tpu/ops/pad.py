"""Center pad/crop utilities (the reference's ``padNd``, utils.py:271-277).

The reference builds a reversed ``F.pad`` tuple so that every spatial dim gets
``floor(delta/2)`` on the leading side and ``ceil(delta/2)`` on the trailing
side. Negative deltas (target smaller than input) crop with the same split,
matching torch's negative-pad semantics. Implemented with static shapes so it
is jit-safe (shapes are trace-time constants).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def pad_spatial(
    x: jnp.ndarray,
    target_spatial: Sequence[int],
    first_axis: int,
    mode: str = "constant",
    value: float = 0.0,
) -> jnp.ndarray:
    """Center pad/crop ``len(target_spatial)`` consecutive axes of ``x``
    starting at ``first_axis`` (layout-agnostic core of :func:`pad_nd`)."""
    nd = len(target_spatial)
    spatial = x.shape[first_axis : first_axis + nd]

    slices = [slice(None)] * x.ndim
    pads = [(0, 0)] * x.ndim
    for axis, (s, t) in enumerate(zip(spatial, target_spatial)):
        delta = t - s
        if delta >= 0:
            pads[first_axis + axis] = (delta // 2, delta - delta // 2)
        else:
            # torch F.pad with negative pads crops; with the reference's
            # (floor(delta/2), ceil(delta/2)) split a negative delta crops
            # ceil(|delta|/2) from the leading side.
            c = -delta
            lead = (c + 1) // 2
            slices[first_axis + axis] = slice(lead, s - (c - lead))
    x = x[tuple(slices)]
    if any(p != (0, 0) for p in pads):
        if mode == "constant":
            x = jnp.pad(x, pads, mode="constant", constant_values=value)
        else:
            x = jnp.pad(x, pads, mode=mode)
    return x


def pad_nd(
    x: jnp.ndarray,
    target_spatial: Sequence[int],
    mode: str = "constant",
    value: float = 0.0,
) -> jnp.ndarray:
    """Center pad/crop the spatial dims of ``x [N, C, *S]`` to ``target_spatial``."""
    assert x.ndim - 2 == len(target_spatial), (x.shape, target_spatial)
    return pad_spatial(x, target_spatial, first_axis=2, mode=mode, value=value)


def pad_like(x: jnp.ndarray, target: jnp.ndarray, mode: str = "constant", value: float = 0.0) -> jnp.ndarray:
    """``padNd(input_, target)`` parity helper: pad/crop ``x`` to ``target``'s spatial shape."""
    return pad_nd(x, target.shape[2:], mode=mode, value=value)
