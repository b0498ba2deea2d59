"""Multi-resolution pyramid utilities for coarse-to-fine registration.

No reference counterpart (the reference is single-resolution); this is the
TPU-first accuracy/throughput lever from SURVEY.md §5 ("long-context" analog):
optimize cheap low-resolution levels first, then refine. Affine-family thetas
transfer across levels unchanged (they live in normalized coordinates); flow
fields upsample with linear interpolation and a voxel-unit rescale.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..ops.resample import warp_flow
from ..ops.resize import downsample_avg


def build_pyramid(x: jnp.ndarray, levels: int, factor: int = 2) -> List[jnp.ndarray]:
    """Pyramid ``[coarsest, ..., full-res]`` of ``x [N, C, *S]`` by repeated
    average-pool downsampling."""
    out = [x]
    for _ in range(levels - 1):
        out.append(downsample_avg(out[-1], factor))
    return out[::-1]


@partial(jax.jit, static_argnames=("out_spatial",))
def upsample_flow(flow: jnp.ndarray, out_spatial: Sequence[int]) -> jnp.ndarray:
    """Upsample a voxel-unit flow ``[N, d, *S]`` to ``out_spatial``, scaling
    displacement magnitudes by the per-axis zoom."""
    in_spatial = flow.shape[2:]
    out = jax.image.resize(
        flow, flow.shape[:2] + tuple(out_spatial), method="linear"
    )
    scale = jnp.asarray(
        [o / i for o, i in zip(out_spatial, in_spatial)], flow.dtype
    ).reshape((1, -1) + (1,) * len(out_spatial))
    return out * scale


@jax.jit
def compose_flows(first: jnp.ndarray, second: jnp.ndarray) -> jnp.ndarray:
    """Compose two displacement fields: applying the returned flow equals
    applying ``first`` then ``second`` (both ``[N, d, *S]``, voxel units).

    ``combined(x) = second(x) + first(x + second(x))`` — the inner field is
    resampled at the outer field's target locations.
    """
    warped_first = warp_flow(first, second)
    return second + warped_first


def compose_flows_separable(
    first: jnp.ndarray, second: jnp.ndarray, max_disp: int
) -> jnp.ndarray:
    """:func:`compose_flows` via the separable sweep warp instead of the
    element gather (XLA gather ≈ 1.1e8 elem/s on v5e — ~0.4 s for a 3-channel
    240³ compose; the sweep is milliseconds). The resample displacement is
    ``second`` itself, so ``max_disp`` need only bound **the outer field's**
    magnitude (e.g. the residual window in field-rebase mode), not the
    composed total. Jit-safe (static window)."""
    from ..ops.separable import warp_flow_separable

    return second + warp_flow_separable(first, second, max_disp=max_disp)
