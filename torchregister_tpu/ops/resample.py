"""Multilinear (bilinear/trilinear) resampling — the framework's hot op.

Replaces torch ``F.grid_sample`` (reference warpings.py:25, utils.py:365). The
XLA path below expresses the 2^d-corner gather + blend as one fused gather
expression; under ``jit`` XLA emits a single gather per corner batch and fuses
all weight arithmetic, so each warp is HBM-bandwidth-bound (one pass over the
source per corner plus one over the output). A Pallas kernel for the
bounded-displacement flow case lives in ``ops/pallas/``; this module is the
semantics oracle and the default implementation.

Padding semantics match ``grid_sample(padding_mode='zeros')``: out-of-range
corners contribute 0. Both ``align_corners`` conventions are supported because
the reference mixes them (affine path False at warpings.py:24-25; flow path
True at utils.py:365).
"""
from __future__ import annotations

import itertools
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from .grid import affine_grid, identity_index_grid, normalized_to_index
from .transforms import as_matrix


def _sample_one(src: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Multilinear sample of one image.

    src:    ``[C, *S]`` source image.
    coords: ``[*Sout, d]`` sample locations in **index** coordinates
            (outermost-first).
    returns ``[C, *Sout]``.
    """
    d = src.ndim - 1
    spatial = src.shape[1:]
    out_shape = coords.shape[:-1]
    C = src.shape[0]

    coords = coords.reshape(-1, d)  # [P, d]
    floor = jnp.floor(coords)
    frac = coords - floor
    base = floor.astype(jnp.int32)

    src_flat = src.reshape(C, -1)
    strides = []
    acc = 1
    for s in spatial[::-1]:
        strides.append(acc)
        acc *= s
    strides = jnp.asarray(strides[::-1], dtype=jnp.int32)  # [d]
    sizes = jnp.asarray(spatial, dtype=jnp.int32)

    out = jnp.zeros((C, coords.shape[0]), dtype=src.dtype)
    for corner in itertools.product((0, 1), repeat=d):
        offs = jnp.asarray(corner, dtype=jnp.int32)
        idx = base + offs  # [P, d]
        valid = jnp.all((idx >= 0) & (idx < sizes), axis=-1)  # [P]
        w = jnp.prod(
            jnp.where(jnp.asarray(corner, dtype=bool), frac, 1.0 - frac), axis=-1
        )
        idx_c = jnp.clip(idx, 0, sizes - 1)
        flat = jnp.sum(idx_c * strides, axis=-1)  # [P]
        vals = jnp.take(src_flat, flat, axis=1)  # [C, P]
        out = out + vals * (w * valid).astype(src.dtype)[None, :]
    return out.reshape((C,) + out_shape)


def multilinear_sample(src: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Batched multilinear sampling at index coordinates.

    src:    ``[N, C, *S]``; coords: ``[N, *Sout, d]`` (index coords,
    outermost-first). Returns ``[N, C, *Sout]``.
    """
    return jax.vmap(_sample_one)(src, coords)


@partial(jax.jit, static_argnames=("align_corners",))
def grid_sample(
    src: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """``F.grid_sample`` equivalent (bilinear, zeros padding).

    src: ``[N, C, *S]``; grid: ``[N, *Sout, d]`` normalized coords with the
    torch innermost-first channel order.
    """
    spatial = src.shape[2:]
    # Promote BEFORE the denormalization arithmetic: ((x+1)*S - 1)/2 in bf16
    # has ulp ~1-2 voxels at S~200 — casting after would be dead code on
    # already-quantized indices.
    grid = grid.astype(jnp.promote_types(grid.dtype, jnp.float32))
    coords = normalized_to_index(grid, spatial, align_corners)
    return multilinear_sample(src, coords)


@partial(jax.jit, static_argnames=("align_corners",))
def warp_affine(
    theta: jnp.ndarray, moving: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """The reference's ``get_affine_warp`` (warpings.py:18-26), TPU-native.

    Accepts theta as ``[1, 6]``/``[1, 12]`` flat or ``[N, d, d+1]`` matrix and
    resamples ``moving [N, C, *S]`` through the affine grid
    (``align_corners=False`` both for grid generation and sampling, matching
    warpings.py:24-25). Grid generation fuses into the sampler under jit — no
    HBM-materialized grid.
    """
    theta = as_matrix(theta)
    spatial = moving.shape[2:]
    grid = affine_grid(theta, spatial, align_corners, dtype=jnp.float32)
    return grid_sample(moving, grid, align_corners)


@jax.jit
def warp_flow(src: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """The reference's ``SpatialTransformer`` (utils.py:333-365), TPU-native.

    src: ``[N, C, *S]``; flow: ``[N, d, *S]`` displacement in **voxel units**
    with channel ``i`` displacing spatial dim ``i``. The reference normalizes
    ``grid + flow`` with align_corners=True and immediately denormalizes inside
    grid_sample — an exact round-trip — so here we sample directly at
    ``identity + flow`` index coordinates (zeros padding outside).
    """
    spatial = src.shape[2:]
    d = len(spatial)
    # f32 coordinates even for reduced-precision flows: bf16(150.0 + 0.25)
    # == 150.0 (index ulp is 1.0 beyond 128), which would round every
    # sub-voxel displacement away at larger coordinates.
    cdtype = jnp.promote_types(flow.dtype, jnp.float32)
    ident = identity_index_grid(spatial, dtype=cdtype)  # [d, *S]
    coords = ident[None] + flow.astype(cdtype)  # [N, d, *S]
    coords = jnp.moveaxis(coords, 1, -1)  # [N, *S, d]
    return multilinear_sample(src, coords)
