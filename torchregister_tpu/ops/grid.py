"""Coordinate-grid generation (the XLA-native replacement for ``F.affine_grid``).

The reference leans on torch's ``F.affine_grid`` (warpings.py:24) with
``align_corners=False``. Here grids are generated as pure ``jnp`` expressions so
XLA fuses them straight into the resampler's index arithmetic — they are never
materialized in HBM on the hot path.

Coordinate conventions
----------------------

* *Normalized* coordinates live in ``[-1, 1]`` per axis, with the torch pixel
  center conventions:
  - ``align_corners=False``: index ``i`` of an axis of size ``S`` sits at
    ``(2*i + 1) / S - 1``.
  - ``align_corners=True``: at ``2*i / (S - 1) - 1``.
* In a *grid tensor* (``[..., d]``), the last axis is ordered innermost-first
  (``x`` = last spatial dim, like torch's ``(x, y, z)``).
* *Index* (pixel/voxel) coordinates are plain array indices, ordered
  outermost-first (``i0, i1, ...``) — the internal canonical form consumed by
  :func:`torchregister_tpu.ops.resample.multilinear_sample`.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _axis_coords(size: int, align_corners: bool, dtype) -> jnp.ndarray:
    i = jnp.arange(size, dtype=dtype)
    if align_corners:
        if size == 1:
            return jnp.zeros((1,), dtype=dtype)
        return 2.0 * i / (size - 1) - 1.0
    return (2.0 * i + 1.0) / size - 1.0


def normalized_grid(
    spatial: Sequence[int], align_corners: bool = False, dtype=jnp.float32
) -> jnp.ndarray:
    """Identity grid of normalized coords, shape ``[*spatial, d]``, last axis
    innermost-first (torch grid convention)."""
    axes = [_axis_coords(s, align_corners, dtype) for s in spatial]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(mesh[::-1], axis=-1)


def affine_grid(
    theta: jnp.ndarray,
    spatial: Sequence[int],
    align_corners: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """``F.affine_grid`` equivalent: ``theta [N, d, d+1]`` -> grid ``[N, *spatial, d]``.

    Row ``r`` of theta maps homogeneous normalized output coords ``(x, y[, z], 1)``
    to the source's normalized coordinate ``r`` (``x`` first). Matches torch
    semantics used at reference warpings.py:24.
    """
    d = len(spatial)
    base = normalized_grid(spatial, align_corners, dtype)  # [*S, d]
    theta = theta.astype(dtype)
    # out[n, ..., r] = sum_k theta[n, r, k] * base[..., k] + theta[n, r, d].
    # Expressed as explicit multiply-adds (k = d+1 is tiny) so it runs on the
    # VPU in full f32 — jnp.einsum would route through dot_general, whose
    # default matmul precision is reduced on TPU.
    bcast = theta.reshape(theta.shape[0:1] + (1,) * len(spatial) + theta.shape[1:])
    out = bcast[..., :, d]  # translation column [N, 1...1, d]
    for k in range(d):
        out = out + bcast[..., :, k] * base[..., k][None, ..., None]
    return out


def identity_index_grid(spatial: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
    """Identity grid in index coordinates, shape ``[d, *spatial]``, channel ``i``
    holding the index along spatial dim ``i`` — the layout of the reference's
    ``SpatialTransformer`` buffer (utils.py:343-348) and of dense flow fields."""
    axes = [jnp.arange(s, dtype=dtype) for s in spatial]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(mesh, axis=0)


def normalized_to_index(
    coords: jnp.ndarray, spatial: Sequence[int], align_corners: bool
) -> jnp.ndarray:
    """Convert a grid-convention normalized coord tensor ``[..., d]`` (x first)
    into index coords ``[..., d]`` (outermost dim first), torch ``grid_sample``
    denormalization semantics."""
    d = len(spatial)
    idx_order = coords[..., ::-1]  # now outermost-first
    sizes = jnp.asarray(spatial, dtype=coords.dtype)
    if align_corners:
        return (idx_order + 1.0) / 2.0 * (sizes - 1.0)
    return ((idx_order + 1.0) * sizes - 1.0) / 2.0
