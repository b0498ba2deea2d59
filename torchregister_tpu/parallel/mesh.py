"""Device-mesh helpers for multi-chip registration.

The reference has zero distributed machinery (SURVEY.md §2 "Parallelism &
communication inventory") — every capability here is TPU-native new build.
Scaling model: cohort registration is embarrassingly parallel over image
pairs, so the primary mesh axis is ``data`` (batch-sharded via
``NamedSharding``; XLA inserts no collectives). An optional ``space`` axis
shards one spatial dim for volumes larger than a chip's HBM — XLA GSPMD
partitions convolutions with automatic halo exchange over ICI.
"""
from __future__ import annotations

from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] | None = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over available devices. Default: 1-D ``data`` mesh over all
    devices.

    Axes are ``Auto`` (classic GSPMD propagation): cohort programs contain
    ``scan``/``while`` optimizer loops whose carries have no meaningful
    explicit shardings — XLA's propagation handles them; jax 0.9's default
    Explicit axis types would demand manual annotations throughout.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    axis_types = (jax.sharding.AxisType.Auto,) * len(axis_names)
    return jax.make_mesh(
        tuple(shape), tuple(axis_names), devices=devices, axis_types=axis_types
    )


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding placing the leading (batch) axis across ``axis``."""
    return NamedSharding(mesh, P(axis))


def cohort_sharding(
    mesh: Mesh,
    ndim: int = 3,
    spatial_axis: int | None = None,
    data_axis: str = "data",
    space_axis: str = "space",
) -> NamedSharding:
    """Sharding for a batched ``[B, C, *S]`` cohort: batch over ``data_axis``
    and (optionally) spatial dim ``spatial_axis`` over ``space_axis`` — the
    combined data x space layout of a 2-D mesh."""
    spec = [data_axis, None] + [None] * ndim
    if spatial_axis is not None:
        spec[2 + spatial_axis] = space_axis
    return NamedSharding(mesh, P(*spec))


def volume_sharding(
    mesh: Mesh, spatial_axis: int = 0, mesh_axis: str = "space", ndim: int = 3
) -> NamedSharding:
    """Sharding for one ``[N, C, *S]`` volume with spatial dim ``spatial_axis``
    split across ``mesh_axis`` (spatial decomposition for HBM-oversized
    volumes)."""
    spec = [None, None] + [None] * ndim
    spec[2 + spatial_axis] = mesh_axis
    return NamedSharding(mesh, P(*spec))
