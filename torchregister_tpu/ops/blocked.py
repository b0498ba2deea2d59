"""Blocked exact resampler — fast grid_sample-parity warps for user-facing calls.

Why this exists: the one-shot exact warp (``ops/resample.py``) is a per-voxel
8-corner gather, and XLA:TPU lowers per-element gathers to ~1.1e8 elem/s
(~1 s per 240^3 warp, BASELINE.md resampler table). The optimization engines
avoid it with the gather-free separable sweep (O(h^2) multi-pass
approximation), but the *user-facing* final warp (``Register.__call__``, CLI
``apply``, reference warpings.py:24-25 / utils.py:365 semantics) wants exact
trilinear values. This module restructures the exact warp into a TPU-shaped
program:

1. Partition the output into ``TILE^3`` tiles. For each tile the
   source support of all its trilinear stencils is a ``B^3`` block whose origin
   is ``min(floor(q))`` over the tile (q = per-voxel source coordinates).
2. Fetch all tile blocks with ONE ``lax.gather`` of ``(B,B,B)`` slices — a
   slice-granular gather (27k DMA-friendly slices for 240^3) instead of 110M
   element gathers. Measured ~5 GB/s vs ~0.4 GB/s element gathering.
3. Reconstruct exact trilinear values by per-axis *hat-function contractions*
   against absolute source positions:

   ``out[v] = sum_{a,b,c} hat(qz[v]-za) hat(qy[v]-yb) hat(qx[v]-xc) blk[a,b,c]``

   evaluated as three chained einsums (MXU work, ``precision='highest'`` —
   the TPU default matmul precision is bf16 and would cost ~1e-2 error).
   Each hat has exactly two nonzeros, so this reproduces the 8-corner formula
   bit-for-bit up to f32 summation order.

Zeros padding falls out for free: block origins are clamped into the volume
and hats are evaluated against *absolute* in-volume positions, so any corner
outside the volume simply has no support row in the block — identical to
``grid_sample(padding_mode='zeros')`` (the reference's convention).

The block size ``B`` must statically bound the per-tile support extent.
``required_block_*`` derive it from a concrete theta / flow displacement
bound; the eager wrappers do this automatically (one tiny host sync), while
jit users pass ``block=`` explicitly. Where the blocked path doesn't apply
(2D, tiny volumes, extreme transforms) the wrappers fall back to the exact
element-gather path, never silently losing support.

Measured on v5e at 240^3 f32: 76 ms (tile 10, B=14, 0.22-rad rotation) —
vs 989 ms for the element-gather exact path (13x).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .separable import _index_map_np, affine_to_index_map
from .transforms import as_matrix

TILE = 10  # output tile edge; best v5e balance of slice-gather latency
# (fewer, larger slices) vs hat-contraction FLOPs (which grow as B^3):
# measured 240^3 f32: tile 8 -> 97 ms, tile 10 -> 76 ms, tile 16 -> 103 ms
_MAX_BLOCK = 48  # beyond this the blocked path loses to plain gather


def required_block_affine(theta, spatial: Sequence[int], align_corners: bool = False) -> int:
    """Smallest valid ``B`` for a *concrete* theta: the max per-axis source
    extent of one output tile, ``ceil(TILE * max_axis sum_j |M[a,j]|) + 3``.

    Host-side (``separable._index_map_np`` — eager device ops cost ~0.1-1 s
    each over remote transports)."""
    theta = np.asarray(jax.device_get(theta), np.float64)
    if theta.ndim == 3:
        theta = theta[0]
    if theta.ndim == 1 or theta.shape[0] == 1:
        theta = theta.reshape(3, 4)
    M, _ = _index_map_np(theta, spatial, align_corners)
    ext = (TILE - 1) * np.abs(M).sum(axis=1).max() + 3.0
    return int(math.ceil(ext))


def required_block_flow(max_disp: float) -> int:
    """Valid ``B`` for a flow warp with ``max |flow| <= max_disp`` (worst-case
    bound; :func:`flow_tile_extent` gives the much tighter smooth-flow one)."""
    return int(TILE + 2 * math.ceil(float(max_disp)) + 3)


@jax.jit
def flow_tile_extent(flow: jnp.ndarray) -> jnp.ndarray:
    """Max within-tile extent of the sample coordinates ``q = identity + flow``
    over all TILE^3 output tiles — the tight block-size requirement.

    Smooth (U-Net-regularized) flows have small within-tile ranges even at
    large absolute displacement, since the block *origin* absorbs the
    per-tile mean. One scalar; the eager wrapper reads it back once.
    """
    spatial = flow.shape[2:]
    grids = [-(-s // TILE) for s in spatial]
    ident = [
        jnp.arange(spatial[i], dtype=jnp.float32).reshape(
            tuple(spatial[i] if j == i else 1 for j in range(3))
        )
        for i in range(3)
    ]
    # f32 coordinate math: a bf16 flow quantizes identity+flow to ~1-2 voxels
    # near coordinate 240, which can under-estimate the extent past the +3
    # margin and under-size the block.
    q = flow[0].astype(jnp.float32) + jnp.stack(jnp.broadcast_arrays(*ident))
    pads = [(0, grids[i] * TILE - spatial[i]) for i in range(3)]
    # edge-replicate so padding voxels never widen a tile's extent
    qp = jnp.pad(q, [(0, 0)] + pads, mode="edge")
    qt = qp.reshape(
        3, grids[0], TILE, grids[1], TILE, grids[2], TILE
    ).transpose(0, 1, 3, 5, 2, 4, 6).reshape(3, -1, TILE ** 3)
    ext = jnp.max(qt, axis=-1) - jnp.min(qt, axis=-1)
    return jnp.max(ext)


def _hat_contract(blk, qc, org, B: int):
    """Exact trilinear values of per-tile blocks ``blk [n, C, B, B, B]``
    (fetched at integer origins ``org [n, 3]``) at coords ``qc [n, V, 3]``
    via per-axis hat-function contractions. Returns ``[n, C, V]``."""
    iota = jnp.arange(B, dtype=jnp.float32)
    pos = org.astype(jnp.float32)[:, :, None] + iota  # [n, 3, B]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(qc[:, :, :, None] - pos[:, None]))
    hi = jax.lax.Precision.HIGHEST
    t1 = jnp.einsum("tva,tcabx->tcvbx", w[:, :, 0], blk, precision=hi)
    t2 = jnp.einsum("tvb,tcvbx->tcvx", w[:, :, 1], t1, precision=hi)
    return jnp.einsum("tvx,tcvx->tcv", w[:, :, 2], t2, precision=hi)


def _hat_block_resample(vol, q, spatial, B: int, chunk: int):
    """Exact multilinear resample of ``vol [C,*S]`` at coords ``q [T,V,d]``
    (index space, tile-major), via slice-gather + hat contractions.

    Returns ``[T, C, V]``. 3D only.
    """
    C = vol.shape[0]
    sizes = jnp.asarray(spatial, jnp.int32)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2, 3),
    )

    def do_chunk(qc):  # [chunk, V, 3]
        qf = jnp.floor(qc)
        org = jnp.clip(jnp.min(qf, axis=1).astype(jnp.int32), 0, sizes - B)
        blk = jax.lax.gather(
            vol, org, dn, slice_sizes=(C, B, B, B),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # [chunk, C, B, B, B]
        return _hat_contract(blk, qc, org, B)

    T = q.shape[0]
    n_chunks = -(-T // chunk)
    pad = n_chunks * chunk - T
    qp = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
    out = jax.lax.map(do_chunk, qp.reshape(n_chunks, chunk, -1, 3))
    return out.reshape(n_chunks * chunk, C, -1)[:T]


def _tile_grid(spatial):
    """Tile origins ``[T,3]`` and local offsets ``[V,3]`` covering ``spatial``
    (padded up to TILE multiples; callers slice the excess away)."""
    grids = [-(-s // TILE) for s in spatial]
    axes = [jnp.arange(g) * TILE for g in grids]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    tile_org = jnp.stack([m.ravel() for m in mesh], -1)  # [T, 3]
    l = jnp.arange(TILE)
    lm = jnp.meshgrid(l, l, l, indexing="ij")
    loc = jnp.stack([m.ravel() for m in lm], -1)  # [V, 3]
    return grids, tile_org, loc


def _untile(out_tcv, grids, spatial, C):
    GZ, GY, GX = grids
    out = out_tcv.reshape(GZ, GY, GX, C, TILE, TILE, TILE)
    out = out.transpose(3, 0, 4, 1, 5, 2, 6).reshape(
        C, GZ * TILE, GY * TILE, GX * TILE
    )
    return out[:, : spatial[0], : spatial[1], : spatial[2]]


SUB = 4  # sub-tiles per super-tile edge (at the default stile)
SUPER = SUB * TILE  # super-tile edge (40): the slice-gather granularity
SUPER_STILE = TILE  # sub-tile edge used by warp_affine_fast (divisor of
# SUPER; the hat-contraction MACs/voxel scale as Bs^3 ~ (stile*rowsum+6)^3,
# so smaller stiles trade einsum shape efficiency for much fewer FLOPs)


def _supertile_plan(theta, spatial: Sequence[int], align_corners: bool = False,
                    stile: int = TILE):
    """Host-side sizing for :func:`warp_affine_supertile`: ``(block_sub,
    block_super, pad)``.

    The key fact making the super-tile decomposition work for *affine* maps:
    the source-window offset of sub-tile ``d`` inside its super-tile's block,
    ``floor(stile * d @ M.T - min_d ...)``, is the SAME for every super-tile
    (linearity) — so the per-sub-tile restack is ``(SUPER/stile)^3``
    ``dynamic_slice`` ops with *traced* starts, not a 13k-slice gather, and
    none of the sizing here depends on ``t`` alone shifting (no per-theta
    recompile beyond the quantized sizes).
    """
    assert SUPER % stile == 0
    sub = SUPER // stile
    theta = np.asarray(jax.device_get(theta), np.float64)
    if theta.ndim == 3:
        theta = theta[0]
    if theta.ndim == 1 or theta.shape[0] == 1:
        theta = theta.reshape(3, 4)
    M, t = _index_map_np(theta, spatial, align_corners)
    rows = np.abs(M).sum(axis=1)
    # sub-tile support extent (stile-1 output steps) + floor/base slack
    Bs = int(math.ceil((stile - 1) * rows.max())) + 5
    Bs += -Bs % 2
    dgrid = np.stack(np.meshgrid(*[np.arange(sub)] * 3, indexing="ij"), -1)
    c = float(stile) * dgrid.reshape(-1, 3) @ M.T  # [sub^3, 3]
    offs = np.floor(c - c.min(axis=0))
    B2 = int(offs.max()) + Bs
    B2 += -B2 % 4
    # exact base range over all super-tiles (for zero-padding the volume so
    # block origins never need clipping — clipped origins would break the
    # uniform-offset structure at volume edges)
    Gs = [-(-s // SUPER) for s in spatial]
    # corners of every super box, vectorized: super origins [T2, 3]
    og = np.stack(
        np.meshgrid(*[np.arange(g) * SUPER for g in Gs], indexing="ij"), -1
    ).reshape(-1, 3).astype(np.float64)
    corn = np.stack(
        np.meshgrid(*[np.array([0.0, SUPER - 1.0])] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    qc = (og[:, None, :] + corn[None, :, :]) @ M.T + t  # [T2, 8, 3]
    base = np.floor(qc.min(axis=1)) - 1.0  # [T2, 3]
    pad = max(
        0.0,
        float(-base.min()),
        float((base + B2 - np.asarray(spatial, np.float64)).max()),
    )
    P = int(math.ceil(pad)) + 2  # +2: device f32 vs host f64 floor drift
    P += -P % 8
    return Bs, B2, P


@partial(jax.jit, static_argnames=("align_corners", "block_sub",
                                   "block_super", "pad", "chunk", "stile"))
def warp_affine_supertile(
    theta: jnp.ndarray,
    moving: jnp.ndarray,
    align_corners: bool = False,
    block_sub: int = 16,
    block_super: int = 64,
    pad: int = 56,
    chunk: int = 432,
    stile: int = TILE,
) -> jnp.ndarray:
    """Exact affine warp (grid_sample parity) via SUPER^3 slice gathers +
    uniform-offset sub-tile restack — the latency fix for the blocked
    resampler: 216 slice fetches at 240^3 instead of 13824 (the per-slice
    ~3.3 us XLA gather latency was ~60 of its 76 ms).

    ``stile`` is the hat-contraction sub-tile edge (any divisor of SUPER):
    the restack slices ``(SUPER/stile)^3`` sub-blocks per super-tile and the
    contraction runs ``block_sub^3`` MACs per output voxel.

    Sizing must come from :func:`_supertile_plan` for this theta AND stile
    (the eager wrapper :func:`warp_affine_fast` does this); reference
    semantics warpings.py:18-26 (zeros padding, align_corners=False default).
    """
    assert SUPER % stile == 0
    SUB_N = SUPER // stile
    theta = as_matrix(theta)
    spatial = moving.shape[2:]
    assert moving.shape[0] == 1 and len(spatial) == 3
    C = moving.shape[1]
    Bs, B2, P = block_sub, block_super, pad
    M, t = affine_to_index_map(theta[0], spatial, align_corners)

    Gs = [-(-s // SUPER) for s in spatial]
    T2 = Gs[0] * Gs[1] * Gs[2]
    og = jnp.stack(
        jnp.meshgrid(*[jnp.arange(g, dtype=jnp.float32) * SUPER for g in Gs],
                     indexing="ij"), -1
    ).reshape(-1, 3)  # [T2, 3]

    # Super-block origins: floor(min over the 8 corners of each super box) - 1
    # (the min of a linear map over a box sits at a corner — exact).
    corn = jnp.stack(
        jnp.meshgrid(*[jnp.asarray([0.0, SUPER - 1.0])] * 3, indexing="ij"), -1
    ).reshape(1, 8, 3)
    oc = og[:, None, :] + corn  # [T2, 8, 3]
    qcorn = jnp.stack(
        [
            M[s, 0] * oc[..., 0] + M[s, 1] * oc[..., 1] + M[s, 2] * oc[..., 2]
            + t[s]
            for s in range(3)
        ],
        axis=-1,
    )
    base = jnp.floor(jnp.min(qcorn, axis=1)) - 1.0  # [T2, 3] float
    sizes = jnp.asarray(spatial, jnp.int32)
    base_i = jnp.clip(base.astype(jnp.int32) + P, 0, sizes + 2 * P - B2)

    volp = jnp.pad(moving[0], ((0, 0),) + ((P, P),) * 3)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2, 3),
    )
    supers = jax.lax.gather(
        volp, base_i, dn, slice_sizes=(C, B2, B2, B2),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [T2, C, B2, B2, B2]

    # Uniform sub-tile offsets (same for every super-tile — linearity):
    dgrid = jnp.stack(
        jnp.meshgrid(*[jnp.arange(SUB_N, dtype=jnp.float32)] * 3,
                     indexing="ij"),
        -1,
    ).reshape(-1, 3)  # [SUB_N^3, 3]
    c_d = float(stile) * jnp.einsum("dj,aj->da", dgrid, M)  # [SUB_N^3, 3]
    offs = jnp.floor(c_d - jnp.min(c_d, axis=0)).astype(jnp.int32)
    offs = jnp.clip(offs, 0, B2 - Bs)  # no-op under a correct plan

    nsub = SUB_N ** 3
    blk = jnp.stack(
        [
            jax.lax.dynamic_slice(
                supers, (0, 0, offs[d, 0], offs[d, 1], offs[d, 2]),
                (T2, C, Bs, Bs, Bs),
            )
            for d in range(nsub)
        ],
        axis=1,
    ).reshape(T2 * nsub, C, Bs, Bs, Bs)

    # Per-tile block origins in UNPADDED index space + output coordinates,
    # ordered (super z,y,x) major, (sub z,y,x), then tile-local (z,y,x).
    org = (base_i[:, None, :] - P + offs[None, :, :]).reshape(-1, 3)
    l = jnp.arange(stile, dtype=jnp.float32)
    loc = jnp.stack(jnp.meshgrid(l, l, l, indexing="ij"), -1).reshape(-1, 3)
    o = (
        og[:, None, None, :]
        + float(stile) * dgrid[None, :, None, :]
        + loc[None, None, :, :]
    )  # [T2, SUB_N^3, V, 3]
    q = jnp.stack(
        [
            M[s, 0] * o[..., 0] + M[s, 1] * o[..., 1] + M[s, 2] * o[..., 2]
            + t[s]
            for s in range(3)
        ],
        axis=-1,
    ).reshape(T2 * nsub, stile ** 3, 3)

    T = T2 * nsub
    n_chunks = -(-T // chunk)
    padn = n_chunks * chunk - T
    blk_p = jnp.pad(blk, ((0, padn),) + ((0, 0),) * 4)
    q_p = jnp.pad(q, ((0, padn), (0, 0), (0, 0)))
    org_p = jnp.pad(org, ((0, padn), (0, 0)))
    out = jax.lax.map(
        lambda args: _hat_contract(args[0], args[1], args[2], Bs),
        (
            blk_p.reshape(n_chunks, chunk, C, Bs, Bs, Bs),
            q_p.reshape(n_chunks, chunk, -1, 3),
            org_p.reshape(n_chunks, chunk, 3),
        ),
    )
    out = out.reshape(n_chunks * chunk, C, -1)[:T]

    # Untile: (sz,sy,sx),(dz,dy,dx),(vz,vy,vx) -> [C, *S]
    out = out.reshape(Gs[0], Gs[1], Gs[2], SUB_N, SUB_N, SUB_N, C,
                      stile, stile, stile)
    out = out.transpose(6, 0, 3, 7, 1, 4, 8, 2, 5, 9).reshape(
        C, Gs[0] * SUPER, Gs[1] * SUPER, Gs[2] * SUPER
    )
    return out[None, :, : spatial[0], : spatial[1], : spatial[2]]


@partial(jax.jit, static_argnames=("align_corners", "block", "chunk"))
def warp_affine_blocked(
    theta: jnp.ndarray,
    moving: jnp.ndarray,
    align_corners: bool = False,
    block: int = 16,
    chunk: int = 432,
) -> jnp.ndarray:
    """Exact affine warp (grid_sample parity, reference warpings.py:18-26)
    via the blocked resampler. 3D, batch 1.

    ``block`` must be >= :func:`required_block_affine` for this theta or
    support is silently truncated — use :func:`warp_affine_fast` (eager) to
    have it derived and checked automatically.
    """
    theta = as_matrix(theta)
    spatial = moving.shape[2:]
    assert moving.shape[0] == 1 and len(spatial) == 3
    M, t = affine_to_index_map(theta[0], spatial, align_corners)

    grids, tile_org, loc = _tile_grid(spatial)
    o = (tile_org[:, None, :] + loc[None]).astype(jnp.float32)  # [T, V, 3]
    # Exact f32 coordinate math (3x3): explicit FMAs, no reduced-precision dot.
    q = jnp.stack(
        [
            M[s, 0] * o[..., 0] + M[s, 1] * o[..., 1] + M[s, 2] * o[..., 2] + t[s]
            for s in range(3)
        ],
        axis=-1,
    )
    out = _hat_block_resample(moving[0], q, spatial, block, chunk)
    return _untile(out, grids, spatial, moving.shape[1])[None]


@partial(jax.jit, static_argnames=("block", "chunk"))
def warp_flow_blocked(
    src: jnp.ndarray,
    flow: jnp.ndarray,
    block: int = 24,
    chunk: int = 432,
) -> jnp.ndarray:
    """Exact dense-flow warp (reference utils.py:333-365 semantics) via the
    blocked resampler. 3D, batch 1.

    ``block`` must be >= :func:`required_block_flow` of the true ``max|flow|``
    — use :func:`warp_flow_fast` (eager) for automatic derivation.
    """
    spatial = src.shape[2:]
    assert src.shape[0] == 1 and len(spatial) == 3
    grids, tile_org, loc = _tile_grid(spatial)
    o = tile_org[:, None, :] + loc[None]  # [T, V, 3] int
    # flow is [1, 3, *S] with channel i displacing axis i (voxel units)
    Sp = [g * TILE for g in grids]
    # Edge-pad (NOT zero-pad): in a partial boundary tile, zero-flow pad
    # voxels sample at identity coordinates and drag the per-tile block
    # origin (min over the tile) toward identity, silently stripping
    # interpolation support from *real* voxels whose displacement is large.
    # With edge replication pad-voxel coords only ever exceed the edge
    # voxel's (pads are on the high side), so the origin stays governed by
    # real voxels; any pad-voxel garbage lands outside ``spatial`` and is
    # sliced away by ``_untile``. This also matches how
    # :func:`flow_tile_extent` (which sizes ``block``) measures the extent.
    fpad = jnp.pad(
        flow[0],
        ((0, 0),) + tuple((0, Sp[i] - spatial[i]) for i in range(3)),
        mode="edge",
    )
    ftiles = fpad.reshape(
        3, grids[0], TILE, grids[1], TILE, grids[2], TILE
    ).transpose(1, 3, 5, 2, 4, 6, 0).reshape(-1, TILE ** 3, 3)
    q = o.astype(jnp.float32) + ftiles
    out = _hat_block_resample(src[0], q, spatial, block, chunk)
    return _untile(out, grids, spatial, src.shape[1])[None]


# ------------------------------------------------------------ eager wrappers


def warp_affine_fast(theta, moving, align_corners: bool = False):
    """Exact affine warp with automatic block sizing (eager; one host sync on
    theta — 12 floats). Falls back to the element-gather path when the blocked
    resampler doesn't apply (2D, batch>1, tiny volumes, huge transforms, or a
    traced theta — block sizing needs concrete values)."""
    from .resample import warp_affine

    theta = as_matrix(jnp.asarray(theta))
    spatial = moving.shape[2:]
    N = moving.shape[0]
    if (
        isinstance(theta, jax.core.Tracer)
        or len(spatial) != 3
        or min(spatial) < TILE
    ):
        return warp_affine(theta, moving, align_corners)
    if N > 1:
        if theta.shape[0] == 1:
            # One transform, many volumes: the batch is just extra channels.
            folded = moving.reshape(1, -1, *spatial)
            out = warp_affine_fast(theta, folded, align_corners)
            return out.reshape(moving.shape)
        # Per-element transforms: few eager dispatches (cohort-final warps).
        return jnp.concatenate(
            [
                warp_affine_fast(theta[i : i + 1], moving[i : i + 1], align_corners)
                for i in range(N)
            ]
        )
    if theta.shape[0] != 1:
        return warp_affine(theta, moving, align_corners)
    B = max(10, required_block_affine(theta, spatial, align_corners))
    B += -B % 2
    if B > min(_MAX_BLOCK, min(spatial)):
        return warp_affine(theta, moving, align_corners)
    if min(spatial) >= SUPER:
        # Latency-shaped volumes: SUPER^3 slice fetches + uniform-offset
        # restack (216 slices at 240^3 vs 13824) — same exactness oracle.
        Bs, B2, P = _supertile_plan(theta, spatial, align_corners,
                                    stile=SUPER_STILE)
        if Bs <= _MAX_BLOCK and B2 <= min(min(spatial) + 2 * P, 128):
            return warp_affine_supertile(
                theta, moving, align_corners,
                block_sub=Bs, block_super=B2, pad=P, stile=SUPER_STILE,
            )
    return warp_affine_blocked(theta, moving, align_corners, block=B)


def warp_flow_fast(src, flow, max_disp: float | None = None):
    """Exact flow warp with automatic block sizing. The block requirement is
    the tight per-tile coordinate extent (eager, one scalar readback);
    ``max_disp`` instead uses the conservative ``TILE + 2*max_disp + 3`` bound
    without touching the flow values (useful when a static bound is known)."""
    from .resample import warp_flow

    spatial = src.shape[2:]
    if (
        (max_disp is None and isinstance(flow, jax.core.Tracer))
        or len(spatial) != 3
        or min(spatial) < TILE
    ):
        return warp_flow(src, flow)
    if src.shape[0] > 1:
        # Per-element fields: few eager dispatches (cohort-final warps).
        return jnp.concatenate(
            [
                warp_flow_fast(src[i : i + 1], flow[i : i + 1], max_disp)
                for i in range(src.shape[0])
            ]
        )
    if max_disp is not None:
        B = required_block_flow(max_disp)
    else:
        ext = float(jax.device_get(flow_tile_extent(flow)))
        if not math.isfinite(ext):
            return warp_flow(src, flow)
        B = int(math.ceil(ext)) + 3
    B += -B % 2
    if B > min(_MAX_BLOCK, min(spatial)):
        return warp_flow(src, flow)
    return warp_flow_blocked(src, flow, block=B)
