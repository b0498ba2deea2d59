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
jit users pass ``block=`` explicitly. 2D images take the same path with
``TILE^2`` tiles and bilinear (two-axis) hat contractions. Where the blocked
path doesn't apply (tiny images, extreme transforms) the wrappers fall back
to the exact element-gather path, never silently losing support.

Measured on v5e at 240^3 f32: 76 ms (tile 10, B=14, 0.22-rad rotation) —
vs 989 ms for the element-gather exact path (13x).
"""
from __future__ import annotations

import math
from functools import partial
import typing
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
        d = len(spatial)
        theta = theta.reshape(d, d + 1)
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
    d = len(spatial)
    grids = [-(-s // TILE) for s in spatial]
    ident = [
        jnp.arange(spatial[i], dtype=jnp.float32).reshape(
            tuple(spatial[i] if j == i else 1 for j in range(d))
        )
        for i in range(d)
    ]
    # f32 coordinate math: a bf16 flow quantizes identity+flow to ~1-2 voxels
    # near coordinate 240, which can under-estimate the extent past the +3
    # margin and under-size the block.
    q = flow[0].astype(jnp.float32) + jnp.stack(jnp.broadcast_arrays(*ident))
    pads = [(0, grids[i] * TILE - spatial[i]) for i in range(d)]
    # edge-replicate so padding voxels never widen a tile's extent
    qp = jnp.pad(q, [(0, 0)] + pads, mode="edge")
    qt = qp.reshape((d,) + tuple(x for i in range(d) for x in (grids[i], TILE)))
    perm = (
        (0,)
        + tuple(1 + 2 * i for i in range(d))
        + tuple(2 + 2 * i for i in range(d))
    )
    qt = qt.transpose(perm).reshape(d, -1, TILE ** d)
    ext = jnp.max(qt, axis=-1) - jnp.min(qt, axis=-1)
    return jnp.max(ext)


def _hat_contract3(blk, qc, orgz, orgy, orgx):
    """Exact trilinear values of per-tile blocks ``blk [n, C, Bz, By, Bx]``
    (fetched at integer per-axis origins ``org* [n]``) at coords
    ``qc [n, V, 3]`` via per-axis hat-function contractions. Returns
    ``[n, C, V]``. Hats are evaluated against *absolute* source positions, so
    any block rows outside a voxel's 2-point support simply get zero weight —
    blocks may overcover their tile's support without changing values."""
    hi = jax.lax.Precision.HIGHEST

    def hat(axis, org, B):
        pos = org.astype(jnp.float32)[:, None] + jnp.arange(B, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(qc[:, :, axis, None] - pos[:, None]))

    wz = hat(0, orgz, blk.shape[2])
    wy = hat(1, orgy, blk.shape[3])
    wx = hat(2, orgx, blk.shape[4])
    t1 = jnp.einsum("tva,tcabx->tcvbx", wz, blk, precision=hi)
    t2 = jnp.einsum("tvb,tcvbx->tcvx", wy, t1, precision=hi)
    return jnp.einsum("tvx,tcvx->tcv", wx, t2, precision=hi)


def _hat_contract(blk, qc, org, B: int):
    """Cubic-block special case of :func:`_hat_contract3` (``org [n, 3]``)."""
    return _hat_contract3(blk, qc, org[:, 0], org[:, 1], org[:, 2])


def _hat_contract2(blk, qc, orgy, orgx):
    """2D analog of :func:`_hat_contract3`: exact bilinear values of per-tile
    blocks ``blk [n, C, By, Bx]`` at coords ``qc [n, V, 2]``. Returns
    ``[n, C, V]``."""
    hi = jax.lax.Precision.HIGHEST

    def hat(axis, org, B):
        pos = org.astype(jnp.float32)[:, None] + jnp.arange(B, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(qc[:, :, axis, None] - pos[:, None]))

    wy = hat(0, orgy, blk.shape[2])
    wx = hat(1, orgx, blk.shape[3])
    t1 = jnp.einsum("tvb,tcbx->tcvx", wy, blk, precision=hi)
    return jnp.einsum("tvx,tcvx->tcv", wx, t1, precision=hi)


def _hat_block_resample(vol, q, spatial, B: int, chunk: int):
    """Exact multilinear resample of ``vol [C,*S]`` at coords ``q [T,V,d]``
    (index space, tile-major), via slice-gather + hat contractions.

    Returns ``[T, C, V]``. 2D and 3D.
    """
    C = vol.shape[0]
    d = len(spatial)
    sizes = jnp.asarray(spatial, jnp.int32)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=tuple(range(1, d + 2)),
        collapsed_slice_dims=(),
        start_index_map=tuple(range(1, d + 1)),
    )

    def do_chunk(qc):  # [chunk, V, d]
        qf = jnp.floor(qc)
        org = jnp.clip(jnp.min(qf, axis=1).astype(jnp.int32), 0, sizes - B)
        blk = jax.lax.gather(
            vol, org, dn, slice_sizes=(C,) + (B,) * d,
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # [chunk, C, B*d]
        if d == 3:
            return _hat_contract(blk, qc, org, B)
        return _hat_contract2(blk, qc, org[:, 0], org[:, 1])

    T = q.shape[0]
    n_chunks = -(-T // chunk)
    pad = n_chunks * chunk - T
    qp = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
    out = jax.lax.map(do_chunk, qp.reshape(n_chunks, chunk, -1, d))
    return out.reshape(n_chunks * chunk, C, -1)[:T]


def _tile_grid(spatial):
    """Tile origins ``[T,d]`` and local offsets ``[V,d]`` covering ``spatial``
    (padded up to TILE multiples; callers slice the excess away)."""
    d = len(spatial)
    grids = [-(-s // TILE) for s in spatial]
    axes = [jnp.arange(g) * TILE for g in grids]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    tile_org = jnp.stack([m.ravel() for m in mesh], -1)  # [T, d]
    l = jnp.arange(TILE)
    lm = jnp.meshgrid(*[l] * d, indexing="ij")
    loc = jnp.stack([m.ravel() for m in lm], -1)  # [V, d]
    return grids, tile_org, loc


def _untile(out_tcv, grids, spatial, C):
    d = len(spatial)
    out = out_tcv.reshape(tuple(grids) + (C,) + (TILE,) * d)
    # (g0..gd-1, C, t0..td-1) -> (C, g0, t0, g1, t1, ...)
    perm = (d,) + tuple(x for i in range(d) for x in (i, d + 1 + i))
    out = out.transpose(perm).reshape((C,) + tuple(g * TILE for g in grids))
    return out[(slice(None),) + tuple(slice(0, s) for s in spatial)]


SUB = 4  # sub-tiles per super-tile edge (at the default stile)
SUPER = SUB * TILE  # super-tile edge (40): the slab granularity
SUPERTILE_ENABLED = False  # measured slower than the blocked path on v5e
# (see warp_affine_fast); flip to route >=SUPER volumes through it
SUPER_STILE = TILE  # sub-tile edge used by warp_affine_fast (divisor of
# SUPER; the hat-contraction MACs/voxel scale as ~Bs^3 ~ (stile*rowsum+6)^3,
# so smaller stiles trade einsum shape efficiency for much fewer FLOPs)


class SupertilePlan(typing.NamedTuple):
    """Static sizing for :func:`warp_affine_supertile` (host-derived from a
    concrete theta by :func:`_supertile_plan`; hashable — used as a jit-static
    argument, so warps recompile only when a *size* changes, not per theta)."""

    block_sub: int  # base sub-tile support edge Bs
    bsub: tuple  # per-axis overcovered sub-block (Bsz, Bsy, Bsx)
    block_super: int  # B2: per-super support bound (origin-clip slack)
    slab: tuple  # (SLz, SLy): slab extent in z/y (x spans the volume)
    pad: int  # zero-pad P on every face
    stile: int  # sub-tile output edge


def _supertile_plan(theta, spatial: Sequence[int], align_corners: bool = False,
                    stile: int = TILE) -> SupertilePlan:
    """Host-side sizing for :func:`warp_affine_supertile`.

    The key fact making the super-tile decomposition work for *affine* maps:
    the source-window offset of sub-tile ``d`` inside its super-tile's
    support, ``floor(stile * d @ M.T - min_d ...)``, is the SAME for every
    super-tile (linearity). v2 exploits it per axis: the offset spread of
    axis ``a`` at fixed ``d_a`` (over the other two sub-coordinates) is tiny
    (``stile * (sum of |M[a, other]|) * (SUB-1)``), so a slightly *overcovered*
    per-axis window has an origin depending on ``d_a`` alone — which turns the
    sub-block extraction into three separable one-hot shift contractions
    (MXU matmuls) instead of short-row copies.
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
    offs = np.floor(c - c.min(axis=0)).reshape(sub, sub, sub, 3)
    B2 = int(offs.max()) + Bs + 2  # +2: device f32 vs host f64 floor drift
    B2 += -B2 % 4
    # per-axis overcover: offset spread at fixed d_axis over the other two
    # sub-coordinates (+2 device-drift slack)
    bsub = []
    for a, red in ((0, (1, 2)), (1, (0, 2)), (2, (0, 1))):
        oa = np.moveaxis(offs[..., a], a, 0).reshape(sub, -1)
        spread = int((oa.max(axis=1) - oa.min(axis=1)).max())
        bsub.append(Bs + spread + 2)
    # exact base range over all super-tiles (pad the volume so clipped
    # origins stay support-exact at the edges)
    Gs = [-(-s // SUPER) for s in spatial]
    og = np.stack(
        np.meshgrid(*[np.arange(g) * SUPER for g in Gs], indexing="ij"), -1
    ).astype(np.float64)  # [G0, G1, G2, 3]
    corn = np.stack(
        np.meshgrid(*[np.array([0.0, SUPER - 1.0])] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    qc = og[..., None, :] @ M.T.reshape(1, 1, 1, 3, 3) + (corn @ M.T + t)
    base = np.floor(qc.min(axis=-2)) - 1.0  # [G0, G1, G2, 3]
    pad = max(
        0.0,
        float(-base.min()),
        float((base + B2 - np.asarray(spatial, np.float64)).max()),
    )
    P = int(math.ceil(pad)) + 2  # +2: device f32 vs host f64 floor drift
    P += -P % 8
    # slab z/y extents: per-(gz, gy) origin spread across the x-supers
    # (+4: device floor drift on both the slab min and the member bases)
    slab = []
    for a in (0, 1):
        ba = np.moveaxis(base[..., a], 2, 0).reshape(base.shape[2], -1)
        spread = int(np.ceil((ba.max(axis=0) - ba.min(axis=0)).max()))
        slab.append(B2 + spread + 4)
    return SupertilePlan(
        block_sub=Bs, bsub=tuple(bsub), block_super=B2,
        slab=tuple(slab), pad=P, stile=stile,
    )


@partial(jax.jit, static_argnames=("align_corners", "plan", "chunk"))
def warp_affine_supertile(
    theta: jnp.ndarray,
    moving: jnp.ndarray,
    align_corners: bool = False,
    plan: SupertilePlan = None,
    chunk: int = 432,
) -> jnp.ndarray:
    """Exact affine warp (grid_sample parity) — the data-movement-shaped
    rewrite of the blocked resampler.

    The per-tile slice gather is latency/short-row-bound on TPU: 14^3 blocks
    read 56-byte rows (measured ~60 of the 76 ms at 240^3), and a
    dynamic-slice restack from 52^3 super-blocks is no better (64-byte rows,
    41 ms measured). v2 therefore never copies short rows:

    1. ONE gather of ``(gz, gy)``-slab blocks ``[SLz, SLy, X+2P]`` — full-X
       rows (~1.2 KB at 240^3) are DMA-efficient;
    2. sub-tile blocks are extracted by three separable ONE-HOT SHIFT
       contractions (MXU matmuls, exact 0/1 selection at f32-HIGHEST): the
       per-axis window origin depends only on that axis's sub-coordinate
       (plus the super index), with a small static overcover absorbing the
       cross-axis offset coupling (see :func:`_supertile_plan`);
    3. the usual hat contraction — absolute-position hats make overcovered
       rows exact no-ops, so no residual re-slicing is needed.

    Sizing must come from :func:`_supertile_plan` for this theta AND stile
    (the eager wrapper :func:`warp_affine_fast` does this); reference
    semantics warpings.py:18-26 (zeros padding, align_corners=False default).
    """
    stile = plan.stile
    assert SUPER % stile == 0
    SUB_N = SUPER // stile
    theta = as_matrix(theta)
    spatial = moving.shape[2:]
    assert moving.shape[0] == 1 and len(spatial) == 3
    C = moving.shape[1]
    Bs, B2, P = plan.block_sub, plan.block_super, plan.pad
    Bsz, Bsy, Bsx = plan.bsub
    SLz, SLy = plan.slab
    M, t = affine_to_index_map(theta[0], spatial, align_corners)
    hi = jax.lax.Precision.HIGHEST

    Gs = [-(-s // SUPER) for s in spatial]
    G0, G1, G2 = Gs
    og = jnp.stack(
        jnp.meshgrid(*[jnp.arange(g, dtype=jnp.float32) * SUPER for g in Gs],
                     indexing="ij"), -1
    )  # [G0, G1, G2, 3]

    # Per-super support origins: floor(min over the 8 corners of the super
    # box) - 1 (the min of a linear map over a box sits at a corner — exact).
    corn = jnp.stack(
        jnp.meshgrid(*[jnp.asarray([0.0, SUPER - 1.0])] * 3, indexing="ij"), -1
    ).reshape(8, 3)
    qcorn = (
        jnp.einsum("zyxj,aj->zyxa", og, M, precision=hi)[..., None, :]
        + (corn @ M.T + t)
    )  # [G0, G1, G2, 8, 3]
    base = jnp.floor(jnp.min(qcorn, axis=-2)) - 1.0
    sizes = jnp.asarray(spatial, jnp.int32)
    base_i = jnp.clip(base.astype(jnp.int32) + P, 0, sizes + 2 * P - B2)

    Xp = spatial[2] + 2 * P
    volp = jnp.pad(moving[0], ((0, 0),) + ((P, P),) * 3)

    # --- stage 1: (gz, gy)-slab gather (full-X rows) ---------------------
    slab_zy = jnp.min(base_i[..., :2], axis=2)  # [G0, G1, 2]
    slab_zy = jnp.clip(
        slab_zy, 0,
        jnp.asarray([spatial[0] + 2 * P - SLz, spatial[1] + 2 * P - SLy],
                    jnp.int32),
    )
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
    )
    slabs = jax.lax.gather(
        volp, slab_zy.reshape(-1, 2), dn, slice_sizes=(C, SLz, SLy, Xp),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(G0, G1, C, SLz, SLy, Xp)

    # --- per-axis sub-tile window origins --------------------------------
    # Sub-tile offsets are uniform across supers (linearity); the per-axis
    # origin uses the min over the other two sub-coordinates, the spread
    # being absorbed by the overcovered Bs* (plan).
    dgrid = jnp.stack(
        jnp.meshgrid(*[jnp.arange(SUB_N, dtype=jnp.float32)] * 3,
                     indexing="ij"),
        -1,
    )  # [SUB_N, SUB_N, SUB_N, 3] (dz, dy, dx)
    c_d = float(stile) * jnp.einsum("zyxj,aj->zyxa", dgrid, M, precision=hi)
    offs = jnp.floor(c_d - jnp.min(c_d, axis=(0, 1, 2)))  # [dz, dy, dx, 3]
    oz_min = jnp.min(offs[..., 0], axis=(1, 2)).astype(jnp.int32)  # [dz]
    oy_min = jnp.min(offs[..., 1], axis=(0, 2)).astype(jnp.int32)  # [dy]
    ox_min = jnp.min(offs[..., 2], axis=(0, 1)).astype(jnp.int32)  # [dx]

    # Absolute per-axis origins (padded coords), decoupled per stage:
    #   x: [G0, G1, G2, dx]; z: [G0, G1, G2, dz] (slab-relative); y likewise.
    orx = jnp.clip(base_i[..., 2, None] + ox_min, 0, Xp - Bsx)
    orz = jnp.clip(
        base_i[..., 0, None] - slab_zy[:, :, None, 0, None] + oz_min,
        0, SLz - Bsz,
    )
    ory = jnp.clip(
        base_i[..., 1, None] - slab_zy[:, :, None, 1, None] + oy_min,
        0, SLy - Bsy,
    )

    def one_hot(origins, B, L):
        # [..., B, L] 0/1 selection: row k picks source index origin + k
        ar = jnp.arange(L, dtype=jnp.int32)
        return (
            origins[..., None, None] + jnp.arange(B, dtype=jnp.int32)[:, None]
            == ar
        ).astype(jnp.float32)

    # --- stage 2: separable one-hot shift contractions (MXU) -------------
    SX = one_hot(orx, Bsx, Xp)  # [G0, G1, G2, dx, Bsx, Xp]
    t1 = jnp.einsum("zygdkX,zycZYX->zygdcZYk", SX, slabs, precision=hi)
    SZ = one_hot(orz, Bsz, SLz)  # [G0, G1, G2, dz, Bsz, SLz]
    t2 = jnp.einsum("zygeiZ,zygdcZYk->zygdeciYk", SZ, t1, precision=hi)
    SY = one_hot(ory, Bsy, SLy)  # [G0, G1, G2, dy, Bsy, SLy]
    t3 = jnp.einsum("zygfjY,zygdeciYk->zygdefcijk", SY, t2, precision=hi)
    # t3: [G0, G1, G2, dx, dz, dy, C, Bsz, Bsy, Bsx]

    nsub = SUB_N ** 3
    T = G0 * G1 * G2 * nsub
    blk = t3.reshape(T, C, Bsz, Bsy, Bsx)

    # --- stage 3: hat contraction (absolute positions, unpadded coords) --
    # Origins/coords in tile order (gz, gy, gx, dx, dz, dy) matching t3.
    def tile_axis(vals_gdim, dord):  # [G0,G1,G2,d] -> [T] in (dx,dz,dy) order
        v = vals_gdim
        if dord == 0:  # dz: broadcast over (dx, dy)
            v = v[:, :, :, None, :, None]
        elif dord == 1:  # dy
            v = v[:, :, :, None, None, :]
        else:  # dx
            v = v[:, :, :, :, None, None]
        return jnp.broadcast_to(v, (G0, G1, G2, SUB_N, SUB_N, SUB_N)).reshape(T)

    orgz = tile_axis(orz + slab_zy[:, :, None, 0, None], 0) - P
    orgy = tile_axis(ory + slab_zy[:, :, None, 1, None], 1) - P
    orgx = tile_axis(orx, 2) - P

    l = jnp.arange(stile, dtype=jnp.float32)
    loc = jnp.stack(jnp.meshgrid(l, l, l, indexing="ij"), -1).reshape(-1, 3)
    d_out = jnp.stack(
        [tile_axis(jnp.broadcast_to(
            float(stile) * jnp.arange(SUB_N, dtype=jnp.float32),
            (G0, G1, G2, SUB_N)), a) for a in range(3)],
        axis=-1,
    )  # [T, 3] sub-tile output offsets
    og_t = jnp.stack(
        [tile_axis(jnp.broadcast_to(
            og[..., a, None], (G0, G1, G2, SUB_N)), a) for a in range(3)],
        axis=-1,
    )  # hmm: og per super broadcast over d — see below
    o = (og_t + d_out)[:, None, :] + loc[None, :, :]  # [T, V, 3]
    q = jnp.einsum("tvj,aj->tva", o, M, precision=hi) + t

    n_chunks = -(-T // chunk)
    padn = n_chunks * chunk - T
    blk_p = jnp.pad(blk, ((0, padn),) + ((0, 0),) * 4)
    q_p = jnp.pad(q, ((0, padn), (0, 0), (0, 0)))
    oz_p = jnp.pad(orgz, (0, padn))
    oy_p = jnp.pad(orgy, (0, padn))
    ox_p = jnp.pad(orgx, (0, padn))
    out = jax.lax.map(
        lambda a: _hat_contract3(a[0], a[1], a[2], a[3], a[4]),
        (
            blk_p.reshape(n_chunks, chunk, C, Bsz, Bsy, Bsx),
            q_p.reshape(n_chunks, chunk, -1, 3),
            oz_p.reshape(n_chunks, chunk),
            oy_p.reshape(n_chunks, chunk),
            ox_p.reshape(n_chunks, chunk),
        ),
    )
    out = out.reshape(n_chunks * chunk, C, -1)[:T]

    # Untile: (gz,gy,gx),(dx,dz,dy),(vz,vy,vx) -> [C, *S]
    out = out.reshape(G0, G1, G2, SUB_N, SUB_N, SUB_N, C,
                      stile, stile, stile)
    out = out.transpose(6, 0, 4, 7, 1, 5, 8, 2, 3, 9).reshape(
        C, G0 * SUPER, G1 * SUPER, G2 * SUPER
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
    via the blocked resampler. 2D/3D, batch 1.

    ``block`` must be >= :func:`required_block_affine` for this theta or
    support is silently truncated — use :func:`warp_affine_fast` (eager) to
    have it derived and checked automatically.
    """
    theta = as_matrix(theta)
    spatial = moving.shape[2:]
    d = len(spatial)
    assert moving.shape[0] == 1 and d in (2, 3)
    M, t = affine_to_index_map(theta[0], spatial, align_corners)

    grids, tile_org, loc = _tile_grid(spatial)
    o = (tile_org[:, None, :] + loc[None]).astype(jnp.float32)  # [T, V, d]
    # Exact f32 coordinate math (dxd): explicit FMAs, no reduced-precision dot.
    q = jnp.stack(
        [sum(M[s, j] * o[..., j] for j in range(d)) + t[s] for s in range(d)],
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
    blocked resampler. 2D/3D, batch 1.

    ``block`` must be >= :func:`required_block_flow` of the true ``max|flow|``
    — use :func:`warp_flow_fast` (eager) for automatic derivation.
    """
    spatial = src.shape[2:]
    d = len(spatial)
    assert src.shape[0] == 1 and d in (2, 3)
    grids, tile_org, loc = _tile_grid(spatial)
    o = tile_org[:, None, :] + loc[None]  # [T, V, d] int
    # flow is [1, d, *S] with channel i displacing axis i (voxel units)
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
        ((0, 0),) + tuple((0, Sp[i] - spatial[i]) for i in range(d)),
        mode="edge",
    )
    ftiles = fpad.reshape(
        (d,) + tuple(x for i in range(d) for x in (grids[i], TILE))
    )
    perm = (
        tuple(1 + 2 * i for i in range(d))
        + tuple(2 + 2 * i for i in range(d))
        + (0,)
    )
    ftiles = ftiles.transpose(perm).reshape(-1, TILE ** d, d)
    q = o.astype(jnp.float32) + ftiles
    out = _hat_block_resample(src[0], q, spatial, block, chunk)
    return _untile(out, grids, spatial, src.shape[1])[None]


# -------------------------------------------------- ROI-gather (Pallas) path

ROIGATHER_ENABLED = False  # measured on v5e r4 and routed OFF — the honest
# numbers (240^3 f32, rigid 0.12-0.15 rad, benchmarks/probe_roi_loop.py /
# probe_roi_stages.py):
#   eager (the user-facing __call__/apply path): blocked 91.4 ms, fused ROI
#     kernel 135.0 ms (~50 ms of per-call wrapper dispatch + host->device
#     scalar shipping through the tunnel);
#   jit-loop-amortized device cost: blocked 63.6 ms/warp, fused 60.6 — a 5%
#     tie, not a win.
# Why it can't reach the <=30 ms target on this stack: the 9-block quantized
# fetch is issue-bound at ~0.33 us/DMA (41 ms for 124k block DMAs; stage-
# isolated), element-granular BlockSpecs that would make it 1 DMA/tile crash
# the remote compile helper (probe_hatgather.py P2/P3 HTTP 500), and the
# in-VMEM one-hot restack + hat weights are VPU-bound at ~25 ms more. A
# slab-row refetch redesign would cut the fetch to ~8 ms but leaves the
# ~40 ms VPU floor. The kernel stays (tests + bench selftest keep hardware
# value parity) for workloads that warp many volumes inside one jit.


def _roi_supports(theta_np, spatial, align_corners):
    """Host-side per-tile support origins for the ROI-gather kernel, or None
    when the transform's support exceeds the kernel's static 16-wide windows
    (caller falls back to the slice-gather path). Returns (scalars [T,5]
    int32, absolute (orgz, orgy, orgx) [T] each, grids)."""
    import numpy as np

    from .pallas.roigather import AW, BW, CW, NB, QB

    M, t = _index_map_np(theta_np, spatial, align_corners)
    ext = (TILE - 1) * np.abs(M).sum(axis=1) + 3.0
    if (ext > np.asarray([AW, BW, CW], np.float64)).any():
        return None
    grids = [-(-s // TILE) for s in spatial]
    axes = [np.arange(g) * TILE for g in grids]
    og = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    corn = np.stack(
        np.meshgrid(*[np.asarray([0.0, TILE - 1.0])] * 3, indexing="ij"), -1
    ).reshape(8, 3)
    qc = (og[:, None, :] + corn[None]) @ M.T + t  # [T, 8, 3]
    qmin = np.floor(qc.min(axis=1)) - 1.0  # [T, 3]
    sizes = np.asarray(spatial, np.int64)
    org = np.clip(qmin.astype(np.int64), 0, sizes - (AW, BW, CW))
    zq, yq = org[:, 0] // QB, org[:, 1] // QB
    scal = np.stack(
        [zq, yq, org[:, 0] - QB * zq, org[:, 1] - QB * yq, org[:, 2]],
        axis=-1,
    ).astype(np.int32)
    return scal, org, grids, M, t


@partial(jax.jit, static_argnames=("grids", "spatial", "chunk"))
def _roi_hat_contract(blocks, orgs, M, t, grids, spatial, chunk: int = 216):
    """Exact trilinear values from ROI-gather compact blocks via per-axis
    hat einsums, chunked over tiles (a full-T intermediate would be
    ~14 GB). f32 HIGHEST throughout (the TPU default matmul precision is
    bf16 and would cost ~1e-2 error)."""
    from .pallas.roigather import AW, BW, CW

    hi = jax.lax.Precision.HIGHEST
    grids = list(grids)
    _, tile_org, loc = _tile_grid(spatial)
    o = (tile_org[:, None, :] + loc[None]).astype(jnp.float32)  # [T, V, 3]
    orgs = orgs.astype(jnp.float32)
    T = blocks.shape[0]
    V = o.shape[1]

    def hat(qs, org0, width):
        pos = org0[:, None] + jnp.arange(width, dtype=jnp.float32)  # [ct, w]
        return jnp.maximum(
            0.0, 1.0 - jnp.abs(qs[:, :, None] - pos[:, None, :])
        )  # [ct, V, w]

    def do_chunk(args):
        blk, oc, orgc = args  # [ct, CW, AW*BW], [ct, V, 3], [ct, 3]
        q = [
            M[s, 0] * oc[..., 0] + M[s, 1] * oc[..., 1]
            + M[s, 2] * oc[..., 2] + t[s]
            for s in range(3)
        ]
        blk4 = blk.reshape(blk.shape[0], CW, AW, BW)
        wz = hat(q[0], orgc[:, 0], AW)
        u1 = jnp.einsum("tva,tcab->tvcb", wz, blk4, precision=hi)
        wy = hat(q[1], orgc[:, 1], BW)
        u2 = jnp.einsum("tvb,tvcb->tvc", wy, u1, precision=hi)
        wx = hat(q[2], orgc[:, 2], CW)
        return jnp.einsum("tvc,tvc->tv", wx, u2, precision=hi)

    n_chunks = -(-T // chunk)
    pad = n_chunks * chunk - T
    blk_p = jnp.pad(blocks, ((0, pad), (0, 0), (0, 0)))
    o_p = jnp.pad(o, ((0, pad), (0, 0), (0, 0)))
    org_p = jnp.pad(orgs, ((0, pad), (0, 0)))
    out = jax.lax.map(
        do_chunk,
        (
            blk_p.reshape(n_chunks, chunk, CW, AW * BW),
            o_p.reshape(n_chunks, chunk, V, 3),
            org_p.reshape(n_chunks, chunk, 3),
        ),
    ).reshape(n_chunks * chunk, V)[:T]
    return _untile(out[:, None, :], grids, spatial, 1)[None]


ROIGATHER_FUSED = True  # fused in-kernel hat contraction (roigather_warp)
# vs compact-block kernel + XLA hats: the XLA hat side moves ~28 GB HBM at
# 240^3 and pads its K=16 einsums 8x on the MXU (measured 139.6 ms total vs
# 93.8 slice-gather); the fused kernel keeps everything in VMEM.


def warp_affine_roi(theta, moving, align_corners: bool = False):
    """Exact affine warp via the Pallas ROI-gather kernel (grid_sample
    parity; reference warpings.py:18-26). 3D, batch 1. Returns None when the
    transform/geometry is outside the kernel's static windows — callers fall
    back to :func:`warp_affine_blocked`."""
    import numpy as np

    from .pallas.roigather import CW, QB, roigather, roigather_warp

    theta = as_matrix(theta)
    spatial = moving.shape[2:]
    if (
        isinstance(theta, jax.core.Tracer)
        or len(spatial) != 3
        or min(spatial) < 4 * QB
        or moving.shape[0] != 1
    ):
        return None
    theta_np = np.asarray(jax.device_get(theta), np.float64)[0]
    sup = _roi_supports(theta_np, spatial, align_corners)
    if sup is None:
        return None
    scal, org, grids, M, t = sup
    # pad z/y by QB past the quantized windows' worst case, x to a
    # 128-multiple >= S2. NOTE: Xp adds no CW margin — the ox <= S2-CW clamp
    # in _roi_supports is what keeps the kernel's x-selection in-bounds; do
    # not remove that clamp.
    Zp = QB * (-(-spatial[0] // QB)) + 2 * QB
    Yp = QB * (-(-spatial[1] // QB)) + 2 * QB
    Xp = 128 * (-(-(spatial[2]) // 128))
    mt = jnp.asarray(
        np.concatenate([np.concatenate([M[s], [t[s]]]) for s in range(3)]),
        jnp.float32,
    )
    vols = []
    for c in range(moving.shape[1]):
        volp = jnp.pad(
            moving[0, c],
            ((0, Zp - spatial[0]), (0, Yp - spatial[1]), (0, Xp - spatial[2])),
        )
        if ROIGATHER_FUSED:
            out = roigather_warp(volp, jnp.asarray(scal), mt, grids, TILE)
            vols.append(
                _untile(out[:, :, : TILE ** 3], grids, spatial, 1)[0]
            )
            continue
        blocks = roigather(volp, jnp.asarray(scal))
        vols.append(
            _roi_hat_contract(
                blocks,
                jnp.asarray(org, jnp.int32),
                jnp.asarray(M, jnp.float32),
                jnp.asarray(t, jnp.float32),
                tuple(grids),
                spatial,
            )[0, 0]
        )
    return jnp.stack(vols)[None]


# ------------------------------------------------------------ eager wrappers


def warp_affine_fast(theta, moving, align_corners: bool = False):
    """Exact affine warp with automatic block sizing (eager; one host sync on
    theta — 12 floats). Falls back to the element-gather path when the blocked
    resampler doesn't apply (batch>1 with per-element thetas handled by a
    short loop; tiny volumes, huge transforms, or a traced theta — block
    sizing needs concrete values). 2D and 3D."""
    from .resample import warp_affine

    theta = as_matrix(jnp.asarray(theta))
    spatial = moving.shape[2:]
    N = moving.shape[0]
    if (
        isinstance(theta, jax.core.Tracer)
        or len(spatial) not in (2, 3)
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
    if ROIGATHER_ENABLED and len(spatial) == 3 and jax.default_backend() != "cpu":
        # Pallas ROI-gather path: pipelined block DMA + in-kernel one-hot
        # restack instead of the latency-bound XLA slice gather. Returns
        # None (fall through) outside its static support windows. CPU runs
        # keep the gather path — interpret-mode Pallas underperforms there.
        out = warp_affine_roi(theta, moving, align_corners)
        if out is not None:
            return out
    if SUPERTILE_ENABLED and len(spatial) == 3 and min(spatial) >= SUPER:
        # Experimental: slab gather + one-hot restack (full-X rows instead
        # of 13824 short-row slices at 240^3). Measured SLOWER than the
        # plain blocked path on v5e (128 ms vs 67 ms at 240^3): XLA pads
        # every materialized intermediate's trailing block dims to the
        # (8,128) tile, a ~6x memory/MAC inflation that dominates what the
        # efficient gather saves. Kept (value-exact, tested) as the base
        # for a future Pallas fusion; off by default.
        plan = _supertile_plan(theta, spatial, align_corners,
                               stile=SUPER_STILE)
        P = plan.pad
        if (
            max(plan.bsub) <= _MAX_BLOCK
            and plan.slab[0] <= spatial[0] + 2 * P
            and plan.slab[1] <= spatial[1] + 2 * P
        ):
            return warp_affine_supertile(theta, moving, align_corners,
                                         plan=plan)
    return warp_affine_blocked(theta, moving, align_corners, block=B)


def warp_flow_fast(src, flow, max_disp: float | None = None):
    """Exact flow warp with automatic block sizing. The block requirement is
    the tight per-tile coordinate extent (eager, one scalar readback);
    ``max_disp`` instead uses the conservative ``TILE + 2*max_disp + 3`` bound
    without touching the flow values (useful when a static bound is known)."""
    from .resample import warp_flow

    spatial = src.shape[2:]
    if flow.shape[0] != src.shape[0]:
        # The blocked path pads flow[0] and never re-checks the batch axis —
        # a flow batch wider than src would be silently dropped here while
        # the exact fallback raises a vmap mismatch. Fail loudly on both.
        raise ValueError(
            f"warp_flow_fast: src batch {src.shape[0]} != flow batch "
            f"{flow.shape[0]} (one flow field per source element)"
        )
    if (
        (max_disp is None and isinstance(flow, jax.core.Tracer))
        or len(spatial) not in (2, 3)
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
