"""Fused ROI-gather kernel: the exact blocked warp's fetch + restack on TPU.

The blocked exact resampler (ops/blocked.py) is bottlenecked by its slice
gather: XLA lowers the per-tile (B,B,B) slice gather to ~3.3 us/slice
latency-bound code — ~60 of the 67 ms of a 240^3 exact affine warp
(BASELINE.md). This kernel replaces gather + one-hot-restack with a Mosaic
pipeline built ONLY from primitives verified on this axon stack
(benchmarks/probe_hatgather.py, r4):

- **scalar-prefetched Blocked index maps** (P1): each grid step fetches nine
  8x8xX blocks around the tile's support window — origins quantized to the
  8-voxel block grid, remainders handled downstream. The DMA engine streams
  blocks double-buffered across grid steps instead of paying per-slice
  gather latency.
- **iota one-hot + MXU matmul restack** (probes d/e): the arbitrary
  sub-window selection happens as two exact 0/1-matmul contractions in VMEM
  (f32 HIGHEST — bf16 passes would truncate image values), never as a
  dynamic lane/sublane slice (dynamic *sublane* starts crash this stack's
  remote compile helper — probe b).

Output: per-tile compact blocks ``[T, CW, AW*BW]`` where column ``ab``
holds source voxel ``(org_z + ab//BW, org_y + ab%BW)`` of x-support row
``org_x + c``. The trilinear hat contraction stays in XLA
(ops/blocked.py:warp_affine_roi) as ONE small-M einsum — orientation
``'tcr,tvr->tcv'`` keeps the padded-MXU waste on the 16-row M axis instead
of 8x on K or N.

Geometry/semantics match ops/blocked.py exactly (zeros padding via clamped
origins + absolute-position hats; reference warpings.py:18-26).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 8  # fetch quantization block (origins rounded down to multiples of QB)
NB = 3  # blocks per axis: window = NB*QB = 24 >= (QB-1 slack) + 16 support
W = NB * QB  # z/y fetch window edge
AW = 16  # z-support width of the compact block (one-hot a range)
BW = 16  # y-support width (one-hot b range)
CW = 16  # x-support width
KPAD = 640  # W*W=576 padded to the next 128 multiple for the m2 contraction


def _kernel(zq_ref, yq_ref, zr_ref, yr_ref, ox_ref, *refs):
    """One output tile: concat the 3x3 fetched blocks, one-hot-restack x
    (Sx, NT matmul) then zy (S_zy, NN matmul). Scalar rows (zq, yq, zr, yr,
    ox) — quantized block indices, in-window remainders, absolute x origin —
    arrive as five [T] arrays: a single [T, 5] operand would be lane-padded
    to [T, 128] in SMEM and overflow its 1 MB at 240^3 (T=13824 -> 7 MB;
    measured HTTP-500 'would exceed memory space=smem' on this stack)."""
    *in_refs, out_ref, scratch = refs
    t = pl.program_id(0)
    zr = zr_ref[t]
    yr = yr_ref[t]
    ox = ox_ref[t]
    Xp = in_refs[0].shape[-1]

    rows = jnp.concatenate(
        [
            jnp.concatenate([in_refs[i * NB + j][:] for j in range(NB)], axis=1)
            for i in range(NB)
        ],
        axis=0,
    )  # [W, W, Xp]
    merged = rows.reshape(W * W, Xp)

    # x-restack: Sx[c, x] = 1 iff x == ox + c  (exact 0/1 selection)
    xi = jax.lax.broadcasted_iota(jnp.int32, (CW, Xp), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (CW, Xp), 0)
    sx = (xi == ci + ox).astype(jnp.float32)
    m1 = jax.lax.dot_general(
        sx, merged, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # [CW, W*W]

    # zy-restack via a K-padded scratch (576 -> 640 lanes: matmul operands
    # need 128-multiple lane widths on this stack)
    scratch[:, : W * W] = m1
    scratch[:, W * W :] = jnp.zeros((CW, KPAD - W * W), jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (KPAD, AW * BW), 0)
    abi = jax.lax.broadcasted_iota(jnp.int32, (KPAD, AW * BW), 1)
    s_zy = (
        (ri // W == zr + abi // BW) & (ri % W == yr + abi % BW) & (ri < W * W)
    ).astype(jnp.float32)
    out_ref[0] = jax.lax.dot_general(
        scratch[:], s_zy, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # [CW, AW*BW]


def _interpret_mode() -> bool:
    # Compiled Mosaic kernels need real TPU hardware; tests run the
    # interpreter on CPU (same stance as sweep.py / conv3d.py).
    return jax.default_backend() == "cpu"


@lru_cache(maxsize=8)
def _build(T: int, Z: int, Y: int, Xp: int, interpret: bool = False):
    in_specs = [
        pl.BlockSpec(
            (QB, QB, Xp),
            (lambda t, zq, yq, zr, yr, ox, zi=zi, yj=yj:
             (zq[t] + zi, yq[t] + yj, 0)),
        )
        for zi in range(NB)
        for yj in range(NB)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, CW, AW * BW), lambda t, *scal: (t, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((CW, KPAD), jnp.float32)],
    )
    fn = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((T, CW, AW * BW), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run(scalars, volp):
        cols = [scalars[:, i] for i in range(5)]
        return fn(*cols, *([volp] * (NB * NB)))

    return jax.jit(run)


# ---------------------------------------------------------------- fused warp

VP = 1024  # TILE^3 = 1000 output voxels per tile, lane-padded to 128-mult


def _warp_kernel(tile, GY, GX,
                 zq_ref, yq_ref, zr_ref, yr_ref, ox_ref, mt_ref, *refs):
    """Fully fused exact-warp tile: fetch + one-hot restack + trilinear hat
    contraction, all in VMEM. vs the compact-block kernel + XLA-hat split
    (_roi_hat_contract): the [T, V, C, B] hat intermediates never exist
    (measured: the XLA hat side moved ~28 GB HBM for a 240^3 warp and its
    K=16 einsums pad 8x on the MXU — 139.6 ms total vs 93.8 blocked), and
    the restacks run as split-bf16 one-hot matmuls (2 exact single passes;
    one-hot selections have exactly one nonzero per output, so bf16
    operands reconstruct the f32 value to ~2^-17 rel) instead of 6-pass
    HIGHEST.

    Scalars: five [T] int32 (zq, yq, zr, yr, ox) + mt [12] f32 — the
    row-major index map M (3x3) and offset t interleaved as
    (M[s,0], M[s,1], M[s,2], t[s]) per output axis s.
    """
    *in_refs, out_ref, scratch = refs
    t = pl.program_id(0)
    zr = zr_ref[t]
    yr = yr_ref[t]
    ox = ox_ref[t]
    orgz = zq_ref[t] * QB + zr  # absolute z/y support origins
    orgy = yq_ref[t] * QB + yr
    Xp = in_refs[0].shape[-1]
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    rows = jnp.concatenate(
        [
            jnp.concatenate([in_refs[i * NB + j][:] for j in range(NB)], axis=1)
            for i in range(NB)
        ],
        axis=0,
    )  # [W, W, Xp]
    merged = rows.reshape(W * W, Xp)
    mhi = merged.astype(bf16)
    mlo = (merged - mhi.astype(f32)).astype(bf16)

    # x-restack: Sx[c, x] = 1 iff x == ox + c
    xi = jax.lax.broadcasted_iota(jnp.int32, (CW, Xp), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (CW, Xp), 0)
    sx = (xi == ci + ox).astype(bf16)

    # zy-restack one-hot (64 possible (zr, yr) values; built per tile)
    ri = jax.lax.broadcasted_iota(jnp.int32, (KPAD, AW * BW), 0)
    abi = jax.lax.broadcasted_iota(jnp.int32, (KPAD, AW * BW), 1)
    s_zy = (
        (ri // W == zr + abi // BW) & (ri % W == yr + abi % BW) & (ri < W * W)
    ).astype(bf16)

    def restack(m):  # [W*W, Xp] bf16 -> compact [CW, AW*BW] f32 (exact)
        m1 = jax.lax.dot_general(
            sx, m, (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )  # [CW, W*W]
        scratch[:, : W * W] = m1.astype(bf16)
        scratch[:, W * W :] = jnp.zeros((CW, KPAD - W * W), bf16)
        return jax.lax.dot_general(
            scratch[:], s_zy, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # [CW, AW*BW]

    blk = restack(mhi) + restack(mlo)

    # --- trilinear hat contraction against absolute source positions ---
    # (same math as ops/blocked._roi_hat_contract; reference warpings.py:24-25
    # zeros semantics via clamped origins + absolute-position hats)
    gx = t % GX
    gy = (t // GX) % GY
    gz = t // (GX * GY)
    mt = mt_ref  # [12] f32

    def coords(v_int):  # tile-local voxel index -> (pz, py, px) f32
        lz = (v_int // (tile * tile)).astype(f32)
        ly = ((v_int // tile) % tile).astype(f32)
        lx = (v_int % tile).astype(f32)
        return (
            (gz * tile).astype(f32) + lz,
            (gy * tile).astype(f32) + ly,
            (gx * tile).astype(f32) + lx,
        )

    def q(s, pz, py, px):  # source coordinate along axis s
        return mt[4 * s] * pz + mt[4 * s + 1] * py + mt[4 * s + 2] * px + mt[4 * s + 3]

    # z/y hats on the [VP, AW*BW] grid: voxels on sublanes, (a, b) on lanes
    vcol = jax.lax.broadcasted_iota(jnp.int32, (VP, 1), 0)
    pzc, pyc, pxc = coords(vcol)
    q0 = q(0, pzc, pyc, pxc)  # [VP, 1]
    q1 = q(1, pzc, pyc, pxc)
    ab = jax.lax.broadcasted_iota(jnp.int32, (1, AW * BW), 1)
    posz = orgz.astype(f32) + (ab // BW).astype(f32)
    posy = orgy.astype(f32) + (ab % BW).astype(f32)
    wzy = jnp.maximum(0.0, 1.0 - jnp.abs(q0 - posz)) * jnp.maximum(
        0.0, 1.0 - jnp.abs(q1 - posy)
    )  # [VP, AW*BW]

    u = jax.lax.dot_general(
        blk, wzy, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # [CW, VP]

    # x hat + fold: out[v] = sum_c wx[c, v] * u[c, v]
    vrow = jax.lax.broadcasted_iota(jnp.int32, (1, VP), 1)
    pzr, pyr, pxr = coords(vrow)
    q2 = q(2, pzr, pyr, pxr)  # [1, VP]
    crow = jax.lax.broadcasted_iota(jnp.int32, (CW, 1), 0)
    posx = ox.astype(f32) + crow.astype(f32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(q2 - posx))  # [CW, VP]
    out_ref[0] = jnp.sum(wx * u, axis=0, keepdims=True)  # [1, VP]


@lru_cache(maxsize=8)
def _build_warp(T: int, Z: int, Y: int, Xp: int, GY: int, GX: int, tile: int,
                interpret: bool = False):
    in_specs = [
        pl.BlockSpec(
            (QB, QB, Xp),
            (lambda t, zq, yq, zr, yr, ox, mt, zi=zi, yj=yj:
             (zq[t] + zi, yq[t] + yj, 0)),
        )
        for zi in range(NB)
        for yj in range(NB)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, VP), lambda t, *scal: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((CW, KPAD), jnp.bfloat16)],
    )
    fn = pl.pallas_call(
        partial(_warp_kernel, tile, GY, GX),
        out_shape=jax.ShapeDtypeStruct((T, 1, VP), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def run(scalars, mt, volp):
        cols = [scalars[:, i] for i in range(5)]
        return fn(*cols, mt, *([volp] * (NB * NB)))

    return jax.jit(run)


def roigather_warp(volp, scalars, mt, grids, tile: int) -> jnp.ndarray:
    """Fused exact affine warp of a padded volume: per-tile trilinear values
    ``[T, 1, VP]`` (valid lanes ``[:tile**3]``). ``mt [12]`` f32 = row-major
    (M[s], t[s]) per axis; other args as :func:`roigather`."""
    T = scalars.shape[0]
    Z, Y, Xp = volp.shape
    assert Xp % 128 == 0, Xp
    assert tile ** 3 <= VP, tile
    _, GY, GX = grids
    return _build_warp(int(T), int(Z), int(Y), int(Xp), int(GY), int(GX),
                       int(tile), _interpret_mode())(scalars, mt, volp)


def roigather(volp: jnp.ndarray, scalars: jnp.ndarray) -> jnp.ndarray:
    """Fetch+restack compact per-tile blocks from a padded volume.

    ``volp [Zp, Yp, Xp]`` (z/y padded by >= QB past the true extents so the
    quantized windows stay in-bounds — pad values are never *selected*, only
    fetched; ``Xp`` a 128-multiple). ``scalars [T, 5]`` int32 rows
    ``(zq, yq, zr, yr, ox)`` with ``zq/yq`` in QB-block units, remainders in
    ``[0, QB)``, ``ox`` an absolute in-bounds x origin (``<= Xp - CW``).
    Returns ``[T, CW, AW*BW]`` with ``out[t, c, ab] =
    volp[8*zq+zr + ab//BW, 8*yq+yr + ab%BW, ox + c]``.
    """
    T = scalars.shape[0]
    Z, Y, Xp = volp.shape
    assert Xp % 128 == 0, Xp
    return _build(int(T), int(Z), int(Y), int(Xp), _interpret_mode())(scalars, volp)
