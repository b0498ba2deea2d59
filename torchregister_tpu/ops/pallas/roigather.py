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

from functools import lru_cache

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


def _kernel(s_ref, *refs):
    """One output tile: concat the 3x3 fetched blocks, one-hot-restack x
    (Sx, NT matmul) then zy (S_zy, NN matmul). s_ref rows: (zq, yq, zr, yr,
    ox) — quantized block indices, in-window remainders, absolute x origin."""
    *in_refs, out_ref, scratch = refs
    t = pl.program_id(0)
    zr = s_ref[t, 2]
    yr = s_ref[t, 3]
    ox = s_ref[t, 4]
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
def _build(T: int, Z: int, Y: int, Xp: int):
    in_specs = [
        pl.BlockSpec(
            (QB, QB, Xp),
            (lambda t, s, zi=zi, yj=yj: (s[t, 0] + zi, s[t, 1] + yj, 0)),
        )
        for zi in range(NB)
        for yj in range(NB)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, CW, AW * BW), lambda t, s: (t, 0, 0)
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
        interpret=_interpret_mode(),
    )

    def run(scalars, volp):
        return fn(scalars, *([volp] * (NB * NB)))

    return jax.jit(run)


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
    return _build(int(T), int(Z), int(Y), int(Xp))(scalars, volp)
