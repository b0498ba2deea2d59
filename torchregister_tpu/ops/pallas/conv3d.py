"""Pallas TPU kernel for fused valid 3x3x3 convolution (the U-Net hot op).

Why this exists: XLA:TPU lowers narrow-channel 3D convolutions ~80x off the
HBM roofline (measured 5.3-5.6 ms for one 8->8 3^3 conv at 120^3 bf16 in any
layout — BASELINE.md), and the tap-decomposed formulation
(models/attention_unet.py:TapConv) is only ~2x better because every one of
its 27 shifted-slice contractions round-trips HBM. The flow U-Net's fwd+bwd
IS the whole flow-step cost (reference utils.py:409-559 is likewise the
reference's entire flow-mode cost), so this kernel keeps the whole 27-tap
stencil on-chip:

- grid over output z-planes; THREE unit-z block-mapped refs of the same
  source array with index maps z, z+1, z+2 (verified working Mosaic pattern —
  plain BlockSpecs cannot express overlapping blocks);
- per plane, the 9 in-plane taps are static (dy, dx) slices, each contracted
  over input channels by an MXU matmul (``einsum('chw,co->ohw')``,
  f32 accumulation);
- one HBM read per plane per z-role (3x input traffic) + one write — vs the
  tap path's 27 round-trips.

Weight layout matches flax/``TapConv`` (``[kz, ky, kx, Ci, Co]``) so
parameters are interchangeable. Exposed with a custom VJP:

- ``d/dx`` is the stride-1 transposed conv == the SAME kernel on the
  zero-padded cotangent with spatially-flipped, ci/co-swapped weights;
- ``d/dw`` is 27 big-K contractions (``einsum('czyx,ozyx->co')`` over
  shifted slices) — XLA lowers these to efficient MXU matmuls already
  (K = whole volume), so they stay outside Pallas.

CPU (tests) runs the kernel in interpreter mode, like ops/pallas/sweep.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Auto-routing gate: TapConv's 'auto' mode uses the kernel only when True.
# Held False until the compiled kernel is hardware-validated each time its
# structure changes (bench.py's pallas_selftest is the on-hardware gate).
PALLAS_CONV_ENABLED = False

_VMEM_BUDGET = 6_000_000  # nominal-estimate budget; Mosaic's true scoped
# stack usage runs ~2x the naive ref+temporary accounting (measured: a 12 MB
# estimate hit a 23.7 MB scoped allocation), so this keeps real usage under
# the 16 MB VMEM scope


def _interpret_mode() -> bool:
    return jax.default_backend() == "cpu"


def fits_pallas_conv(ci: int, co: int, spatial, itemsize: int) -> bool:
    """Whether the kernel's per-step working set fits the VMEM budget, for
    BOTH the forward shape and its VJP's padded-cotangent shape — callers
    fall back to the tap path otherwise."""
    if len(spatial) != 3:
        return False
    Z, H, W = spatial
    if Z < 3 or H < 3 or W < 3:
        return False
    wp_fwd = -(-(W - 2) // 128) * 128 + 2
    # dx kernel runs on the cotangent padded by 2 per side: [Co, Z+2, H+2, W+2]
    wp_bwd = -(-W // 128) * 128 + 2
    return (
        _pick_zt(ci, co, H, wp_fwd, itemsize) > 0
        and _pick_zt(co, ci, H + 2, wp_bwd, itemsize) > 0
    )


def _conv_kernel(w_ref, main, halo, o_ref, *, ZT: int, Ho: int, Wo: int,
                 out_dtype, f32: bool):
    # [Ci, ZT+2, H, Wp]: this step's z-chunk + 2-plane halo
    x_all = jnp.concatenate([main[:], halo[:]], axis=1)
    # z-taps folded into the contraction: [3Ci, ZT, H, Wp] with row order
    # (dz, ci) — matching the weight reshape in _conv_fwd_pallas
    x3 = jnp.concatenate([x_all[:, dz:dz + ZT] for dz in range(3)], axis=0)
    prec = jax.lax.Precision.HIGHEST if f32 else None
    wk = w_ref[:]
    if not f32 and _interpret_mode():
        # XLA:CPU's dot thunk can't execute BF16 x BF16 = F32 — upcast in
        # interpreter mode only (TPU uses the native bf16 MXU path)
        x3 = x3.astype(jnp.float32)
        wk = wk.astype(jnp.float32)
    acc = None
    for dy in range(3):
        for dx in range(3):
            seg = x3[:, :, dy:dy + Ho, dx:dx + Wo]
            term = jnp.einsum(
                "czhw,co->ozhw", seg, wk[dy * 3 + dx],
                preferred_element_type=jnp.float32, precision=prec,
            )
            acc = term if acc is None else acc + term
    o_ref[:] = acc.astype(out_dtype)


def _pick_zt(ci: int, co: int, h: int, wp: int, itemsize: int) -> int:
    """Largest even z-chunk whose working set (double-buffered refs +
    in-kernel temporaries + f32 accumulator) fits the VMEM budget."""
    for zt in (16, 12, 8, 6, 4, 2):
        plane = h * wp * itemsize
        need = (
            2 * (ci * (zt + 2)) * plane          # main+halo, double-buffered
            + 4 * ci * zt * plane                 # x_all + x3 temporaries
            + co * zt * h * wp * 4                # f32 accumulator
            + 2 * co * zt * plane                 # out block, double-buffered
        )
        if need <= _VMEM_BUDGET:
            return zt
    return 0


def _conv_fwd_pallas(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x ``[Ci, Z, H, W]``, w ``[3, 3, 3, Ci, Co]`` -> ``[Co, Z-2, H-2, W-2]``
    (valid conv, f32 accumulation, output in x.dtype).

    Mosaic constraints baked in (all probed on this stack):

    - the contraction einsum compiles only when the sliced LANE width is an
      exact 128-multiple ("infer-vector-layout: unsupported shape cast") —
      so the source is zero-padded to a 128-aligned output width and the pad
      columns sliced away afterwards;
    - ``precision=HIGHEST`` is rejected for bf16 operands ("Bad lhs type");
      bf16 uses the default MXU path with f32 accumulation;
    - per-grid-step overhead is ~30 us, so single-plane steps are latency-
      bound: each step processes a ``ZT``-plane chunk, with the +2 z-halo
      delivered by a SECOND block-mapped ref of granularity 2 (start
      ``(z+1) * ZT`` is expressible in 2-plane block units for even ZT —
      plain BlockSpecs cannot express overlapping blocks directly).
    """
    Ci, Z, H, W = x.shape
    Co = w.shape[-1]
    Ho, Wo = H - 2, W - 2
    Wo_p = -(-Wo // 128) * 128
    Wp = Wo_p + 2
    ZT = _pick_zt(Ci, Co, H, Wp, x.dtype.itemsize)
    Zo = Z - 2
    Zo_p = -(-Zo // ZT) * ZT
    pad_w = Wp - W
    pad_z = Zo_p + 2 - Z
    if pad_w or pad_z:
        x = jnp.pad(x, ((0, 0), (0, pad_z), (0, 0), (0, pad_w)))
    # weights with (dz, ci) merged for the folded-z contraction
    w9 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(9, 3 * Ci, Co)
    kern = functools.partial(
        _conv_kernel, ZT=ZT, Ho=Ho, Wo=Wo_p, out_dtype=x.dtype,
        f32=x.dtype == jnp.float32,
    )
    out = pl.pallas_call(
        kern,
        grid=(Zo_p // ZT,),
        in_specs=[
            pl.BlockSpec((9, 3 * Ci, Co), lambda z: (0, 0, 0)),
            pl.BlockSpec((Ci, ZT, H, Wp), lambda z: (0, z, 0, 0)),
            pl.BlockSpec((Ci, 2, H, Wp), lambda z: (0, (z + 1) * (ZT // 2), 0, 0)),
        ],
        out_specs=pl.BlockSpec((Co, ZT, Ho, Wo_p), lambda z: (0, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Co, Zo_p, Ho, Wo_p), x.dtype),
        interpret=_interpret_mode(),
    )(w9.astype(x.dtype), x, x)
    return out[:, :Zo, :, :Wo]


def _wgrad_xla(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """dw[dz,dy,dx,ci,co] = sum x[ci, z+dz, y+dy, x+dx] * g[co, z, y, x].

    27 whole-volume contractions — XLA emits MXU matmuls with K = numel
    (the same shape TapConv's autodiff produces)."""
    _, Zo, Ho, Wo = g.shape
    taps = []
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.slice(
                    x, (0, dz, dy, dx),
                    (x.shape[0], dz + Zo, dy + Ho, dx + Wo),
                )
                taps.append(jnp.einsum(
                    "czyx,ozyx->co", xs.astype(jnp.float32),
                    g.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST,
                ))
    return jnp.stack(taps).reshape(3, 3, 3, x.shape[0], g.shape[0])


@jax.custom_vjp
def conv3x3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Fused valid 3^3 convolution: ``[Ci, Z, H, W] x [3,3,3,Ci,Co] ->
    [Co, Z-2, H-2, W-2]`` (bias-free; add bias outside — keeps the op linear
    so both VJP operands reuse the same kernel)."""
    return _conv_fwd_pallas(x, w)


def _conv_vjp_fwd(x, w):
    return _conv_fwd_pallas(x, w), (x, w)


def _conv_vjp_bwd(res, g):
    x, w = res
    # dx: stride-1 transposed conv == valid conv of the zero-padded cotangent
    # with spatially-flipped, ci/co-swapped weights.
    gp = jnp.pad(g, ((0, 0), (2, 2), (2, 2), (2, 2)))
    w_t = w[::-1, ::-1, ::-1].swapaxes(3, 4)
    dx = _conv_fwd_pallas(gp, w_t.astype(gp.dtype)).astype(x.dtype)
    dw = _wgrad_xla(x, g).astype(w.dtype)
    return dx, dw


conv3x3x3.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)
