"""Pallas TPU kernel for fused valid 3x3x3 convolution (the U-Net hot op).

Why this exists: XLA:TPU lowers narrow-channel 3D convolutions far off the
HBM roofline (measured 32.5 ms for one 8->8 3^3 conv at 120^3 f32 in a
chained device loop; the tap-decomposed formulation in
models/attention_unet.py:TapConv gets 4.2 ms), because narrow channel counts
starve the MXU and every tap round-trips HBM. The flow U-Net's fwd+bwd IS the
whole flow-step cost (reference utils.py:409-559 is likewise the reference's
entire flow-mode cost), so this kernel keeps the whole 27-tap stencil
on-chip:

- grid over output z-planes; a 3-plane window of the source is read per step
  (z, z+1, z+2), the z-taps folded into the contraction: the planes
  concatenate to ``[3Ci, H, W]`` and each of the 9 in-plane taps is ONE MXU
  matmul with K = 3*Ci (``einsum('chw,co->ohw')``, f32 accumulation) over a
  static (dy, dx) slice;
- one HBM read per plane per z-role (3x input traffic) + one write — vs the
  tap path's 27 round-trips.

Two block layouts (both probed on v5e through the axon stack):

- variant A (preferred): ONE all-``pl.Element`` ref with an elementwise z
  start (Mosaic requires Element dims to be all-or-none, and the last two
  block dims to be (8,128)-divisible or full-size — full H/W here).
  2.95 ms per 8->8 conv at 120^3 f32; 21.9 ms at 240^3.
- variant C (huge shapes): H is chunked in HC=64-row output strips;
  overlapped input windows (66 rows) cannot be expressed by Blocked specs,
  so the input is pre-stacked into ``[nh, Ci, Z, HC+2, Wp]`` slabs (one
  cheap XLA copy) whose trailing dims are full-size. Bounds VMEM for any H:
  4.74 ms at 128^3, 25.6 ms at 240^3 (tap: 7.3 / 57.8; XLA native:
  38.8 / 251).

Variant choice is by a calibrated VMEM model (see the `_VMEM_*` constants):
each pallas_call requests a raised scoped-VMEM limit via
``CompilerParams(vmem_limit_bytes=...)`` — the 16 MB default is a compiler
flag, not the v5e's 128 MB of physical VMEM — sized at 4x the naive
ref+temporary estimate (Mosaic's true stack measured 2.5-3.7x it; each
unrolled einsum statement gets its own stack slot). Variant A is preferred whenever
its request fits the 100 MB ceiling (measured: 2.95 ms at 120^3 f32, 2.1 ms
for the Ci=32 decoder shape, 21.9 ms at 240^3 f32 — faster than variant C
everywhere it compiles); C covers the remainder. z-merged grids (ZT output
planes per step) were probed and do NOT help (3.7 ms vs 2.95 at 120^3):
the kernel is compute-shaped, not grid-overhead-shaped.

Weight layout matches flax/``TapConv`` (``[kz, ky, kx, Ci, Co]``) so
parameters are interchangeable. Exposed with a custom VJP:

- ``d/dx`` is the stride-1 transposed conv == the SAME kernel on the
  zero-padded cotangent with spatially-flipped, ci/co-swapped weights;
- ``d/dw`` is 27 big-K contractions (``einsum('czyx,ozyx->co')`` over
  shifted slices) — XLA fuses these sibling reductions well (K = volume),
  and the Mosaic stack rejects every in-kernel two-axis contraction form.

CPU (tests) runs the kernel in interpreter mode, like ops/pallas/sweep.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Auto-routing gate: TapConv's 'auto' mode uses the kernel only when True.
#
# OFF after the r3 fwd+bwd A/B on v5e: the kernel wins STANDALONE FORWARD
# (2.95 ms vs tap 4.96 at 8->8 120^3 f32) but loses or ties in a training
# loop, which is the only production use (engines are grad loops; the stored
# flow, not the U-Net, serves `Register.__call__`). Loop-amortized
# fwd+bwd/step at the 128^3 engine's shapes:
#
#   8->8 @124^3:  tap 6.15 ms   pallas 20.3 ms  (9.9 dw-grad-only; 6.2 with
#   16->16 @58^3: tap 3.33      pallas  7.4      default-precision wgrad)
#   16->8 @118^3: tap 7.61      pallas 26.6
#
# Root cause: XLA fuses the tap path's backward — the 27 weight-grad
# einsums, the transposed-conv dx and the forward residuals share one
# memory sweep — while the custom_vjp kernel boundary forces dw/dx into
# separate full-volume passes (plus 3x z-role re-reads inside the kernel).
# A locally-faster kernel that breaks the fusion boundary is a net loss:
# the tap decomposition IS the TPU-correct training formulation. The kernel
# stays available (use_pallas=True) for forward-dominated workloads and
# keeps its interpret-mode tests + on-hardware bench selftest.
PALLAS_CONV_ENABLED = False

# Mosaic's scoped-VMEM stack runs 2.5-3.7x the naive ref+temporary estimate
# (measured: 16.22 MB at a 6.43 MB estimate for 120^3 f32, 16.73 MB at a
# 5.32 MB estimate for the Ci=32 decoder shape, 38.83 MB at a ~10.5 MB
# estimate for the 128^3 engine's dec2 shape — each unrolled einsum statement
# gets its own stack slot). The default 16 MB scoped limit is just the
# `--xla_tpu_scoped_vmem_limit_kib` default, NOT the hardware: v5e has
# 128 MB VMEM, and `CompilerParams(vmem_limit_bytes=...)` raises the scope
# per-kernel (probed working at 32/64/100 MB on this axon stack; 240^3
# variant A measured 21.9 ms/conv at a 90 MB request — faster than variant
# C's 25.6). Each pallas_call therefore requests `_VMEM_SAFETY x estimate`
# clamped to [`_VMEM_FLOOR`, `_VMEM_CEIL`] (the ceiling leaves headroom out
# of 128 MB for XLA's own buffers). A variant is *admitted* at the smaller
# `_VMEM_ADMIT x estimate <= ceiling` so a large kernel whose safety-scaled
# request saturates the ceiling still runs (the request is a limit, not a
# reservation — the 240^3 variant-A stack fits under 100 MB in practice).
_VMEM_SAFETY = 4.0
_VMEM_ADMIT = 3.7  # the measured WORST ratio: admitting below it could pass
# a shape whose true stack exceeds the ceiling -> Mosaic compile error with
# no fallback. Shapes in the rejected band route to the tap path instead.
_VMEM_FLOOR = 48 << 20   # covers worst measured ratio for small estimates
_VMEM_CEIL = 100 << 20
HC = 64  # variant-C output rows per grid step (multiple of 8 — Mosaic
# requires (8,128)-divisible or full-size trailing block dims)


def _interpret_mode() -> bool:
    return jax.default_backend() == "cpu"


def _est_a(ci: int, co: int, h: int, wp: int, itemsize: int) -> int:
    """Variant-A per-step VMEM estimate: double-buffered 3-plane Element ref,
    the [3Ci] concat, one live einsum term + f32 accumulator, double-buffered
    out block."""
    wo = wp - 2
    return (
        2 * 3 * ci * h * wp * itemsize   # x ref (3 z-planes), double-buffered
        + 3 * ci * h * wp * itemsize     # x3 concat
        + 2 * co * (h - 2) * wo * 4      # term + accumulator (f32)
        + 2 * co * (h - 2) * wo * itemsize  # out block, double-buffered
    )


def _est_c(ci: int, co: int, wp: int, itemsize: int) -> int:
    """Variant-C per-step VMEM estimate (H fixed at HC+2 input rows)."""
    wo = wp - 2
    return (
        2 * 3 * ci * (HC + 2) * wp * itemsize  # 3 slab refs, double-buffered
        + 3 * ci * (HC + 2) * wp * itemsize    # x3 concat
        + 2 * co * HC * wo * 4                 # term + accumulator (f32)
        + 2 * co * HC * wo * itemsize          # out block, double-buffered
    )


def _vmem_request(est: int) -> int:
    """Scoped-VMEM limit to request for a kernel with naive estimate ``est``."""
    return int(min(_VMEM_CEIL, max(_VMEM_FLOOR, _VMEM_SAFETY * est)))


def _compiler_params(est: int):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_vmem_request(est))


def _pick_variant(ci: int, co: int, h: int, w: int, itemsize: int):
    wp = -(-(w - 2) // 128) * 128 + 2
    if _VMEM_ADMIT * _est_a(ci, co, h, wp, itemsize) <= _VMEM_CEIL:
        return "a"
    if _VMEM_ADMIT * _est_c(ci, co, wp, itemsize) <= _VMEM_CEIL:
        return "c"
    return None


def fits_pallas_conv(ci: int, co: int, spatial, itemsize: int) -> bool:
    """Whether some kernel variant fits the VMEM budget, for BOTH the forward
    shape and its VJP's padded-cotangent shape — callers fall back to the tap
    path otherwise."""
    if len(spatial) != 3:
        return False
    Z, H, W = spatial
    if Z < 3 or H < 3 or W < 3:
        return False
    return (
        _pick_variant(ci, co, H, W, itemsize) is not None
        and _pick_variant(co, ci, H + 2, W + 2, itemsize) is not None
    )


def _conv_kernel(w_ref, x_ref, o_ref, *, Ho: int, Wo: int, f32: bool):
    # z-taps folded into the contraction: [3Ci, H, Wp], row order (dz, ci) —
    # matching the weight transpose in _conv_fwd_pallas. x_ref is the 3-plane
    # window (variant A: [Ci, 3, H, Wp]; variant C: 3 slab refs pre-concat).
    x3 = jnp.concatenate([x_ref[:, 0], x_ref[:, 1], x_ref[:, 2]], axis=0)
    return _tap_matmuls(w_ref, x3, o_ref, Ho, Wo, f32)


def _tap_matmuls(w_ref, x3, o_ref, Ho, Wo, f32):
    # f32 needs an explicit HIGHEST (default = bf16 MXU passes, ~5e-2 err);
    # bf16 operands reject HIGHEST ("Bad lhs type") and accumulate f32 via
    # preferred_element_type alone. CPU interpret can't run bf16 dots at all.
    prec = jax.lax.Precision.HIGHEST if f32 else None
    wk = w_ref[:]
    if not f32 and _interpret_mode():
        x3 = x3.astype(jnp.float32)
        wk = wk.astype(jnp.float32)
    acc = None
    for dy in range(3):
        for dx in range(3):
            seg = x3[:, dy:dy + Ho, dx:dx + Wo]
            term = jnp.einsum(
                "chw,co->ohw", seg, wk[dy * 3 + dx],
                preferred_element_type=jnp.float32, precision=prec,
            )
            acc = term if acc is None else acc + term
    o_ref[:, 0] = acc.astype(o_ref.dtype)


def _conv_kernel_c(w_ref, p0, p1, p2, o_ref, *, Ho: int, Wo: int, f32: bool):
    x3 = jnp.concatenate([p0[0, :, 0], p1[0, :, 0], p2[0, :, 0]], axis=0)
    return _tap_matmuls(w_ref, x3, o_ref, Ho, Wo, f32)


def _fwd_a(x, w9, Ci, Co, Z, H, Wp, Wo_p):
    Ho = H - 2
    kern = functools.partial(
        _conv_kernel, Ho=Ho, Wo=Wo_p, f32=x.dtype == jnp.float32
    )
    itemsize = jnp.dtype(x.dtype).itemsize
    return pl.pallas_call(
        kern,
        grid=(Z - 2,),
        in_specs=[
            pl.BlockSpec((9, 3 * Ci, Co), lambda z: (0, 0, 0)),
            pl.BlockSpec(
                (pl.Element(Ci), pl.Element(3), pl.Element(H), pl.Element(Wp)),
                lambda z: (0, z, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((Co, 1, Ho, Wo_p), lambda z: (0, z, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Co, Z - 2, Ho, Wo_p), x.dtype),
        interpret=_interpret_mode(),
        compiler_params=_compiler_params(_est_a(Ci, Co, H, Wp, itemsize)),
    )(w9.astype(x.dtype), x)


def _fwd_c(x, w9, Ci, Co, Z, H, Wp, Wo_p):
    Ho = H - 2
    nh = -(-Ho // HC)
    Hpad = nh * HC + 2
    if Hpad != H:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Hpad - H), (0, 0)))
    # overlapped input strips as a stacked leading dim — trailing block dims
    # stay full-size (Mosaic's divisibility rule), one cheap XLA copy
    xh = jnp.stack([x[:, :, i * HC:i * HC + HC + 2] for i in range(nh)])
    kern = functools.partial(
        _conv_kernel_c, Ho=HC, Wo=Wo_p, f32=x.dtype == jnp.float32
    )
    itemsize = jnp.dtype(x.dtype).itemsize
    out = pl.pallas_call(
        kern,
        grid=(Z - 2, nh),
        in_specs=[
            pl.BlockSpec((9, 3 * Ci, Co), lambda z, h: (0, 0, 0)),
            pl.BlockSpec((1, Ci, 1, HC + 2, Wp), lambda z, h: (h, 0, z, 0, 0)),
            pl.BlockSpec((1, Ci, 1, HC + 2, Wp),
                         lambda z, h: (h, 0, z + 1, 0, 0)),
            pl.BlockSpec((1, Ci, 1, HC + 2, Wp),
                         lambda z, h: (h, 0, z + 2, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Co, 1, HC, Wo_p), lambda z, h: (0, z, h, 0)),
        out_shape=jax.ShapeDtypeStruct((Co, Z - 2, nh * HC, Wo_p), x.dtype),
        interpret=_interpret_mode(),
        compiler_params=_compiler_params(_est_c(Ci, Co, Wp, itemsize)),
    )(w9.astype(x.dtype), xh, xh, xh)
    return out[:, :, :Ho]


def _conv_fwd_pallas(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x ``[Ci, Z, H, W]``, w ``[3, 3, 3, Ci, Co]`` -> ``[Co, Z-2, H-2, W-2]``
    (valid conv, f32 accumulation, output in x.dtype).

    Mosaic constraint (probed): the contraction einsum compiles only when the
    sliced LANE width is an exact 128-multiple ("infer-vector-layout:
    unsupported shape cast") — static unaligned *starts* are fine. The source
    is zero-padded to a 128-aligned output width; pad columns contribute
    zeros and are sliced away.
    """
    Ci, Z, H, W = x.shape
    Co = w.shape[-1]
    Wo = W - 2
    Wo_p = -(-Wo // 128) * 128
    Wp = Wo_p + 2
    if Wp != W:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
    # weights with (dz, ci) merged for the folded-z contraction
    w9 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(9, 3 * Ci, Co)
    variant = _pick_variant(Ci, Co, H, W, jnp.dtype(x.dtype).itemsize)
    if variant is None:
        # Reachable via use_pallas=True (which bypasses fits_pallas_conv):
        # running variant A anyway would surface as a raw Mosaic scoped-VMEM
        # compile error with no hint the sizing model rejected the shape.
        raise ValueError(
            f"pallas conv3x3x3: no VMEM-admissible variant for shape "
            f"Ci={Ci} Co={Co} Z={Z} H={H} W={W} "
            f"(itemsize {jnp.dtype(x.dtype).itemsize}) — the estimated "
            f"Mosaic stack exceeds the {_VMEM_CEIL >> 20} MB ceiling on "
            "both variants; use the tap-decomposed conv (use_pallas=False)"
        )
    if variant == "c":
        out = _fwd_c(x, w9, Ci, Co, Z, H, Wp, Wo_p)
    else:
        out = _fwd_a(x, w9, Ci, Co, Z, H, Wp, Wo_p)
    return out[..., :Wo]


def _wgrad_xla(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """dw[dz,dy,dx,ci,co] = sum x[ci, z+dz, y+dy, x+dx] * g[co, z, y, x].

    27 whole-volume contractions — XLA emits MXU matmuls with K = numel
    (the same shape TapConv's autodiff produces) and fuses the sibling
    reductions into few memory passes."""
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
