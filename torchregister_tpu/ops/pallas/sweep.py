"""Pallas TPU kernel for the 1-D sweep resampler.

The XLA formulation of :func:`ops.separable.sweep_resample_axis` materializes
an HBM round-trip per shift term once the window exceeds XLA's fusion
appetite (the ``fori_loop`` path at K=60 costs ~122 HBM passes ≈ 35 ms for a
240^3 volume). This kernel keeps a row tile of the padded source, the
coordinates and the accumulator in VMEM and runs the whole shift sweep
on-chip: 3 HBM passes total (read source+coords, write output) regardless of
window size — HBM-roofline resampling.

Layout: the swept axis must be minor (the caller transposes). Rows are tiled
over a 1-D grid; the source comes in pre-padded by ``K+1``/``K+2`` zeros so
every shifted segment is a static in-tile slice.

The op is exposed with a custom VJP:
- ``d/d q`` is ``g * (ceil_value - floor_value)``; the forward kernel emits
  the ``diff`` plane as a second output (free — both corner values are
  already in registers).
- ``d/d src`` is the transposed sweep — the same kernel structure run over
  the padded upstream gradient with mirrored shifts.

Used for large-window warps (full-transform level re-warps, one-shot user
warps); small unrolled windows stay on the fused XLA path which is already
optimal there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 256


def _fwd_kernel(q_ref, src_ref, out_ref, diff_ref, *, K: int, X: int):
    q = q_ref[:]  # [TR, X]
    q0 = jnp.floor(q)
    fr = q - q0
    # Mosaic iota must be integer-typed; cast to f32 after.
    iota_x = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1).astype(jnp.float32)
    k = q0 - iota_x

    # fori_loop (an unrolled Python loop makes Mosaic stack-allocate every
    # iteration's temporaries, blowing the 16 MB VMEM scope). Mosaic cannot
    # do unaligned dynamic lane slices, so the padded block is carried and
    # lane-rotated — by 8 lanes once per 8 shifts (rotates are the dominant
    # kernel cost; the 8 sub-offsets come from static slices of the carried
    # value).
    P = X + 2 * K + 3  # padded row length (static); slack lane at the end
    n_terms = 2 * K + 2
    n_outer = -(-n_terms // 8)
    zeros = jnp.zeros(q.shape, jnp.float32)

    def outer(a, carry):
        floor_v, ceil_v, cur = carry
        base = a * 8 - K  # shift of sub-offset 0 this round
        for b in range(8):
            s = (base + b).astype(jnp.float32)
            idx = a * 8 + b
            # One mask per term: the ceil value for floor-index k sits one
            # lane over, so a second static slice replaces the second mask.
            m = jnp.where((k == s) & (idx < n_terms), 1.0, 0.0)
            floor_v = floor_v + cur[:, 1 + b : 1 + b + X] * m
            # Window-edge semantics (must match the unrolled/fori oracle):
            # k = K+1 (the last term) has floor support only — its ceil
            # neighbor is outside the window.
            mc = jnp.where((k == s) & (idx < n_terms - 1), 1.0, 0.0)
            ceil_v = ceil_v + cur[:, 2 + b : 2 + b + X] * mc
        return floor_v, ceil_v, pltpu.roll(cur, P - 8, 1)

    cur0 = src_ref[:]
    # k = -(K+1) has ceil support only: f * src[o-K] (= padded[o+1], the
    # same slice the first floor term reads).
    ceil0 = cur0[:, 1 : 1 + X] * jnp.where(k == -(K + 1.0), 1.0, 0.0)
    floor_v, ceil_v, _ = jax.lax.fori_loop(
        0, n_outer, outer, (zeros, ceil0, cur0)
    )
    out_ref[:] = floor_v * (1.0 - fr) + ceil_v * fr
    diff_ref[:] = ceil_v - floor_v


def _interpret_mode() -> bool:
    # Compiled Mosaic kernels need real TPU hardware; tests run the
    # interpreter on CPU.
    return jax.default_backend() == "cpu"


def _sweep_fwd_raw(src: jnp.ndarray, q: jnp.ndarray, K: int):
    R, X = src.shape
    TR = min(_ROW_TILE, R)
    rows = -(-R // TR) * TR
    if rows != R:
        src = jnp.pad(src, ((0, rows - R), (0, 0)))
        q = jnp.pad(q, ((0, rows - R), (0, 0)), constant_values=-1e9)
    padded = jnp.pad(src, ((0, 0), (K + 1, K + 2)))
    P = X + 2 * K + 3

    kern = functools.partial(_fwd_kernel, K=K, X=X)
    out, diff = pl.pallas_call(
        kern,
        grid=(rows // TR,),
        in_specs=[
            pl.BlockSpec((TR, X), lambda i: (i, 0)),
            pl.BlockSpec((TR, P), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TR, X), lambda i: (i, 0)),
            pl.BlockSpec((TR, X), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, X), jnp.float32),
            jax.ShapeDtypeStruct((rows, X), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(q.astype(jnp.float32), padded.astype(jnp.float32))
    return out[:R], diff[:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sweep_lastaxis(src: jnp.ndarray, q: jnp.ndarray, K: int) -> jnp.ndarray:
    """Differentiable Pallas sweep resample along the last axis."""
    out, _ = _sweep_fwd_raw(src, q, K)
    return out


def _sweep_vjp_fwd(src, q, K):
    out, diff = _sweep_fwd_raw(src, q, K)
    return out, (src, q, diff)


def _sweep_vjp_bwd(K, res, g):
    src, q, diff = res
    dq = g * diff
    # d src: hand-written transpose of the linear-in-src sweep. The forward
    # (matching `separable._sweep_fori`) reads ``out[o] = sum_s w_s[o] *
    # src[o+s]`` with ``w_s = (1-fr)[k==s] + fr[k==s-1]``, so the adjoint
    # scatter-adds ``g*w_s`` at offset ``s`` into a padded accumulator — the
    # exact mirror of the forward's dynamic-slice reads, one pass per term
    # and NO throwaway forward. (jax.linear_transpose over the fori/scan
    # formulation fails on current jax — ValAccum enters the scan carry.)
    R, X = src.shape
    q = q.astype(jnp.float32)
    q0 = jnp.floor(q)
    fr = q - q0
    iota_x = jnp.arange(X, dtype=jnp.float32)[None, :]
    k = q0 - iota_x
    n_terms = 2 * K + 2
    g = g.astype(src.dtype)
    fr = fr.astype(src.dtype)

    def body(i, acc):
        s = (i - K).astype(k.dtype)
        w = jnp.where(k == s, 1.0 - fr, 0.0) + jnp.where(k == s - 1.0, fr, 0.0)
        t = g * w
        start = i + 1  # = s + K + 1: the forward's read offset, mirrored
        seg = jax.lax.dynamic_slice_in_dim(acc, start, X, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(acc, seg + t, start, axis=1)

    acc0 = jnp.zeros((R, X + 2 * K + 3), src.dtype)
    acc = jax.lax.fori_loop(0, n_terms, body, acc0)
    dsrc = jax.lax.slice_in_dim(acc, K + 1, K + 1 + X, axis=1)
    return dsrc, dq


sweep_lastaxis.defvjp(_sweep_vjp_fwd, _sweep_vjp_bwd)
