"""Intensity similarity losses: MSE, SSD, global NCC, local (windowed) NCC.

Pure functions ``loss(y, yp) -> scalar`` designed to live inside a jitted
``value_and_grad`` step. Semantics match the reference:

- :func:`mse` — torch ``nn.MSELoss`` (mean reduction), the reference default
  criterion everywhere (warpings.py:37,124,179).
- :func:`ncc` — the reference's **global** NCC (utils.py:186-205):
  ``(1 - sum(y_ yp_) / sqrt(sum(y_^2) sum(yp_^2) + eps)) * alpha``.
- :func:`ssd` — utils.py:208-221, ``sum((y-yp)^2) * alpha``.
- :func:`lncc` — local windowed NCC (VoxelMorph-style), a TPU-first addition
  with no reference counterpart: window sums via depthwise box filters lower to
  ``reduce_window``/conv and fuse well on TPU. Better-conditioned than global
  NCC for deformable registration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-10


def mse(y: jnp.ndarray, yp: jnp.ndarray) -> jnp.ndarray:
    # f32 reduction even for bf16 compute paths: a bf16 mean over millions of
    # voxels loses most of its mantissa (the subtraction fuses either way).
    d = (y - yp).astype(jnp.float32)
    return jnp.mean(d * d)


def ssd(y: jnp.ndarray, yp: jnp.ndarray, alpha: float = 3.0) -> jnp.ndarray:
    d = (y - yp).astype(jnp.float32)
    return jnp.sum(d * d) * alpha


def ncc(y: jnp.ndarray, yp: jnp.ndarray, alpha: float = 100.0) -> jnp.ndarray:
    y = y.astype(jnp.float32)  # f32 moments; see mse note
    yp = yp.astype(jnp.float32)
    y_ = y - jnp.mean(y)
    yp_ = yp - jnp.mean(yp)
    num = jnp.sum(y_ * yp_)
    den = jnp.sqrt(jnp.sum(y_ * y_) * jnp.sum(yp_ * yp_) + EPSILON)
    return (1.0 - num / den) * alpha


def _box_filter(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Sliding-window sum over spatial dims of ``[N, C, *S]`` (SAME padding)."""
    d = x.ndim - 2
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 1) + (win,) * d,
        window_strides=(1,) * (d + 2),
        padding="SAME",
    )


def lncc(y: jnp.ndarray, yp: jnp.ndarray, win: int = 9, alpha: float = 100.0) -> jnp.ndarray:
    """Local NCC loss: ``(1 - mean_w NCC_w(y, yp)) * alpha``.

    Computes per-window cross-correlation from five box-filtered moment maps —
    one fused elementwise epilogue after the window sums, all
    reduce_window-lowered (bandwidth-bound, no gathers).
    """
    d = y.ndim - 2
    n = float(win**d)
    # f32 moments (see mse note: bf16 window/volume sums lose the mean), and
    # global-mean centering first: the one-pass E[x^2] - E[x]^2 form
    # catastrophically cancels in f32 when intensities ride a large DC offset
    # (un-norm()'d images) — centering removes the offset without a second
    # box-filter pass. Window-local means are still subtracted below.
    y = y.astype(jnp.float32)
    yp = yp.astype(jnp.float32)
    y = y - jnp.mean(y)
    yp = yp - jnp.mean(yp)
    s_y = _box_filter(y, win)
    s_p = _box_filter(yp, win)
    s_yy = _box_filter(y * y, win)
    s_pp = _box_filter(yp * yp, win)
    s_yp = _box_filter(y * yp, win)
    cross = s_yp - s_y * s_p / n
    # clamp: roundoff can leave tiny negative variances whose PRODUCT is
    # positive — flipping cc's sign (instance_norm clamps the same formula)
    var_y = jnp.maximum(s_yy - s_y * s_y / n, 0.0)
    var_p = jnp.maximum(s_pp - s_p * s_p / n, 0.0)
    cc = (cross * cross) / (var_y * var_p + 1e-5)
    return (1.0 - jnp.mean(cc)) * alpha
