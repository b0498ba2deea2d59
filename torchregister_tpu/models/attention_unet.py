"""Attention U-Net flow-field model (flax).

TPU-native redesign of the reference ``Attention_UNet`` (utils.py:409-559) and
``attention_grid`` (utils.py:368-406):

- Channel-**last** tensors internally (``[N, *S, C]``) — the layout XLA:TPU
  tiles onto the MXU for convolutions; the engines convert at the boundary.
- Architecture parity with the reference at ``depth=4``: four valid-conv
  double-conv encoder blocks with channels ``64/n .. 512/n``, MaxPool(2)
  downsampling, a ``1024/n`` bottleneck, ConvTranspose(k2, s2) upsampling,
  attention-gated skip connections, center-pad shape reconciliation
  (``padNd``), a final center-pad back to the input size and a 1x1 conv head
  producing ``ndim`` flow channels. InstanceNorm is non-affine with eps=1e-5
  (torch default).
- The reference architecture requires inputs ≳140^3 in 3D (each valid double
  conv eats 4 voxels; 4 MaxPools halve; torch *crashes* below that — e.g. at
  128^3 the bottleneck conv sees a 4^3 map). ``max_depth_for`` computes the
  deepest legal depth for a shape so engines can clamp instead of crashing —
  a documented, strictly-enabling divergence.
- The model returns the **flow**; warping happens in
  ``ops.resample.warp_flow`` (the reference couples them at utils.py:520,557 —
  decoupling lets the cascade re-apply flows to arbitrary channels without a
  module instance).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pad import pad_spatial
from ..ops.resize import axis_nearest_resize


def _nearest_resize_cl(x: jnp.ndarray, out_spatial: Sequence[int]) -> jnp.ndarray:
    """torch-'nearest' resize on channel-last ``[N, *S, C]`` (gather-free —
    one-hot MXU contraction per axis; a take-based resize costs ~100ms+ per
    U-Net step at 120^3 on TPU)."""
    for axis, s_out in enumerate(out_spatial):
        x = axis_nearest_resize(x, 1 + axis, s_out)
    return x


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Non-affine InstanceNorm over spatial axes of ``[N, *S, C]``
    (torch InstanceNormNd defaults: affine=False, biased variance).

    Uses the one-pass moments form (``var = E[x^2] - E[x]^2``) so XLA computes
    both reductions in a single read of ``x`` instead of two.
    """
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)  # stats in f32 even for bf16 activations
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=axes, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _max_pool_cl(x: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    d = x.ndim - 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) + (k,) * d + (1,),
        window_strides=(1,) + (k,) * d + (1,),
        padding="VALID",
    )


class DoubleConv(nn.Module):
    """(Conv k3 VALID -> ReLU -> InstanceNorm) x2 — the reference's per-level
    block (utils.py:414-415 etc.)."""

    features: int
    ndim: int
    use_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (3,) * self.ndim
        x = nn.Conv(self.features, k, padding="VALID", dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.use_norm:
            x = instance_norm(x)
        x = nn.Conv(self.features, k, padding="VALID", dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.use_norm:
            x = instance_norm(x)
        return x


class UpBlock(nn.Module):
    """ConvTranspose(k2, s2) -> ReLU -> InstanceNorm (utils.py:441 etc.)."""

    features: int
    ndim: int
    use_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.features, (2,) * self.ndim, strides=(2,) * self.ndim,
            padding="VALID", dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        return instance_norm(x) if self.use_norm else x


class AttentionGate(nn.Module):
    """Attention-gated skip connection (reference ``attention_grid``,
    utils.py:368-406): 1x1 stride-3 conv on the skip input, 1x1 conv on the
    gate, sigmoid(psi(relu(a+b))) weight map upsampled (nearest) to the skip's
    size, multiplied in, instance-normed."""

    inter_features: int
    ndim: int
    stride: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, g):
        a = nn.Conv(
            self.inter_features, (1,) * self.ndim,
            strides=(self.stride,) * self.ndim, use_bias=False,
            dtype=self.dtype,
        )(x)
        b = nn.Conv(self.inter_features, (1,) * self.ndim, use_bias=True,
                    dtype=self.dtype)(g)
        # Reference reconciles by comparing only the last spatial dim
        # (utils.py:395-399) and padNd-ing the smaller tensor to the other.
        if a.shape[-2] < b.shape[-2]:
            a = pad_spatial(a, b.shape[1:-1], first_axis=1)
        elif a.shape[-2] > b.shape[-2]:
            b = pad_spatial(b, a.shape[1:-1], first_axis=1)
        w = nn.sigmoid(
            nn.Conv(1, (1,) * self.ndim, use_bias=True, dtype=self.dtype)(
                nn.relu(a + b)
            )
        )
        # Work with the weight map SQUEEZED to [N, *S]: a trailing channel
        # dim of 1 puts size-1 on the TPU lane axis (padded to 128 — a 128x
        # memory blowup at full resolution).
        w = w[..., 0]
        for axis, s_out in enumerate(x.shape[1:-1]):
            w = axis_nearest_resize(w, 1 + axis, s_out)
        w = w[..., None]
        return instance_norm(x * w), w


def level_channels(depth: int, n: float) -> list[int]:
    """Encoder channels ``int(64 * 2^i / n)`` for i in [0, depth] (bottleneck
    included), floored at 1. Reference: utils.py:414-441 with the ``n`` width
    divisor (torchregister.py:46 default n=32 -> base width 2)."""
    return [max(1, int(64 * (2**i) / n)) for i in range(depth + 1)]


def max_depth_for(spatial: Sequence[int], max_depth: int = 4) -> int:
    """Deepest U-Net depth whose bottleneck double-conv still sees >=5 voxels
    per spatial dim (valid k3 convs eat 4; MaxPool halves with floor)."""
    depth = 0
    for d in range(1, max_depth + 1):
        sizes = list(spatial)
        ok = True
        for _ in range(d):
            sizes = [s - 4 for s in sizes]  # double conv
            if min(sizes) < 2:
                ok = False
                break
            sizes = [s // 2 for s in sizes]  # maxpool
        if ok and min(sizes) >= 5:  # bottleneck double conv needs >= 5
            depth = d
    return depth


class AttentionUNet(nn.Module):
    """Flow-field U-Net. Input ``[N, *S, in_c]`` (channel-last), output flow
    ``[N, *S, ndim]`` in voxel units, channel ``i`` displacing spatial dim ``i``.
    ``depth=4`` reproduces the reference topology exactly."""

    ndim: int
    in_c: int = 1
    n: float = 1
    depth: int = 4
    use_attention: bool = True  # ablation/config: plain skips when False
    use_norm: bool = True  # ablation/config: drop InstanceNorms when False
    dtype: jnp.dtype = jnp.float32  # compute dtype; bf16 halves HBM traffic
    # and doubles MXU rate (params stay f32; norms/flow head compute in f32)

    @nn.compact
    def __call__(self, x):
        chans = level_channels(self.depth, self.n)
        in_spatial = x.shape[1:-1]
        x = x.astype(self.dtype)

        skips = []
        y = x
        for i in range(self.depth):
            y = DoubleConv(chans[i], self.ndim, self.use_norm, self.dtype,
                           name=f"enc{i+1}")(y)
            skips.append(y)
            y = _max_pool_cl(y)

        # Bottleneck: double conv at chans[depth] then upsample to
        # chans[depth-1] (reference layer5, utils.py:438-441).
        y = DoubleConv(chans[self.depth], self.ndim, self.use_norm, self.dtype,
                       name="bottleneck")(y)
        y = UpBlock(chans[self.depth - 1], self.ndim, self.use_norm, self.dtype,
                    name="up0")(y)

        for j in range(self.depth - 1, -1, -1):
            if self.use_attention:
                gated, _ = AttentionGate(chans[j], self.ndim, dtype=self.dtype,
                                         name=f"skip{j+1}")(skips[j], y)
            else:
                gated = skips[j]
            y = pad_spatial(y, gated.shape[1:-1], first_axis=1)
            y = jnp.concatenate([gated, y.astype(gated.dtype)], axis=-1)
            y = DoubleConv(chans[j], self.ndim, self.use_norm, self.dtype,
                           name=f"dec{j+1}")(y)
            if j > 0:
                y = UpBlock(chans[j - 1], self.ndim, self.use_norm, self.dtype,
                            name=f"up{self.depth - j}")(y)

        y = pad_spatial(y, in_spatial, first_axis=1)
        # Flow head in f32: sub-voxel displacement precision matters.
        flow = nn.Conv(self.ndim, (1,) * self.ndim, name="out")(
            y.astype(jnp.float32)
        )
        return flow
