"""Attention U-Net flow-field model (flax) — TPU-layout-native.

Redesign of the reference ``Attention_UNet`` (utils.py:409-559) and
``attention_grid`` (utils.py:368-406). Architecture parity at ``depth=4``:
valid-conv double-conv encoder blocks with channels ``64/n .. 512/n`` (via the
``n`` width divisor), MaxPool(2), a ``1024/n`` bottleneck, ConvTranspose(k2,s2)
upsampling, attention-gated skips, center-pad (``padNd``) shape
reconciliation, a final center-pad to the input size and a 1x1 conv head
producing ``ndim`` voxel-unit flow channels. InstanceNorm is non-affine,
eps=1e-5 (torch defaults).

TPU-first implementation choices (all measured on v5e):

- **Channel-first** ``[N, C, *S]`` tensors throughout: registration U-Nets are
  narrow (the reference's default width divisor n=32 gives a 2-channel base),
  and channel-last puts that tiny channel count on the TPU lane axis — XLA
  pads lanes to 128, a 16-64x memory blowup. Channel-first keeps the two
  minor dims spatial (large), which tile cleanly.
- **Tap-decomposed convolutions**: a k^d valid conv is evaluated as k^d
  shifted-slice 1x1 contractions (``einsum('nc...,co->no...')``); measured
  ~2.2x faster than XLA's conv lowering for narrow channel counts, and its
  autodiff produces MXU-friendly big-K matmuls for the weight gradients.
- **Transpose conv as corner contractions + interleave**: each of the 2^d
  kernel corners is a 1x1 contraction; outputs interleave via reshape (exactly
  torch's ConvTranspose(k=2, s=2) semantics).
- Attention-gate weight maps stay **squeezed** (``[N, *S]``) and upsample via
  static one-hot matmuls (gather-free, see ops/resize.py).

Reference-topology notes: the reference architecture requires inputs ≳140^3 in
3D (each valid double conv eats 4 voxels, 4 MaxPools halve; torch *crashes*
below that). ``max_depth_for`` computes the deepest legal depth so engines
clamp instead of crashing — a documented, strictly-enabling divergence. The
model returns the flow; warping lives in ``ops.resample``/``ops.separable``
(the reference couples them at utils.py:520,557).
"""
from __future__ import annotations

import itertools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pad import pad_spatial
from ..ops.resize import axis_nearest_resize


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Non-affine InstanceNorm over spatial axes of ``[N, C, *S]``
    (torch InstanceNormNd defaults: affine=False, biased variance). One-pass
    moments (``var = E[x^2] - E[x]^2``); stats in f32 for bf16 activations."""
    axes = tuple(range(2, x.ndim))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=axes, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _max_pool_cf(x: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    d = x.ndim - 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1) + (k,) * d,
        window_strides=(1, 1) + (k,) * d,
        padding="VALID",
    )


def _contract_1x1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Pointwise channel contraction: x ``[N, Ci, *S]``, w ``[Ci, Co]`` ->
    ``[N, Co, *S]`` (an MXU matmul over the channel axis)."""
    return jnp.einsum("nc...,co->no...", x, w)


class TapConv(nn.Module):
    """Valid k^d convolution as k^d shifted-slice pointwise contractions.

    Parameter layout matches flax ``nn.Conv`` (kernel ``[*k, Ci, Co]``, zero
    bias) so checkpoints are interchangeable.

    A fused Pallas kernel exists (ops/pallas/conv3d.py) but auto-routing is
    OFF (``PALLAS_CONV_ENABLED=False``): it wins standalone *forward* (2.95
    vs 4.96 ms at 120^3 8->8 f32) but loses ~3x in a training loop, where
    XLA fuses the tap backward's wgrad einsums + dx + forward residuals into
    one memory sweep and the custom_vjp kernel boundary forces separate
    full-volume passes. Engines are grad loops, so taps stay the engine
    path; pass ``use_pallas=True`` for forward-dominated use.
    """

    features: int
    ndim: int
    ksize: int = 3
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool | None = None  # None = auto (TPU + fits VMEM)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[1]
        k = self.ksize
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=-2, out_axis=-1),
            (k,) * self.ndim + (cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        out = self._conv(x, kernel, cin, k)
        if bias is not None:
            out = out + bias.astype(self.dtype).reshape(
                (1, self.features) + (1,) * self.ndim
            )
        return out

    def _conv(self, x, kernel, cin, k):
        from ..ops.pallas import conv3d
        from ..ops.pallas.conv3d import conv3x3x3, fits_pallas_conv

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = (
                conv3d.PALLAS_CONV_ENABLED
                and self.ndim == 3
                and k == 3
                and jax.default_backend() == "tpu"
                and fits_pallas_conv(
                    cin, self.features, x.shape[2:],
                    jnp.dtype(self.dtype).itemsize,
                )
            )
        if use_pallas:
            if x.shape[0] == 1:
                return conv3x3x3(x[0], kernel)[None]
            return jax.vmap(lambda a: conv3x3x3(a, kernel))(x)

        out_spatial = tuple(s - (k - 1) for s in x.shape[2:])
        out = None
        for taps in itertools.product(range(k), repeat=self.ndim):
            start = (0, 0) + taps
            limit = (x.shape[0], cin) + tuple(
                t + s for t, s in zip(taps, out_spatial)
            )
            seg = jax.lax.slice(x, start, limit)
            term = _contract_1x1(seg, kernel[taps])
            out = term if out is None else out + term
        return out


class TapConvTranspose2x(nn.Module):
    """ConvTranspose(k=2, s=2): one pointwise contraction per kernel corner,
    interleaved via reshape (torch semantics: ``y[2i+d] = sum_ci x[i] W[d]``).
    Kernel layout matches flax ``nn.ConvTranspose`` (``[*k, Ci, Co]``)."""

    features: int
    ndim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=-2, out_axis=-1),
            (2,) * self.ndim + (cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        n = x.shape[0]
        spatial = x.shape[2:]
        corners = [
            _contract_1x1(x, kernel[c])
            for c in itertools.product(range(2), repeat=self.ndim)
        ]
        y = jnp.stack(corners, axis=-1)  # [N, Co, *S, 2^d]
        y = y.reshape((n, self.features) + tuple(spatial) + (2,) * self.ndim)
        # interleave: [N, Co, s0, s1, ..., 2, 2, ...] -> [N, Co, s0, 2, s1, 2, ...]
        perm = [0, 1]
        for i in range(self.ndim):
            perm += [2 + i, 2 + self.ndim + i]
        y = y.transpose(perm)
        y = y.reshape((n, self.features) + tuple(2 * s for s in spatial))
        return y + bias.astype(self.dtype).reshape(
            (1, self.features) + (1,) * self.ndim
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
        for i in range(2):
            x = TapConv(self.features, self.ndim, dtype=self.dtype,
                        name=f"Conv_{i}")(x)
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
        x = TapConvTranspose2x(self.features, self.ndim, dtype=self.dtype)(x)
        x = nn.relu(x)
        return instance_norm(x) if self.use_norm else x


class AttentionGate(nn.Module):
    """Attention-gated skip connection (reference ``attention_grid``,
    utils.py:368-406): 1x1 stride-3 conv on the skip input, 1x1 conv on the
    gate, ``sigmoid(psi(relu(a+b)))`` weight map upsampled (nearest, as a
    one-hot matmul) to the skip's size, multiplied in, instance-normed."""

    inter_features: int
    ndim: int
    stride: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, g):
        cx, cg = x.shape[1], g.shape[1]
        w_in = self.param(
            "input_kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=0, out_axis=1),
            (cx, self.inter_features), jnp.float32,
        )
        w_gate = self.param(
            "gate_kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=0, out_axis=1),
            (cg, self.inter_features), jnp.float32,
        )
        b_gate = self.param(
            "gate_bias", nn.initializers.zeros, (self.inter_features,), jnp.float32
        )
        w_psi = self.param(
            "psi_kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=0, out_axis=1),
            (self.inter_features, 1), jnp.float32,
        )
        b_psi = self.param("psi_bias", nn.initializers.zeros, (1,), jnp.float32)

        dt = self.dtype
        # stride-k 1x1 conv == spatial subsample + channel contraction
        sub = (slice(None), slice(None)) + (slice(None, None, self.stride),) * self.ndim
        a = _contract_1x1(x[sub].astype(dt), w_in.astype(dt))
        b = _contract_1x1(g.astype(dt), w_gate.astype(dt)) + b_gate.astype(dt).reshape(
            (1, -1) + (1,) * self.ndim
        )
        # Reference reconciles by comparing only the last spatial dim
        # (utils.py:395-399) and padNd-ing the smaller tensor to the other.
        if a.shape[-1] < b.shape[-1]:
            a = pad_spatial(a, b.shape[2:], first_axis=2)
        elif a.shape[-1] > b.shape[-1]:
            b = pad_spatial(b, a.shape[2:], first_axis=2)
        w = nn.sigmoid(
            _contract_1x1(nn.relu(a + b), w_psi.astype(dt))[:, 0]
            + b_psi.astype(dt)[0]
        )  # [N, *s] — squeezed: a channel dim of 1 would lane-pad 128x
        for axis, s_out in enumerate(x.shape[2:]):
            w = axis_nearest_resize(w, 1 + axis, s_out)
        return instance_norm(x * w[:, None]), w


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
    """Flow-field U-Net. Input ``[N, in_c, *S]`` (channel-first), output flow
    ``[N, ndim, *S]`` in voxel units, channel ``i`` displacing spatial dim
    ``i``. ``depth=4`` reproduces the reference topology exactly."""

    ndim: int
    in_c: int = 1
    n: float = 1
    depth: int = 4
    use_attention: bool = True  # ablation/config: plain skips when False
    use_norm: bool = True  # ablation/config: drop InstanceNorms when False
    dtype: jnp.dtype = jnp.float32  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, out_att: bool = False):
        """``out_att=True`` additionally returns the decoder attention-gate
        weight maps (coarsest-first tuple of ``[N, *s]`` arrays) — the analog
        of the reference's dead ``forward(..., out_att)`` flag (utils.py:522,
        never exercised there; live here)."""
        chans = level_channels(self.depth, self.n)
        in_spatial = x.shape[2:]
        x = x.astype(self.dtype)
        atts = []

        skips = []
        y = x
        for i in range(self.depth):
            y = DoubleConv(chans[i], self.ndim, self.use_norm, self.dtype,
                           name=f"enc{i+1}")(y)
            skips.append(y)
            y = _max_pool_cf(y)

        # Bottleneck: double conv at chans[depth] then upsample to
        # chans[depth-1] (reference layer5, utils.py:438-441).
        y = DoubleConv(chans[self.depth], self.ndim, self.use_norm, self.dtype,
                       name="bottleneck")(y)
        y = UpBlock(chans[self.depth - 1], self.ndim, self.use_norm, self.dtype,
                    name="up0")(y)

        for j in range(self.depth - 1, -1, -1):
            if self.use_attention:
                gated, att = AttentionGate(chans[j], self.ndim, dtype=self.dtype,
                                           name=f"skip{j+1}")(skips[j], y)
                atts.append(att)
            else:
                gated = skips[j]
            y = pad_spatial(y, gated.shape[2:], first_axis=2)
            y = jnp.concatenate([gated, y.astype(gated.dtype)], axis=1)
            y = DoubleConv(chans[j], self.ndim, self.use_norm, self.dtype,
                           name=f"dec{j+1}")(y)
            if j > 0:
                y = UpBlock(chans[j - 1], self.ndim, self.use_norm, self.dtype,
                            name=f"up{self.depth - j}")(y)

        y = pad_spatial(y, in_spatial, first_axis=2)
        # Flow head in f32: sub-voxel displacement precision matters.
        w_out = self.param(
            "out_kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=0, out_axis=1),
            (y.shape[1], self.ndim), jnp.float32,
        )
        b_out = self.param("out_bias", nn.initializers.zeros, (self.ndim,),
                           jnp.float32)
        flow = _contract_1x1(y.astype(jnp.float32), w_out) + b_out.reshape(
            (1, self.ndim) + (1,) * self.ndim
        )
        if out_att:
            return flow, tuple(atts)
        return flow
