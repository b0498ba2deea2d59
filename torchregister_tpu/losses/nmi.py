"""KDE-based (normalized) mutual information loss.

Reimplements the reference's differentiable soft-histogram NMI stack
(utils.py:18-79 and NMILoss at utils.py:224-259) with a TPU-friendly memory
layout: the reference materializes an ``[N, L, bins]`` kernel tensor
(utils.py:25-26) — 8+ GB at its own defaults — whereas :func:`kde_pdf` streams
voxel chunks through a ``lax.scan``, keeping memory at ``O(N * chunk * bins)``
while producing bit-equivalent sums (modulo fp reassociation).

Reference semantics preserved exactly (including quirks, because they define
observable loss values):

- Gaussian kernel ``K(u) = exp(-u^2/2) / (2*pi)`` — the unnormalized ``1/2pi``
  constant (utils.py:18-21) cancels in the NMI ratio.
- Sample points: ``steps`` points linspaced between the *global* max and min of
  the batch (descending order — utils.py:45-46 swaps min/max; order only, all
  downstream reductions are order-invariant).
- The "joint histogram" is the KDE of the *concatenated* signals
  ``stack((img1, img2), dim=1)`` flattened per batch element (utils.py:62-63) —
  a pooled marginal, not a 2D joint. Kept as-is for loss-value parity.
- Entropies via ``-sum(p * -log2(p + 1e-10))`` (utils.py:71-73), NMI =
  ``2*MI/(E1+E2)``.
- ``nmi_loss`` resizes to ``(2*patch)^d`` with nearest interpolation and
  flat-reshapes into ``(2^d * B * C)`` chunks of ``patch^d`` — a raw-buffer
  ``view``, not spatial octants (utils.py:239-254). Loss =
  ``mean(|NMI - 1|) * alpha``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resize import nearest_resize

EPSILON = 1e-10
_INV_2PI = 1.0 / (2.0 * jnp.pi)


def _kde_accumulate(signals: jnp.ndarray, xis: jnp.ndarray, h: float) -> jnp.ndarray:
    """Sum over voxel axis of ``K((signals - xi)/h)``.

    signals: ``[N, L]``; xis: ``[steps]`` (shared across batch, as in the
    reference where line samples use global bounds). Returns ``[N, steps]``.
    """
    u = (signals[:, :, None] - xis[None, None, :]) / h
    return jnp.sum(_INV_2PI * jnp.exp(-0.5 * u * u), axis=1)


def kde_pdf(
    signals: jnp.ndarray,
    xis: jnp.ndarray,
    bandwidth: float,
    chunk: int = 8192,
) -> jnp.ndarray:
    """Differentiable KDE density of each row of ``signals [N, L]`` at sample
    points ``xis [steps]``; returns ``[N, steps]`` (= reference ``PDF``,
    utils.py:24-38, with streaming instead of an ``[N, L, steps]`` temp)."""
    n, L = signals.shape
    h = float(bandwidth)
    if L <= chunk:
        acc = _kde_accumulate(signals, xis, h)
    else:
        main = (L // chunk) * chunk
        body = signals[:, :main].reshape(n, L // chunk, chunk).transpose(1, 0, 2)

        # Remat the chunk body: without it, reverse-mode saves each chunk's
        # [n, chunk, bins] kernel tensor as a scan residual — tens of GB for
        # a 3D volume. Recomputing the exps in the backward keeps memory at
        # O(n * chunk * bins) total.
        @jax.checkpoint
        def step(acc, sig_chunk):
            return acc + _kde_accumulate(sig_chunk, xis, h), None

        acc, _ = jax.lax.scan(
            step, jnp.zeros((n, xis.shape[0]), signals.dtype), body
        )
        if main < L:
            acc = acc + _kde_accumulate(signals[:, main:], xis, h)
    return acc / (h * L)


def get_pdf(data: jnp.ndarray, steps: int = 256, bandwidth: float = 2.0) -> jnp.ndarray:
    """Reference ``get_pdf`` (utils.py:41-53): flatten ``[N, ...] -> [N, L]``,
    linspace sample points over the global (max -> min, descending) range."""
    signals = data.reshape(data.shape[0], -1)
    # Bounds are detached: the reference reads them via ``.item()``
    # (utils.py:45-46), so no gradient flows through the sample-point grid.
    hi = jax.lax.stop_gradient(jnp.max(signals))
    lo = jax.lax.stop_gradient(jnp.min(signals))
    xis = jnp.linspace(0.0, 1.0, steps, dtype=signals.dtype) * (lo - hi) + hi
    return kde_pdf(signals, xis, bandwidth)


def nmi(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    bins: int = 256,
    bandwidth: float = 0.1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``NMI`` (utils.py:56-79). Returns ``(nmi [N], mi [N])``."""
    hist1 = get_pdf(img1, steps=bins, bandwidth=bandwidth)
    hist2 = get_pdf(img2, steps=bins, bandwidth=bandwidth)
    hist_joint = get_pdf(
        jnp.stack((img1, img2), axis=1), steps=bins, bandwidth=bandwidth
    )

    p1 = hist1 / jnp.sum(hist1, axis=1, keepdims=True)
    p2 = hist2 / jnp.sum(hist2, axis=1, keepdims=True)
    pj = hist_joint / jnp.sum(hist_joint, axis=1, keepdims=True)

    # Double negation kept from the reference: entropies come out negative but
    # consistently so across terms (utils.py:71-73).
    e1 = -jnp.sum(p1 * -jnp.log2(p1 + EPSILON), axis=1)
    e2 = -jnp.sum(p2 * -jnp.log2(p2 + EPSILON), axis=1)
    ej = -jnp.sum(pj * -jnp.log2(pj + EPSILON), axis=1)

    mi = e1 + e2 - ej
    return 2.0 * mi / (e1 + e2), mi


def nmi_loss(
    y: jnp.ndarray,
    yp: jnp.ndarray,
    alpha: float = 1000.0,
    bins: int = 256,
    patch_size: int = 100,
    bandwidth: float = 3.0,
) -> jnp.ndarray:
    """Reference ``NMILoss.forward`` (utils.py:236-259)."""
    p = patch_size
    d = y.ndim - 2
    re_shape = (2 * p,) * d

    def prep(x):
        x = nearest_resize(x, re_shape)
        return x.reshape(((2**d) * x.shape[0] * x.shape[1],) + (p,) * d)

    n, _ = nmi(prep(y), prep(yp), bins=bins, bandwidth=bandwidth)
    return jnp.mean(jnp.abs(n - 1.0)) * alpha


def nmi_loss_checkified(y: jnp.ndarray, yp: jnp.ndarray, **kw):
    """Checkify-instrumented NMI loss — the SURVEY §5 numerics hot spot guard.

    The KDE/log2 path can silently go non-finite (all-constant inputs collapse
    the histogram range; extreme intensities overflow the kernel). This
    variant raises a checkify error naming the failing stage instead of
    propagating NaN into the optimizer. Used by ``Register.optim(debug=True)``
    as a one-shot pre-flight on the actual inputs — the hot loop stays
    uninstrumented (checkify inserts per-op guards XLA cannot elide).

    Returns ``(err, loss)``; call ``err.throw()`` to surface failures.
    """
    from jax.experimental import checkify

    def checked(y_, yp_):
        checkify.check(
            jnp.all(jnp.isfinite(y_)) & jnp.all(jnp.isfinite(yp_)),
            "non-finite input to NMI",
        )
        loss = nmi_loss(y_, yp_, **kw)
        checkify.check(
            jnp.isfinite(loss), "NMI loss is non-finite (KDE/log2 stage)"
        )
        return loss

    return checkify.checkify(checked)(y, yp)
