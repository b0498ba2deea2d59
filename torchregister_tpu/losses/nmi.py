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


_FINE_BINS = 1024  # binned-KDE splat grid (A x B two-level one-hot factors)
_FINE_A = 32
_FINE_B = 32


@jax.custom_vjp
def _splat_matmul(prod: jnp.ndarray, oh_b: jnp.ndarray) -> jnp.ndarray:
    """``einsum('nca,ncb->nab', prod, oh_b)`` at f32 accuracy in 3 MXU passes.

    ``oh_b`` is 0/1 — EXACT in bf16 — so only the weighted side needs
    splitting: a 3-way bf16 decomposition (hi+mid+lo covers f32's 24-bit
    mantissa) reproduces the f32 product, 2x fewer passes than
    ``precision=HIGHEST`` (6 bf16 passes over both operands). The raw split
    is NOT autodiff-safe (the hi/mid/lo cotangents cancel in bf16, leaving
    rounding garbage), hence the custom VJP: the backward is one
    default-precision matmul — gradient noise ~2e-3 relative, irrelevant for
    optimization and 6x cheaper than HIGHEST's backward.
    """
    hi = prod.astype(jnp.bfloat16)
    rem = prod - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    oh_b = oh_b.astype(jnp.bfloat16)
    out = None
    for part in (hi, mid, lo):
        term = jnp.einsum(
            "nca,ncb->nab", part, oh_b, preferred_element_type=jnp.float32
        )
        out = term if out is None else out + term
    return out


def _splat_matmul_fwd(prod, oh_b):
    return _splat_matmul(prod, oh_b), oh_b


def _splat_matmul_bwd(oh_b, g):
    d_prod = jnp.einsum(
        "nab,ncb->nca", g, oh_b.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return d_prod, jnp.zeros(oh_b.shape, oh_b.dtype)


_splat_matmul.defvjp(_splat_matmul_fwd, _splat_matmul_bwd)


def _binned_histogram(signals: jnp.ndarray, x0, xe, chunk: int = 4096) -> jnp.ndarray:
    """Linear-splat soft histogram of ``signals [N, L]`` onto ``_FINE_BINS``
    uniform bins spanning ``[x0, xe]`` — differentiable w.r.t. ``signals``
    (gradient flows through the two splat weights).

    TPU shape: a per-element scatter-add would serialize (~1e8 elem/s); the
    splat is instead TWO-LEVEL one-hot contractions — ``idx = a*B + b`` with
    one-hots over ``a`` and ``b`` separately, combined by an MXU matmul
    ``[A, chunk] @ [chunk, B]`` — O(L*(A+B)) compares + O(L*G) MXU MACs,
    no per-voxel transcendental.
    """
    n, L = signals.shape
    G = _FINE_BINS
    den = xe - x0
    den = jnp.where(jnp.abs(den) > 0, den, jnp.ones_like(den))
    delta = den / (G - 1)

    def splat_chunk(sig):  # [n, c] -> [n, G]
        p = jnp.clip((sig - x0) / delta, 0.0, G - 1.0)
        i0 = jnp.clip(jnp.floor(p), 0.0, G - 2.0)
        f = p - i0  # gradient w.r.t. sig rides here (d floor = 0)
        idx = i0.astype(jnp.int32)
        out = jnp.zeros((n, G), jnp.float32)
        ar = jnp.arange(_FINE_A, dtype=jnp.int32)
        br = jnp.arange(_FINE_B, dtype=jnp.int32)
        for off, w in ((0, 1.0 - f), (1, f)):
            k = idx + off
            oh_a = (k[..., None] // _FINE_B == ar).astype(jnp.float32)
            oh_b = (k[..., None] % _FINE_B == br).astype(jnp.float32)
            prod = oh_a * w[..., None].astype(jnp.float32)
            h2 = _splat_matmul(prod, oh_b)
            out = out + h2.reshape(n, G)
        return out.astype(signals.dtype)

    if L <= chunk:
        return splat_chunk(signals)
    main = (L // chunk) * chunk
    body = signals[:, :main].reshape(n, L // chunk, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def step(acc, sig_chunk):
        return acc + splat_chunk(sig_chunk), None

    acc, _ = jax.lax.scan(step, jnp.zeros((n, G), signals.dtype), body)
    if main < L:
        acc = acc + splat_chunk(signals[:, main:])
    return acc


def kde_pdf_binned(
    signals: jnp.ndarray, xis: jnp.ndarray, bandwidth: float
) -> jnp.ndarray:
    """Binned KDE: splat to a fine histogram, then one tiny ``[G, steps]``
    kernel contraction. Exact up to the linear-splat quadrature error
    O((delta_fine / h)^2) — the auto path engages only when
    ``h >= 4 * delta_fine`` (see :func:`get_pdf`), keeping it under ~0.1%."""
    n, L = signals.shape
    h = float(bandwidth)
    x0, xe = xis[0], xis[-1]
    H = _binned_histogram(signals, x0, xe)
    grid = jnp.linspace(0.0, 1.0, _FINE_BINS, dtype=signals.dtype) * (xe - x0) + x0
    u = (grid[:, None] - xis[None, :]) / h  # [G, steps]
    kmat = _INV_2PI * jnp.exp(-0.5 * u * u)
    return H @ kmat / (h * L)


def get_pdf(
    data: jnp.ndarray,
    steps: int = 256,
    bandwidth: float = 2.0,
    method: str = "auto",
) -> jnp.ndarray:
    """Reference ``get_pdf`` (utils.py:41-53): flatten ``[N, ...] -> [N, L]``,
    linspace sample points over the global (max -> min, descending) range.

    ``method='auto'`` (default) picks the fast binned KDE when the bandwidth
    resolves the fine splat grid (``h >= 4 * |range| / (G-1)`` — true for any
    normalized-intensity image at the reference's bandwidths) and the exact
    per-voxel accumulation otherwise, as ONE runtime ``lax.cond`` — data with
    huge intensity ranges degrades gracefully to the exact path instead of a
    wrong density. ``'exact'``/``'binned'`` force a path.
    """
    if method not in ("auto", "exact", "binned"):
        raise ValueError(
            f"get_pdf method must be 'auto', 'exact', or 'binned' "
            f"(got {method!r})"
        )
    # f32 accumulation: the KDE sums thousands of kernel terms per sample
    # point — in bf16 the reduction loses the density entirely (the same
    # failure mode CLAUDE.md documents for volume means; measured: loss off
    # by 4-5 orders, gradient cosine ~0 vs f32). Losses upcast, like
    # losses/similarity.py.
    signals = data.reshape(data.shape[0], -1).astype(jnp.float32)
    # Bounds are detached: the reference reads them via ``.item()``
    # (utils.py:45-46), so no gradient flows through the sample-point grid.
    hi = jax.lax.stop_gradient(jnp.max(signals))
    lo = jax.lax.stop_gradient(jnp.min(signals))
    xis = jnp.linspace(0.0, 1.0, steps, dtype=signals.dtype) * (lo - hi) + hi
    if method == "exact":
        return kde_pdf(signals, xis, bandwidth)
    if method == "binned":
        return kde_pdf_binned(signals, xis, bandwidth)
    fine = jnp.abs(lo - hi) / (_FINE_BINS - 1)
    return jax.lax.cond(
        float(bandwidth) >= 4.0 * fine,
        lambda s: kde_pdf_binned(s, xis, bandwidth),
        lambda s: kde_pdf(s, xis, bandwidth),
        signals,
    )


def _density_from_hist(H, x0, xe, xis, bandwidth, L):
    """KDE density at sample points ``xis`` from a fine histogram ``H [N, G]``
    splatted on the uniform grid spanning ``[x0, xe]``."""
    G = H.shape[1]
    grid = jnp.linspace(0.0, 1.0, G, dtype=H.dtype) * (xe - x0) + x0
    u = (grid[:, None] - xis[None, :]) / bandwidth
    kmat = _INV_2PI * jnp.exp(-0.5 * u * u)
    return H @ kmat / (bandwidth * L)


def _nmi_hists_binned(s1, s2, _sj, xis1, xis2, xisj, bandwidth):
    """Binned-KDE marginal + pooled-joint densities with ONE shared fine grid.

    ``_sj`` is signature ballast: ``nmi``'s ``lax.cond`` passes one operand
    tuple to both branches and only the exact branch consumes the pooled
    concat (here the joint histogram is ``H1 + H2`` — same pooled samples,
    no 2L-voxel splat).

    The reference's "joint histogram" is the KDE of the *pooled concat*
    (utils.py:62-63), so on a grid spanning the joint range the joint fine
    histogram is exactly ``H1 + H2`` — the splat (the dominant cost) runs
    twice instead of four times (each marginal + the 2L-voxel joint). Each
    density then contracts the same histograms against its own sample points
    (marginal bounds preserved — reference value parity).
    """
    x0, xe = xisj[0], xisj[-1]  # joint range spans both marginals
    H1 = _binned_histogram(s1, x0, xe)
    H2 = _binned_histogram(s2, x0, xe)
    L = s1.shape[1]
    hist1 = _density_from_hist(H1, x0, xe, xis1, bandwidth, L)
    hist2 = _density_from_hist(H2, x0, xe, xis2, bandwidth, L)
    histj = _density_from_hist(H1 + H2, x0, xe, xisj, bandwidth, 2 * L)
    return hist1, hist2, histj


def nmi(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    bins: int = 256,
    bandwidth: float = 0.1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``NMI`` (utils.py:56-79). Returns ``(nmi [N], mi [N])``.

    Density construction auto-dispatches like :func:`get_pdf`: the fast
    shared-grid binned path when the bandwidth resolves the fine grid of the
    *joint* range, the exact per-voxel path otherwise — one runtime
    ``lax.cond``.
    """
    # f32 KDE accumulation regardless of image dtype (see get_pdf) — bf16
    # kernel-sum reductions produce garbage densities AND gradients, and this
    # path is reachable via matrix_dtype='bfloat16' + the reference default
    # criterion stack.
    s1 = img1.reshape(img1.shape[0], -1).astype(jnp.float32)
    s2 = img2.reshape(img2.shape[0], -1).astype(jnp.float32)
    sj = jnp.concatenate((s1, s2), axis=1)  # == stack((img1,img2),1) flat

    def xis_of(s):
        hi = jax.lax.stop_gradient(jnp.max(s))
        lo = jax.lax.stop_gradient(jnp.min(s))
        return jnp.linspace(0.0, 1.0, bins, dtype=s.dtype) * (lo - hi) + hi

    xis1, xis2, xisj = xis_of(s1), xis_of(s2), xis_of(sj)
    fine = jnp.abs(xisj[-1] - xisj[0]) / (_FINE_BINS - 1)

    def binned(args):
        return _nmi_hists_binned(*args, bandwidth)

    def exact(args):
        s1_, s2_, sj_, x1, x2, xj = args
        return (
            kde_pdf(s1_, x1, bandwidth),
            kde_pdf(s2_, x2, bandwidth),
            kde_pdf(sj_, xj, bandwidth),
        )

    hist1, hist2, hist_joint = jax.lax.cond(
        float(bandwidth) >= 4.0 * fine,
        binned,
        exact,
        (s1, s2, sj, xis1, xis2, xisj),
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
