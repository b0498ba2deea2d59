"""Gather-free separable resampling — the TPU fast path for warps.

Why this exists: XLA:TPU lowers per-element gathers essentially to scalar
loads (~1e8 elements/s measured on v5e), so a naive ``grid_sample``-style
8-corner gather costs ~1 s for one 240^3 warp — unusable inside a
1000-iteration optimization loop. TPUs are built for regular, vectorizable
data movement, so this module reformulates warping as **per-axis sweep
passes** containing only static shifts and elementwise FMAs (VPU ops that XLA
fuses into a handful of HBM passes):

1. The normalized-coordinate affine theta is converted to an **index-space**
   affine map ``s = M o + t`` (absorbing the torch align_corners pixel-center
   conventions).
2. ``M`` (homogeneous) is factored into elementary row-operation matrices
   ``M = E_x . E_y . E_z`` (Gauss-style, no pivoting — valid for the
   near-identity transforms of registration). Each ``E_k`` modifies only
   coordinate ``k``, so applying the warp becomes ``d`` sequential 1-D
   resampling passes, x-pass first.
3. Each 1-D pass ``out[o] = lerp(src at q(o))`` with ``q`` affine in the
   output coords is evaluated as a **shift-and-select sweep**: for every
   integer shift ``s`` in a static window ``[-K, K+1]``, accumulate
   ``shift(src, s) * [ (k==s)(1-f) + (k==s-1) f ]`` where ``k = floor(q) - o``
   and ``f = q - floor(q)``. Out-of-volume reads contribute zero (zeros
   padding, matching ``grid_sample``), and displacements beyond the static
   bound ``K`` contribute zero (graceful degradation — pick ``K`` from the
   expected transform magnitude; engines warp-and-compose so residual
   displacements stay small).

The same sweep evaluates dense **flow** warps, one pass per displacement
component.

Exactness: a sequence of 1-D linear interpolations is not bit-identical to
one-shot multilinear interpolation when the transform mixes axes (the classic
multi-pass rendering trade-off; agreement is to O(h^2) on smooth images, and
exact for pure translations / axis-aligned scales). Engines use this path for
the optimization loop; user-facing one-shot warps default to the exact
``ops.resample`` path.

Differentiability matches ``grid_sample``: linear in ``src``; gradients w.r.t.
the transform flow through the fractional weights (the integer-shift selects
are piecewise-constant, like ``floor``).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .transforms import as_matrix


# --------------------------------------------------------------------- maps


def affine_to_index_map(
    theta: jnp.ndarray,
    spatial: Sequence[int],
    align_corners: bool = False,
):
    """Convert a torch-convention normalized theta ``[d, d+1]`` into the
    index-space map ``s_idx = M @ o_idx + t`` (axes in array order, z first).

    Composes ``affine_grid``'s output->normalized-source map with
    ``grid_sample``'s denormalization, for equal in/out spatial shapes
    (the reference always warps onto the moving image's own grid,
    warpings.py:24).
    """
    d = len(spatial)
    sizes = jnp.asarray(spatial, jnp.float32)
    # Reverse both axes of theta's linear block: torch rows/cols are ordered
    # (x, y, z), array axes are (z, y, x).
    A = theta[..., :d][::-1, ::-1]  # M_norm in index-axis order
    b = theta[..., d][::-1]

    if align_corners:
        # n = 2 o / (S-1) - 1 ; s_idx = (n_src + 1) (S-1) / 2
        scale_out = 2.0 / (sizes - 1.0)
        off_out = -jnp.ones_like(sizes)
        scale_in = (sizes - 1.0) / 2.0
        off_in = (sizes - 1.0) / 2.0
    else:
        # n = (2 o + 1) / S - 1 ; s_idx = ((n_src + 1) S - 1) / 2
        scale_out = 2.0 / sizes
        off_out = 1.0 / sizes - 1.0
        scale_in = sizes / 2.0
        off_in = sizes / 2.0 - 0.5

    M = A * scale_in[:, None] * scale_out[None, :]
    t = scale_in * (A @ off_out + b) + off_in
    return M, t


_PIVOT_EPS = 1e-4  # absolute clamp on factorization divisors under trace
_PIVOT_REL = 0.15  # scaled-minor threshold below which the factorization is
# numerically degenerate (rotation near 90 deg); eager wrappers fall back


def _safe_div_den(den):
    """Clamp a factorization divisor away from zero (sign-preserving).

    The Gauss factorization divides by leading principal minors; at/near a
    90-degree rotation a pivot crosses zero and an unguarded division emits
    NaN/inf that silently poisons the whole warp. Under trace the clamp keeps
    everything finite (engines only feed near-identity residuals where the
    clamp never binds); concrete callers are routed to the exact path by
    :func:`min_scaled_pivot` before ever reaching a binding clamp.
    """
    mag = jnp.maximum(jnp.abs(den), _PIVOT_EPS)
    return jnp.where(den < 0, -mag, mag)


def factor_passes(M: jnp.ndarray, t: jnp.ndarray):
    """Factor ``s = M o + t`` into per-axis passes (application order:
    x-pass first, then y, then z).

    Returns a list of ``(coef [d], offset)`` — pass ``k`` (for axis ``a_k``)
    samples its input along ``a_k`` at ``q = coef . o + offset``. Requires the
    leading principal minors of ``M`` to be well away from zero (true near
    identity); divisors are clamped to ``+-1e-4`` so a degenerate minor yields
    finite (but support-truncated) output, never NaN — concrete callers should
    gate on :func:`min_scaled_pivot` and use the exact path instead.
    """
    d = M.shape[0]
    if d == 2:
        # A = E_x . E_y ; E_y row0 = (M00, M01 | t0)
        g = (M[0], t[0])
        e0 = M[1, 0] / _safe_div_den(M[0, 0])
        e1 = M[1, 1] - e0 * M[0, 1]
        et = t[1] - e0 * t[0]
        e = (jnp.stack([e0, e1]), et)
        return [(1, e), (0, g)]  # [(axis, (coef, offset)), ...] x first
    if d == 3:
        # A = E_x . E_y . E_z ; E_z row0 = A row0.
        g = (M[0], t[0])
        f0 = M[1, 0] / _safe_div_den(M[0, 0])
        f1 = M[1, 1] - f0 * M[0, 1]
        f2 = M[1, 2] - f0 * M[0, 2]
        ft = t[1] - f0 * t[0]
        f = (jnp.stack([f0, f1, f2]), ft)
        # Solve [e0 e1] [[M00, M01], [M10, M11]] = [M20, M21]
        det = _safe_div_den(M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0])
        e0 = (M[2, 0] * M[1, 1] - M[2, 1] * M[1, 0]) / det
        e1 = (M[2, 1] * M[0, 0] - M[2, 0] * M[0, 1]) / det
        e2 = M[2, 2] - e0 * M[0, 2] - e1 * M[1, 2]
        et = t[2] - e0 * t[0] - e1 * t[1]
        e = (jnp.stack([e0, e1, e2]), et)
        return [(2, e), (1, f), (0, g)]
    raise ValueError(f"only 2D/3D supported, got d={d}")


def min_scaled_pivot(theta_np, spatial, align_corners: bool = False) -> float:
    """Smallest scale-normalized leading principal minor of the index map —
    the factorization's conditioning measure (host numpy, no device ops).

    ``< _PIVOT_REL`` (e.g. rotations within ~10 deg of 90) means the
    per-axis factorization is degenerate and the separable path must not be
    trusted; use the exact resampler.
    """
    theta = np.asarray(theta_np, np.float64)
    if theta.ndim == 3:
        theta = theta[0]
    d = len(spatial)
    if theta.ndim == 1:
        theta = theta.reshape(d, d + 1)
    M, _ = _index_map_np(theta, spatial, align_corners)
    s = max(float(np.max(np.abs(M))), 1e-30)
    p1 = abs(float(M[0, 0])) / s
    if d == 2:
        return p1
    det2 = float(M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0])
    return min(p1, abs(det2) / (s * s))


# -------------------------------------------------------- window requirements


def _index_map_np(theta: np.ndarray, spatial, align_corners: bool):
    """Host (numpy) mirror of :func:`affine_to_index_map` — window sizing must
    not dispatch eager device ops (0.1-1 s each over remote transports)."""
    d = len(spatial)
    sizes = np.asarray(spatial, np.float64)
    A = np.asarray(theta, np.float64)[:, :d][::-1, ::-1]
    b = np.asarray(theta, np.float64)[:, d][::-1]
    if align_corners:
        scale_out = 2.0 / (sizes - 1.0)
        off_out = -np.ones_like(sizes)
        scale_in = (sizes - 1.0) / 2.0
        off_in = (sizes - 1.0) / 2.0
    else:
        scale_out = 2.0 / sizes
        off_out = 1.0 / sizes - 1.0
        scale_in = sizes / 2.0
        off_in = sizes / 2.0 - 0.5
    M = A * scale_in[:, None] * scale_out[None, :]
    t = scale_in * (A @ off_out + b) + off_in
    return M, t


def _factor_passes_np(M: np.ndarray, t: np.ndarray):
    """Host mirror of :func:`factor_passes` (same elimination order)."""
    d = M.shape[0]
    if d == 2:
        g = (M[0].copy(), float(t[0]))
        e0 = M[1, 0] / M[0, 0]
        e = (np.array([e0, M[1, 1] - e0 * M[0, 1]]), float(t[1] - e0 * t[0]))
        return [(1, e), (0, g)]
    g = (M[0].copy(), float(t[0]))
    f0 = M[1, 0] / M[0, 0]
    f = (
        np.array([f0, M[1, 1] - f0 * M[0, 1], M[1, 2] - f0 * M[0, 2]]),
        float(t[1] - f0 * t[0]),
    )
    det = M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
    e0 = (M[2, 0] * M[1, 1] - M[2, 1] * M[1, 0]) / det
    e1 = (M[2, 1] * M[0, 0] - M[2, 0] * M[0, 1]) / det
    e = (
        np.array([e0, e1, M[2, 2] - e0 * M[0, 2] - e1 * M[1, 2]]),
        float(t[2] - e0 * t[0] - e1 * t[1]),
    )
    return [(2, e), (1, f), (0, g)]


def required_windows(theta, spatial, align_corners: bool = False) -> tuple[int, ...]:
    """Per-pass sweep windows needed so a *concrete* theta loses no support.

    For pass ``k`` on axis ``a`` sampling at ``q = coef . o + offset``, the
    sweep (``sweep_resample_axis``) zeroes any contribution with
    ``|floor(q) - o_a|`` outside ``[-K, K+1]``; the required ``K`` is the max
    of ``|q - o_a|`` over the output box (interval arithmetic on the pass
    coefficients). Pure-host numpy; callers feed init/recovered thetas.
    """
    theta = np.asarray(jax.device_get(theta), np.float64)
    if theta.ndim == 3:
        theta = theta[0]
    d = len(spatial)
    if theta.ndim == 1:
        theta = theta.reshape(d, d + 1)
    M, t = _index_map_np(theta, spatial, align_corners)
    if min_scaled_pivot(theta, spatial, align_corners) < _PIVOT_REL:
        # Degenerate factorization (near-90-deg rotation): the elimination
        # divides by a vanishing minor and the pass displacements blow up —
        # report the maximum useful window (full axis extent) instead of
        # inf/garbage so callers cap/warn deterministically.
        return tuple(int(spatial[a]) for a in range(d - 1, -1, -1))
    out = []
    for axis, (coef, offset) in _factor_passes_np(M, t):
        disp = np.asarray(coef, np.float64).copy()
        disp[axis] -= 1.0
        lo = hi = offset
        for b in range(d):
            ext = disp[b] * (spatial[b] - 1)
            lo += min(0.0, ext)
            hi += max(0.0, ext)
        ext_max = max(abs(lo), abs(hi))
        out.append(int(np.ceil(min(ext_max, float(spatial[axis])))))
    return tuple(out)


# -------------------------------------------------------------------- sweeps

_UNROLL_LIMIT = 40  # max terms for the unrolled-fused sweep (one XLA kernel)
_UNROLL_BYTES = 2_000_000_000  # ... but only while the fused program's
# worst-case materialized footprint (terms x operand bytes) stays bounded:
# batched 240^3 volumes at K=16 OOM'd the chip (34 terms x 221 MB ~ 7.5 GB)
# while the single-pair case (34 x 55 MB) is fine and much faster unrolled


def _shift_axis(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """out[i] = x[i+s] along ``axis`` with zero fill (static s)."""
    if s == 0:
        return x
    size = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    if s > 0:
        pad[axis] = (0, s)
        return jax.lax.slice_in_dim(jnp.pad(x, pad), s, s + size, axis=axis)
    pad[axis] = (-s, 0)
    return jax.lax.slice_in_dim(jnp.pad(x, pad), 0, size, axis=axis)


def sweep_resample_axis(
    src: jnp.ndarray,
    q: jnp.ndarray,
    axis: int,
    max_shift: int,
) -> jnp.ndarray:
    """Linearly resample ``src`` along spatial ``axis`` at coordinates ``q``.

    src: ``[N, C, *S]``; q: broadcastable to ``[1, 1, *S]`` (sample coordinate
    along ``axis`` for every output voxel). Static sweep window
    ``[-max_shift, max_shift+1]``.
    """
    arr_axis = axis + 2
    size = src.shape[arr_axis]
    d = src.ndim - 2
    iota = jnp.arange(size, dtype=jnp.float32).reshape(
        (1, 1) + tuple(size if i == axis else 1 for i in range(d))
    )
    q0 = jnp.floor(q)
    fr = (q - q0).astype(src.dtype)
    k = q0 - iota  # float compare below avoids an int cast round-trip

    K = int(max_shift)
    n_terms = 2 * K + 2

    out_shape = jnp.broadcast_shapes(src.shape, fr.shape)
    fused_bytes = n_terms * int(np.prod(out_shape)) * src.dtype.itemsize
    if n_terms <= _UNROLL_LIMIT and fused_bytes <= _UNROLL_BYTES:
        out = jnp.zeros(out_shape, src.dtype)
        for s in range(-K, K + 2):
            w = jnp.where(k == s, 1.0 - fr, 0.0) + jnp.where(k == s - 1, fr, 0.0)
            out = out + _shift_axis(src, s, arr_axis) * w
        return out

    # Large windows on TPU: the Pallas kernel keeps the whole sweep in VMEM.
    # Only worthwhile when the padded working set exceeds VMEM — below that
    # XLA's fori path caches the padded source on-chip and wins.
    rows = int(np.prod(src.shape)) // size
    padded_bytes = rows * (size + 2 * K + 3) * 4
    # K >= 3: the kernel's static sub-offset slices need P = X+2K+3 >= X+9
    # lanes (a small-window batched warp can land here via the fused-bytes
    # branch and would fail to trace with clamped slices).
    if K >= 3 and jax.default_backend() != "cpu" and padded_bytes > 12_000_000:
        from .pallas.sweep import sweep_lastaxis

        full_shape = jnp.broadcast_shapes(src.shape, q.shape[:2] + src.shape[2:])
        srcb = jnp.broadcast_to(src, full_shape)
        qb = jnp.broadcast_to(q, full_shape)
        x2 = jnp.moveaxis(srcb, arr_axis, -1)
        q2 = jnp.moveaxis(qb, arr_axis, -1)
        lead = x2.shape[:-1]
        out2 = sweep_lastaxis(
            x2.reshape(-1, size).astype(jnp.float32),
            q2.reshape(-1, size).astype(jnp.float32),
            K,
        )
        return jnp.moveaxis(out2.reshape(lead + (size,)), -1, arr_axis).astype(
            src.dtype
        )

    return _sweep_fori(src, q, axis, K)


def _sweep_fori(src: jnp.ndarray, q: jnp.ndarray, axis: int, K: int) -> jnp.ndarray:
    """XLA fori_loop sweep over a pre-padded source (dynamic-start slices).

    One HBM pass per shift term — the portable fallback, and the linear map
    the Pallas kernel's VJP transposes.
    """
    arr_axis = axis + 2
    size = src.shape[arr_axis]
    d = src.ndim - 2
    iota = jnp.arange(size, dtype=jnp.float32).reshape(
        (1, 1) + tuple(size if i == axis else 1 for i in range(d))
    )
    q0 = jnp.floor(q)
    fr = (q - q0).astype(src.dtype)
    k = q0 - iota
    n_terms = 2 * K + 2

    pad = [(0, 0)] * src.ndim
    pad[arr_axis] = (K + 1, K + 2)
    padded = jnp.pad(src, pad)
    out0 = jnp.zeros(jnp.broadcast_shapes(src.shape, fr.shape), src.dtype)

    def body(i, acc):
        s = i - K  # s in [-K, K+1]
        start = i + 1  # padded[o + s + K + 1]
        shifted = jax.lax.dynamic_slice_in_dim(padded, start, size, axis=arr_axis)
        sf = s.astype(k.dtype)
        w = jnp.where(k == sf, 1.0 - fr, 0.0) + jnp.where(k == sf - 1.0, fr, 0.0)
        return acc + shifted * w

    return jax.lax.fori_loop(0, n_terms, body, out0)


def _axis_coord_grid(coef: jnp.ndarray, offset, spatial) -> jnp.ndarray:
    """q[o] = coef . o + offset over the full grid, shape [1, 1, *S]."""
    d = len(spatial)
    q = offset
    for b in range(d):
        iota = jnp.arange(spatial[b], dtype=jnp.float32).reshape(
            tuple(spatial[b] if i == b else 1 for i in range(d))
        )
        q = q + coef[b] * iota
    return q[None, None]


# ------------------------------------------------------------------- public


@partial(jax.jit, static_argnames=("align_corners", "max_shift"))
def _warp_affine_separable(
    theta: jnp.ndarray,
    moving: jnp.ndarray,
    align_corners: bool = False,
    max_shift: int | Sequence[int] | None = None,
) -> jnp.ndarray:
    """Jitted separable-warp core — no conditioning checks (engines/cascades
    call this directly: their thetas evolve from near-identity where the
    factorization is well-conditioned, and a host readback per call would
    serialize eager cascade levels at ~0.8 s each on remote transports)."""
    theta = as_matrix(theta)
    assert theta.shape[0] == 1, "separable path expects a single transform"
    spatial = moving.shape[2:]
    d = len(spatial)

    M, t = affine_to_index_map(theta[0], spatial, align_corners)
    passes = factor_passes(M, t)

    if max_shift is None:
        shifts = [max(8, -(-spatial[axis] // 4)) for axis, _ in passes]
    elif isinstance(max_shift, int):
        shifts = [max_shift] * d
    else:
        shifts = list(max_shift)

    out = moving
    for (axis, (coef, offset)), K in zip(passes, shifts):
        q = _axis_coord_grid(coef, offset, spatial)
        out = sweep_resample_axis(out, q, axis, K)
    return out


def warp_affine_separable(
    theta: jnp.ndarray,
    moving: jnp.ndarray,
    align_corners: bool = False,
    max_shift: int | Sequence[int] | None = None,
) -> jnp.ndarray:
    """Affine warp via per-axis sweep passes (fast path for optimization
    loops; see module docstring for the exactness trade-off vs
    :func:`ops.resample.warp_affine`).

    ``max_shift``: static per-axis sweep bound in voxels (scalar or per-pass
    sequence). Default: ``max(8, ceil(0.25 * S_axis))`` — covers rotations to
    ~0.25 rad plus the reference's bounded translations at that axis' scale.
    Batch size must be 1 (one theta), matching the engines' usage.

    A *concrete* theta is conditioning-checked on the host first: at/near a
    90-degree rotation the per-axis factorization's pivots vanish
    (:func:`factor_passes`) and the sweep would silently lose support, so such
    thetas fall back to the exact resampler with a RuntimeWarning (one small
    host readback; traced thetas skip the check — the clamped factorization
    keeps them finite).
    """
    if not isinstance(theta, jax.core.Tracer):
        spatial = moving.shape[2:]
        theta_np = np.asarray(jax.device_get(theta), np.float64)
        pivot = min_scaled_pivot(theta_np, spatial, align_corners)
        if pivot < _PIVOT_REL:
            import warnings

            from .resample import warp_affine

            warnings.warn(
                f"warp_affine_separable: theta's per-axis factorization is "
                f"degenerate (scaled pivot {pivot:.3g} < {_PIVOT_REL}; e.g. a "
                "near-90-degree rotation) — falling back to the exact "
                "resampler (ops/separable.py factor_passes).",
                RuntimeWarning,
                stacklevel=2,
            )
            return warp_affine(theta, moving, align_corners)
    if max_shift is not None and not isinstance(max_shift, int):
        # The jitted core takes max_shift as a static argument, which must be
        # hashable — normalize the advertised Sequence[int] form (a list
        # would raise "Non-hashable static arguments").
        max_shift = tuple(max_shift)
    return _warp_affine_separable(theta, moving, align_corners, max_shift)


@partial(jax.jit, static_argnames=("max_disp",))
def warp_flow_separable(
    src: jnp.ndarray,
    flow: jnp.ndarray,
    max_disp: int = 8,
) -> jnp.ndarray:
    """Dense-flow warp via sequential per-component sweep passes.

    ``out = P_z(P_y(P_x(src)))`` with pass ``a`` sampling along axis ``a`` at
    ``o_a + flow_a(o)``. Exact for flows constant along the swept axis and an
    O(h^2) approximation otherwise (U-Net regularized fields are smooth at
    that scale). ``max_disp`` is the static per-axis displacement bound.
    """
    spatial = src.shape[2:]
    d = len(spatial)
    out = src
    for axis in range(d - 1, -1, -1):  # x-pass first
        ident = jnp.arange(spatial[axis], dtype=jnp.float32).reshape(
            tuple(spatial[axis] if i == axis else 1 for i in range(d))
        )
        q = flow[:, axis][:, None] + ident  # [N,1,*S]
        out = sweep_resample_axis(out, q, axis, max_disp)
    return out
