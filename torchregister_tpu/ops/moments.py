"""Closed-form moment-matching initialization for the matrix stages.

The reference initializes rigid parameters with ``torch.rand`` and walks them
in with hundreds of SGD steps (utils.py:316-321, warpings.py:138-159). A
center-of-mass match gives the bulk translation in ONE pass over each volume —
two weighted reductions, fully fused by XLA — so the iterative stage only has
to recover rotation + residual translation.

Conventions: theta maps output normalized coords to source normalized coords
(torch ``affine_grid``, align_corners=False); theta rows are ordered (x, y, z)
= reversed array axes (see ops/separable.py:affine_to_index_map). For a pure
translation ``warped(x) = moving(x + t)``, matching mass centers requires
``t = com(moving) - com(target)`` in normalized coordinates.
"""
from __future__ import annotations

import jax.numpy as jnp

# Second-order (principal-axes) init: eigenframes of the intensity covariance
# give the rotation in closed form the way the mass centers give the
# translation. For ``t(x) = m(R x + b)`` (theta convention: output coords ->
# source coords) the weighted coordinate moments transform as
# ``com_t = R^T (com_m - b)`` and ``C_t = R^T C_m R``, so with eigenframes
# ``C = F diag(lam) F^T`` (ascending) the rotation is ``R = F_m F_t^T`` and
# ``b = com_m - R com_t``. Eigenvector sign ambiguity is resolved by the
# third central moment along each axis (rotation-covariant: the skewness of
# corresponding axes is equal), handedness by flipping the least-skewed axis.
# Near-isotropic or near-symmetric volumes make the frame unobservable — the
# init then falls back to CoM-translation-only (zero rotation), gated by
# relative eigengap and skewness thresholds (traceable: jnp.where, no host
# branching, so it runs inside the jitted cascade).


def center_of_mass(img: jnp.ndarray) -> jnp.ndarray:
    """Intensity-weighted center of mass of ``img [1,1,*S]`` in index space,
    per array axis (f32, ``[d]``). Uses ``|img|`` as the weight so signed or
    edge-filtered inputs stay well-defined."""
    w = jnp.abs(img[0, 0]).astype(jnp.float32)
    total = jnp.sum(w) + 1e-12
    d = w.ndim
    coms = []
    for a in range(d):
        idx = jnp.arange(w.shape[a], dtype=jnp.float32)
        axes = tuple(i for i in range(d) if i != a)
        coms.append(jnp.sum(jnp.sum(w, axis=axes) * idx) / total)
    return jnp.stack(coms)


def com_translation(moving: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Normalized-coordinate translation ``[d]`` (theta row order, x first)
    that moves ``moving``'s center of mass onto ``target``'s."""
    spatial = jnp.asarray(moving.shape[2:], jnp.float32)
    t_idx = center_of_mass(moving) - center_of_mass(target)
    t_norm = 2.0 * t_idx / spatial  # align_corners=False: scale_in = S/2
    return t_norm[::-1]  # array-axis order (z,y,x) -> theta row order (x,y,z)


def com_rigid_params(
    moving: jnp.ndarray, target: jnp.ndarray, max_translate: float = 0.25
) -> jnp.ndarray:
    """Raw rigid parameters (zero rotation, CoM-matched translation) — a drop-in
    ``init_params`` for :func:`engines.rigid.rigid_register`.

    3D raw translations pass through ``max_translate * tanh`` (ops/transforms.py
    ``rigid_theta_3d``), so the normalized translation is inverted with atanh
    (clipped: shifts beyond the tanh bound saturate at ~0.96 of it). 2D raw
    translations are unbounded (utils.py:306-309) and pass through directly.
    """
    ndim = moving.ndim - 2
    t = com_translation(moving, target)
    if ndim == 3:
        raw = jnp.arctanh(jnp.clip(t / max_translate, -0.96, 0.96))
        return jnp.concatenate([jnp.zeros((3,), jnp.float32), raw])
    return jnp.concatenate([jnp.zeros((1,), jnp.float32), t])


def _normalized_coords(shape):
    """Per-array-axis 1D normalized coordinates — delegates to the single
    source of the align_corners=False convention (ops/grid._axis_coords,
    ``(2i+1)/S - 1``) so the moment init can never drift from the warps'
    coordinate frame."""
    from .grid import _axis_coords

    return [_axis_coords(s, align_corners=False, dtype=jnp.float32) for s in shape]


def coordinate_moments(img: jnp.ndarray):
    """``(com [d], cov [d,d], frame [d,d], lam [d], skew [d])`` of ``img
    [1,1,*S]`` in normalized coordinates, **theta row order** (x first =
    reversed array axes).

    ``frame`` columns are covariance eigenvectors (ascending eigenvalues
    ``lam``), each sign-fixed so its third central moment ``skew`` is
    non-negative, with handedness (det=+1) restored by flipping the
    least-skewed axis. Three extra full-volume reductions for the skew
    projections; everything else is fused sums.
    """
    w = jnp.abs(img[0, 0]).astype(jnp.float32)
    total = jnp.sum(w) + 1e-12
    d = w.ndim
    coords = _normalized_coords(w.shape)

    def bcast(a, axis):
        shape = [1] * d
        shape[axis] = -1
        return a.reshape(shape)

    com = jnp.stack(
        [jnp.sum(w * bcast(coords[a], a)) / total for a in range(d)]
    )
    centered = [bcast(coords[a], a) - com[a] for a in range(d)]
    cov = jnp.stack(
        [
            jnp.stack(
                [jnp.sum(w * centered[a] * centered[b]) / total for b in range(d)]
            )
            for a in range(d)
        ]
    )
    lam, F = jnp.linalg.eigh(cov)  # ascending; columns = eigenvectors
    # third central moment along each eigenvector (sign disambiguation)
    skew = jnp.stack(
        [
            jnp.sum(w * sum(centered[a] * F[a, j] for a in range(d)) ** 3)
            / total
            for j in range(d)
        ]
    )
    flip = jnp.where(skew < 0, -1.0, 1.0)
    F = F * flip[None, :]
    skew = jnp.abs(skew)
    # right-handed frame: flip the least-skewed (most ambiguous) axis if
    # needed (traceable one-hot column flip)
    det = jnp.linalg.det(F)
    fix = jnp.where(
        (det < 0) & (jnp.arange(d) == jnp.argmin(skew)), -1.0, 1.0
    )
    F = F * fix[None, :]
    # array order (z,y,x) -> theta order (x,y,z): orthogonal axis reversal J
    rev = slice(None, None, -1)
    return com[rev], cov[rev, rev], F[rev, :], lam, skew


def pa_rigid_params(
    moving: jnp.ndarray,
    target: jnp.ndarray,
    max_translate: float = 0.25,
    gap_tol: float = 0.08,
    skew_tol: float = 0.05,
) -> jnp.ndarray:
    """Raw rigid parameters from principal-axes + center-of-mass matching —
    a drop-in ``init_params`` like :func:`com_rigid_params`, additionally
    matching rotation when the intensity distribution makes it observable.

    Falls back to the CoM-translation-only init (zero rotation) when either
    volume's covariance eigengaps are below ``gap_tol`` (relative to the
    largest eigenvalue — near-isotropic: axes unstable) or any axis skewness
    is below ``skew_tol`` of its ``lam^1.5`` scale (near-symmetric: sign
    unobservable). Fully traceable — usable inside the jitted cascade
    (``moment_init='pa'``).

    Euler extraction matches :func:`ops.transforms.rigid_theta_3d`'s ZYX-style
    rows (reference utils.py:288-305): ``psi = asin(-R[2,0])``,
    ``th = atan2(R[1,0], R[0,0])``, ``phi = atan2(R[2,1], R[2,2])``.
    """
    ndim = moving.ndim - 2
    com_m, _, F_m, lam_m, skew_m = coordinate_moments(moving)
    com_t, _, F_t, lam_t, skew_t = coordinate_moments(target)

    def reliable(lam, skew):
        lam = jnp.maximum(lam, 0.0)  # PSD up to eigh noise
        gaps = jnp.diff(lam) / (lam[-1] + 1e-12)
        norm_skew = skew / (lam**1.5 + 1e-12)
        return jnp.all(gaps > gap_tol) & jnp.all(norm_skew > skew_tol)

    ok = reliable(lam_m, skew_m) & reliable(lam_t, skew_t)
    R = F_m @ F_t.T
    eye = jnp.eye(ndim, dtype=jnp.float32)
    R = jnp.where(ok, R, eye)
    b = com_m - R @ com_t

    if ndim == 3:
        psi = jnp.arcsin(-jnp.clip(R[2, 0], -1.0, 1.0))
        th = jnp.arctan2(R[1, 0], R[0, 0])
        phi = jnp.arctan2(R[2, 1], R[2, 2])
        raw_t = jnp.arctanh(jnp.clip(b / max_translate, -0.96, 0.96))
        return jnp.concatenate([jnp.stack([psi, th, phi]), raw_t])
    th = jnp.arctan2(R[1, 0], R[0, 0])
    return jnp.concatenate([th[None], b])
