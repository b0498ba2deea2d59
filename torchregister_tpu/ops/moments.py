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
