"""Rigid-transform parameterizations: raw parameters -> flattened affine matrices.

TPU-native re-design of the reference's ``Theta``/``Regressor`` modules
(reference: src/TorchRegister/utils.py:280-330). Instead of nn.Modules holding
state, transforms here are pure functions over pytree parameter arrays, so they
can live inside a jitted ``lax.scan`` optimization loop.

Conventions (matching the reference's observable semantics):

- 3D params ``x`` are ``[psi, theta, phi, t0, t1, t2]``. The rotation block is
  the ZYX-style Euler product used at utils.py:287-305; translations are bounded
  to ``(-max_translate, max_translate)`` via ``max_translate * tanh(t)``
  (utils.py:295,301,305).
- 2D params ``x`` are ``[theta, t0, t1]`` with **unbounded** raw translations
  (utils.py:306-309).
- The resulting matrix is the ``theta`` consumed by ``warp_affine`` /
  ``affine_grid`` in torch ``F.affine_grid`` convention: row ``r`` produces the
  source coordinate along normalized axis ``r`` from the homogeneous output
  coordinate ``(x, y[, z], 1)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rigid_theta_3d(params: jnp.ndarray, max_translate: float = 0.25) -> jnp.ndarray:
    """Map 6 raw rigid params -> ``[3, 4]`` affine matrix.

    Mirrors reference utils.py:288-305: rows are

    ``[ cos(psi)cos(th), sin(phi)sin(psi)cos(th)-cos(phi)sin(th), cos(phi)sin(psi)cos(th)+sin(phi)sin(th), T*tanh(t0) ]``
    ``[ cos(psi)sin(th), sin(phi)sin(psi)sin(th)+cos(phi)cos(th), cos(phi)sin(psi)sin(th)-sin(phi)cos(th), T*tanh(t1) ]``
    ``[ -sin(psi),       sin(phi)cos(psi),                        cos(phi)cos(psi),                        T*tanh(t2) ]``
    """
    psi, th, phi = params[0], params[1], params[2]
    sp, cp = jnp.sin(psi), jnp.cos(psi)
    st, ct = jnp.sin(th), jnp.cos(th)
    sf, cf = jnp.sin(phi), jnp.cos(phi)
    t = max_translate * jnp.tanh(params[3:6])
    row0 = jnp.stack([cp * ct, sf * sp * ct - cf * st, cf * sp * ct + sf * st, t[0]])
    row1 = jnp.stack([cp * st, sf * sp * st + cf * ct, cf * sp * st - sf * ct, t[1]])
    row2 = jnp.stack([-sp, sf * cp, cf * cp, t[2]])
    return jnp.stack([row0, row1, row2])


def rigid_theta_2d(params: jnp.ndarray) -> jnp.ndarray:
    """Map 3 raw rigid params ``[theta, t0, t1]`` -> ``[2, 3]`` affine matrix.

    Mirrors reference utils.py:306-309 (note: raw, unbounded translations).
    """
    th = params[0]
    s, c = jnp.sin(th), jnp.cos(th)
    row0 = jnp.stack([c, -s, params[1]])
    row1 = jnp.stack([s, c, params[2]])
    return jnp.stack([row0, row1])


def rigid_theta(params: jnp.ndarray, max_translate: float = 0.25) -> jnp.ndarray:
    """Dispatch on parameter count: 6 -> 3D ``[3,4]``, 3 -> 2D ``[2,3]``."""
    if params.shape[-1] == 6:
        return rigid_theta_3d(params, max_translate)
    if params.shape[-1] == 3:
        return rigid_theta_2d(params)
    raise ValueError(f"rigid params must have 3 or 6 elements, got {params.shape}")


def rigid_theta_np(params, max_translate: float = 0.25):
    """Host (numpy) mirror of :func:`rigid_theta` for window sizing — avoids
    eager device dispatches (0.1-1 s each over remote transports)."""
    import numpy as np

    p = np.asarray(jax.device_get(params), np.float64)
    if p.shape[-1] == 3:
        th, t0, t1 = p
        s, c = np.sin(th), np.cos(th)
        return np.array([[c, -s, t0], [s, c, t1]])
    psi, th, phi = p[0], p[1], p[2]
    sp, cp = np.sin(psi), np.cos(psi)
    st, ct = np.sin(th), np.cos(th)
    sf, cf = np.sin(phi), np.cos(phi)
    t = max_translate * np.tanh(p[3:6])
    return np.array(
        [
            [cp * ct, sf * sp * ct - cf * st, cf * sp * ct + sf * st, t[0]],
            [cp * st, sf * sp * st + cf * ct, cf * sp * st - sf * ct, t[1]],
            [-sp, sf * cp, cf * cp, t[2]],
        ]
    )


def identity_theta(ndim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Identity affine matrix ``[ndim, ndim+1]`` (the reference's affine init,
    warpings.py:47-48,54-55)."""
    return jnp.concatenate(
        [jnp.eye(ndim, dtype=dtype), jnp.zeros((ndim, 1), dtype=dtype)], axis=1
    )


def as_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    """Normalize a theta to ``[N, d, d+1]``.

    Accepts ``[d, d+1]``, flat ``[6]``/``[12]``, ``[1, 6]``/``[1, 12]`` or already
    batched matrices — the same flat-reshape acceptance as the reference's
    ``get_affine_warp`` (warpings.py:19-23).
    """
    if theta.ndim == 1:
        theta = theta[None]
    if theta.ndim == 2:
        n, m = theta.shape
        if (n, m) in ((2, 3), (3, 4)):  # unbatched [d, d+1] matrix
            theta = theta[None]
        elif m == 6:  # [N, 6] flat 2D thetas (N==2 is a flat batch, not [2,3])
            theta = theta.reshape(n, 2, 3)
        elif m == 12:  # [N, 12] flat 3D thetas
            theta = theta.reshape(n, 3, 4)
        else:
            raise ValueError(f"cannot interpret theta of shape {theta.shape}")
    return theta


@jax.jit
def compose_theta(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose two affine transforms in normalized coordinates.

    ``compose_theta(a, b)`` returns the theta whose warp equals warping first by
    ``b`` then by ``a``? No — in ``affine_grid`` convention theta maps *output*
    coords to *source* coords, so applying warp A then warp B to an image
    corresponds to coordinate map ``theta_A @ theta_B_h`` where the source
    lookup of the combined warp is ``theta_A (theta_B (x))``. This helper
    returns exactly ``a ∘ b`` as coordinate maps: ``x -> a(b(x))``.

    Used by the cascade/pyramid drivers to fold rigid+affine stages into a
    single resample.
    """
    a = as_matrix(a)
    b = as_matrix(b)
    d = a.shape[-2]
    bh = jnp.concatenate(
        [
            b,
            jnp.broadcast_to(
                jnp.concatenate([jnp.zeros((d,), a.dtype), jnp.ones((1,), a.dtype)])[
                    None, None, :
                ],
                (b.shape[0], 1, d + 1),
            ),
        ],
        axis=-2,
    )
    # Full-precision contraction: theta composition feeds coordinate math, and
    # the environment's default matmul precision may be bf16-reduced.
    return jnp.einsum("nij,njk->nik", a, bh, precision=jax.lax.Precision.HIGHEST)
