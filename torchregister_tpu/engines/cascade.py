"""Rigid -> affine -> flow cascade (the README driver program, productized).

The reference's canonical pipeline is a hand-written script: run rigid, warp,
detach, run affine on the result, warp, detach, run flow (README.md:58-88;
SURVEY.md §3.5). This module is that pipeline as one call, with two TPU-first
upgrades the reference can't express:

- **multi-resolution pyramid** for the matrix stages: optimize at coarse
  levels first (thetas live in normalized coords, so they transfer across
  levels unchanged) and refine at full resolution — fewer full-res epochs for
  the same accuracy;
- **single-resample composition**: rigid and affine thetas are folded with
  ``compose_theta`` so the moving image is resampled once, not re-warped per
  stage (each extra resample loses high-frequency content).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.resample import warp_affine, warp_flow
from ..ops.transforms import identity_theta
from ..utils.pyramid import build_pyramid
from .affine import affine_register
from .flow import FlowResult, flow_register
from .rigid import rigid_register


class CascadeResult(NamedTuple):
    warped: jnp.ndarray  # final registered image
    theta: jnp.ndarray  # composed rigid∘affine matrix [1, d, d+1]
    flow: Optional[jnp.ndarray]  # dense field (None if no flow stage)
    rigid_losses: Optional[jnp.ndarray]
    affine_losses: Optional[jnp.ndarray]
    flow_losses: Optional[jnp.ndarray]


def register_cascade(
    moving: jnp.ndarray,
    target: jnp.ndarray,
    stages: Sequence[str] = ("rigid", "affine", "flow"),
    levels: int = 3,
    rigid_epochs: int = 500,
    rigid_lr: float = 1e-5,
    affine_epochs: int = 200,
    affine_lr: float = 1e-5,
    flow_epochs: int = 100,
    flow_lr: float = 1e-3,
    criterions=("mse", "ncc"),
    weights=None,
    optimizer: str = "adam",
    n: float = 32,
    flow_depth: int | None = None,
    seed: int = 0,
) -> CascadeResult:
    """Coarse-to-fine rigid→affine→flow registration of one pair.

    Epoch budgets default to the README recipe (500/200/100,
    README.md:59-82). With ``levels > 1`` the matrix stages split their epoch
    budget evenly across pyramid levels (coarse levels are nearly free).
    """
    moving = jnp.asarray(moving, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    ndim = moving.ndim - 2

    mov_pyr = build_pyramid(moving, levels)
    tgt_pyr = build_pyramid(target, levels)

    theta = identity_theta(ndim)[None]
    rigid_losses = affine_losses = flow_losses = None
    rigid_params = None

    if "rigid" in stages:
        per_level = max(1, rigid_epochs // levels)
        losses = []
        for mov_l, tgt_l in zip(mov_pyr, tgt_pyr):
            _, res = rigid_register(
                mov_l, tgt_l, lr=rigid_lr, epochs=per_level,
                criterions=list(criterions), weights=weights, grad_edges=False,
                optimizer=optimizer, init="identity",
                init_params=rigid_params, key=jax.random.key(seed),
            )
            rigid_params = res.best_params
            losses.append(res.losses)
        theta = res.best_theta
        rigid_losses = jnp.concatenate(losses)

    if "affine" in stages:
        per_level = max(1, affine_epochs // levels)
        losses = []
        init_theta = theta
        for mov_l, tgt_l in zip(mov_pyr, tgt_pyr):
            _, res = affine_register(
                mov_l, tgt_l, lr=affine_lr, epochs=per_level,
                criterions=list(criterions), weights=weights, grad_edges=False,
                optimizer=optimizer, init_theta=init_theta,
            )
            init_theta = res.best_theta
            losses.append(res.losses)
        theta = res.best_theta
        affine_losses = jnp.concatenate(losses)

    # One resample through the composed matrix transform.
    warped = warp_affine(theta, moving)

    flow = None
    if "flow" in stages:
        _, fres = flow_register(
            warped, target, lr=flow_lr, max_epochs=flow_epochs,
            criterions=list(criterions), weights=weights, n=n,
            depth=flow_depth, optimizer=optimizer, key=jax.random.key(seed),
        )
        flow = fres.flow
        flow_losses = fres.losses
        warped = warp_flow(warped, flow)

    return CascadeResult(
        warped=warped, theta=theta, flow=flow,
        rigid_losses=rigid_losses, affine_losses=affine_losses,
        flow_losses=flow_losses,
    )
