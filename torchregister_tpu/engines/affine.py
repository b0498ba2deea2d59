"""Affine registration engine.

TPU-native redesign of reference ``affine_register`` (warpings.py:30-113). The
reference parameterizes theta through a zero-initialized two-layer MLP whose
dead ReLU confines all gradient flow to the final bias — i.e. it *effectively*
optimizes a direct, identity-initialized theta (SURVEY.md §2). We implement
that effective parameterization directly: a flat ``[d*(d+1)]`` theta vector,
identity-initialized, same SGD dynamics, none of the dead weight.

The ``per`` voxel-subsampling argument only ever fed the dead MLP input in the
reference (sampled once at warpings.py:62-65, observably irrelevant to the
result); it is accepted for API parity and ignored.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..losses import resolve_criteria, weighted_loss
from ..ops.edge import edge_filter
from ..ops.resample import warp_affine
# the unchecked core: engine thetas evolve from near-identity (well-
# conditioned factorization) and support overflow is covered by
# check_sweep_windows; the public wrapper's host-side pivot check would
# add a ~0.8 s readback per eager call on remote transports
from ..ops.separable import _warp_affine_separable as warp_affine_separable
from ..ops.transforms import identity_theta
from .common import (
    EngineFns,
    RegistrationResult,
    check_sweep_windows,
    make_chunked_optimizer,
    make_optimizer,
    optimize_scan,
    resolve_sweep_windows,
    run_with_progress,
)


@lru_cache(maxsize=64)
def _build_affine_fn(
    criteria: tuple,
    weights: tuple,
    lr: float,
    epochs: int,
    optimizer: str,
    ndim: int,
    method: str = "separable",
    max_shift: int | tuple | None = None,
    stop_rel: float | None = None,
    patience: int = 25,
):
    loss = weighted_loss(criteria, weights)

    def warp(theta, moving):
        if method == "separable":
            return warp_affine_separable(theta, moving, max_shift=max_shift)
        return warp_affine(theta, moving)

    def loss_of(moving, target):
        def loss_fn(params):
            theta = params.reshape(1, ndim, ndim + 1)
            warped = warp(theta, moving)
            return loss(target, warped)

        return loss_fn

    def _to_result(raw):
        final_params, best_params, best_loss, losses, hist, steps = raw
        return RegistrationResult(
            final_theta=final_params.reshape(1, ndim, ndim + 1),
            best_theta=best_params.reshape(1, ndim, ndim + 1),
            final_params=final_params,
            best_params=best_params,
            losses=losses,
            best_loss=best_loss,
            param_history=hist,
            steps=steps,
        )

    if optimizer == "lm":
        # Damped Newton over the 6/12 theta entries (engines/second_order.py):
        # ``epochs`` counts LM iterations; ``lr`` is unused.
        from .second_order import make_chunked_lm

        make_carry, run_chunk, finalize = make_chunked_lm(
            loss_of, epochs, stop_rel=stop_rel, patience=patience
        )

        def run(moving, target, params0):
            carry = run_chunk(moving, target, make_carry(params0),
                              jnp.int32(epochs))
            return _to_result(finalize(carry))

        return EngineFns(run=jax.jit(run), make_carry=make_carry,
                         run_chunk=run_chunk,
                         finalize=lambda carry: _to_result(finalize(carry)))

    tx = make_optimizer(optimizer, lr)

    def run(moving, target, params0):
        return _to_result(optimize_scan(
            loss_of(moving, target), params0, tx, epochs,
            stop_rel=stop_rel, patience=patience,
        ))

    make_carry, run_chunk, finalize = make_chunked_optimizer(
        loss_of, tx, epochs, stop_rel=stop_rel, patience=patience
    )
    return EngineFns(run=jax.jit(run), make_carry=make_carry,
                     run_chunk=run_chunk,
                     finalize=lambda carry: _to_result(finalize(carry)))


def affine_register(
    moving: jnp.ndarray,
    target: jnp.ndarray,
    lr: float = 1e-5,
    epochs: int = 1000,
    per: float = 0.1,
    criterions=None,
    weights=None,
    grad_edges: bool = True,
    optimizer: str = "sgd",
    init_theta: jnp.ndarray | None = None,
    method: str = "separable",
    max_shift=None,
    check_window: bool = True,
    stop_rel: float | None = None,
    patience: int = 25,
    progress_every: int | None = None,
) -> tuple[jnp.ndarray, RegistrationResult]:
    """Register ``moving [1,1,*S]`` onto ``target`` with a full affine matrix.

    Returns ``(warped_best, result)``. ``init_theta`` (``[1, d, d+1]`` or flat)
    lets cascades warm-start from a previous stage; default is identity
    (matching the reference's effective init, warpings.py:47-48,54-55).

    ``max_shift`` (int or per-pass sequence) bounds the separable sweep; by
    default it is auto-bumped to cover the concrete init theta, and
    ``check_window`` warns post-run if the recovered theta outgrew it.
    """
    del per  # dead in the reference too — see module docstring
    if grad_edges:
        moving = edge_filter(moving)
        target = edge_filter(target)
    criteria, w = resolve_criteria(criterions, weights)
    ndim = moving.ndim - 2
    spatial = moving.shape[2:]
    if init_theta is None:
        params0 = identity_theta(ndim).reshape(-1)
    else:
        params0 = jnp.asarray(init_theta, jnp.float32).reshape(-1)
    if method != "separable":
        windows = None
    elif max_shift is not None:
        windows = max_shift if isinstance(max_shift, int) else tuple(max_shift)
    elif isinstance(params0, jax.core.Tracer):
        windows = None  # traced init (cascade): keep the shared default
    else:
        import numpy as np

        theta0_np = np.asarray(jax.device_get(params0), np.float64).reshape(
            ndim, ndim + 1
        )
        windows = resolve_sweep_windows(theta0_np, spatial, None)
    fns = _build_affine_fn(tuple(criteria), tuple(w), float(lr), int(epochs),
                           optimizer, ndim, method, windows,
                           None if stop_rel is None else float(stop_rel),
                           int(patience))
    if progress_every:
        result = run_with_progress(fns, moving, target, params0,
                                   int(epochs), int(progress_every),
                                   "affine_register")
    else:
        result = fns.run(moving, target, params0)
    if method == "exact":
        from ..ops.blocked import warp_affine_fast

        warped_best = warp_affine_fast(result.best_theta, moving)
    else:
        warped_best = warp_affine_separable(
            result.best_theta, moving, max_shift=windows
        )
        if check_window:
            check_sweep_windows(result.best_theta, spatial, windows, "affine_register")
    return warped_best, result
