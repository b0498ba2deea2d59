"""Rigid (SE(2)/SE(3)) registration engine.

TPU-native redesign of reference ``rigid_register`` (warpings.py:117-174):
parameters are a 6-vector (3D: Euler angles + bounded translations) or 3-vector
(2D), mapped to an affine matrix by :func:`rigid_theta` and optimized with a
jitted ``lax.scan`` loop (SURVEY.md §7 design stance). The reference's random
``torch.rand`` init (utils.py:316-321) is reproduced via ``jax.random.uniform``
under ``init='random'``; ``init='identity'`` (all-zero params) is the
recommended alternative.
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
from ..ops.transforms import rigid_theta, rigid_theta_np
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


def init_rigid_params(ndim: int, key=None, init: str = "random") -> jnp.ndarray:
    n = 6 if ndim == 3 else 3
    if init == "identity":
        return jnp.zeros((n,), jnp.float32)
    if key is None:
        key = jax.random.key(0)
    # torch.rand parity: uniform [0, 1) (utils.py:316-321).
    return jax.random.uniform(key, (n,), jnp.float32)


@lru_cache(maxsize=64)
def _build_rigid_fn(
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
    """One compiled program per (loss stack, lr, epochs, optimizer, ndim).

    ``method='separable'`` (default) uses the gather-free sweep resampler in
    the hot loop (ops/separable.py — ~100x the throughput of the exact XLA
    gather path on TPU); ``'exact'`` keeps grid_sample-identical semantics.

    ``optimizer='lm'`` swaps the first-order loop for damped Newton
    (engines/second_order.py): ``epochs`` then counts LM iterations (each
    ~n_params+2 passes but quadratically convergent) and ``lr`` is unused.
    """
    loss = weighted_loss(criteria, weights)

    def warp(theta, moving):
        if method == "separable":
            return warp_affine_separable(theta, moving, max_shift=max_shift)
        return warp_affine(theta, moving)

    def loss_of(moving, target):
        def loss_fn(params):
            theta = rigid_theta(params)[None]  # [1, d, d+1]
            warped = warp(theta, moving)
            return loss(target, warped)

        return loss_fn

    def _to_result(raw):
        final_params, best_params, best_loss, losses, hist, steps = raw
        return RegistrationResult(
            final_theta=rigid_theta(final_params)[None],
            best_theta=rigid_theta(best_params)[None],
            final_params=final_params,
            best_params=best_params,
            losses=losses,
            best_loss=best_loss,
            param_history=hist,
            steps=steps,
        )

    if optimizer == "lm":
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


def rigid_register(
    moving: jnp.ndarray,
    target: jnp.ndarray,
    lr: float = 1e-5,
    epochs: int = 1000,
    per: float = 0.1,
    criterions=None,
    weights=None,
    grad_edges: bool = True,
    optimizer: str = "sgd",
    init: str = "random",
    key=None,
    init_params: jnp.ndarray | None = None,
    method: str = "separable",
    max_shift=None,
    check_window: bool = True,
    stop_rel: float | None = None,
    patience: int = 25,
    progress_every: int | None = None,
) -> tuple[jnp.ndarray, RegistrationResult]:
    """Register ``moving [1,1,*S]`` onto ``target`` with a rigid transform.

    Returns ``(warped_best, result)``. ``per`` is accepted for reference API
    parity but unused — the reference's rigid engine also never uses it
    (warpings.py:117 takes it and ignores it). ``grad_edges=True`` runs both
    images through the Sobel band-pass mask first (warpings.py:118-121).

    ``max_shift`` (int or per-pass sequence) bounds the separable sweep; by
    default it is auto-bumped to cover the concrete init theta, and
    ``check_window`` warns post-run if the recovered theta outgrew it.

    ``progress_every=N`` prints epoch/loss/current-params every N epochs — the
    reference's in-loop tqdm + param prints (warpings.py:135-136,138,161-169)
    as one compiled chunk program re-invoked with a moving end index: one host
    sync per segment, never per epoch.
    """
    if grad_edges:
        moving = edge_filter(moving)
        target = edge_filter(target)
    criteria, w = resolve_criteria(criterions, weights)
    ndim = moving.ndim - 2
    spatial = moving.shape[2:]
    if init_params is None:
        init_params = init_rigid_params(ndim, key, init)
    if method != "separable":
        windows = None
    elif max_shift is not None:
        windows = max_shift if isinstance(max_shift, int) else tuple(max_shift)
    elif isinstance(init_params, jax.core.Tracer):
        windows = None  # traced init (cascade): keep the shared default
    else:
        windows = resolve_sweep_windows(rigid_theta_np(init_params), spatial, None)
    fns = _build_rigid_fn(tuple(criteria), tuple(w), float(lr), int(epochs),
                          optimizer, ndim, method, windows,
                          None if stop_rel is None else float(stop_rel),
                          int(patience))
    if progress_every:
        result = run_with_progress(fns, moving, target, init_params,
                                   int(epochs), int(progress_every),
                                   "rigid_register")
    else:
        result = fns.run(moving, target, init_params)
    if method == "exact":
        from ..ops.blocked import warp_affine_fast

        warped_best = warp_affine_fast(result.best_theta, moving)
    else:
        warped_best = warp_affine_separable(
            result.best_theta, moving, max_shift=windows
        )
        if check_window:
            check_sweep_windows(result.best_theta, spatial, windows, "rigid_register")
    return warped_best, result
