"""Shared machinery for registration engines.

The reference's engines are Python ``for`` loops with an ``error.item()`` host
sync every iteration (warpings.py:67-93,138-159) — the exact anti-pattern for
TPU. Here every engine is one jitted program: the full epoch loop lives in
``lax.scan`` on device, best-parameter tracking rides in the scan carry, and
the loss history comes back as a single device array at the end. Zero host
round-trips inside the loop.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class RegistrationResult(NamedTuple):
    """Outcome of a rigid/affine registration.

    ``final_theta``/``best_theta`` are ``[1, d, d+1]`` matrices; the reference
    returns ``[final, best]`` pairs (warpings.py:113,174) and its ``Register``
    keeps the *best* one (torchregister.py:94,106). ``losses`` is the full
    on-device loss history (the reference collects it in a Python list and
    never returns it — §5 of SURVEY.md; returning it is a deliberate upgrade).
    """

    final_theta: jnp.ndarray
    best_theta: jnp.ndarray
    final_params: Any
    best_params: Any
    losses: jnp.ndarray
    best_loss: jnp.ndarray
    # Per-epoch raw parameter trajectory [epochs, n_params] — a few floats per
    # step, carried device-side so debug reporting can reproduce the
    # reference's in-loop parameter prints (warpings.py:135-136,161-169)
    # post-hoc with zero host syncs in the loop.
    param_history: Any = None
    # Executed step count: equals the epoch budget on the scan path, the exit
    # index under plateau early-stop. Distinguishes early-stop NaN padding in
    # ``losses`` from a mid-run divergence (both are NaN by position alone).
    steps: Any = None


def resolve_sweep_windows(
    init_theta_np,
    spatial,
    max_shift,
) -> tuple[int, ...] | int | None:
    """Static per-pass sweep windows for a separable-method engine.

    ``None`` (auto) takes the default ``max(8, S/4)`` per pass — which covers
    the tanh-bounded translations plus rotations to ~0.25 rad — and *bumps* any
    pass whose window the concrete init theta already requires more of
    (required+4, rounded up to a multiple of 8 to bound the jit-cache
    cardinality across random inits, capped at the axis size). This closes
    the silent-zero hole of
    the reference-parity random init (angles up to 1 rad can displace volume
    corners beyond S/4; ops/separable.py:24-27). Explicit ``max_shift`` wins.
    """
    if max_shift is not None:
        return max_shift if isinstance(max_shift, int) else tuple(max_shift)
    from ..ops.separable import required_windows

    req = required_windows(init_theta_np, spatial)
    # pass order (x, y[, z]) == reversed axis order, matching factor_passes
    axes = list(range(len(spatial)))[::-1]
    default = [max(8, -(-spatial[a] // 4)) for a in axes]
    out = []
    bumped = False
    for d, r, a in zip(default, req, axes):
        if r + 2 <= d:
            k = d
        else:
            # Quantize bumped windows to multiples of 8: the window feeds the
            # engines' jit/lru cache key, and an exact ceil(required)+margin is
            # a continuous function of a random init — every multi-restart
            # draw would otherwise recompile the whole engine (~30-90 s).
            k = min(int(spatial[a]), -(-(r + 4) // 8) * 8)
        bumped |= k != d
        out.append(k)
    return tuple(out) if bumped else None  # None keeps the shared jit cache


def check_sweep_windows(theta, spatial, used, label: str) -> None:
    """Post-run guard: warn when a recovered theta needs a larger sweep window
    than the engine optimized with (its support was partially zeroed —
    re-run with ``max_shift``/``method='exact'`` or treat results as suspect).
    """
    import warnings

    from ..ops.separable import required_windows

    if isinstance(theta, jax.core.Tracer):
        return  # under jit (e.g. make_cascade_fn) there is nothing to read
    axes = list(range(len(spatial)))[::-1]
    if used is None:
        used = [max(8, -(-spatial[a] // 4)) for a in axes]
    elif isinstance(used, int):
        used = [used] * len(spatial)
    req = required_windows(theta, spatial)
    if any(r > u for r, u in zip(req, used)):
        warnings.warn(
            f"{label}: recovered transform needs sweep windows {req} but the "
            f"engine used {list(used)}; displacements beyond the window "
            "contribute zero (ops/separable.py:24-27). Pass a larger "
            "max_shift or method='exact'.",
            RuntimeWarning,
            stacklevel=3,
        )


def make_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    """'sgd' (reference parity, warpings.py:58,131,192) or 'adam' (the
    north-star optimizer)."""
    name = name.lower()
    if name == "sgd":
        return optax.sgd(lr)
    if name == "adam":
        return optax.adam(lr)
    raise ValueError(f"unknown optimizer {name!r} (use 'sgd' or 'adam')")


def optimize_scan(
    loss_fn: Callable[[Any], jnp.ndarray],
    params0: Any,
    tx: optax.GradientTransformation,
    epochs: int,
    stop_rel: float | None = None,
    patience: int = 25,
):
    """Run up to ``epochs`` optimizer steps of ``loss_fn`` on device.

    Returns ``(final_params, best_params, best_loss, losses, param_history,
    steps)``.
    Best-tracking matches the reference (warpings.py:85-93): the *pre-update*
    parameters of the lowest-loss step win (strict ``<``; first step
    initializes). ``param_history`` stacks the pre-update params per epoch
    (rigid/affine params are a handful of floats — negligible; NaN-padded
    past an early stop).

    ``stop_rel`` enables plateau early-stopping (a TPU-native extension — the
    reference's matrix engines always run the full budget): stop once the best
    loss hasn't improved *relatively* by ``stop_rel`` within the last
    ``patience`` steps. The loop then runs as ``lax.while_loop`` instead of
    ``scan`` — still entirely on device, zero host syncs.
    """
    opt_state0 = tx.init(params0)
    grad_fn = jax.value_and_grad(loss_fn)

    def step_core(params, opt_state, best_loss, best_params):
        loss_val, grads = grad_fn(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        better = loss_val < best_loss
        best_params = jax.tree.map(
            lambda b, p: jnp.where(better, p, b), best_params, params
        )
        new_best = jnp.where(better, loss_val, best_loss)
        return new_params, opt_state, new_best, best_params, loss_val, params

    if stop_rel is None:
        def step(carry, _):
            params, opt_state, best_loss, best_params = carry
            params, opt_state, best_loss, best_params, loss_val, pre = step_core(
                params, opt_state, best_loss, best_params
            )
            return (params, opt_state, best_loss, best_params), (loss_val, pre)

        init = (params0, opt_state0, jnp.asarray(jnp.inf, jnp.float32), params0)
        (final_params, _, best_loss, best_params), (losses, param_hist) = (
            jax.lax.scan(step, init, None, length=epochs)
        )
        return (final_params, best_params, best_loss, losses, param_hist,
                jnp.int32(epochs))

    flat0 = jnp.ravel(jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(params0)]))
    losses0 = jnp.full((epochs,), jnp.nan, jnp.float32)
    hist0 = jnp.full((epochs, flat0.size), jnp.nan, jnp.float32)

    def cond(carry):
        _, _, best_loss, _, i, _, _, ref_loss, since = carry
        plateaued = (since >= patience) & (
            best_loss > ref_loss * (1.0 - stop_rel)
        )
        return (i < epochs) & ~plateaued

    def body(carry):
        params, opt_state, best_loss, best_params, i, losses, hist, ref_loss, since = carry
        params, opt_state, new_best, best_params, loss_val, pre = step_core(
            params, opt_state, best_loss, best_params
        )
        losses = jax.lax.dynamic_update_slice(losses, loss_val[None], (i,))
        pre_flat = jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(pre)])
        hist = jax.lax.dynamic_update_slice(hist, pre_flat[None], (i, 0))
        # reset the plateau window whenever the best improves enough
        improved = new_best < ref_loss * (1.0 - stop_rel)
        ref_loss = jnp.where(improved, new_best, ref_loss)
        since = jnp.where(improved, 0, since + 1)
        return params, opt_state, new_best, best_params, i + 1, losses, hist, ref_loss, since

    init = (
        params0, opt_state0, jnp.asarray(jnp.inf, jnp.float32), params0,
        jnp.int32(0), losses0, hist0, jnp.asarray(jnp.inf, jnp.float32),
        jnp.int32(0),
    )
    (final_params, _, best_loss, best_params, steps, losses, hist, _, _) = (
        jax.lax.while_loop(cond, body, init)
    )
    return final_params, best_params, best_loss, losses, hist, steps
