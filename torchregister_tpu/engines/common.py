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

    return windows_from_required(required_windows(init_theta_np, spatial), spatial)


def windows_from_required(req, spatial) -> tuple[int, ...] | None:
    """Quantized sweep windows covering a concrete per-pass requirement
    (the shared core of :func:`resolve_sweep_windows`; cohort engines feed the
    elementwise max requirement over their batch of inits)."""
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


def check_sweep_windows_batch(thetas, spatial, used, label: str) -> None:
    """Vectorized post-run window guard for cohort engines: one warning naming
    every sample whose recovered theta outgrew the sweep windows the cohort
    optimized with (mirror of :func:`check_sweep_windows`; ONE host readback
    for the whole batch)."""
    import warnings

    import numpy as np

    from ..ops.separable import required_windows

    if isinstance(thetas, jax.core.Tracer):
        return
    axes = list(range(len(spatial)))[::-1]
    if used is None:
        used = [max(8, -(-spatial[a] // 4)) for a in axes]
    elif isinstance(used, int):
        used = [used] * len(spatial)
    thetas_np = np.asarray(jax.device_get(thetas), np.float64)
    bad = []
    for b in range(thetas_np.shape[0]):
        req = required_windows(thetas_np[b], spatial)
        if any(r > u for r, u in zip(req, used)):
            bad.append((b, req))
    if bad:
        shown = ", ".join(f"#{b} needs {list(r)}" for b, r in bad[:5])
        more = f" (+{len(bad) - 5} more)" if len(bad) > 5 else ""
        warnings.warn(
            f"{label}: {len(bad)} of {thetas_np.shape[0]} recovered transforms "
            f"outgrew the sweep windows {list(used)}: {shown}{more}; "
            "displacements beyond the window contribute zero "
            "(ops/separable.py:24-27). Pass a larger max_shift or "
            "method='exact'.",
            RuntimeWarning,
            stacklevel=3,
        )


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


class EngineFns(NamedTuple):
    """Compiled entry points of a matrix engine build.

    ``run`` is the usual one-shot program (whole loop on device). The other
    three power segmented host progress (reference tqdm/param prints,
    warpings.py:67,135-136,138,161-169, without per-epoch host syncs): ONE
    compiled chunk program re-invoked with a moving ``end`` index — same
    pattern as the flow engine's ``progress_every`` (engines/flow.py)."""

    run: Callable
    make_carry: Callable
    run_chunk: Callable
    finalize: Callable


def make_chunked_optimizer(
    loss_of: Callable,
    tx: optax.GradientTransformation,
    epochs: int,
    stop_rel: float | None = None,
    patience: int = 25,
):
    """Segmented variant of :func:`optimize_scan` for host progress reporting.

    ``loss_of(moving, target)`` returns the per-params loss closure. Returns
    jitted ``(make_carry, run_chunk, finalize)``: ``run_chunk(moving, target,
    carry, end)`` advances the while-loop to a *dynamic* epoch index (no
    retrace per segment); ``finalize`` unpacks the carry into
    :func:`optimize_scan`'s result tuple. Plateau early-stop (``stop_rel``)
    composes with segmenting exactly as in the one-shot path.
    """

    def make_carry(params0):
        flat0 = jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(params0)])
        return (
            params0,
            tx.init(params0),
            jnp.asarray(jnp.inf, jnp.float32),
            params0,
            jnp.int32(0),
            jnp.full((epochs,), jnp.nan, jnp.float32),
            jnp.full((epochs, flat0.size), jnp.nan, jnp.float32),
            jnp.asarray(jnp.inf, jnp.float32),
            jnp.int32(0),
        )

    def run_chunk(moving, target, carry, end):
        loss_fn = loss_of(moving, target)
        grad_fn = jax.value_and_grad(loss_fn)

        def cond(carry):
            _, _, best_loss, _, i, _, _, ref_loss, since = carry
            ok = i < end
            if stop_rel is not None:
                plateaued = (since >= patience) & (
                    best_loss > ref_loss * (1.0 - stop_rel)
                )
                ok = ok & ~plateaued
            return ok

        def body(carry):
            params, opt_state, best_loss, best_params, i, losses, hist, ref_loss, since = carry
            loss_val, grads = grad_fn(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            better = loss_val < best_loss
            best_params = jax.tree.map(
                lambda b, p: jnp.where(better, p, b), best_params, params
            )
            new_best = jnp.where(better, loss_val, best_loss)
            losses = jax.lax.dynamic_update_slice(losses, loss_val[None], (i,))
            pre_flat = jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(params)])
            hist = jax.lax.dynamic_update_slice(hist, pre_flat[None], (i, 0))
            if stop_rel is not None:
                improved = new_best < ref_loss * (1.0 - stop_rel)
                ref_loss = jnp.where(improved, new_best, ref_loss)
                since = jnp.where(improved, 0, since + 1)
            return (new_params, opt_state, new_best, best_params, i + 1,
                    losses, hist, ref_loss, since)

        return jax.lax.while_loop(cond, body, carry)

    def finalize(carry):
        params, _, best_loss, best_params, i, losses, hist, _, _ = carry
        return params, best_params, best_loss, losses, hist, i

    return jax.jit(make_carry), jax.jit(run_chunk), jax.jit(finalize)


def run_with_progress(
    engine_fns: EngineFns,
    moving,
    target,
    params0,
    epochs: int,
    progress_every: int,
    label: str,
    param_fmt: Callable | None = None,
):
    """Drive an engine in segments, printing loss + current raw parameters
    after each chunk — the reference's tqdm + in-loop param prints
    (warpings.py:67,135-136,138,161-169) at one host sync per segment."""
    import numpy as np

    carry = engine_fns.make_carry(params0)
    prev_done = -1
    for end in range(progress_every, epochs + progress_every, progress_every):
        end = min(end, epochs)
        carry = engine_fns.run_chunk(moving, target, carry, jnp.int32(end))
        i_done = int(carry[4])
        if i_done == prev_done:
            # A plateau stop that fired EXACTLY at the previous segment
            # boundary: this chunk exited immediately (i_done < end never
            # triggered below because the stop landed on i_done == end).
            # Report it now instead of printing a duplicate progress line.
            print(f"[{label}] plateau early-stop at epoch {i_done}", flush=True)
            break
        prev_done = i_done
        loss_last = float(carry[2])
        params_now = np.concatenate(
            [np.ravel(np.asarray(x)) for x in jax.tree.leaves(carry[0])]
        )
        ptxt = (param_fmt(params_now) if param_fmt
                else np.array2string(params_now, precision=4, separator=", "))
        print(f"[{label}] epoch {i_done}/{epochs} best_loss={loss_last:.6g} "
              f"params={ptxt}", flush=True)
        if i_done < end:
            print(f"[{label}] plateau early-stop at epoch {i_done}", flush=True)
            break
    return engine_fns.finalize(carry)


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
