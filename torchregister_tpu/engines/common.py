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
):
    """Run ``epochs`` optimizer steps of ``loss_fn`` under ``lax.scan``.

    Returns ``(final_params, best_params, best_loss, losses)``. Best-tracking
    matches the reference (warpings.py:85-93): the *pre-update* parameters of
    the lowest-loss step win (strict ``<``; first step initializes).
    """
    opt_state0 = tx.init(params0)
    grad_fn = jax.value_and_grad(loss_fn)

    def step(carry, _):
        params, opt_state, best_loss, best_params = carry
        loss_val, grads = grad_fn(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        better = loss_val < best_loss
        best_params = jax.tree.map(
            lambda b, p: jnp.where(better, p, b), best_params, params
        )
        best_loss = jnp.where(better, loss_val, best_loss)
        return (new_params, opt_state, best_loss, best_params), loss_val

    init = (params0, opt_state0, jnp.asarray(jnp.inf, jnp.float32), params0)
    (final_params, _, best_loss, best_params), losses = jax.lax.scan(
        step, init, None, length=epochs
    )
    return final_params, best_params, best_loss, losses
