"""Levenberg-Marquardt (damped Newton) optimization for the matrix engines.

The rigid/affine stages optimize only 6/12 parameters, yet the reference (and
the r4 recipe) runs hundreds of first-order steps on them
(warpings.py:58,131 — plain SGD loops; our Adam variant still executed ~196+33
steps per cascade, ~75% of the wall time). For a parameter space this small a
full damped-Newton step is nearly free *relative to the gradient itself*:

- one ``jax.linearize`` of ``value_and_grad`` gives loss + gradient from a
  single forward/backward pass;
- the dense Hessian costs ``n`` extra *linearized* passes (forward-over-
  reverse; the expensive primal trace is shared), ``n <= 12``;
- the ``(H + lam*D) delta = -g`` solve is a 12x12 Cholesky — noise.

With quadratic convergence near the optimum (where Adam crawls along a
plateau for ``patience`` steps), total passes drop by ~an order of magnitude.

The loop is one ``lax.while_loop`` on device (zero host syncs), with classic
Marquardt trust-region control: a trial step is *evaluated* before acceptance;
on increase the step is rejected and the damping ``lam`` grows (degrading
toward well-scaled gradient descent), on decrease ``lam`` shrinks (toward pure
Newton). An indefinite Hessian or overshoot therefore self-corrects — the
Cholesky of a non-PD system yields NaNs, the trial evaluates non-finite, and
the step is rejected with more damping.

The carry layout matches :func:`engines.common.make_chunked_optimizer`'s
9-tuple exactly (``lam`` sits in the optimizer-state slot) so
``run_with_progress`` and the engine ``finalize`` wrappers work unchanged.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _val_grad_hess(loss_fn: Callable, params: jnp.ndarray):
    """(loss, gradient, dense Hessian) in one primal pass + n linearized ones.

    ``jax.linearize`` of ``value_and_grad`` shares the primal trace across the
    ``n`` Hessian columns — the volume-sized forward/backward runs once; only
    the (cheaper) tangent computation is vmapped over the parameter basis.
    """
    n = params.size
    (val, g), lin = jax.linearize(jax.value_and_grad(loss_fn), params)
    _, H = jax.vmap(lin)(jnp.eye(n, dtype=params.dtype))
    return val, g, H


def make_chunked_lm(
    loss_of: Callable,
    max_iters: int,
    stop_rel: float | None = 1e-4,
    patience: int = 3,
    lam0: float = 1.0,
    lam_down: float = 1.0 / 3.0,
    lam_up: float = 4.0,
):
    """Segmented LM loop: jitted ``(make_carry, run_chunk, finalize)``.

    ``loss_of(moving, target)`` returns the per-params scalar loss closure
    (same contract as :func:`engines.common.make_chunked_optimizer`).
    ``run_chunk(moving, target, carry, end)`` advances to a dynamic iteration
    index; plateau early-stop fires once the best loss hasn't improved
    relatively by ``stop_rel`` within ``patience`` iterations (LM stalls are
    sharp — rejected steps leave the loss unchanged — so small patience works).
    """
    lam_min, lam_max = 1e-8, 1e8

    def make_carry(params0):
        params0 = jnp.asarray(params0, jnp.float32)
        return (
            params0,
            jnp.asarray(lam0, jnp.float32),  # optimizer state = damping
            jnp.asarray(jnp.inf, jnp.float32),
            params0,
            jnp.int32(0),
            jnp.full((max_iters,), jnp.nan, jnp.float32),
            jnp.full((max_iters, params0.size), jnp.nan, jnp.float32),
            jnp.asarray(jnp.inf, jnp.float32),
            jnp.int32(0),
        )

    def run_chunk(moving, target, carry, end):
        loss_fn = loss_of(moving, target)

        def cond(carry):
            _, _, _, _, i, _, _, _, since = carry
            ok = i < end
            if stop_rel is not None:
                ok = ok & (since < patience)
            return ok

        def body(carry):
            params, lam, best_loss, best_params, i, losses, hist, ref_loss, since = carry
            val, g, H = _val_grad_hess(loss_fn, params)
            # Marquardt scaling: damp along the Hessian diagonal so the
            # fallback direction is a *scaled* gradient step (angles and
            # tanh-bounded translations live on different scales).
            d = jnp.abs(jnp.diag(H))
            D = jnp.diag(jnp.maximum(d, 1e-8 * jnp.max(d) + 1e-12))
            A = H + lam * D
            # Cholesky: non-PD systems yield NaNs -> trial rejects itself.
            L, _ = jax.scipy.linalg.cho_factor(A, lower=True)
            delta = jax.scipy.linalg.cho_solve((L, True), -g)
            trial = params + delta
            val_new = loss_fn(trial)
            accept = jnp.isfinite(val_new) & (val_new < val)
            params = jnp.where(accept, trial, params)
            lam = jnp.clip(
                jnp.where(accept, lam * lam_down, lam * lam_up), lam_min, lam_max
            )
            # Best tracking: an accepted trial beats every loss seen so far
            # (monotone acceptance), so compare BOTH the pre-step loss (parity
            # with optimize_scan's pre-update tracking) and the trial.
            better_pre = val < best_loss
            best_params = jnp.where(better_pre, carry[0], best_params)
            best_loss = jnp.where(better_pre, val, best_loss)
            better_new = accept & (val_new < best_loss)
            best_params = jnp.where(better_new, trial, best_params)
            best_loss = jnp.where(better_new, val_new, best_loss)
            losses = jax.lax.dynamic_update_slice(losses, val[None], (i,))
            hist = jax.lax.dynamic_update_slice(hist, carry[0][None], (i, 0))
            if stop_rel is not None:
                # Relative improvement with an absolute floor: converged NCC
                # losses hover around tiny (even slightly negative) values
                # where a pure-relative test churns forever.
                improved = best_loss < jnp.where(
                    jnp.isfinite(ref_loss),
                    ref_loss - stop_rel * jnp.abs(ref_loss) - 1e-8,
                    jnp.inf,  # first finite loss always counts as improvement
                )
                ref_loss = jnp.where(improved, best_loss, ref_loss)
                since = jnp.where(improved, 0, since + 1)
            return (params, lam, best_loss, best_params, i + 1,
                    losses, hist, ref_loss, since)

        return jax.lax.while_loop(cond, body, carry)

    def finalize(carry):
        params, _, best_loss, best_params, i, losses, hist, _, _ = carry
        return params, best_params, best_loss, losses, hist, i

    return jax.jit(make_carry), jax.jit(run_chunk), jax.jit(finalize)


def optimize_lm(
    loss_fn: Callable,
    params0: jnp.ndarray,
    max_iters: int,
    stop_rel: float | None = 1e-4,
    patience: int = 3,
    lam0: float = 1.0,
):
    """One-shot LM run; returns :func:`engines.common.optimize_scan`'s
    6-tuple ``(final, best, best_loss, losses, hist, steps)``."""
    make_carry, run_chunk, finalize = make_chunked_lm(
        lambda m, t: loss_fn, max_iters, stop_rel, patience, lam0
    )
    carry = run_chunk(None, None, make_carry(params0), jnp.int32(max_iters))
    return finalize(carry)
