"""Similarity criteria and the weighted-sum combinator.

Criteria are pure functions ``(y, yp) -> scalar`` (called as
``criterion(target, warped)``, matching the reference's argument order at
warpings.py:78,144,213). They can be named by string, constructed with custom
hyperparameters via :func:`get_criterion`, or passed as arbitrary callables.

The reference's default stack is ``MSE + NCC(alpha=100) + NMI(alpha=1000)``
with weights ``[0.33, 0.33, 0.33]`` (warpings.py:37,124,179). NOTE a deliberate
divergence from a reference bug: the reference silently *discards* any
user-supplied criterion list and substitutes ``[MSELoss()]`` (warpings.py:36-40);
here user criteria are honored.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Callable, Sequence

import jax.numpy as jnp

from .nmi import get_pdf, kde_pdf, nmi, nmi_loss
from .similarity import lncc, mse, ncc, ssd

Criterion = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

_REGISTRY = {
    "mse": mse,
    "ssd": ssd,
    "ncc": ncc,
    "lncc": lncc,
    "nmi": nmi_loss,
}

DEFAULT_WEIGHTS = (0.33, 0.33, 0.33)


@lru_cache(maxsize=256)
def _cached_partial(name: str, kw_items: tuple) -> Criterion:
    return partial(_REGISTRY[name], **dict(kw_items))


def get_criterion(spec, **kwargs) -> Criterion:
    """Resolve a criterion spec: a name string, or a callable (passed through).

    Resolution is **identity-stable**: the same (name, kwargs) always returns
    the same function object. Engines key their jit caches on the criterion
    tuple, so a fresh closure per call would force a re-trace of the whole
    optimization program on every engine invocation.
    """
    if callable(spec):
        return spec
    if isinstance(spec, str):
        key = spec.lower()
        if key not in _REGISTRY:
            raise KeyError(f"unknown criterion {spec!r}; known: {sorted(_REGISTRY)}")
        if not kwargs:
            return _REGISTRY[key]
        return _cached_partial(key, tuple(sorted(kwargs.items())))
    raise TypeError(f"criterion spec must be str or callable, got {type(spec)}")


def default_criteria() -> tuple[Criterion, ...]:
    """The reference default stack (warpings.py:37): MSE, NCC(100), NMI(1000)."""
    return (mse, ncc, nmi_loss)


def weighted_loss(
    criteria: Sequence[Criterion], weights: Sequence[float]
) -> Criterion:
    """Weighted-sum combinator: ``sum_i w_i * crit_i(y, yp)``."""
    criteria = tuple(criteria)
    weights = tuple(float(w) for w in weights)
    if len(criteria) != len(weights):
        raise ValueError(
            f"{len(criteria)} criteria but {len(weights)} weights"
        )

    def loss(y, yp):
        total = 0.0
        for w, c in zip(weights, criteria):
            total = total + w * c(y, yp)
        return total

    return loss


def resolve_criteria(criterion, weight) -> tuple[tuple[Criterion, ...], tuple[float, ...]]:
    """Normalize the public API's (criterion, weight) pair.

    ``criterion=None`` -> the reference default stack with default weights
    (or user weights if given). A user criterion list is *used* (see module
    docstring for the documented divergence from warpings.py:36-40).
    """
    if criterion is None:
        crits = default_criteria()
        w = tuple(weight) if weight is not None else DEFAULT_WEIGHTS
    else:
        if callable(criterion) or isinstance(criterion, str):
            criterion = [criterion]
        crits = tuple(get_criterion(c) for c in criterion)
        if weight is None:
            w = (1.0 / len(crits),) * len(crits)
        else:
            w = tuple(float(x) for x in weight)
    if len(crits) != len(w):
        raise ValueError(f"{len(crits)} criteria but {len(w)} weights")
    return crits, w


__all__ = [
    "get_criterion",
    "default_criteria",
    "weighted_loss",
    "resolve_criteria",
    "mse",
    "ssd",
    "ncc",
    "lncc",
    "nmi",
    "nmi_loss",
    "get_pdf",
    "kde_pdf",
    "DEFAULT_WEIGHTS",
]
