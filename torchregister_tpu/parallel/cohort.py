"""Cohort (batched, multi-chip) registration.

The reference hard-assumes batch size 1 everywhere (torchregister.py:53-55;
SURVEY.md §2). Here every engine core is a pure function of one pair, so a
cohort is just ``vmap`` — and a *sharded* cohort is the same ``vmap`` jitted
with a batch-sharded ``NamedSharding`` over a 1-D device mesh. Pairs are
independent: XLA emits zero collectives; throughput scales linearly over ICI.

Window safety matches the single-pair engines (engines/common.py): sweep
windows are sized from the *worst-case init over the whole batch* (random
inits can need more than the S/4 default — tests/test_window_safety.py), the
recovered transforms are checked post-run in one vectorized pass, and
``method='exact'`` sidesteps the static window entirely.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..engines.affine import _build_affine_fn
from ..engines.flow import FlowResult, _build_flow_fn
from ..engines.rigid import _build_rigid_fn, init_rigid_params
from ..losses import resolve_criteria
from ..models.attention_unet import max_depth_for
from ..ops.edge import edge_filter
from ..ops.transforms import identity_theta, rigid_theta_np
from .mesh import batch_sharding


def _cohort_windows(init_thetas_np, spatial, max_shift):
    """Sweep windows covering the worst-case init over the batch: elementwise
    max of per-sample :func:`required_windows`, quantized exactly as the
    single-pair engines do (engines/common.py:resolve_sweep_windows)."""
    from ..engines.common import windows_from_required
    from ..ops.separable import required_windows

    if max_shift is not None:
        return max_shift if isinstance(max_shift, int) else tuple(max_shift)
    reqs = [required_windows(t, spatial) for t in init_thetas_np]
    worst = tuple(max(r[i] for r in reqs) for i in range(len(spatial)))
    return windows_from_required(worst, spatial)


def register_cohort(
    movings: jnp.ndarray,
    targets: jnp.ndarray,
    mode: str = "rigid",
    mesh: Optional[Mesh] = None,
    lr: float | None = None,
    epochs: int = 1000,
    criterions=None,
    weights=None,
    grad_edges: bool = False,
    optimizer: str | None = None,
    init: str = "identity",
    seed: int = 0,
    n: float = 32,
    depth: int | None = None,
    stop_crit: float = 1e-4,
    method: str = "separable",
    max_shift=None,
    max_disp: int = 8,
    stop_rel: float | None = None,
    patience: int = 25,
    check_window: bool = True,
    flow_model: str = "field",
    smooth: float | None = None,
    dtype: str = "float32",
):
    """Register ``movings [B, 1, *S]`` onto ``targets [B, 1, *S]`` pairwise.

    Returns the engine's result pytree with a leading batch axis. When ``mesh``
    is given, inputs/outputs are sharded over its ``data`` axis and the whole
    cohort runs as one SPMD program.

    ``method``/``max_shift``/``max_disp``/``stop_rel``/``patience`` mirror the
    single-pair engines. With ``method='separable'`` (default) the sweep
    windows are auto-sized to cover the worst-case init in the batch, and
    ``check_window`` warns post-run (naming the samples) if any recovered
    transform outgrew them — never a silent truncation.

    Flow mode additionally takes ``flow_model``/``smooth``/``dtype`` (same
    contract as :func:`engines.flow.flow_register`), so the winning
    direct-field recipe — ``flow_model='field'``, diffusion ``smooth``,
    plateau ``stop_rel``/``patience`` — runs cohort-wide, not just per pair.

    **Default resolution matches the single-pair API** (api.py:119,137,165 —
    a breaking change from r4, whose cohort defaulted ``flow_model='unet'``
    with SGD): ``flow_model`` defaults to ``'field'``, and ``optimizer`` /
    ``lr`` / ``smooth`` left as ``None`` resolve to ``adam`` / ``0.3`` /
    ``0.5`` for field-mode flow and to the reference-parity ``sgd`` /
    ``1e-5`` / ``0.0`` for every other mode — the same out-of-box call now
    runs the same engine per-pair and cohort-wide. Pass ``flow_model='unet',
    optimizer='sgd', smooth=0.0`` explicitly for the r4 cohort behavior.
    """
    # Mirror Register.__init__/optim's default resolution (api.py:119,137,165)
    # so cohort-wide and per-pair out-of-box behavior never diverge.
    is_field_flow = mode == "flow" and flow_model == "field"
    if init not in ("identity", "random"):
        raise ValueError(
            f"init must be 'identity' or 'random' (got {init!r})"
        )
    if init == "random" and mode != "rigid":
        raise ValueError(
            "init='random' is only meaningful for mode='rigid' (the "
            "reference's torch.rand regressor init, utils.py:316-321); "
            "affine starts at identity and flow at a zero field"
        )
    if optimizer is None:
        optimizer = "adam" if is_field_flow else "sgd"
    if lr is None:
        lr = 0.3 if is_field_flow else 1e-5
    if smooth is None:
        smooth = 0.5 if is_field_flow else 0.0
    movings = jnp.asarray(movings, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    assert movings.shape == targets.shape and movings.shape[1] == 1
    B = movings.shape[0]
    ndim = movings.ndim - 2
    spatial = movings.shape[2:]

    if grad_edges:
        # Per-sample vmap: edge_filter's min-max normalization and thresholds
        # are global over its input, so filtering the whole batch at once
        # would couple samples and diverge from per-pair registration.
        _ef = jax.jit(jax.vmap(lambda v: edge_filter(v[None])[0]))
        movings = _ef(movings)
        targets = _ef(targets)

    criteria, w = resolve_criteria(criterions, weights)
    key = jax.random.key(seed)
    srel = None if stop_rel is None else float(stop_rel)

    def _per_pair(run):
        # Engines take [1, 1, *S]; vmap hands us [1, *S] per element.
        def one(mov, tgt, p0):
            return run(mov[None], tgt[None], p0)

        return jax.vmap(one)

    windows = None
    if mode == "rigid":
        if init == "identity":
            params0 = jnp.zeros((B, 6 if ndim == 3 else 3), jnp.float32)
        else:
            params0 = jax.vmap(lambda k: init_rigid_params(ndim, k, "random"))(
                jax.random.split(key, B)
            )
        if method == "separable":
            # ONE host readback of [B, 6] floats sizes the shared window from
            # the worst-case sample (random inits can need > S/4 —
            # tests/test_window_safety.py:37-43).
            p0_np = np.asarray(jax.device_get(params0), np.float64)
            windows = _cohort_windows(
                [rigid_theta_np(p) for p in p0_np], spatial, max_shift
            )
        run = _build_rigid_fn(tuple(criteria), tuple(w), float(lr), int(epochs),
                              optimizer, ndim, method, windows, srel,
                              int(patience)).run
        batched = _per_pair(run)
    elif mode == "affine":
        params0 = jnp.broadcast_to(
            identity_theta(ndim).reshape(-1), (B, ndim * (ndim + 1))
        )
        if method == "separable":
            windows = _cohort_windows(
                [np.asarray(identity_theta(ndim))], spatial, max_shift
            )
        run = _build_affine_fn(tuple(criteria), tuple(w), float(lr), int(epochs),
                               optimizer, ndim, method, windows, srel,
                               int(patience)).run
        batched = _per_pair(run)
    elif mode == "flow":
        if flow_model == "field":
            depth = 0  # no network; keep the build-cache key stable
        elif depth is None:
            depth = max_depth_for(movings.shape[2:])
        run, model, *_rest = _build_flow_fn(
            tuple(criteria), tuple(w), float(lr), int(epochs), float(stop_crit),
            optimizer, ndim, 1, float(n), int(depth),
            # canonical name (str() of a dtype CLASS breaks the builder)
            method, int(max_disp), jnp.dtype(dtype).name,
            flow_model=str(flow_model), smooth=float(smooth),
            stop_rel=srel, patience=int(patience),
        )
        if flow_model == "field":
            # Per-pair field params are the [1, d, *S] flow itself.
            params0 = jnp.zeros((B, 1, ndim) + spatial, jnp.float32)
        else:
            keys = jax.random.split(key, B)
            params0 = jax.jit(
                jax.vmap(lambda k, m: model.init(k, m[None])["params"])
            )(keys, movings)
        batched = _per_pair(run)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    if mesh is not None:
        sh = batch_sharding(mesh)
        movings = jax.device_put(movings, sh)
        targets = jax.device_put(targets, sh)
        params0 = jax.device_put(params0, sh)  # broadcast over pytree leaves
        out = jax.jit(batched)(movings, targets, params0)
    else:
        out = batched(movings, targets, params0)
    if mode == "flow":
        flow, _warped, losses, steps, converged, params, maxd = out
        if check_window and method == "separable":
            import warnings

            worst = float(np.max(np.asarray(jax.device_get(maxd))))
            if worst > max_disp:
                warnings.warn(
                    f"register_cohort: a recovered flow reaches {worst:.1f} "
                    f"voxels but the separable sweep window is "
                    f"max_disp={max_disp}; displacements beyond it contribute "
                    "zero (ops/separable.py:24-27). Raise max_disp or use "
                    "method='exact'.",
                    RuntimeWarning,
                    stacklevel=2,
                )
        return FlowResult(flow=flow, losses=losses, steps=steps,
                          converged=converged, params=params, max_disp=maxd)
    if check_window and method == "separable":
        from ..engines.common import check_sweep_windows_batch

        check_sweep_windows_batch(out.best_theta, spatial, windows,
                                  f"register_cohort ({mode})")
    return out
