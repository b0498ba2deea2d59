"""Rigid -> affine -> flow cascade (the README driver program, productized).

The reference's canonical pipeline is a hand-written script: run rigid, warp,
detach, run affine on the result, warp, detach, run flow (README.md:58-88;
SURVEY.md §3.5). This module is that pipeline as one call, with TPU-first
upgrades the reference can't express:

- **multi-resolution pyramid**: matrix stages optimize coarse levels first
  (thetas live in normalized coords, so they transfer across levels
  unchanged);
- **residual optimization**: at each level the moving image is warped once
  with the accumulated theta and only a near-identity *residual* transform is
  optimized, then composed (``theta <- theta ∘ residual``). This keeps every
  sweep-resampler displacement window small and statically bounded, so the
  whole inner loop stays a single fused XLA kernel chain (see
  ops/separable.py);
- **bounded resample count**: stages hand off matrices, not images — the
  moving image is resampled once per level, not once per stage per epoch.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.resize import downsample_avg
# the unchecked core: engine thetas evolve from near-identity (well-
# conditioned factorization) and support overflow is covered by
# check_sweep_windows; the public wrapper's host-side pivot check would
# add a ~0.8 s readback per eager call on remote transports
from ..ops.separable import _warp_affine_separable as warp_affine_separable
from ..ops.separable import warp_flow_separable
from ..ops.transforms import compose_theta, identity_theta
from ..utils.pyramid import (
    build_pyramid,
    compose_flows,
    compose_flows_separable,
    upsample_flow,
)
from .affine import affine_register
from .flow import flow_register
from .rigid import rigid_register


def make_cascade_fn(**config):
    """Build a fully-jitted cascade: ``fn(moving, target) -> CascadeResult``.

    The whole rigid→affine→flow pipeline — every pyramid level, engine loop,
    re-warp and composition — compiles into ONE XLA program: one dispatch, one
    device round-trip. (The plain :func:`register_cascade` issues ~25 separate
    jitted calls, each paying dispatch latency — painful on remote-device
    transports.) ``config`` takes the same keyword arguments as
    :func:`register_cascade`; all must be hashable (use tuples for lists).
    """
    import jax as _jax

    key = tuple(sorted(config.items()))
    fn = _CASCADE_CACHE.get(key)
    if fn is None:
        def fn_inner(moving, target):
            return register_cascade(moving, target, **config)

        fn = _jax.jit(fn_inner)
        _CASCADE_CACHE[key] = fn
    return fn


_CASCADE_CACHE: dict = {}


def make_cascade_batch_fn(mesh=None, spatial_axis=None, **config):
    """Batched (and optionally mesh-sharded) cascade:
    ``fn(movings [B,1,*S], targets [B,1,*S]) -> CascadeResult`` with a leading
    batch axis on every field — BASELINE config #5 ("batched cascade via
    vmap"). Pairs are independent, so with a ``mesh`` the batch axis shards
    over its ``data`` axis with zero collectives.

    ``spatial_axis`` (with a 2-D ``data x space`` mesh) additionally shards
    that spatial dimension of every volume over the mesh's ``space`` axis —
    XLA GSPMD inserts the halo exchanges the sweep warps and pyramid convs
    need at shard boundaries. This is the full product path sharded: the same
    ``register_cascade`` program, one SPMD compile.
    """
    import jax as _jax

    def one(mov, tgt):
        return register_cascade(mov[None], tgt[None], **config)

    batched = _jax.vmap(one)

    if mesh is None:
        if spatial_axis is not None:
            raise ValueError(
                "spatial_axis requires a mesh with a 'space' axis — without "
                "one the batch would run unsharded and silently ignore it"
            )
        return _jax.jit(batched)

    from ..parallel.mesh import batch_sharding, cohort_sharding

    jitted = _jax.jit(batched)  # hoisted: one callable, C++ fastpath dispatch

    def run(movings, targets):
        if spatial_axis is None:
            sh = batch_sharding(mesh)
        else:
            sh = cohort_sharding(mesh, ndim=movings.ndim - 2,
                                 spatial_axis=spatial_axis)
        movings = _jax.device_put(movings, sh)
        targets = _jax.device_put(targets, sh)
        return jitted(movings, targets)

    return run


class CascadeResult(NamedTuple):
    warped: jnp.ndarray  # final registered image
    theta: jnp.ndarray  # composed rigid∘affine matrix [1, d, d+1]
    flow: Optional[jnp.ndarray]  # dense field (None if no flow stage)
    rigid_losses: Optional[jnp.ndarray]
    affine_losses: Optional[jnp.ndarray]
    flow_losses: Optional[jnp.ndarray]


def _level_warp(theta, moving_level, exact: bool):
    if exact:
        # Blocked exact resampler where theta is concrete (eager cascade);
        # falls back to the element-gather path under tracing.
        from ..ops.blocked import warp_affine_fast

        return warp_affine_fast(theta, moving_level)
    # Full-transform re-warp: window must cover the whole displacement.
    S = max(moving_level.shape[2:])
    return warp_affine_separable(theta, moving_level, max_shift=max(8, S // 3))


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
    n: float = 8,  # U-Net width divisor; channels >= 8 tile the TPU lanes —
    # the reference's n=32 (2-channel base) hits a 16x layout-padding blowup
    flow_depth: int | None = None,
    seed: int = 0,
    residual_shift: int = 8,
    final_warp: str = "separable",
    flow_max_size: int = 160,
    flow_dtype: str = "float32",
    level_decay: float = 2.0,
    flow_remat: bool = False,
    flow_max_disp: int = 8,
    matrix_dtype: str = "float32",
    flow_attention: bool = True,
    flow_norm: bool = True,
    matrix_stop_rel: float | None = None,
    matrix_patience: int = 25,
    matrix_levels: int | None = None,
    matrix_optimizer: str | None = None,
    moment_init: bool | str = False,
    flow_model: str = "field",
    flow_smooth=None,
    flow_stop_rel: float | None = None,
    flow_patience: int = 25,
    flow_compose: bool = True,
    flow_levels: int | None = None,
    flow_criterions=None,
    flow_rebase: bool = False,
    flow_residual_disp: int = 4,
) -> CascadeResult:
    """Coarse-to-fine rigid→affine→flow registration of one pair.

    Epoch budgets default to the README recipe (500/200/100,
    README.md:59-82); with ``levels > 1`` the matrix stages split their budget
    evenly across pyramid levels. ``residual_shift`` is the static sweep bound
    (voxels) for the per-level residual optimizations — the coarsest level
    additionally gets a window covering a quarter of its extent.
    ``final_warp='exact'`` produces a grid_sample-identical output resample at
    the cost of one slow XLA gather pass.

    ``matrix_levels`` (default: all ``levels``) restricts the rigid/affine
    stages to the coarsest N pyramid levels. Thetas live in normalized
    coordinates, so a matrix fitted at half resolution applies unchanged at
    full resolution — and a 6/12-parameter global transform rarely gains from
    full-resolution gradients, while a fine-level step costs 8x a mid-level
    one. The flow stage (and the final full-resolution warp) are unaffected.

    ``flow_model`` defaults to ``'field'`` (direct dense-field optimization):
    measured on the deformable-truth control it recovers ~97% of a known
    smooth deformation where the reference-parity U-Net path caps at 54-76%
    (BASELINE.md). ``flow_smooth=None`` resolves per model: 0.5 (the bench
    recipe's diffusion weight) for ``'field'``, 0.0 for ``'unet'`` so the
    parity path's loss stays exactly the reference's. A tuple sets the
    diffusion weight PER flow pyramid level (coarse -> fine; fine levels
    usually want less smoothing — the coarse level already pinned the bulk
    displacement).

    ``flow_levels`` (default ``min(2, levels)``) sets the flow stage's own
    mini-pyramid depth (validated: >= 1, clamped so the coarsest level keeps
    >= 8 voxels per axis); ``flow_criterions`` (default: ``criterions``)
    overrides the similarity stack for the flow stage only (e.g. ``('lncc',)``
    where locally-normalized gradients help the fine field).

    ``flow_rebase=True`` (field mode only) restructures the finer flow levels
    as *residual* fields: each level first warps its input once with the
    upsampled total field (one wide-window one-shot warp sized to the
    worst-case composed magnitude — upsampling doubles voxel magnitudes per
    level), then optimizes a zero-initialized residual under the much
    smaller ``flow_residual_disp`` window, and composes
    ``total <- residual ∘ total``. The hot fine-level sweep shrinks from
    ``2*flow_max_disp+1`` to ``2*flow_residual_disp+1`` terms per axis per
    step for the price of one extra full-window warp + one small-window
    compose per level. The recoverable deformation contract is unchanged
    (``flow_max_disp`` full-res voxels); per-level *corrections* beyond
    ``flow_residual_disp`` voxels are out of window.

    Measured (r5, benchmarks/tune_rebase.py, bench recipe at 240³): a
    QUALITY lever, not a speed one — deform-gate 97.93→98.14% and
    observable field error 0.429→0.386 vox (rd=3/4/5 identical), but
    0.223→0.39-0.44 s per cascade: each zero-init residual restarts the
    fine level's plateau trajectory, so executed steps grow more than the
    smaller window saves. Default off.

    ``matrix_optimizer`` (default: ``optimizer``) selects the rigid/affine
    stages' optimizer independently of the flow stage — ``'lm'`` runs damped
    Newton (engines/second_order.py) on the 6/12-parameter matrix problems,
    where ``rigid_epochs``/``affine_epochs`` then count LM iterations.
    ``moment_init=True`` (or ``'com'``) seeds the coarsest rigid level with
    the closed-form center-of-mass translation (ops/moments.py) instead of
    identity; ``'pa'`` additionally matches the principal-axes rotation
    (covariance eigenframes, skewness-disambiguated), falling back to CoM
    on near-isotropic/symmetric volumes where the frame is unobservable.
    """
    moving = jnp.asarray(moving, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    ndim = moving.ndim - 2
    m_opt = optimizer if matrix_optimizer is None else matrix_optimizer
    if flow_smooth is None:
        flow_smooth = 0.5 if flow_model == "field" else 0.0
    if flow_criterions is None:
        flow_criterions = criterions

    mov_pyr = build_pyramid(moving, levels)
    tgt_pyr = build_pyramid(target, levels)
    if matrix_dtype != "float32":
        # bf16 matrix-stage compute: halves the sweep's HBM traffic. Theta
        # params/updates stay f32 (optimizer state + coordinate math); only
        # the image FMAs and loss reductions run reduced.
        mdt = jnp.dtype(matrix_dtype)
        mov_pyr = [m.astype(mdt) for m in mov_pyr]
        tgt_pyr = [t.astype(mdt) for t in tgt_pyr]

    theta = identity_theta(ndim)[None]
    rigid_losses = affine_losses = flow_losses = None
    scale = 1
    if matrix_levels is not None and matrix_levels < 1:
        raise ValueError(
            f"matrix_levels must be >= 1 (got {matrix_levels}): the matrix "
            "stages need at least the coarsest pyramid level"
        )
    if moment_init not in (False, True, "com", "pa"):
        # A typo like 'PA' or 'principal' would otherwise pass the truthiness
        # checks below and silently run the CoM-only init.
        raise ValueError(
            f"moment_init must be False, True, 'com', or 'pa' "
            f"(got {moment_init!r})"
        )
    m_levels = levels if matrix_levels is None else min(matrix_levels, levels)

    def level_shift(i, mov_l):
        if i == 0:  # coarsest level sees the full initial misalignment
            S = max(mov_l.shape[2:])
            if moment_init == "pa" and "rigid" in stages:
                # PA init exists for LARGE-rotation misalignments: a seeded
                # ~90-degree rotation displaces corner voxels by up to ~S per
                # axis, far beyond the S/4 near-identity worst case, and
                # check_window=False means overflow would zero support
                # silently. S/2+4 covers rotations to ~60-90 degrees;
                # coarsest level only, and only when 'pa' is requested.
                # Rotations beyond that need method='exact' or the direct
                # engines with their init-derived auto windows.
                return max(residual_shift, S // 2 + 4)
            if (
                moment_init and moment_init != "pa" and ndim == 3
                and "rigid" in stages
            ):
                # CoM init pre-matches the bulk translation, so the theta the
                # coarse level optimizes stays near the init; the sweep still
                # applies the FULL theta, whose tanh-bounded translation is
                # <= 0.25 normalized = S/8 voxels — cover that plus rotation
                # margin instead of the S/4 worst case (the sweep's term
                # count, not its bytes, is the rigid stage's cost — roofline
                # r5: 2.2% of HBM peak). The S/8 bound is the 3D rigid
                # parameterization's (ops/transforms.py 0.25*tanh); 2D
                # translations are raw/unbounded and 'pa' seeds large
                # rotations, so both keep the S/4 worst-case window.
                return max(residual_shift, S // 8 + 4)
            return max(residual_shift, S // 4)
        return residual_shift

    def level_budgets(total, nlevels=None):
        """Geometric epoch split favoring coarse levels (a fine-level step
        costs ~2^d x more than the level below; coarse levels do the
        alignment, fine levels polish). ``level_decay`` sets the ratio."""
        nlevels = levels if nlevels is None else nlevels
        weights = [level_decay ** (nlevels - 1 - i) for i in range(nlevels)]
        s = sum(weights)
        return [max(1, int(round(total * w / s))) for w in weights]

    if "rigid" in stages:
        budgets = level_budgets(rigid_epochs, m_levels)
        losses = []
        for i, (mov_l, tgt_l) in enumerate(
            zip(mov_pyr[:m_levels], tgt_pyr[:m_levels])
        ):
            base = _level_warp(theta, mov_l, exact=False) if i else mov_l
            init_params = None
            if i == 0 and moment_init:
                # Closed-form moment init (ops/moments.py): fused reduction
                # passes per volume; the iterative stage then starts with the
                # bulk shift (and, for 'pa', the principal-axes rotation)
                # already matched. moment_init=True/'com' -> CoM translation;
                # 'pa' -> principal axes + CoM (falls back to CoM on
                # near-isotropic/symmetric volumes).
                from ..ops.moments import com_rigid_params, pa_rigid_params

                if moment_init == "pa":
                    init_params = pa_rigid_params(base, tgt_l)
                else:
                    init_params = com_rigid_params(base, tgt_l)
            _, res = rigid_register(
                base, tgt_l, lr=rigid_lr, epochs=budgets[i],
                criterions=list(criterions), weights=weights, grad_edges=False,
                optimizer=m_opt, init="identity", init_params=init_params,
                stop_rel=matrix_stop_rel, patience=matrix_patience,
                max_shift=level_shift(i, mov_l), key=jax.random.key(seed),
                check_window=False,  # windows sized explicitly per level; the
                # check's device_get would add a ~0.8 s host sync per level
                # on remote transports
            )
            theta = compose_theta(theta, res.best_theta)
            losses.append(res.losses)
        rigid_losses = jnp.concatenate(losses)

    if "affine" in stages:
        budgets = level_budgets(affine_epochs, m_levels)
        losses = []
        for i, (mov_l, tgt_l) in enumerate(
            zip(mov_pyr[:m_levels], tgt_pyr[:m_levels])
        ):
            base = _level_warp(theta, mov_l, exact=False)
            _, res = affine_register(
                base, tgt_l, lr=affine_lr, epochs=budgets[i],
                criterions=list(criterions), weights=weights, grad_edges=False,
                optimizer=m_opt,
                stop_rel=matrix_stop_rel, patience=matrix_patience,
                max_shift=level_shift(i if "rigid" not in stages else levels, mov_l),
                check_window=False,  # see rigid stage note
            )
            theta = compose_theta(theta, res.best_theta)
            losses.append(res.losses)
        affine_losses = jnp.concatenate(losses)

    # One full-resolution resample through the composed matrix transform.
    warped = _level_warp(theta, moving, exact=(final_warp == "exact"))

    flow = None
    if "flow" in stages:
        # Flow fields are smooth: for volumes beyond ``flow_max_size`` the
        # U-Net optimization runs at up to half resolution with its own
        # coarse-to-fine mini-pyramid — the U-Net weights are resolution-
        # independent, so coarse levels warm-start fine ones. Half-res also
        # avoids XLA layout blowups for narrow full-res decoder tensors.
        flow_in, flow_tgt = warped, target
        while max(flow_in.shape[2:]) > flow_max_size:
            flow_in = downsample_avg(flow_in, 2)
            flow_tgt = downsample_avg(flow_tgt, 2)
            scale *= 2
        if flow_levels is None:
            flow_levels = min(2, levels)
        if flow_levels < 1:
            raise ValueError(
                f"flow_levels must be >= 1 (got {flow_levels}): the flow "
                "stage needs at least one pyramid level"
            )
        if flow_rebase and flow_model != "field":
            raise ValueError(
                "flow_rebase=True requires flow_model='field' (unet mode "
                "already composes residuals via flow_compose)"
            )
        if flow_rebase and not 1 <= flow_residual_disp <= flow_max_disp:
            raise ValueError(
                f"flow_residual_disp must be in [1, flow_max_disp="
                f"{flow_max_disp}] (got {flow_residual_disp})"
            )
        # Clamp the depth so the coarsest level keeps >= 8 voxels per axis —
        # deeper pyramids would build degenerate levels the warp can't use.
        import math

        min_s = min(flow_in.shape[2:])
        requested_levels = flow_levels
        flow_levels = min(
            flow_levels, max(1, int(math.log2(max(1, min_s // 8))) + 1)
        )
        f_pyr_in = build_pyramid(flow_in, flow_levels)
        f_pyr_tgt = build_pyramid(flow_tgt, flow_levels)
        smooths = (
            tuple(flow_smooth)
            if isinstance(flow_smooth, (tuple, list))
            else (float(flow_smooth),) * flow_levels
        )
        if len(smooths) == requested_levels and flow_levels < requested_levels:
            # The depth clamp dropped coarse levels (small volume); a smooth
            # schedule sized to the REQUESTED count would otherwise raise a
            # confusing error naming a level count the caller never passed.
            # The pyramid keeps its finest levels, so keep the tail entries.
            smooths = smooths[-flow_levels:]
        if len(smooths) != flow_levels:
            raise ValueError(
                f"flow_smooth tuple has {len(smooths)} entries for "
                f"{flow_levels} flow levels"
            )
        if flow_depth is None and flow_model == "unet":
            # One depth across levels: warm-starting requires an identical
            # parameter structure, so clamp to the coarsest level's maximum.
            from ..models.attention_unet import max_depth_for

            flow_depth = max_depth_for(f_pyr_in[0].shape[2:])
        budgets = level_budgets(flow_epochs, flow_levels)
        params = None
        total_flow = None  # U-Net composition carry (voxel units, level grid)
        losses = []
        for li, ((f_in, f_tgt), eps) in enumerate(
            zip(zip(f_pyr_in, f_pyr_tgt), budgets)
        ):
            base_in = f_in
            level_disp = flow_max_disp
            if flow_model == "field" and params is not None:
                # Field-mode warm start: the params ARE the flow — upsample
                # (with voxel-unit rescale) to the next level's grid and keep
                # optimizing the same total field.
                params = upsample_flow(params, f_in.shape[2:])
                if flow_rebase:
                    # Residual rebase: spend ONE wide-window warp to bake the
                    # total-so-far into the level input, then optimize a
                    # zero-init residual under the small window — the hot
                    # per-step sweep shrinks from 2*flow_max_disp+1 to
                    # 2*flow_residual_disp+1 terms per axis (docstring above).
                    # The one-shot warp's window must cover the WORST-CASE
                    # upsampled composite (each upsample doubles voxel
                    # magnitudes): coarse window f doubled li times plus the
                    # doubled residual slack — out-of-window parts of a
                    # one-shot warp are zeroed permanently (unlike the
                    # warm-start path's self-correcting in-loop window).
                    # One wide warp per level; not a per-step cost.
                    total_flow = params
                    # (this branch only runs at li >= 1, where 2^li - 2 >= 0)
                    rebase_win = (
                        flow_max_disp * 2**li
                        + flow_residual_disp * (2**li - 2)
                    )
                    base_in = warp_flow_separable(
                        f_in, total_flow, max_disp=rebase_win
                    )
                    params = None
                    level_disp = flow_residual_disp
            elif flow_model == "unet" and flow_compose and total_flow is not None:
                # U-Net residual COMPOSITION (vs the r2 weight warm-start):
                # warp the level input with the flow recovered so far and fit
                # a fresh network to the *residual* deformation, then compose
                # the fields. A U-Net re-predicting the FULL flow at the fine
                # level recovers only 54-76% of a known smooth deformation
                # (BASELINE.md deformable-truth control) — splitting the
                # displacement across levels keeps each network's target
                # small. One rebase warp per level (inside the jitted
                # program; 2 levels -> 1 rebase) — separable sweep, not the
                # element-gather warp_flow: XLA gather runs ~1.1e8 elem/s on
                # v5e (~0.1 s per 120^3 rebase), the sweep is ~3-7 ms. The
                # window covers the composed magnitude: each coarser level
                # contributes <= flow_max_disp at its own grid, doubled per
                # upsample (r4 ADVICE) — summed over levels 0..li-1 that is
                # flow_max_disp * (2^(li+1) - 2) at this level's grid (for
                # li=1 the same 2x window as before; li>=2 needs more).
                total_flow = upsample_flow(total_flow, f_in.shape[2:])
                base_in = warp_flow_separable(
                    f_in, total_flow,
                    max_disp=flow_max_disp * (2 ** (li + 1) - 2),
                )
                params = None  # fresh net: the residual target changed
            _, fres = flow_register(
                base_in, f_tgt, lr=flow_lr, max_epochs=eps,
                criterions=list(flow_criterions), weights=weights, n=n,
                depth=flow_depth, optimizer=optimizer,
                key=jax.random.key(seed), dtype=flow_dtype,
                init_params=params, remat=flow_remat,
                max_disp=level_disp,
                use_attention=flow_attention, use_norm=flow_norm,
                flow_model=flow_model, smooth=smooths[li],
                stop_rel=flow_stop_rel, patience=flow_patience,
                # composition levels start from the composed-so-far
                # alignment: a lecun-init head would trash it at step 0
                zero_head=(flow_model == "unet" and flow_compose),
                check_disp=False,  # per-level readbacks would serialize the
                # eager cascade; ONE end-of-run check below covers the final
                # field against the final warp's window
            )
            params = fres.params
            if flow_model == "unet" and flow_compose:
                # applying total_flow then fres.flow == applying the composite
                total_flow = (
                    fres.flow if total_flow is None
                    else compose_flows(total_flow, fres.flow)
                )
            elif flow_model == "field" and flow_rebase and total_flow is not None:
                # Fold the residual back into the running total (same
                # "applied total, then residual" order as the unet branch) so
                # the next level's warm start — and the final warp — see the
                # composite field. Separable compose: the resample
                # displacement is the residual itself, so the small window
                # suffices (an element-gather compose would cost ~0.4 s at
                # 240^3 — more than the whole flow stage).
                total_flow = compose_flows_separable(
                    total_flow, fres.flow, max_disp=flow_residual_disp
                )
                params = total_flow
            losses.append(fres.losses)
        flow = total_flow if total_flow is not None else fres.flow
        flow_losses = jnp.concatenate(losses)
        if scale > 1:
            flow = upsample_flow(flow, warped.shape[2:])
        # A composed multi-level U-Net flow grows by up to 2^(flow_levels-1):
        # each coarser level's contribution doubles per upsample (r4 ADVICE —
        # under make_cascade_fn the end-of-run overflow check is a tracer
        # no-op, so windows must be sized statically).
        if flow_model == "unet" and flow_compose:
            # Composed magnitude model (comment at the rebase warp above):
            # level j contributes <= flow_max_disp * 2^(L-1-j) at the finest
            # flow grid — summed, flow_max_disp * (2^L - 1).
            final_bound = flow_max_disp * scale * (2**flow_levels - 1)
        elif flow_model == "field" and flow_rebase:
            # Worst-case composed total at the finest flow grid: the coarse
            # level can reach its full window f at its own grid (doubled per
            # upsample -> f*2^(L-1)), and the level-li residual (<= rd at its
            # grid) doubles per remaining upsample -> rd*(2^(L-1)-1) summed.
            final_bound = (
                flow_max_disp * 2 ** (flow_levels - 1)
                + flow_residual_disp * (2 ** (flow_levels - 1) - 1)
            ) * scale
        else:
            final_bound = flow_max_disp * scale
        if final_warp == "exact":
            from ..ops.blocked import warp_flow_fast

            warped = warp_flow_fast(warped, flow)
        else:
            # The upsampled flow's magnitudes scale with the zoom — the final
            # sweep window must too, or large displacements get zeroed.
            warped = warp_flow_separable(warped, flow, max_disp=final_bound)

    # One end-of-run overflow check for the eager path (a single host sync,
    # instead of the per-level checks the inner engine calls skip): warn if
    # the composed theta or the recovered flow outgrew the final separable
    # windows — no silent zero-support. Under make_cascade_fn everything is a
    # tracer and the checks are no-ops.
    if final_warp != "exact" and not isinstance(theta, jax.core.Tracer):
        from .common import check_sweep_windows

        final_window = max(8, max(moving.shape[2:]) // 3)
        check_sweep_windows(theta, moving.shape[2:], final_window,
                            "register_cascade (composed theta)")
        if flow is not None:
            import warnings

            maxd = float(jnp.max(jnp.abs(flow)))
            bound = final_bound
            if maxd > bound:
                warnings.warn(
                    f"register_cascade: recovered flow reaches {maxd:.1f} "
                    f"voxels but the final sweep window is {bound}; "
                    "displacements beyond it contribute zero "
                    "(ops/separable.py:24-27). Raise flow_max_disp or use "
                    "final_warp='exact'.",
                    RuntimeWarning,
                    stacklevel=2,
                )

    return CascadeResult(
        warped=warped, theta=theta, flow=flow,
        rigid_losses=rigid_losses, affine_losses=affine_losses,
        flow_losses=flow_losses,
    )
