"""Dense flow-field registration engine (VoxelMorph-style, per-pair optimized).

TPU-native redesign of reference ``flow_register`` (warpings.py:178-242): an
Attention U-Net predicts a dense displacement field for one image pair and is
optimized against the similarity stack by SGD. The whole optimization —
forward, warp, loss, backward, update, early-stop test — is ONE jitted
``lax.while_loop``; the reference's per-epoch ``error.item()`` host syncs
(warpings.py:220) disappear.

Reference semantics preserved:
- defaults ``lr=1e-3, max_epochs=2000, stop_crit=1e-4`` and the
  MSE+NCC+NMI/0.33 criterion stack (warpings.py:179);
- early stop when the *recorded* (pre-update) loss <= stop_crit, checked after
  the update (warpings.py:231-233);
- optional ``grad_edges`` pre-filter (warpings.py:199-202);
- ``deform`` re-applies the stored flow to arbitrary images
  (warpings.py:238-242) -> :func:`ops.resample.warp_flow`.

Documented divergences:
- the returned flow is computed from the *post-update* final parameters (the
  reference keeps the forward of the last step's pre-update parameters);
- loss history is returned (NaN-padded to ``max_epochs``);
- U-Net depth is clamped via ``max_depth_for`` for inputs too small for the
  reference topology (which crashes below ~140^3 in 3D).
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..losses import resolve_criteria, weighted_loss
from ..models.attention_unet import AttentionUNet, max_depth_for
from ..ops.edge import edge_filter
from ..ops.resample import warp_flow
from ..ops.separable import warp_flow_separable
from .common import make_optimizer


class FlowResult(NamedTuple):
    flow: jnp.ndarray  # [1, d, *S] voxel-unit displacement field
    losses: jnp.ndarray  # [max_epochs], NaN beyond the executed steps
    steps: jnp.ndarray  # number of optimizer steps executed
    converged: jnp.ndarray  # bool: stopped by stop_crit before max_epochs
    params: dict  # final U-Net parameters
    max_disp: jnp.ndarray | None = None  # max |flow| over the field (scalar)


def _diffusion_energy(flow: jnp.ndarray) -> jnp.ndarray:
    """Mean squared forward-difference of a flow ``[N, d, *S]`` — the standard
    VoxelMorph-style diffusion regularizer (sum over axes of ``|∂u/∂x_a|²``).
    Keeps a directly-optimized field smooth where the similarity term carries
    no signal (flat image regions)."""
    f = flow.astype(jnp.float32)
    total = 0.0
    for a in range(2, flow.ndim):
        n = flow.shape[a]
        d = jax.lax.slice_in_dim(f, 1, n, axis=a) - jax.lax.slice_in_dim(
            f, 0, n - 1, axis=a
        )
        total = total + jnp.mean(d * d)
    return total


@lru_cache(maxsize=32)
def _build_flow_fn(
    criteria: tuple,
    weights: tuple,
    lr: float,
    max_epochs: int,
    stop_crit: float,
    optimizer: str,
    ndim: int,
    in_c: int,
    n: float,
    depth: int,
    method: str = "separable",
    max_disp: int = 8,
    dtype: str = "float32",
    remat: bool = False,
    use_attention: bool = True,
    use_norm: bool = True,
    flow_model: str = "unet",
    smooth: float = 0.0,
    stop_rel: float | None = None,
    patience: int = 25,
):
    model = None
    if flow_model == "unet":
        model = AttentionUNet(ndim=ndim, in_c=in_c, n=n, depth=depth,
                              dtype=jnp.dtype(dtype),
                              use_attention=use_attention, use_norm=use_norm)
    loss = weighted_loss(criteria, weights)
    tx = make_optimizer(optimizer, lr)

    def warp(moving, flow):
        if method == "separable":
            return warp_flow_separable(moving, flow, max_disp=max_disp)
        return warp_flow(moving, flow)

    if flow_model == "field":
        # Direct dense-field parameterization (demons/ANTs-style test-time
        # optimization): the parameters ARE the displacement field. No
        # reference counterpart (the reference only offers the U-Net,
        # warpings.py:178-242); on TPU a field step is warp+losses only —
        # no network forward/backward — so it both runs ~an order of
        # magnitude faster per epoch and fits a *specific* deformation far
        # more directly than U-Net weights do.
        def predict_flow(params, moving):
            return params.astype(jnp.float32)

        # Field mode has no network to carry ``dtype`` — apply it to the
        # *image* side of each optimization step instead (sweep FMAs + loss
        # reductions run reduced; the field/optimizer state, coordinate math
        # and the finalize warp stay f32, and losses upcast at the
        # subtraction). Same contract as the cascade's ``matrix_dtype``.
        img_dt = jnp.dtype(dtype)

        def prep(x):
            return x.astype(img_dt)
    else:
        def predict_flow(params, moving):
            apply = lambda p, m: model.apply({"params": p}, m)  # [N, d, *S]
            if remat:
                # Trade ~30% step time for activation memory (needed e.g. for
                # a batch of 8 240^3 pairs on one 16 GB chip).
                apply = jax.checkpoint(apply)
            return apply(params, moving)

        def prep(x):  # the model's own dtype handles reduced compute
            return x

    def _loop(moving, target, carry, end):
        moving, target = prep(moving), prep(target)

        def loss_fn(params):
            flow = predict_flow(params, moving)
            warped = warp(moving, flow)
            sim = loss(target, warped)
            if smooth > 0.0:
                return sim + smooth * _diffusion_energy(flow)
            return sim

        grad_fn = jax.value_and_grad(loss_fn)

        def cond(carry):
            _, _, i, _, last, ref, since = carry
            go = (i < end) & (last > stop_crit)
            if stop_rel is not None:
                # Plateau stop (same semantics as the matrix engines,
                # engines/common.py): no stop_rel-relative improvement over
                # the reference loss for `patience` consecutive steps.
                go = go & (since < patience)
            return go

        def _body(carry):
            params, opt_state, i, losses, _, ref, since = carry
            loss_val, grads = grad_fn(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            losses = jax.lax.dynamic_update_slice(losses, loss_val[None], (i,))
            if stop_rel is not None:
                improved = loss_val < ref * (1.0 - stop_rel)
                ref = jnp.where(improved, loss_val, ref)
                since = jnp.where(improved, 0, since + 1)
            return params, opt_state, i + 1, losses, loss_val, ref, since

        return jax.lax.while_loop(cond, _body, carry)

    def make_carry(params0):
        return (
            params0,
            tx.init(params0),
            jnp.int32(0),
            jnp.full((max_epochs,), jnp.nan, jnp.float32),
            jnp.float32(jnp.inf),
            jnp.float32(jnp.inf),  # plateau reference loss
            jnp.int32(0),  # steps since stop_rel-relative improvement
        )

    def finalize(moving, carry):
        params, _, steps, losses, last, _ref, _since = carry
        flow = predict_flow(params, moving)
        warped = warp(moving, flow)  # method-consistent final warp
        converged = last <= stop_crit
        return flow, warped, losses, steps, converged, params, jnp.max(jnp.abs(flow))

    def run(moving, target, params0):
        carry = _loop(moving, target, make_carry(params0), jnp.int32(max_epochs))
        return finalize(moving, carry)

    # Segmented variant for host progress reporting: one compiled chunk
    # program re-invoked with a growing dynamic ``end`` (no retrace/segment).
    # make_carry is jitted too: eager optax.init dispatches one op per U-Net
    # leaf (~0.1-1 s each over remote transports).
    make_carry = jax.jit(make_carry)
    run_chunk = jax.jit(_loop)
    run_finalize = jax.jit(finalize)

    # Jitted param init: eager flax init dispatches hundreds of ops (very
    # costly over remote-device transports).
    if flow_model == "field":
        init_fn = jax.jit(
            lambda key, x: jnp.zeros((x.shape[0], ndim) + x.shape[2:],
                                     jnp.float32)
        )
    else:
        init_fn = jax.jit(lambda key, x: model.init(key, x)["params"])
    return jax.jit(run), model, init_fn, make_carry, run_chunk, run_finalize


def flow_register(
    moving: jnp.ndarray,
    target: jnp.ndarray,
    lr: float = 1e-3,
    max_epochs: int = 2000,
    stop_crit: float = 1e-4,
    n: float = 1,
    in_c: int = 1,
    criterions=None,
    weights=None,
    grad_edges: bool = False,
    optimizer: str = "sgd",
    depth: int | None = None,
    key=None,
    method: str = "separable",
    max_disp: int = 8,
    dtype: str = "float32",
    init_params=None,
    remat: bool = False,
    check_disp: bool = True,
    use_attention: bool = True,
    use_norm: bool = True,
    progress_every: int | None = None,
    flow_model: str = "unet",
    smooth: float = 0.0,
    stop_rel: float | None = None,
    patience: int = 25,
    zero_head: bool = False,
) -> tuple[jnp.ndarray, FlowResult]:
    """Deformable registration of ``moving [1, in_c, *S]`` onto ``target``.

    Returns ``(warped, FlowResult)``. Re-apply the recovered field to other
    images with ``warp_flow(x, result.flow)``. ``init_params`` warm-starts the
    U-Net — the weights are resolution-independent, so coarse-to-fine flow
    pyramids just continue optimizing the same parameters at finer levels.

    ``flow_model='field'`` optimizes the displacement field DIRECTLY
    (demons/ANTs-style; ``result.params`` is the field itself) instead of
    through U-Net weights — far faster per epoch (no network) and much better
    at recovering a specific deformation; pair it with ``smooth`` (diffusion
    regularizer weight, e.g. 0.1-1) since the field has no architectural
    smoothness prior. For field-mode warm starts across resolutions, upsample
    the field with ``utils.pyramid.upsample_flow`` before passing
    ``init_params``. ``n``/``depth``/``use_attention``/``use_norm`` are
    ignored in field mode; ``dtype`` there sets the *image-side* compute
    precision of each optimization step (sweep FMAs + loss reductions — the
    field, optimizer state, coordinate math and the returned final warp stay
    f32), mirroring the cascade's ``matrix_dtype`` contract.

    ``max_disp`` statically bounds the default separable warp's sweep window
    (the reference's exact ``F.grid_sample`` has no such bound —
    warpings.py:178-242); with ``check_disp`` the recovered field is checked
    against it post-run and a RuntimeWarning fires on overflow. Use
    ``method='exact'`` or a larger ``max_disp`` for large-displacement pairs.

    ``progress_every=N`` prints loss progress every N epochs — the TPU analog
    of the reference's tqdm bar + every-100-epoch prints (warpings.py:208,
    222-229): the loop runs as ONE compiled chunk program re-invoked with a
    moving end index (no retraces), paying one host sync per segment instead
    of one per epoch. Default None keeps the loop entirely on device.

    ``stop_rel``/``patience`` add plateau early-stopping (same semantics as
    the matrix engines): stop after ``patience`` consecutive steps without a
    ``stop_rel``-relative improvement. The reference's absolute
    ``stop_crit=1e-4`` (warpings.py:231-233) rarely fires in practice;
    plateau stopping is the useful device-side analog. Off by default.
    """
    if grad_edges:
        moving = edge_filter(moving)
        target = edge_filter(target)
    criteria, w = resolve_criteria(criterions, weights)
    ndim = moving.ndim - 2
    spatial = moving.shape[2:]
    if (
        flow_model == "unet"
        and jnp.dtype(dtype) == jnp.bfloat16
        and ndim == 3
        and max(spatial) >= 160
    ):
        # ndim == 3: the probed crash is a 3D-volume workload — 2D bf16
        # U-Nets at >=160 pixels are orders of magnitude smaller and were
        # never observed to crash; don't refuse configs beyond the evidence.
        # Probed twice on the axon v5e stack (hbm_ceiling.py, r4): a bf16
        # U-Net forward+backward at >=160^3 reproducibly CRASHES the TPU
        # worker process (UNAVAILABLE "worker crashed" — not an OOM the
        # client can catch). Refuse up front with provenance instead of
        # letting the user hit an opaque dead worker. f32 U-Net and bf16
        # field/matrix paths are unaffected.
        raise ValueError(
            f"flow_model='unet' with dtype='bfloat16' at spatial size "
            f"{spatial} (>=160 per axis) crashes the TPU worker process on "
            "this stack (probed twice; see BASELINE.md / CLAUDE.md). Use "
            "dtype='float32' for the U-Net at this size, flow_model='field' "
            "(whose bf16 path is safe), or a <160-voxel pyramid level."
        )
    if flow_model == "field":
        depth = 0  # no network; keep the build cache key stable
        if optimizer == "sgd" and lr <= 1e-2:
            # The unet-parity defaults (sgd, lr=1e-3) are a measured near-
            # no-op on a direct field: per-voxel gradients are ~1/numel-
            # scaled, so 150 SGD epochs move the field ~0.5% (api.py
            # resolves adam/lr=0.3 for field mode; the engine keeps its
            # reference-parity defaults but must not fail silently).
            import warnings

            warnings.warn(
                f"flow_register(flow_model='field') with optimizer='sgd' and "
                f"lr={lr:g}: SGD at unet-scale learning rates barely moves a "
                "direct field (measured ~0.5% RMSE reduction in 150 epochs). "
                "Use optimizer='adam' with lr~0.3 (the api.Register default "
                "for field mode), or raise lr substantially.",
                RuntimeWarning,
                stacklevel=2,
            )
    elif depth is None:
        depth = max_depth_for(spatial)
        if depth == 0:
            raise ValueError(f"volume {spatial} too small for the U-Net")
    run, model, init_fn, make_carry, run_chunk, run_finalize = _build_flow_fn(
        tuple(criteria), tuple(w), float(lr), int(max_epochs), float(stop_crit),
        optimizer, ndim, in_c, float(n), int(depth), method, int(max_disp),
        # canonical dtype name: str() of a dtype CLASS (jnp.bfloat16) is
        # "<class ...>", which jnp.dtype() inside the builder rejects
        jnp.dtype(dtype).name, bool(remat), bool(use_attention), bool(use_norm),
        str(flow_model), float(smooth),
        None if stop_rel is None else float(stop_rel), int(patience),
    )
    if key is None:
        key = jax.random.key(0)
    params0 = init_params if init_params is not None else init_fn(key, moving)
    if zero_head and flow_model == "unet" and init_params is None:
        # Zero-initialized flow head (VoxelMorph-style): the net predicts an
        # exactly-zero field at step 0, so residual optimization starts FROM
        # the incoming alignment instead of trashing it with lecun-init
        # noise. Used by the cascade's per-level flow composition; the
        # reference-parity default stays random (utils.py:553-555 is a
        # standard torch-init conv head).
        params0 = dict(params0)
        for k in ("out_kernel", "out_bias"):
            params0[k] = jnp.zeros_like(params0[k])
    if progress_every:
        carry = make_carry(params0)
        prev_done = -1
        for end in range(progress_every, max_epochs + progress_every,
                         progress_every):
            end = min(end, max_epochs)
            carry = run_chunk(moving, target, carry, jnp.int32(end))
            i_done, last = int(carry[2]), float(carry[4])
            if i_done == prev_done:
                # stop fired exactly at the previous segment boundary: this
                # chunk was a no-op — report without a duplicate progress line
                print(f"[flow_register] early stop at epoch {i_done}",
                      flush=True)
                break
            prev_done = i_done
            print(f"[flow_register] epoch {i_done}/{max_epochs} "
                  f"loss={last:.6g}", flush=True)
            if i_done < end or last <= stop_crit:
                # name the actual cause: stop_crit (reference parity) vs the
                # plateau stop_rel extension — the old line claimed
                # "loss <= stop_crit" for both
                cause = (f"loss <= {stop_crit:g}" if last <= stop_crit
                         else f"plateau (stop_rel={stop_rel}, "
                              f"patience={patience})")
                print(f"[flow_register] stopped at epoch {i_done} ({cause})",
                      flush=True)
                break
        flow, warped, losses, steps, converged, params, maxd = run_finalize(
            moving, carry
        )
    else:
        flow, warped, losses, steps, converged, params, maxd = run(
            moving, target, params0
        )
    if check_disp and method == "separable" and not isinstance(maxd, jax.core.Tracer):
        import warnings

        maxd_host = float(jax.device_get(maxd))
        if maxd_host > max_disp:
            warnings.warn(
                f"flow_register: recovered flow reaches {maxd_host:.1f} voxels "
                f"but the separable sweep window is max_disp={max_disp}; "
                "displacements beyond it contribute zero "
                "(ops/separable.py:24-27). Raise max_disp or use "
                "method='exact'.",
                RuntimeWarning,
                stacklevel=2,
            )
    return warped, FlowResult(flow=flow, losses=losses, steps=steps,
                              converged=converged, params=params,
                              max_disp=maxd)
