"""Benchmark: full rigid→affine→flow cascade on a 240^3 pair, one chip.

Prints ONE JSON line:
  {"metric": "cascade_240_registrations_per_min", "value": ..., "unit":
   "registrations/min", "vs_baseline": ...}

Baseline: the BASELINE.json north star — a full cascade on a 1x1x240^3 pair in
<10 s on one v5e chip, i.e. 6 registrations/min. ``vs_baseline`` > 1 beats it.
Recipe: README epoch budgets (rigid 500, affine 200, flow 100 —
reference README.md:59-82) with a 3-level pyramid for the matrix stages and
the MSE+NCC criterion stack.
"""
from __future__ import annotations

import json
import time

import numpy as np


def make_pair(shape=(240, 240, 240), seed=0):
    import jax.numpy as jnp

    from torchregister_tpu.ops.resample import warp_affine
    from torchregister_tpu.ops.transforms import rigid_theta

    rng = np.random.default_rng(seed)
    grids = np.meshgrid(
        *[np.linspace(-1, 1, s, dtype=np.float32) for s in shape], indexing="ij"
    )
    vol = np.zeros(shape, np.float32)
    for _ in range(8):
        c = rng.uniform(-0.5, 0.5, 3)
        w = rng.uniform(0.1, 0.35)
        vol += np.exp(
            -sum((g - ci) ** 2 for g, ci in zip(grids, c)) / (2 * w**2)
        ).astype(np.float32)
    moving = jnp.asarray(vol[None, None])
    true = rigid_theta(jnp.asarray([0.06, -0.04, 0.05, 0.2, -0.15, 0.1], jnp.float32))
    target = warp_affine(true[None], moving)
    return moving, target


def pallas_selftest() -> str:
    """Value-equality gate for the compiled Pallas kernels (sweep + conv).

    CI exercises the kernels only in CPU interpret mode; benchmarks exercise
    the TPU-compiled kernels but measure speed, not values. This runs each
    compiled kernel against its XLA oracle on bench-scale shapes (one bad
    lane rotation would ship silently otherwise).
    """
    import jax
    import jax.numpy as jnp

    from torchregister_tpu.ops.pallas.conv3d import conv3x3x3
    from torchregister_tpu.ops.pallas.sweep import sweep_lastaxis
    from torchregister_tpu.ops.separable import _sweep_fori

    try:
        R, S, K = 1024, 240, 80
        key = jax.random.key(42)
        src = jax.random.uniform(key, (R, S), jnp.float32)
        # coordinates spanning the whole window incl. out-of-range edges
        q = (
            jnp.arange(S, dtype=jnp.float32)[None, :]
            + jax.random.uniform(jax.random.key(7), (R, S), minval=-K - 2.0, maxval=K + 2.0)
        )
        got = sweep_lastaxis(src, q, K)
        want = _sweep_fori(src[None, None], q[None, None], 1, K)[0, 0]
        err = float(jnp.max(jnp.abs(got - want)))
        if err >= 1e-5:
            return f"fail:sweep_maxdiff={err:.3e}"
    except Exception as e:  # pragma: no cover - only on kernel regression
        return f"fail:sweep_{type(e).__name__}"

    try:
        from torchregister_tpu.ops.blocked import warp_affine_roi
        from torchregister_tpu.ops.resample import warp_affine as _warp_exact
        from torchregister_tpu.ops.transforms import rigid_theta as _rt

        mv = jax.random.uniform(jax.random.key(3), (1, 1, 50, 47, 44), jnp.float32)
        th = _rt(jnp.asarray([0.15, -0.12, 0.1, 0.12, -0.08, 0.06], jnp.float32))[None]
        got = warp_affine_roi(th, mv)
        if got is None:
            return "fail:roi_declined"
        want = _warp_exact(th, mv)
        err = float(jnp.max(jnp.abs(got - want)))
        if err >= 1e-4:
            return f"fail:roi_maxdiff={err:.3e}"
    except Exception as e:  # pragma: no cover - only on kernel regression
        return f"fail:roi_{type(e).__name__}"

    try:
        x = jax.random.normal(jax.random.key(1), (8, 40, 60, 70), jnp.float32)
        w = jax.random.normal(jax.random.key(2), (3, 3, 3, 8, 8), jnp.float32) * 0.2
        got = conv3x3x3(x, w)
        want = jax.lax.conv_general_dilated(
            x[None], w.transpose(4, 3, 0, 1, 2), (1, 1, 1), "VALID",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            precision=jax.lax.Precision.HIGHEST,
        )[0]
        rel = float(jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-9))
        if rel >= 1e-4:
            return f"fail:conv_relerr={rel:.3e}"
    except Exception as e:  # pragma: no cover - only on kernel regression
        return f"fail:conv_{type(e).__name__}"
    return "pass"


def make_flow_truth_pair(shape=(240, 240, 240), seed=1, max_disp=7.0,
                         rigid=(0.05, -0.03, 0.04, 0.12, -0.1, 0.08)):
    """Deformable ground-truth pair: a known band-limited smooth flow composed
    with a known rigid theta (the control that the headline isn't a rigid-only
    artifact — reference README.md:76-93 showcases exactly this scenario).

    Returns ``(moving, target, theta_true, flow_true)`` with
    ``target(x) = moving(A_true(x + f_true(x)))`` — the same sampling-map
    structure the cascade's recovered (theta, flow) pair applies, so the two
    total maps are directly comparable voxel-for-voxel.
    """
    import jax
    import jax.numpy as jnp

    from torchregister_tpu.ops.resample import warp_affine, warp_flow
    from torchregister_tpu.ops.transforms import rigid_theta

    moving, _ = make_pair(shape, seed=seed)
    rng = np.random.default_rng(seed + 17)
    coarse = rng.normal(size=(3, 6, 6, 6)).astype(np.float32)
    flow = jax.image.resize(jnp.asarray(coarse), (3,) + shape, method="cubic")
    flow = flow * (max_disp / jnp.max(jnp.abs(flow)))
    flow_true = flow[None]
    theta_true = rigid_theta(jnp.asarray(rigid, jnp.float32))[None]
    target = warp_flow(warp_affine(theta_true, moving), flow_true)
    return moving, target, theta_true, flow_true


def total_sampling_map(theta, flow, spatial):
    """``phi(x) = A(x + f(x))`` in index space ``[3, *S]`` — the voxel-level
    source coordinate of the affine∘flow composition both the generator and
    the cascade's applier use (warp order: affine resample, then flow)."""
    import jax.numpy as jnp

    from torchregister_tpu.ops.separable import affine_to_index_map

    d = len(spatial)
    ident = jnp.stack(
        jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in spatial],
                     indexing="ij")
    )
    y = ident if flow is None else ident + flow[0]
    M, t = affine_to_index_map(theta[0], spatial, align_corners=False)
    return (
        jnp.einsum("ij,j...->i...", M, y)
        + t.reshape((d,) + (1,) * d)
    )


def flow_truth_metrics(res, moving, target, theta_true, flow_true):
    """``(rmse_reduction_pct, field_err_vox, field_err_observable_vox)``.

    ``field_err_observable_vox`` is the foreground-mean |component of the
    map error ALONG the local image gradient| — the part any intensity
    criterion can see. The tangential remainder is the aperture problem
    (motion along intensity level sets produces zero image change); tracking
    the observable component regression-proofs the r4 closure argument
    (benchmarks/probe_field_floor.py, r4 VERDICT #3).
    """
    import jax.numpy as jnp

    spatial = moving.shape[2:]
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((res.warped - target) ** 2)))
    phi_true = total_sampling_map(theta_true, flow_true, spatial)
    phi_rec = total_sampling_map(res.theta, res.flow, spatial)
    fg = target[0, 0] > 0.1 * float(jnp.max(target))
    e = phi_rec - phi_true
    err = jnp.linalg.norm(e, axis=0)
    g = jnp.stack(jnp.gradient(target[0, 0]))
    gn = g / (jnp.linalg.norm(g, axis=0, keepdims=True) + 1e-8)
    e_par = jnp.abs(jnp.sum(e * gn, axis=0))
    n_fg = jnp.sum(fg)
    field_err = float(jnp.sum(jnp.where(fg, err, 0.0)) / n_fg)
    field_err_obs = float(jnp.sum(jnp.where(fg, e_par, 0.0)) / n_fg)
    return 100.0 * (1.0 - r1 / max(r0, 1e-12)), field_err, field_err_obs


# The measured headline recipe — ONE source of truth, shared by the tune
# scripts (benchmarks/_ab.py) and run_configs.py so A/B variants always start
# from what bench.py actually runs.
RECIPE = dict(
    stages=("rigid", "affine", "flow"),
    levels=3,
    rigid_epochs=500,
    rigid_lr=3e-3,
    affine_epochs=200,
    affine_lr=1e-3,
    flow_lr=0.3,
    criterions=("mse", "ncc"),
    optimizer="adam",
    n=8,
    # f32 field-stage images: bf16 (measured r3) makes the plateau
    # loss noisy enough that the stop fires ~13 steps later AND
    # quality drops (99.08 vs 99.25 rigid-gate RMSE reduction) — the
    # cheaper steps don't pay for themselves in field mode.
    flow_dtype="float32",
    level_decay=3.5,  # steeper coarse-heavy budgets: equal RMSE, -30% time
    # r2 recipe upgrades (measured, tune4/tune5 on 3 pairs): bf16
    # matrix-stage sweeps (theta math and reductions stay f32);
    # 2.80 s -> 0.78 s per 240^3 cascade at strictly better quality.
    matrix_dtype="bfloat16",
    # plateau early-stop for the matrix stages (engines/common.py):
    # identical RMSE, 0.78 s -> 0.57 s (the budgets overshoot).
    # patience 10 (r3, A/B on both quality gates): rigid 226 -> 196
    # and affine 54 -> 33 executed steps at IDENTICAL rigid-gate and
    # deformable-truth scores — 0.61 s -> 0.53 s. patience tails were
    # pure plateau-polish; tighter than 10 starts costing quality.
    matrix_stop_rel=1e-3,
    matrix_patience=10,
    # r3: matrix stages skip the 240^3 fine level entirely — thetas
    # live in normalized coords and a 6/12-param global transform
    # gains nothing from full-res gradients, while fine-level steps
    # cost 8x mid-level ones. A/B (tune_matrix_levels.py, both
    # quality gates): 0.524 s -> 0.286 s at IDENTICAL rigid-gate
    # (99.25%) and deformable-truth (96.9%, 2.26->2.29 vox) scores.
    # matrix_levels=1 saves 0.02 s more but starts costing both gates.
    matrix_levels=2,
    # r5 (tune_rigid.py / tune_rigid2.py on both gates): closed-form
    # center-of-mass translation init for the coarsest rigid level
    # (ops/moments.py) — coarse executed steps 174 -> 31 at gate-identical
    # scores (99.26/97.57 vs 99.28/97.59), 0.264 -> 0.245 s. The other r5
    # rigid levers were measured and retired: LM/damped-Newton runs 2.2x
    # SLOWER at identical gates (the n+2 Hessian passes cost what the Adam
    # steps they replace cost — tune_lm.py), higher rigid lr (6e-3/1e-2)
    # and matrix_patience<10 each trade 0.1+ rigid-gate points for ~0.01 s,
    # and tighter flow patience (15/20) is neutral-to-worse on both axes.
    moment_init=True,
    # r3 recipe upgrade (measured on the deformable-truth control +
    # the rigid-gate pair): DIRECT-FIELD flow stage (demons-style,
    # engines/flow.py flow_model='field') with a diffusion
    # regularizer. The r2 U-Net flow polish scored 99.86% on the
    # rigid gate but only 54.6% RMSE reduction on a known smooth
    # 7-voxel deformation (epochs/lr/dtype/texture all probed — the
    # U-Net parameterization itself is the bottleneck); the field
    # stage recovers 97.1% of the deformable control at ~1/3 the
    # flow wall time (no network fwd/bwd), 99.2% on the rigid gate.
    flow_model="field",
    # r5 prior A/B (tune_r5_final.py, VERDICT r4 #3): a per-level diffusion
    # schedule that relaxes smoothing at the fine level lifts the deformable
    # gate 97.57 -> 97.93% at IDENTICAL time and total-map error (2.28 vox,
    # observable 0.43) — the prior lever improves the observable fit but
    # cannot touch the aperture-invisible tangential error, confirming the
    # r4 floor diagnosis. Stronger coarse smoothing (1.0,...) and a smoother
    # fine level (...,0.5) both measured worse.
    flow_smooth=(0.5, 0.5, 0.25),
    # r5 window trim (tune_r5_final.py + roofline.py): the rigid stage runs
    # at 2.2% of HBM peak — its cost is the unrolled sweep's TERM COUNT, so
    # smaller static windows are near-linear wins. residual_shift 8 -> 6
    # (fine-level windows 18 -> 14 terms/pass) and the moment-init coarse
    # window S/4 -> S/8+4 (32 -> 26 terms): 0.245 -> 0.228 s at gate-equal
    # scores (99.13-99.28 is the flow-stage noise band; deform gate and map
    # error unchanged). residual_shift=4 saves 5 ms more but leaves only a
    # 4-voxel per-level residual margin for general pairs — not taken.
    residual_shift=6,
    # r4 (tune_field.py A/B on both gates): a FULL-RESOLUTION third flow
    # level beats the r3 half-res cap on every axis — 0.293 -> 0.273 s,
    # rigid-gate 99.25 -> 99.28%, deform-gate 96.89 -> 97.59% — because the
    # 3-level flow pyramid with plateau stops spends its steps coarser on
    # average than one warm-started half-res stage, and skips the input
    # downsample entirely. Field error stays ~2.26 vox: probed to be an
    # APERTURE floor, not an optimizer gap (benchmarks/probe_field_floor.py:
    # only 0.40 vox of it lies along image gradients; 2.22 vox is motion
    # along intensity level sets, invisible to any similarity criterion).
    flow_max_size=256,
    flow_levels=3,
    flow_epochs=450,
    # flow plateau stop: the easy (rigid-residual) pair converges in
    # far fewer than the budgeted field steps
    flow_stop_rel=1e-3,
    flow_patience=25,
)

_CASCADE = None
_CASCADE_UNET = None


def run_cascade_unet(moving, target):
    """The reference-parity U-Net flow mode (flow_model='unet'), same recipe
    otherwise. Its deformable-truth number is published in the bench JSON so
    the out-of-box-vs-parity gap stays measured (r3 VERDICT #1): the default
    flow mode is 'field' because the U-Net path recovers far less of a known
    smooth deformation."""
    from torchregister_tpu.engines.cascade import make_cascade_fn

    global _CASCADE_UNET
    if _CASCADE_UNET is None:
        # Pinned to the r3 flow geometry (half-res cap, 2 levels, 300 ep):
        # the control tracks the U-Net PARAMETERIZATION's quality; a 240^3
        # full-res U-Net stage (the r4 field recipe's geometry) would change
        # its memory/compile profile without changing what it measures.
        _CASCADE_UNET = make_cascade_fn(
            **{**RECIPE, "flow_model": "unet", "flow_smooth": None,
               "flow_max_size": 160, "flow_levels": 2, "flow_epochs": 300}
        )
    res = _CASCADE_UNET(moving, target)
    checksum = float(res.warped.mean())
    return res, checksum


def run_cascade(moving, target):
    from torchregister_tpu.engines.cascade import make_cascade_fn

    global _CASCADE
    if _CASCADE is None:
        _CASCADE = make_cascade_fn(**RECIPE)
    res = _CASCADE(moving, target)
    # Force real completion: on remote-device transports block_until_ready can
    # return before execution finishes; a host readback cannot.
    checksum = float(res.warped.mean())
    return res, checksum


def main():
    selftest = pallas_selftest()

    moving, target = make_pair()

    # Warmup: compile everything once.
    run_cascade(moving, target)

    times = []
    res = None
    for _ in range(2):
        t0 = time.perf_counter()
        res, _ = run_cascade(moving, target)
        times.append(time.perf_counter() - t0)
    t = min(times)

    import jax.numpy as jnp

    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((res.warped - target) ** 2)))

    # Deformable ground-truth control (same cascade config — already
    # compiled): recover a known smooth flow ∘ rigid composition and score
    # both image RMSE and the total sampling-map error in voxels.
    fmov, ftgt, theta_true, flow_true = make_flow_truth_pair()
    fres, _ = run_cascade(fmov, ftgt)
    flow_rmse_red, field_err, field_err_obs = flow_truth_metrics(
        fres, fmov, ftgt, theta_true, flow_true
    )

    # Parity-mode (U-Net) control on the same pair: tracked so the default
    # (field) vs parity (unet) quality gap is public, per r3 VERDICT #1.
    ures, _ = run_cascade_unet(fmov, ftgt)
    unet_rmse_red, unet_field_err, unet_obs = flow_truth_metrics(
        ures, fmov, ftgt, theta_true, flow_true
    )

    regs_per_min = 60.0 / t
    baseline = 6.0  # north star: <10 s per cascade = 6/min
    print(
        json.dumps(
            {
                "metric": "cascade_240_registrations_per_min",
                "value": round(regs_per_min, 3),
                "unit": "registrations/min",
                "vs_baseline": round(regs_per_min / baseline, 3),
                "pallas_selftest": selftest,
                "rmse_reduction_pct": round(100 * (1 - r1 / max(r0, 1e-12)), 2),
                "flow_truth_rmse_reduction_pct": round(flow_rmse_red, 2),
                "flow_field_err_vox": round(field_err, 3),
                "flow_field_err_observable_vox": round(field_err_obs, 3),
                "unet_flow_truth_rmse_reduction_pct": round(unet_rmse_red, 2),
                "unet_flow_field_err_vox": round(unet_field_err, 3),
                # ~0.97 vs the field mode's ~0.43: the parity mode's gap is
                # observable (capacity), not aperture — BASELINE.md r5 floor.
                "unet_flow_field_err_observable_vox": round(unet_obs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
