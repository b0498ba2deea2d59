"""Second-order (LM) matrix engines + moment-matching init + r5 guards.

Covers engines/second_order.py (damped-Newton loop), ops/moments.py
(closed-form center-of-mass init), the cascade's ``matrix_optimizer`` /
``moment_init`` knobs, the bf16-U-Net crash guard (r4 VERDICT #4) and the
``flow_levels`` validation (r4 ADVICE).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchregister_tpu.engines.affine import affine_register
from torchregister_tpu.engines.rigid import rigid_register
from torchregister_tpu.ops.moments import (
    center_of_mass,
    com_rigid_params,
    com_translation,
    pa_rigid_params,
)
from torchregister_tpu.ops.resample import warp_affine
from torchregister_tpu.ops.transforms import rigid_theta


def _blob_volume(shape, seed=0, k=6):
    rng = np.random.default_rng(seed)
    grids = np.meshgrid(
        *[np.linspace(-1, 1, s, dtype=np.float32) for s in shape], indexing="ij"
    )
    vol = np.zeros(shape, np.float32)
    for _ in range(k):
        c = rng.uniform(-0.5, 0.5, len(shape))
        w = rng.uniform(0.15, 0.3)
        vol += np.exp(
            -sum((g - ci) ** 2 for g, ci in zip(grids, c)) / (2 * w**2)
        ).astype(np.float32)
    return jnp.asarray(vol[None, None])


TRUE_3D = jnp.asarray([0.06, -0.04, 0.05, 0.2, -0.15, 0.1], jnp.float32)


def _pair_3d(shape=(40, 40, 40), seed=0):
    moving = _blob_volume(shape, seed)
    target = warp_affine(rigid_theta(TRUE_3D)[None], moving)
    return moving, target


@pytest.mark.slow  # 3D engine build (smoke keeps the 2D LM + guards)
def test_lm_rigid_recovers_params_fast():
    moving, target = _pair_3d()
    warped, res = rigid_register(
        moving, target, epochs=40, criterions=["mse", "ncc"],
        grad_edges=False, optimizer="lm", init="identity",
        stop_rel=1e-3, patience=3,
    )
    # quadratic convergence: far fewer iterations than the epoch budget
    assert int(res.steps) <= 20
    np.testing.assert_allclose(
        np.asarray(res.best_params), np.asarray(TRUE_3D), atol=5e-3
    )
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((warped - target) ** 2)))
    assert r1 < 0.02 * r0


@pytest.mark.slow  # 3D engine build (smoke keeps the 2D LM + guards)
def test_lm_affine_recovers_matrix():
    moving, target = _pair_3d(seed=3)
    warped, res = affine_register(
        moving, target, epochs=40, criterions=["mse", "ncc"],
        grad_edges=False, optimizer="lm", stop_rel=1e-3, patience=3,
    )
    np.testing.assert_allclose(
        np.asarray(res.best_theta[0]),
        np.asarray(rigid_theta(TRUE_3D)),
        atol=8e-3,
    )
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((warped - target) ** 2)))
    assert r1 < 0.03 * r0


def test_lm_2d_rigid():
    moving = _blob_volume((48, 48), seed=5)
    true_p = jnp.asarray([0.1, 0.08, -0.06], jnp.float32)
    target = warp_affine(rigid_theta(true_p)[None], moving)
    _, res = rigid_register(
        moving, target, epochs=40, criterions=["mse"], grad_edges=False,
        optimizer="lm", init="identity", stop_rel=1e-3, patience=3,
    )
    np.testing.assert_allclose(
        np.asarray(res.best_params), np.asarray(true_p), atol=5e-3
    )


@pytest.mark.slow  # 3D engine build (smoke keeps the 2D LM + guards)
def test_lm_monotone_best_and_history():
    """Losses record per-iteration values; best_loss is their running min and
    rejected steps never increase it."""
    moving, target = _pair_3d(seed=7)
    _, res = rigid_register(
        moving, target, epochs=25, criterions=["mse"], grad_edges=False,
        optimizer="lm", init="identity", stop_rel=None,
    )
    losses = np.asarray(res.losses)
    assert np.isfinite(losses).all()
    assert float(res.best_loss) <= np.min(losses) + 1e-12
    hist = np.asarray(res.param_history)
    assert hist.shape == (25, 6)
    assert np.isfinite(hist).all()


@pytest.mark.slow  # 3D engine build (smoke keeps the 2D LM + guards)
def test_lm_rejects_bad_steps_on_hard_start():
    """From a far-off random init the first Newton proposals may overshoot;
    the damping must keep the loop finite and still descending."""
    moving, target = _pair_3d(seed=9)
    init = jnp.asarray([0.5, -0.4, 0.45, 1.0, -0.8, 0.9], jnp.float32)
    _, res = rigid_register(
        moving, target, epochs=40, criterions=["mse"], grad_edges=False,
        optimizer="lm", init_params=init, stop_rel=1e-3, patience=5,
    )
    losses = np.asarray(res.losses)
    valid = losses[: int(res.steps)]
    assert np.isfinite(valid).all()
    assert float(res.best_loss) < valid[0]


def test_center_of_mass_known():
    vol = jnp.zeros((1, 1, 16, 16, 16), jnp.float32).at[0, 0, 4, 8, 12].set(2.0)
    np.testing.assert_allclose(np.asarray(center_of_mass(vol)), [4.0, 8.0, 12.0])


def test_com_translation_recovers_pure_shift():
    """A pure normalized-coordinate translation theta must be exactly inverted
    by the moment init (up to interpolation mass leakage at edges)."""
    moving = _blob_volume((32, 32, 32), seed=11)
    t_norm = jnp.asarray([0.12, -0.08, 0.1], jnp.float32)  # theta row order
    theta = jnp.concatenate([jnp.eye(3), t_norm[:, None]], axis=1)[None]
    target = warp_affine(theta, moving)
    got = np.asarray(com_translation(moving, target))
    np.testing.assert_allclose(got, np.asarray(t_norm), atol=0.02)


@pytest.mark.slow  # 3D engine build (smoke keeps the 2D LM + guards)
def test_com_rigid_params_feed_engine():
    """CoM init + a few LM iterations recovers a translation-dominant rigid
    transform faster than identity init."""
    moving, target = _pair_3d(seed=13)
    ip = com_rigid_params(moving, target)
    # the translation part of the init is already close to the truth
    np.testing.assert_allclose(np.asarray(ip[3:]), np.asarray(TRUE_3D[3:]), atol=0.06)
    _, res = rigid_register(
        moving, target, epochs=20, criterions=["mse"], grad_edges=False,
        optimizer="lm", init_params=ip, stop_rel=1e-3, patience=3,
    )
    np.testing.assert_allclose(
        np.asarray(res.best_params), np.asarray(TRUE_3D), atol=5e-3
    )


@pytest.mark.slow  # 3D engine build (smoke keeps the 2D LM + guards)
def test_cascade_matrix_optimizer_lm():
    """matrix_optimizer='lm' + moment_init run end-to-end in the jitted
    cascade and match the rigid truth on a small pair."""
    from torchregister_tpu.engines.cascade import make_cascade_fn

    moving, target = _pair_3d(shape=(32, 32, 32), seed=15)
    fn = make_cascade_fn(
        stages=("rigid", "affine"), levels=2, rigid_epochs=20,
        affine_epochs=10, criterions=("mse",), optimizer="adam",
        matrix_optimizer="lm", matrix_patience=3, matrix_stop_rel=1e-3,
        moment_init=True,
    )
    res = fn(moving, target)
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((res.warped - target) ** 2)))
    assert r1 < 0.08 * r0


def _aniso_volume(shape):
    """Anisotropic AND skewed along every principal axis: a separable
    product of split Gaussians (right tail 1.8x wider than the left) with
    distinct per-axis widths — distinct covariance eigenvalues and strong
    per-axis third moments, the observable case for the principal-axes
    init. (A symmetric lobe + satellite construction is NOT enough: the
    lobe's ``3 sigma^2 (center - com)`` term cancels the satellite's third
    moment along wide axes.)"""
    d = len(shape)
    grids = np.meshgrid(
        *[np.linspace(-1, 1, s, dtype=np.float32) for s in shape], indexing="ij"
    )
    widths = [0.2, 0.13, 0.08][:d]  # distinct spreads per array axis
    vol = np.ones(shape, np.float32)
    for g, w in zip(grids, widths):
        vol = vol * np.where(
            g < 0, np.exp(-(g**2) / (2 * w**2)), np.exp(-(g**2) / (2 * (1.8 * w) ** 2))
        ).astype(np.float32)
    return jnp.asarray(vol[None, None])


def test_pa_recovers_known_rotation_3d():
    """pa_rigid_params inverts a known rigid theta on an anisotropic,
    skewed volume (moments are closed-form — no optimization)."""
    moving = _aniso_volume((48, 48, 48))
    true_p = jnp.asarray([0.15, -0.12, 0.1, 0.3, -0.2, 0.25], jnp.float32)
    target = warp_affine(rigid_theta(true_p)[None], moving)
    got = pa_rigid_params(moving, target)
    # angles are raw; translations live in the atanh domain like true_p
    # (measured recovery is ~1e-4 rad on this volume; tolerance is slack)
    np.testing.assert_allclose(
        np.asarray(got[:3]), np.asarray(true_p[:3]), atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(got[3:]), np.asarray(true_p[3:]), atol=0.05
    )


def test_pa_falls_back_to_com_on_isotropic():
    """A spherical blob has no observable frame: rotation must gate to zero
    and the translation must match the CoM init exactly."""
    moving = _blob_volume((32, 32, 32), seed=0, k=1)
    target = jnp.roll(moving, 3, axis=2)
    got = pa_rigid_params(moving, target)
    np.testing.assert_allclose(np.asarray(got[:3]), np.zeros(3), atol=1e-5)
    com = com_rigid_params(moving, target)
    np.testing.assert_allclose(
        np.asarray(got[3:]), np.asarray(com[3:]), atol=1e-3
    )


def test_pa_2d_rotation():
    moving = _aniso_volume((64, 64))
    true_p = jnp.asarray([0.2, 0.1, -0.08], jnp.float32)
    target = warp_affine(rigid_theta(true_p)[None], moving)
    got = pa_rigid_params(moving, target)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(true_p), atol=0.05
    )


@pytest.mark.slow  # 3D engine build (smoke keeps the closed-form PA tests)
def test_cascade_moment_init_pa():
    """moment_init='pa' traces inside the jitted cascade and registers a
    rotated anisotropic pair."""
    from torchregister_tpu.engines.cascade import make_cascade_fn

    moving = _aniso_volume((32, 32, 32))
    true_p = jnp.asarray([0.12, -0.1, 0.08, 0.25, -0.15, 0.2], jnp.float32)
    target = warp_affine(rigid_theta(true_p)[None], moving)
    fn = make_cascade_fn(
        stages=("rigid",), levels=2, rigid_epochs=30, rigid_lr=3e-3,
        criterions=("mse",), optimizer="adam", moment_init="pa",
        matrix_patience=5, matrix_stop_rel=1e-4,
    )
    res = fn(moving, target)
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((res.warped - target) ** 2)))
    assert r1 < 0.1 * r0


def test_bf16_unet_large_volume_refused():
    """r4 VERDICT #4: the probed worker-crash condition (unet + bf16 + >=160)
    must fail fast with a clear error, not an opaque dead TPU worker."""
    from torchregister_tpu.engines.flow import flow_register

    moving = jnp.zeros((1, 1, 160, 8, 8), jnp.float32)
    with pytest.raises(ValueError, match="crashes the TPU worker"):
        flow_register(moving, moving, flow_model="unet", dtype="bfloat16")
    # f32 unet and bf16 field mode at the same size stay allowed (guard
    # specificity): build must get past the dtype check (other errors OK).
    try:
        flow_register(moving, moving, flow_model="field", dtype="bfloat16",
                      max_epochs=1, criterions=["mse"], max_disp=2)
    except ValueError as e:  # pragma: no cover
        assert "crashes the TPU worker" not in str(e)


def test_flow_levels_validation():
    """r4 ADVICE: flow_levels<1 raises; absurd depths are clamped, not
    degenerate."""
    from torchregister_tpu.engines.cascade import register_cascade

    moving = _blob_volume((16, 16), seed=17)
    target = jnp.roll(moving, 1, axis=2)
    with pytest.raises(ValueError, match="flow_levels"):
        register_cascade(
            moving, target, stages=("flow",), levels=1, flow_levels=0,
            flow_epochs=1, criterions=("mse",),
        )
    # depth 6 on a 16^2 image clamps to 2 levels (coarsest >= 8 voxels)
    res = register_cascade(
        moving, target, stages=("flow",), levels=1, flow_levels=6,
        flow_epochs=4, criterions=("mse",), flow_max_disp=2,
    )
    assert res.flow is not None and np.isfinite(np.asarray(res.flow)).all()


def test_bf16_unet_guard_allows_2d():
    """Guard specificity: the probed crash is a 3D-volume workload — a 2D
    bf16 U-Net at >=160 px must get past the dtype check (other errors OK)."""
    from torchregister_tpu.engines.flow import flow_register

    moving = jnp.zeros((1, 1, 160, 160), jnp.float32)
    try:
        flow_register(moving, moving, flow_model="unet", dtype="bfloat16",
                      max_epochs=1, criterions=["mse"], n=32, depth=1,
                      max_disp=2)
    except ValueError as e:  # pragma: no cover
        assert "crashes the TPU worker" not in str(e)
