"""Cascade + pyramid tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from torchregister_tpu.engines.cascade import register_cascade
from torchregister_tpu.ops.resample import warp_affine, warp_flow
from torchregister_tpu.ops.transforms import rigid_theta
from torchregister_tpu.utils.pyramid import build_pyramid, compose_flows, upsample_flow

pytestmark = pytest.mark.slow  # full multi-level cascade optimizations (smoke tier: -m 'not slow')


def _blob(shape, seed=0):
    rng = np.random.default_rng(seed)
    grids = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    vol = np.zeros(shape, np.float32)
    for _ in range(6):
        c = rng.uniform(-0.4, 0.4, len(shape))
        w = rng.uniform(0.15, 0.35)
        vol += np.exp(-sum((g - ci) ** 2 for g, ci in zip(grids, c)) / (2 * w**2))
    return jnp.asarray(vol[None, None])


def test_build_pyramid_shapes():
    x = jnp.zeros((1, 1, 32, 48))
    pyr = build_pyramid(x, 3)
    assert [p.shape for p in pyr] == [
        (1, 1, 8, 12),
        (1, 1, 16, 24),
        (1, 1, 32, 48),
    ]


def test_upsample_flow_scales_displacements():
    flow = jnp.ones((1, 2, 8, 8))
    up = upsample_flow(flow, (16, 16))
    assert up.shape == (1, 2, 16, 16)
    np.testing.assert_allclose(np.asarray(up), 2.0, rtol=1e-5)


def test_compose_flows_integer_shifts():
    src = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 12, 12)), jnp.float32)
    f1 = jnp.zeros((1, 2, 12, 12)).at[:, 0].set(1.0)
    f2 = jnp.zeros((1, 2, 12, 12)).at[:, 0].set(2.0)
    combined = compose_flows(f1, f2)
    out_composed = warp_flow(src, combined)
    out_seq = warp_flow(warp_flow(src, f1), f2)
    # interior agrees (borders differ by zero-fill handling)
    np.testing.assert_allclose(
        np.asarray(out_composed[0, 0, :8]), np.asarray(out_seq[0, 0, :8]), atol=1e-5
    )


def test_cascade_matrix_stages_recover_rigid_2d():
    moving = _blob((64, 64))
    true = rigid_theta(jnp.asarray([0.1, 0.06, -0.04], jnp.float32))[None]
    target = warp_affine(true, moving)
    res = register_cascade(
        moving, target, stages=("rigid", "affine"), levels=2,
        rigid_epochs=160, rigid_lr=5e-3, affine_epochs=80, affine_lr=2e-3,
        criterions=("mse",), optimizer="adam",
    )
    assert res.flow is None
    np.testing.assert_allclose(np.asarray(res.theta), np.asarray(true), atol=0.05)
    rmse = float(jnp.sqrt(jnp.mean((res.warped - target) ** 2)))
    base = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    assert rmse < 0.35 * base


def test_make_cascade_fn_single_program_matches_eager():
    from torchregister_tpu.engines.cascade import make_cascade_fn

    moving = _blob((32, 32), seed=3)
    target = _blob((32, 32), seed=4)
    cfg = dict(stages=("rigid", "affine"), levels=2, rigid_epochs=30,
               rigid_lr=3e-3, affine_epochs=20, affine_lr=1e-3,
               criterions=("mse",), optimizer="adam")
    fn = make_cascade_fn(**cfg)
    res_jit = fn(moving, target)
    res_eager = register_cascade(moving, target, **cfg)
    np.testing.assert_allclose(
        np.asarray(res_jit.theta), np.asarray(res_eager.theta), rtol=1e-4,
        atol=1e-5,
    )
    # cache hit: same config returns the same compiled callable
    assert make_cascade_fn(**cfg) is fn


def test_cascade_anisotropic_volume():
    """Realistic MRI shapes are anisotropic (e.g. 240x240x48); the pyramid,
    depth clamping and sweeps must handle unequal spatial dims."""
    moving = _blob((48, 40, 16), seed=5)
    target = _blob((48, 40, 16), seed=6)
    res = register_cascade(
        moving, target, levels=2, rigid_epochs=16, affine_epochs=8,
        flow_epochs=4, criterions=("mse",), optimizer="adam", n=32,
    )
    assert res.warped.shape == moving.shape
    assert res.flow.shape == (1, 3, 48, 40, 16)
    assert np.isfinite(np.asarray(res.warped)).all()


def test_cascade_odd_sizes():
    moving = _blob((45, 37), seed=7)
    target = _blob((45, 37), seed=8)
    res = register_cascade(
        moving, target, stages=("rigid", "affine"), levels=2,
        rigid_epochs=10, affine_epochs=6, criterions=("mse",), optimizer="adam",
    )
    assert res.warped.shape == moving.shape
    assert np.isfinite(np.asarray(res.theta)).all()


def test_cascade_full_pipeline_runs_2d():
    moving = _blob((48, 48), seed=1)
    target = _blob((48, 48), seed=2)
    res = register_cascade(
        moving, target, levels=2, rigid_epochs=20, affine_epochs=10,
        flow_epochs=5, criterions=("mse",), optimizer="adam", n=32,
    )
    assert res.warped.shape == moving.shape
    assert res.flow.shape == (1, 2, 48, 48)
    for l in (res.rigid_losses, res.affine_losses):
        assert np.isfinite(np.asarray(l)).all()


def test_cascade_matrix_levels_coarse_only_recovers_rigid():
    """matrix_levels=1: rigid/affine run only on the coarsest level; the
    normalized-coordinate theta still applies exactly at full resolution."""
    moving = _blob((64, 64))
    true = rigid_theta(jnp.asarray([0.1, 0.06, -0.04], jnp.float32))[None]
    target = warp_affine(true, moving)
    res = register_cascade(
        moving, target, stages=("rigid", "affine"), levels=2, matrix_levels=1,
        rigid_epochs=240, rigid_lr=5e-3, affine_epochs=80, affine_lr=2e-3,
        criterions=("mse",), optimizer="adam",
    )
    np.testing.assert_allclose(np.asarray(res.theta), np.asarray(true), atol=0.06)
    rmse = float(jnp.sqrt(jnp.mean((res.warped - target) ** 2)))
    base = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    assert rmse < 0.4 * base


def test_cascade_matrix_levels_rejects_nonpositive():
    import pytest

    moving = _blob((24, 24))
    for bad in (0, -1):
        with pytest.raises(ValueError, match="matrix_levels"):
            register_cascade(
                moving, moving, stages=("rigid",), levels=2, rigid_epochs=2,
                criterions=("mse",), matrix_levels=bad,
            )


def test_compose_flows_separable_matches_gather_on_smooth_fields():
    """compose_flows_separable == compose_flows up to the sweep's O(h^2)
    smoothness term: exact for fields constant along each swept axis
    (integer-shift case below), close for smooth fields."""
    from torchregister_tpu.utils.pyramid import compose_flows_separable

    src_shape = (1, 2, 12, 12)
    f1 = jnp.zeros(src_shape).at[:, 0].set(1.0)
    f2 = jnp.zeros(src_shape).at[:, 0].set(2.0)
    exact = compose_flows(f1, f2)
    sep = compose_flows_separable(f1, f2, max_disp=3)
    np.testing.assert_allclose(
        np.asarray(sep[:, :, :8]), np.asarray(exact[:, :, :8]), atol=1e-5
    )


def test_cascade_flow_rebase_matches_warmstart_quality():
    """flow_rebase=True (field mode): fine levels optimize a small-window
    residual over a once-rebased input; the recovered registration quality
    must match the total-field warm-start path on a smooth deformation."""
    import jax

    moving = _blob((40, 40), seed=3)
    zz, yy = np.meshgrid(
        np.linspace(0, 2 * np.pi, 40), np.linspace(0, 2 * np.pi, 40),
        indexing="ij",
    )
    fl = np.stack(
        [2.0 * np.sin(zz) * np.cos(yy), -2.0 * np.cos(zz) * np.sin(yy)]
    ).astype(np.float32)[None]
    target = warp_flow(moving, jnp.asarray(fl))
    base = dict(
        stages=("flow",), levels=2, flow_levels=2, flow_epochs=80,
        flow_model="field", flow_lr=0.3, optimizer="adam",
        criterions=("mse",), flow_max_disp=4, flow_smooth=(0.3, 0.15),
    )
    rmses = {}
    for rb in (False, True):
        res = register_cascade(
            moving, target, flow_rebase=rb, flow_residual_disp=2, **base
        )
        assert res.flow.shape == (1, 2, 40, 40)
        rmses[rb] = float(jnp.sqrt(jnp.mean((res.warped - target) ** 2)))
    base_rmse = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    # both paths register well; rebase within 1.5x of warm-start residual
    assert rmses[False] < 0.5 * base_rmse
    assert rmses[True] < max(1.5 * rmses[False], 0.5 * base_rmse)


def test_cascade_flow_rebase_validation():
    import pytest

    moving = _blob((24, 24))
    with pytest.raises(ValueError, match="flow_rebase"):
        register_cascade(
            moving, moving, stages=("flow",), levels=1, flow_epochs=2,
            criterions=("mse",), flow_model="unet", flow_rebase=True,
        )
    with pytest.raises(ValueError, match="flow_residual_disp"):
        register_cascade(
            moving, moving, stages=("flow",), levels=1, flow_epochs=2,
            criterions=("mse",), flow_model="field", flow_rebase=True,
            flow_residual_disp=0,
        )


def test_cascade_flow_smooth_tuple_survives_level_clamp():
    """A flow_smooth tuple sized to the REQUESTED flow_levels must not raise
    when the small-volume depth clamp shrinks the level count: the clamped
    pyramid keeps its finest levels, so the tuple's finest entries apply."""
    moving = _blob((12, 12))
    res = register_cascade(
        moving, moving, stages=("flow",), levels=1, flow_levels=2,
        flow_epochs=2, criterions=("mse",), flow_model="field",
        flow_smooth=(0.5, 0.25), optimizer="adam", flow_lr=0.3,
    )
    assert res.flow.shape == (1, 2, 12, 12)


def test_cascade_moment_init_rejects_unknown_mode():
    """A typo like 'PA' must raise, not silently fall back to CoM-only."""
    moving = _blob((24, 24))
    with pytest.raises(ValueError, match="moment_init"):
        register_cascade(
            moving, moving, stages=("rigid",), levels=1, rigid_epochs=2,
            criterions=("mse",), moment_init="PA",
        )


def test_cascade_batch_spatial_axis_requires_mesh():
    from torchregister_tpu.engines.cascade import make_cascade_batch_fn

    with pytest.raises(ValueError, match="spatial_axis requires a mesh"):
        make_cascade_batch_fn(spatial_axis=0, stages=("rigid",))


def test_cascade_flow_rebase_three_levels():
    """3-level rebase: per-level rebase windows and the final bound follow the
    worst-case doubling model (pre-fix the li=2 one-shot warp and the final
    sweep window were undersized and would zero large displacements)."""
    moving = _blob((48, 48), seed=5)
    res = register_cascade(
        moving, moving, stages=("flow",), levels=3, flow_levels=3,
        flow_epochs=6, criterions=("mse",), flow_model="field",
        flow_lr=0.3, optimizer="adam", flow_max_disp=4,
        flow_smooth=(0.3, 0.2, 0.1), flow_rebase=True, flow_residual_disp=2,
    )
    assert res.flow.shape == (1, 2, 48, 48)
    assert np.isfinite(np.asarray(res.flow)).all()
