"""Attention U-Net + flow engine tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from torchregister_tpu.engines.flow import flow_register
from torchregister_tpu.models.attention_unet import (
    AttentionUNet,
    instance_norm,
    level_channels,
    max_depth_for,
)
from torchregister_tpu.ops.resample import warp_flow

pytestmark = pytest.mark.slow  # flow recovery optimizations (smoke tier: -m 'not slow')


def test_level_channels_reference_widths():
    assert level_channels(4, 1) == [64, 128, 256, 512, 1024]
    assert level_channels(4, 32) == [2, 4, 8, 16, 32]
    assert level_channels(4, 128) == [1, 1, 2, 4, 8]  # floored at 1


def test_max_depth_for():
    assert max_depth_for((240, 240, 240)) == 4  # reference-legal size
    assert max_depth_for((128, 128, 128)) < 4  # reference would crash here
    assert max_depth_for((256, 256)) == 4  # the 2D ringo config
    assert max_depth_for((16, 16)) >= 1


def test_instance_norm_matches_torch():
    import torch

    x = np.random.default_rng(0).normal(size=(2, 3, 9, 9)).astype(np.float32)
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    t = torch.nn.functional.instance_norm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, t, rtol=1e-4, atol=1e-5)


def test_tap_conv_matches_torch_conv():
    import torch

    from torchregister_tpu.models.attention_unet import TapConv

    x = np.random.default_rng(7).normal(size=(1, 3, 12, 13)).astype(np.float32)
    conv = TapConv(features=5, ndim=2)
    params = conv.init(jax.random.key(0), jnp.asarray(x))["params"]
    ours = np.asarray(conv.apply({"params": params}, jnp.asarray(x)))
    # torch oracle: same kernel, [Co, Ci, kh, kw] layout
    w = np.asarray(params["kernel"]).transpose(3, 2, 0, 1)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w.copy()),
        torch.from_numpy(np.asarray(params["bias"])),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_tap_conv_transpose_matches_torch():
    import torch

    from torchregister_tpu.models.attention_unet import TapConvTranspose2x

    x = np.random.default_rng(8).normal(size=(1, 4, 6, 7)).astype(np.float32)
    up = TapConvTranspose2x(features=3, ndim=2)
    params = up.init(jax.random.key(1), jnp.asarray(x))["params"]
    ours = np.asarray(up.apply({"params": params}, jnp.asarray(x)))
    # torch ConvTranspose2d weight layout: [Ci, Co, kh, kw]
    w = np.asarray(params["kernel"]).transpose(2, 3, 0, 1)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w.copy()),
        torch.from_numpy(np.asarray(params["bias"])), stride=2,
    ).numpy()
    assert ours.shape == ref.shape == (1, 3, 12, 14)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_unet_2d_shapes():
    model = AttentionUNet(ndim=2, n=32, depth=2)
    x = jnp.zeros((1, 1, 48, 40))
    params = model.init(jax.random.key(0), x)["params"]
    flow = model.apply({"params": params}, x)
    assert flow.shape == (1, 2, 48, 40)


def test_unet_3d_shapes_and_warp():
    model = AttentionUNet(ndim=3, n=64, depth=1)
    x = jnp.ones((1, 1, 14, 16, 18))
    params = model.init(jax.random.key(1), x)["params"]
    flow = model.apply({"params": params}, x)
    assert flow.shape == (1, 3, 14, 16, 18)
    warped = warp_flow(x, flow)
    assert warped.shape == (1, 1, 14, 16, 18)
    assert np.isfinite(np.asarray(warped)).all()


def test_unet_out_att_returns_gate_maps():
    """Reference ``forward(x, device, out_att)`` analog (utils.py:522 — dead
    there, live here): the gate weight maps come out coarsest-first, one per
    decoder level, each spatially matching its skip tensor."""
    model = AttentionUNet(ndim=2, n=32, depth=2)
    x = jnp.zeros((1, 1, 48, 40))
    params = model.init(jax.random.key(0), x)["params"]
    flow, atts = model.apply({"params": params}, x, out_att=True)
    assert flow.shape == (1, 2, 48, 40)
    assert len(atts) == 2
    for att in atts:
        assert att.ndim == 3  # [N, *s] — squeezed single-channel maps
        a = np.asarray(att)
        assert np.isfinite(a).all()
        assert (a >= 0).all() and (a <= 1).all()  # sigmoid gate weights
    # default call unchanged
    flow2 = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(flow2), np.asarray(flow))


def test_unet_gradients_flow():
    model = AttentionUNet(ndim=2, n=32, depth=2)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 1, 32, 32)), jnp.float32)
    params = model.init(jax.random.key(2), x)["params"]

    def loss(p):
        return jnp.mean(model.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def _pair_2d(shape=(40, 40)):
    rng = np.random.default_rng(3)
    grids = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    vol = np.zeros(shape, np.float32)
    for _ in range(5):
        c = rng.uniform(-0.5, 0.5, 2)
        w = rng.uniform(0.15, 0.3)
        vol += np.exp(-((grids[0] - c[0]) ** 2 + (grids[1] - c[1]) ** 2) / (2 * w**2))
    moving = jnp.asarray(vol[None, None])
    # small smooth deformation of moving as target
    flow = np.stack(
        [1.5 * np.sin(np.pi * grids[1]), -1.5 * np.cos(np.pi * grids[0])]
    ).astype(np.float32)[None]
    target = warp_flow(moving, jnp.asarray(flow))
    return moving, target


def test_flow_register_field_mode_recovers_flow():
    """Direct-field mode (demons-style): the params ARE the field — it must
    beat the U-Net at fitting a specific known deformation in equal epochs,
    and the diffusion regularizer keeps it finite/smooth in flat regions."""
    moving, target = _pair_2d()
    warped, res = flow_register(
        moving, target, lr=0.3, max_epochs=120, criterions=["mse"],
        optimizer="adam", flow_model="field", smooth=0.3, max_disp=4,
        stop_crit=1e-9,
    )
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((warped - target) ** 2)))
    assert r1 < 0.35 * r0, (r0, r1)
    assert res.flow.shape == (1, 2) + moving.shape[2:]
    # params ARE the field in this mode
    np.testing.assert_array_equal(np.asarray(res.params), np.asarray(res.flow))
    assert np.all(np.isfinite(np.asarray(res.flow)))


def test_flow_register_field_mode_bf16_images():
    """Field mode with dtype='bfloat16' runs the *image side* of each step
    reduced (sweep FMAs + loss reductions) while the field, optimizer state
    and the returned final warp stay f32 — recovery must survive the reduced
    step precision (the cascade's bench recipe relies on this)."""
    moving, target = _pair_2d()
    warped, res = flow_register(
        moving, target, lr=0.3, max_epochs=120, criterions=["mse"],
        optimizer="adam", flow_model="field", smooth=0.3, max_disp=4,
        stop_crit=1e-9, dtype="bfloat16",
    )
    assert res.flow.dtype == jnp.float32
    assert warped.dtype == jnp.float32
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((warped - target) ** 2)))
    assert r1 < 0.4 * r0, (r0, r1)
    assert np.all(np.isfinite(np.asarray(res.flow)))


def test_flow_register_field_warm_start_upsample():
    """Field-mode coarse-to-fine: a field optimized at half resolution,
    upsampled with upsample_flow, warm-starts the full-resolution fit."""
    from torchregister_tpu.ops.resize import downsample_avg
    from torchregister_tpu.utils.pyramid import upsample_flow

    moving, target = _pair_2d()
    mov_c, tgt_c = downsample_avg(moving, 2), downsample_avg(target, 2)
    _, coarse = flow_register(
        mov_c, tgt_c, lr=0.3, max_epochs=60, criterions=["mse"],
        optimizer="adam", flow_model="field", smooth=0.3, max_disp=4,
        stop_crit=1e-9,
    )
    init = upsample_flow(coarse.flow, moving.shape[2:])
    warped, res = flow_register(
        moving, target, lr=0.15, max_epochs=40, criterions=["mse"],
        optimizer="adam", flow_model="field", smooth=0.3, max_disp=4,
        stop_crit=1e-9, init_params=init,
    )
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((warped - target) ** 2)))
    assert r1 < 0.5 * r0, (r0, r1)


def test_cascade_field_flow_stage():
    """register_cascade(flow_model='field') runs end-to-end and improves on
    the matrix-only result (the warm-start upsample path across the flow
    mini-pyramid is exercised by levels=2)."""
    from torchregister_tpu.engines.cascade import register_cascade

    moving, target = _pair_2d()
    res = register_cascade(
        moving, target, stages=("flow",), levels=2, flow_epochs=60,
        flow_lr=0.3, criterions=("mse",), optimizer="adam",
        flow_model="field", flow_smooth=0.3, flow_max_disp=4,
    )
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((res.warped - target) ** 2)))
    assert r1 < 0.6 * r0, (r0, r1)


def test_cascade_field_flow_per_level_smooth_and_criterions():
    """r4 knobs: per-level flow_smooth tuples, flow_levels, and the
    flow-stage criterion override all run end-to-end and still improve."""
    from torchregister_tpu.engines.cascade import register_cascade

    moving, target = _pair_2d()
    res = register_cascade(
        moving, target, stages=("flow",), levels=2, flow_epochs=60,
        flow_lr=0.3, criterions=("mse",), optimizer="adam",
        flow_model="field", flow_smooth=(0.4, 0.1), flow_max_disp=4,
        flow_levels=2, flow_criterions=("mse",),
    )
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((res.warped - target) ** 2)))
    assert r1 < 0.6 * r0, (r0, r1)
    # tuple length must match the flow mini-pyramid depth
    import pytest

    with pytest.raises(ValueError, match="flow_smooth"):
        register_cascade(
            moving, target, stages=("flow",), levels=2, flow_epochs=4,
            criterions=("mse",), flow_model="field",
            flow_smooth=(0.4, 0.2, 0.1), flow_levels=2,
        )


def test_cascade_unet_flow_composition():
    """r4: U-Net flow mode composes per-level residual fields
    (flow_compose=True default) instead of re-predicting the full flow at
    each level — the r3 VERDICT's named lever for the parity path. The
    composed-field cascade must run, return the COMPOSED field, and improve
    on identity."""
    from torchregister_tpu.engines.cascade import register_cascade

    moving, target = _pair_2d()
    kw = dict(
        stages=("flow",), levels=2, flow_epochs=60, flow_lr=2e-3,
        criterions=("mse",), optimizer="adam", flow_model="unet", n=16,
        flow_max_disp=4,
    )
    res = register_cascade(moving, target, **kw)
    assert res.flow.shape == (1, 2) + moving.shape[2:]
    assert np.all(np.isfinite(np.asarray(res.flow)))
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((res.warped - target) ** 2)))
    assert r1 < 0.9 * r0, (r0, r1)
    # compose=False (r2 warm-start behavior) still works and differs
    res2 = register_cascade(moving, target, flow_compose=False, **kw)
    assert np.all(np.isfinite(np.asarray(res2.flow)))
    assert not np.allclose(np.asarray(res.flow), np.asarray(res2.flow))


def test_flow_register_reduces_loss():
    moving, target = _pair_2d()
    warped, res = flow_register(
        moving, target, lr=2e-3, max_epochs=60, criterions=["mse"],
        optimizer="adam", n=32, depth=2,
    )
    losses = np.asarray(res.losses)
    valid = losses[np.isfinite(losses)]
    assert int(res.steps) == 60
    assert valid[-1] < valid[0] * 0.7, (valid[0], valid[-1])
    assert res.flow.shape == (1, 2) + moving.shape[2:]


def test_flow_register_early_stop():
    moving, target = _pair_2d()
    _, res = flow_register(
        moving, target, lr=1e-3, max_epochs=50, criterions=["mse"],
        stop_crit=1e9,  # absurdly loose -> stops after first step
        n=32, depth=2,
    )
    assert int(res.steps) == 1
    assert bool(res.converged)
    losses = np.asarray(res.losses)
    assert np.isfinite(losses[0]) and np.isnan(losses[1:]).all()


def test_flow_register_bf16_compute():
    moving, target = _pair_2d()
    warped, res = flow_register(
        moving, target, lr=2e-3, max_epochs=20, criterions=["mse"],
        optimizer="adam", n=32, depth=2, dtype="bfloat16",
    )
    losses = np.asarray(res.losses)
    valid = losses[np.isfinite(losses)]
    assert np.isfinite(valid).all()
    assert valid[-1] < valid[0]  # still optimizes in bf16
    assert res.flow.dtype == jnp.float32  # f32 flow head


def test_flow_register_warm_start_params():
    moving, target = _pair_2d()
    _, r1 = flow_register(moving, target, lr=2e-3, max_epochs=5,
                          criterions=["mse"], optimizer="adam", n=32, depth=2)
    _, r2 = flow_register(moving, target, lr=2e-3, max_epochs=5,
                          criterions=["mse"], optimizer="adam", n=32, depth=2,
                          init_params=r1.params)
    l1 = np.asarray(r1.losses)[0]
    l2 = np.asarray(r2.losses)[0]
    assert l2 < l1  # warm start resumes from the optimized params


def test_flow_deform_reapplies_to_other_channels():
    moving, target = _pair_2d()
    _, res = flow_register(
        moving, target, lr=1e-3, max_epochs=5, criterions=["mse"], n=32, depth=2
    )
    multi = jnp.concatenate([moving, moving * 2.0], axis=1)  # [1,2,H,W]
    out = warp_flow(multi, res.flow)
    assert out.shape == multi.shape
    np.testing.assert_allclose(
        np.asarray(out[:, 1]), 2 * np.asarray(out[:, 0]), rtol=1e-4, atol=1e-5
    )


def test_flow_progress_every_prints_and_matches(capsys):
    """progress_every segments the loop via one compiled chunk program; the
    result must equal the unsegmented run (same step sequence) and progress
    lines must appear (SURVEY §5 tqdm analog, warpings.py:208,222-229)."""
    import numpy as np
    from torchregister_tpu.engines.flow import flow_register

    rng = np.random.default_rng(5)
    m = jnp.asarray(rng.normal(size=(1, 1, 20, 20)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(1, 1, 20, 20)).astype(np.float32))
    kw = dict(lr=1e-3, max_epochs=6, n=32, depth=1, criterions=["mse"],
              optimizer="adam", check_disp=False)
    _, r1 = flow_register(m, t, **kw)
    _, r2 = flow_register(m, t, progress_every=2, **kw)
    out = capsys.readouterr().out
    assert "epoch 2/6" in out and "epoch 6/6" in out
    np.testing.assert_allclose(np.asarray(r1.flow), np.asarray(r2.flow),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(r1.losses), np.asarray(r2.losses),
                               rtol=1e-6, atol=1e-7)


def test_flow_register_accepts_dtype_class():
    """dtype=jnp.bfloat16 (the common JAX idiom, a dtype CLASS) must hit the
    same build cache as dtype='bfloat16' instead of crashing the builder
    (pre-fix: str(class) reached jnp.dtype and raised TypeError)."""
    moving, target = _pair_2d()
    warped, res = flow_register(
        moving, target, lr=0.3, max_epochs=3, criterions=["mse"],
        optimizer="adam", flow_model="field", smooth=0.3, max_disp=2,
        dtype=jnp.bfloat16,
    )
    assert res.flow.dtype == jnp.float32
    assert np.isfinite(np.asarray(res.losses)[:3]).all()


def test_flow_register_field_sgd_default_warns():
    """The unet-parity defaults (sgd, lr=1e-3) are a measured near-no-op on a
    direct field — the engine must warn instead of failing silently."""
    import warnings as _w

    moving, target = _pair_2d()
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        flow_register(
            moving, target, max_epochs=2, criterions=["mse"],
            flow_model="field", max_disp=2,
        )
    assert any("barely moves" in str(r.message) for r in rec)
