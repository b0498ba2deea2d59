"""Public ``Register`` API parity tests (reference torchregister.py:11-129)."""
import numpy as np
import jax.numpy as jnp
import pytest

import torchregister_tpu as tr
from torchregister_tpu.ops.resample import warp_affine
from torchregister_tpu.ops.transforms import rigid_theta


def _blob(shape, seed=0):
    rng = np.random.default_rng(seed)
    grids = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    vol = np.zeros(shape, np.float32)
    for _ in range(5):
        c = rng.uniform(-0.4, 0.4, len(shape))
        w = rng.uniform(0.15, 0.3)
        vol += np.exp(-sum((g - ci) ** 2 for g, ci in zip(grids, c)) / (2 * w**2))
    return jnp.asarray(vol[None, None])


def test_register_defaults_match_reference_api():
    reg = tr.Register()
    assert reg.mode == "rigid"
    assert reg.criterion is None and reg.weight is None
    assert reg.grad_edges is False  # torchregister.py:12 API-level default
    assert reg.debug is False
    assert reg.theta is None


def test_register_rejects_bad_mode():
    with pytest.raises(ValueError):
        tr.Register(mode="elastic")


def test_register_call_before_optim_raises():
    with pytest.raises(RuntimeError):
        tr.Register()(jnp.zeros((1, 1, 4, 4)))


def test_rigid_mode_end_to_end():
    moving = _blob((32, 32))
    true = rigid_theta(jnp.asarray([0.1, 0.05, -0.03], jnp.float32))[None]
    target = warp_affine(true, moving)

    reg = tr.Register(mode="rigid", criterion=["mse"], optimizer="adam",
                      init="identity")
    reg.optim(moving, target, lr=5e-3, max_epochs=150)
    assert reg.theta.shape == (1, 2, 3)
    np.testing.assert_allclose(np.asarray(reg.theta), np.asarray(true), atol=0.05)

    warped = reg(moving)
    assert warped.shape == moving.shape
    rmse = float(jnp.sqrt(jnp.mean((warped - target) ** 2)))
    base = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    assert rmse < 0.5 * base


def test_affine_mode_stores_best_theta():
    moving = _blob((24, 24), seed=1)
    target = _blob((24, 24), seed=2)
    reg = tr.Register(mode="affine", criterion=["mse"])
    reg.optim(moving, target, lr=1e-4, max_epochs=5)
    assert reg.theta.shape == (1, 2, 3)
    assert reg.losses is not None and len(np.asarray(reg.losses)) == 5


def test_multichannel_warp_applies_same_transform_per_channel():
    moving = _blob((20, 20), seed=3)
    target = _blob((20, 20), seed=4)
    reg = tr.Register(mode="affine", criterion=["mse"])
    reg.optim(moving, target, lr=1e-4, max_epochs=2)
    multi = jnp.concatenate([moving, 3.0 * moving], axis=1)
    out = reg(multi)
    assert out.shape == (1, 2, 20, 20)
    np.testing.assert_allclose(
        np.asarray(out[:, 1]), 3 * np.asarray(out[:, 0]), rtol=1e-4, atol=1e-5
    )


def test_flow_mode_end_to_end():
    moving = _blob((24, 24), seed=5)
    target = _blob((24, 24), seed=6)
    reg = tr.Register(mode="flow", criterion=["mse"], optimizer="adam")
    reg.optim(moving, target, lr=2e-3, max_epochs=10, n=32)
    assert reg.theta.shape == (1, 2, 24, 24)  # dense flow stored as theta
    warped = reg(moving)
    assert warped.shape == moving.shape


def test_flow_mode_default_path_recovers_shift():
    """The OUT-OF-BOX flow path must work: ``Register(mode='flow')`` with no
    optimizer/lr/criterion arguments (r3 VERDICT #1 — the default flow mode
    must be defensible). flow_model='field' resolves optimizer=adam and
    lr=0.3 (SGD's ~1/numel similarity gradients cannot move a direct
    per-voxel field); a 2-voxel shift is recovered to >70% RMSE reduction."""
    moving = _blob((28, 28), seed=9)
    target = jnp.roll(moving, -2, axis=2)
    reg = tr.Register(mode="flow")
    assert reg.optimizer == "adam" and reg.flow_model == "field"
    reg.optim(moving, target, max_epochs=150)
    warped = reg(moving)
    r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    r1 = float(jnp.sqrt(jnp.mean((warped - target) ** 2)))
    assert r1 < 0.3 * r0, (r0, r1)
    # the parity modes keep the reference defaults (warpings.py:58,131,192)
    assert tr.Register(mode="rigid").optimizer == "sgd"
    assert tr.Register(mode="flow", flow_model="unet").optimizer == "sgd"


def test_norm():
    x = jnp.asarray([[0.0, 5.0], [10.0, 2.5]])
    out = np.asarray(tr.norm(x))
    assert out.min() == 0.0
    np.testing.assert_allclose(out.max(), 1.0, rtol=1e-6)
    # failure path returns None with a warning (reference utils.py:262-267)
    assert tr.norm(object()) is None


def test_save_load_transform(tmp_path):
    from torchregister_tpu.utils.io import load_transform, save_transform

    moving = _blob((16, 16), seed=7)
    reg = tr.Register(mode="affine", criterion=["mse"])
    reg.optim(moving, moving, lr=1e-6, max_epochs=2)
    p = str(tmp_path / "t.npz")
    save_transform(p, reg)

    reg2 = tr.Register(mode="affine")
    load_transform(p, reg2)
    np.testing.assert_allclose(np.asarray(reg2.theta), np.asarray(reg.theta))
    out = reg2(moving)
    assert out.shape == moving.shape
    # rigid<->affine interchange is fine (both are [1,d,d+1] matrices)
    load_transform(p, tr.Register(mode="rigid"))
    # but loading a matrix transform into a flow Register would misapply it
    with pytest.raises(ValueError, match="misapply"):
        load_transform(p, tr.Register(mode="flow"))


def test_save_load_transform_flow_key(tmp_path):
    """Flow-mode save_transform stores the field under "flow" (regression:
    it used "theta", which the CLI apply dispatcher misread as a matrix)."""
    from torchregister_tpu.utils.io import load_pytree, load_transform, save_transform

    moving = _blob((16, 16), seed=11)
    target = _blob((16, 16), seed=12)
    reg = tr.Register(mode="flow", criterion=["mse"], optimizer="adam")
    reg.optim(moving, target, lr=2e-3, max_epochs=4, n=32)
    p = str(tmp_path / "flow.npz")
    save_transform(p, reg)
    tree = load_pytree(p)
    assert "flow" in tree and "theta" not in tree

    reg2 = tr.Register(mode="flow")
    load_transform(p, reg2)
    np.testing.assert_allclose(np.asarray(reg2.theta), np.asarray(reg.theta))
    with pytest.raises(ValueError, match="misapply"):
        load_transform(p, tr.Register(mode="rigid"))


def test_debug_flag_prints_summary(capsys):
    moving = _blob((16, 16), seed=8)
    reg = tr.Register(mode="affine", criterion=["mse"], debug=True)
    reg.optim(moving, moving, lr=1e-6, max_epochs=2)
    captured = capsys.readouterr()
    assert "loss" in captured.out
    # reference-parity epochs/10 observability: per-decile epoch lines with
    # the raw parameter trajectory (warpings.py:95-102,135-136,161-169)
    assert "epoch" in captured.out
    assert "params" in captured.out


def test_debug_flow_convergence_message(capsys):
    moving = _blob((16, 16), seed=9)
    reg = tr.Register(mode="flow", criterion=["mse"], debug=True)
    reg.optim(moving, moving, lr=1e-4, max_epochs=2, n=32)
    captured = capsys.readouterr()
    assert "converge" in captured.out  # warpings.py:231-236 analog


def test_param_history_carried():
    moving = _blob((16, 16), seed=10)
    reg = tr.Register(mode="rigid", criterion=["mse"], init="identity")
    reg.optim(moving, moving, lr=1e-4, max_epochs=5)
    hist = np.asarray(reg.result.param_history)
    assert hist.shape == (5, 3)  # 2D rigid: [theta, t0, t1] per epoch
    np.testing.assert_allclose(hist[0], 0.0, atol=1e-7)  # identity init


def test_nmi_checkified_guard():
    from torchregister_tpu.losses.nmi import nmi_loss_checkified

    good = _blob((24, 24), seed=11)
    err, loss = nmi_loss_checkified(good, good, patch_size=8, bins=32)
    err.throw()  # no error on finite inputs
    assert np.isfinite(float(loss))
    bad = good.at[0, 0, 0, 0].set(jnp.nan)
    err, _ = nmi_loss_checkified(bad, good, patch_size=8, bins=32)
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_debug_preflight_raises_on_nan_input_with_nmi():
    moving = _blob((24, 24), seed=12)
    bad = moving.at[0, 0, 0, 0].set(jnp.nan)
    reg = tr.Register(mode="rigid", criterion=None, debug=True, init="identity")
    with pytest.raises(Exception, match="non-finite"):
        reg.optim(bad, moving, lr=1e-5, max_epochs=1)


def test_load_transform_rejects_cascade_composite(tmp_path):
    """A CLI cascade transform (theta AND flow) must not load into a Register
    — either half alone would silently produce a wrong warp."""
    from torchregister_tpu.utils.io import load_transform, save_pytree

    p = str(tmp_path / "casc.npz")
    save_pytree(p, {"mode": np.asarray("cascade"),
                    "theta": np.zeros((1, 2, 3), np.float32),
                    "flow": np.zeros((1, 2, 8, 8), np.float32)})
    with pytest.raises(ValueError, match="composite cascade"):
        load_transform(p, tr.Register(mode="flow"))


def test_load_transform_infers_mode_from_keys(tmp_path):
    """Mode-less files (older, or hand-built) must still hit the misapply
    guard: a flow payload cannot load into a rigid Register (pre-fix the
    check was silently skipped when 'mode' was absent)."""
    from torchregister_tpu.utils.io import load_transform, save_pytree

    p = str(tmp_path / "nomode.npz")
    save_pytree(p, {"flow": np.zeros((1, 2, 8, 8), np.float32)})
    with pytest.raises(ValueError, match="misapply"):
        load_transform(p, tr.Register(mode="rigid"))
    reg = tr.Register(mode="flow")
    load_transform(p, reg)
    assert reg.theta.shape == (1, 2, 8, 8)


def test_save_pytree_normalizes_npz_suffix(tmp_path):
    """np.savez silently appends .npz — save_pytree must report the real
    filename so a later load doesn't FileNotFoundError."""
    from torchregister_tpu.utils.io import load_pytree, save_pytree

    p = str(tmp_path / "bare")
    written = save_pytree(p, {"x": np.ones(3, np.float32)})
    assert written.endswith(".npz")
    assert load_pytree(written)["x"].shape == (3,)
