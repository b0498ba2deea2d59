"""Engine recovery tests: apply a known perturbation, assert the optimizer
recovers it (the JAX analog of the reference README driver, SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp

from torchregister_tpu.engines.affine import affine_register
from torchregister_tpu.engines.rigid import init_rigid_params, rigid_register
from torchregister_tpu.ops.resample import warp_affine
from torchregister_tpu.ops.transforms import rigid_theta
import pytest

pytestmark = pytest.mark.slow  # full engine recovery optimizations (smoke tier: -m 'not slow')


def _blob_volume(shape, seed=0):
    """Smooth synthetic volume: sum of gaussian blobs (registration-friendly)."""
    rng = np.random.default_rng(seed)
    grids = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    vol = np.zeros(shape, np.float32)
    for _ in range(6):
        c = rng.uniform(-0.5, 0.5, size=len(shape))
        w = rng.uniform(0.1, 0.3)
        d2 = sum((g - ci) ** 2 for g, ci in zip(grids, c))
        vol += np.exp(-d2 / (2 * w**2)).astype(np.float32)
    return vol[None, None]


def test_rigid_recovery_2d():
    moving = jnp.asarray(_blob_volume((48, 48)))
    true_params = jnp.asarray([0.12, 0.08, -0.05], jnp.float32)
    target = warp_affine(rigid_theta(true_params)[None], moving)

    warped, res = rigid_register(
        moving, target, lr=5e-3, epochs=200, criterions=["mse"],
        grad_edges=False, optimizer="adam", init="identity",
    )
    losses = np.asarray(res.losses)
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])
    err = float(jnp.mean(jnp.abs(res.best_theta - rigid_theta(true_params)[None])))
    assert err < 0.03, err


def test_rigid_recovery_3d():
    moving = jnp.asarray(_blob_volume((24, 24, 24), seed=1))
    true_params = jnp.asarray([0.1, -0.06, 0.04, 0.3, -0.2, 0.1], jnp.float32)
    target = warp_affine(rigid_theta(true_params)[None], moving)

    warped, res = rigid_register(
        moving, target, lr=5e-3, epochs=300, criterions=["mse", "ncc"],
        weights=[0.5, 0.5], grad_edges=False, optimizer="adam", init="identity",
    )
    losses = np.asarray(res.losses)
    assert losses[-1] < losses[0] * 0.3
    # residual image error after warping with the recovered transform
    final = warp_affine(res.best_theta, moving)
    rmse = float(jnp.sqrt(jnp.mean((final - target) ** 2)))
    base = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    assert rmse < 0.3 * base, (rmse, base)


def test_affine_recovery_2d():
    moving = jnp.asarray(_blob_volume((40, 40), seed=2))
    true = jnp.asarray([[[0.95, 0.08, 0.05], [-0.06, 1.04, -0.04]]], jnp.float32)
    target = warp_affine(true, moving)

    warped, res = affine_register(
        moving, target, lr=5e-3, epochs=300, criterions=["mse"],
        grad_edges=False, optimizer="adam",
    )
    err = float(jnp.max(jnp.abs(res.best_theta - true)))
    assert err < 0.05, err


def test_affine_starts_at_identity():
    moving = jnp.asarray(_blob_volume((16, 16), seed=3))
    _, res = affine_register(
        moving, moving, lr=1e-9, epochs=1, criterions=["mse"], grad_edges=False
    )
    np.testing.assert_allclose(
        np.asarray(res.final_theta[0]), [[1, 0, 0], [0, 1, 0]], atol=1e-6
    )
    # self-registration at identity: loss ~ 0
    assert float(res.losses[0]) < 1e-10


def test_best_theta_tracks_minimum_loss():
    moving = jnp.asarray(_blob_volume((20, 20), seed=4))
    true_params = jnp.asarray([0.2, 0.1, -0.1], jnp.float32)
    target = warp_affine(rigid_theta(true_params)[None], moving)
    # Aggressive lr so the loss is non-monotone -> best != final.
    _, res = rigid_register(
        moving, target, lr=0.5, epochs=100, criterions=["mse"],
        grad_edges=False, optimizer="sgd", init="identity",
    )
    losses = np.asarray(res.losses)
    assert abs(float(res.best_loss) - losses.min()) < 1e-9


def test_rigid_random_init_matches_torch_rand_range():
    p = init_rigid_params(3, jax.random.key(1), init="random")
    assert p.shape == (6,)
    assert np.all((np.asarray(p) >= 0) & (np.asarray(p) < 1))
    p2 = init_rigid_params(2, init="identity")
    np.testing.assert_allclose(np.asarray(p2), 0)


def test_grad_edges_path_runs():
    moving = jnp.asarray(_blob_volume((16, 16, 16), seed=5))
    target = jnp.asarray(_blob_volume((16, 16, 16), seed=6))
    _, res = rigid_register(
        moving, target, lr=1e-4, epochs=3, criterions=["mse"],
        grad_edges=True, init="identity",
    )
    assert np.isfinite(np.asarray(res.losses)).all()


def test_default_criterion_stack_runs_small():
    # MSE+NCC+NMI default stack on a tiny pair (NMI patch shrunk via a custom
    # criterion to keep the test fast).
    from torchregister_tpu.losses import get_criterion

    small_nmi = get_criterion("nmi", patch_size=8, bins=32, bandwidth=0.5)
    moving = jnp.asarray(_blob_volume((16, 16), seed=7))
    target = jnp.asarray(_blob_volume((16, 16), seed=8))
    _, res = rigid_register(
        moving, target, lr=1e-5, epochs=3,
        criterions=["mse", "ncc", small_nmi], weights=[0.33, 0.33, 0.33],
        grad_edges=False, init="identity",
    )
    assert np.isfinite(np.asarray(res.losses)).all()


def test_rigid_plateau_early_stop():
    """stop_rel plateau stopping: on an already-aligned pair the loss can't
    improve, so the loop exits after ~patience steps (NaN-padded losses); and
    with stop_rel the well-posed problem still recovers the transform."""
    moving = jnp.asarray(_blob_volume((20, 20), seed=3))
    # aligned pair: immediate plateau
    _, res = rigid_register(
        moving, moving, lr=1e-4, epochs=300, criterions=["mse"],
        grad_edges=False, optimizer="adam", init="identity",
        stop_rel=1e-4, patience=10,
    )
    losses = np.asarray(res.losses)
    executed = int(np.isfinite(losses).sum())
    assert executed < 50, executed  # stopped long before the 300 budget
    # misaligned pair: must still register correctly with early stop enabled
    theta = rigid_theta(jnp.asarray([0.06, 0.1, -0.05], jnp.float32))[None]
    target = warp_affine(theta, moving)
    _, res2 = rigid_register(
        moving, target, lr=5e-3, epochs=400, criterions=["mse"],
        grad_edges=False, optimizer="adam", init="identity",
        stop_rel=1e-4, patience=25,
    )
    np.testing.assert_allclose(
        np.asarray(res2.best_theta), np.asarray(theta), atol=0.05
    )


def test_early_stop_disabled_matches_scan_path():
    """stop_rel=None keeps the original scan semantics bit-for-bit."""
    moving = jnp.asarray(_blob_volume((16, 16), seed=4))
    target = jnp.asarray(_blob_volume((16, 16), seed=5))
    kw = dict(lr=1e-3, epochs=12, criterions=["mse"], grad_edges=False,
              optimizer="adam", init="identity")
    _, r1 = rigid_register(moving, target, **kw)
    _, r2 = rigid_register(moving, target, stop_rel=1e-9, patience=1000, **kw)
    # patience > epochs: the while_loop never stops early; trajectories match
    np.testing.assert_allclose(
        np.asarray(r1.losses), np.asarray(r2.losses), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(r1.best_theta), np.asarray(r2.best_theta), rtol=1e-6, atol=1e-7
    )


def test_matrix_progress_chunked_matches_scan():
    """VERDICT r2 #8: segmented progress runs (one compiled chunk program,
    moving end index) must produce the same result as the one-shot scan path,
    while printing periodic epoch/loss/param lines."""
    import contextlib
    import io

    import numpy as np

    from torchregister_tpu.engines.rigid import rigid_register

    moving = _blob_volume_j((20, 20), seed=0)
    target = _blob_volume_j((20, 20), seed=1)
    _, plain = rigid_register(
        moving, target, lr=2e-3, epochs=12, grad_edges=False,
        criterions=["mse"], optimizer="adam", init="identity",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _, seg = rigid_register(
            moving, target, lr=2e-3, epochs=12, grad_edges=False,
            criterions=["mse"], optimizer="adam", init="identity",
            progress_every=4,
        )
    out = buf.getvalue()
    assert "[rigid_register] epoch 4/12" in out
    assert "params=" in out
    np.testing.assert_allclose(
        np.asarray(seg.best_theta), np.asarray(plain.best_theta),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(seg.losses), np.asarray(plain.losses), rtol=1e-5, atol=1e-7
    )


def test_matrix_progress_early_stop_segments():
    """Plateau early-stop composes with segmenting: the loop exits midway and
    says so."""
    import contextlib
    import io

    from torchregister_tpu.engines.affine import affine_register

    moving = _blob_volume_j((16, 16), seed=2)
    target = _blob_volume_j((16, 16), seed=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _, res = affine_register(
            moving, target, lr=1e-6, epochs=200, grad_edges=False,
            criterions=["mse"], optimizer="adam",
            stop_rel=1e-3, patience=3, progress_every=50,
        )
    assert int(res.steps) < 200
    assert "early-stop" in buf.getvalue()


def test_register_debug_emits_live_progress(capsys):
    import torchregister_tpu as tr

    moving = _blob_volume_j((16, 16), seed=3)
    target = _blob_volume_j((16, 16), seed=4)
    reg = tr.Register(mode="rigid", criterion=["mse"], debug=True,
                      optimizer="adam", init="identity")
    reg.optim(moving, target, lr=1e-3, max_epochs=20)
    out = capsys.readouterr().out
    assert "[rigid_register] epoch" in out


def _blob_volume_j(shape, seed=0):
    return jnp.asarray(_blob_volume(shape, seed))
