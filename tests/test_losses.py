"""Loss parity/property tests.

Dense numpy oracles reimplement the reference loss *formulas* directly (from
their documented semantics) to validate the chunked/streamed TPU formulations.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchregister_tpu.losses import (
    get_criterion,
    resolve_criteria,
    weighted_loss,
)
from torchregister_tpu.losses.nmi import get_pdf, nmi, nmi_loss
from torchregister_tpu.losses.similarity import lncc, mse, ncc, ssd

EPS = 1e-10


def _rand(shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).random(size=shape) * scale).astype(np.float32)


# ------------------------------------------------------------------- simple


def test_mse_matches_numpy():
    y, yp = _rand((1, 1, 8, 8), 0), _rand((1, 1, 8, 8), 1)
    np.testing.assert_allclose(
        float(mse(jnp.asarray(y), jnp.asarray(yp))), np.mean((y - yp) ** 2), rtol=1e-6
    )


def test_ssd_matches_numpy():
    y, yp = _rand((1, 1, 6, 6), 2), _rand((1, 1, 6, 6), 3)
    np.testing.assert_allclose(
        float(ssd(jnp.asarray(y), jnp.asarray(yp))), 3 * np.sum((y - yp) ** 2), rtol=1e-5
    )


def test_ncc_self_is_zero():
    y = _rand((1, 1, 16, 16), 4)
    assert abs(float(ncc(jnp.asarray(y), jnp.asarray(y)))) < 1e-3


def test_ncc_matches_reference_formula():
    y, yp = _rand((1, 1, 10, 10), 5), _rand((1, 1, 10, 10), 6)
    y_, yp_ = y - y.mean(), yp - yp.mean()
    expected = (1 - (y_ * yp_).sum() / np.sqrt((y_**2).sum() * (yp_**2).sum() + EPS)) * 100
    np.testing.assert_allclose(
        float(ncc(jnp.asarray(y), jnp.asarray(yp))), expected, rtol=1e-4
    )


def test_ncc_anticorrelated_near_two_alpha():
    y = _rand((1, 1, 32, 32), 7) - 0.5
    val = float(ncc(jnp.asarray(y), jnp.asarray(-y)))
    assert abs(val - 200.0) < 1e-2


def test_lncc_self_is_zero_and_positive_otherwise():
    y = _rand((1, 1, 24, 24), 8)
    assert abs(float(lncc(jnp.asarray(y), jnp.asarray(y)))) < 1e-2
    yp = _rand((1, 1, 24, 24), 9)
    assert float(lncc(jnp.asarray(y), jnp.asarray(yp))) > 1.0


# ---------------------------------------------------------------------- KDE


def _np_pdf(data, steps, bandwidth):
    """Dense numpy oracle for the reference get_pdf/PDF/K_gauss chain
    (utils.py:18-53), including the descending (max->min) sample grid."""
    signals = data.reshape(data.shape[0], -1).astype(np.float64)
    hi, lo = signals.max(), signals.min()
    xis = np.linspace(hi, lo, steps)
    u = (signals[:, :, None] - xis[None, None, :]) / bandwidth
    k = (1 / (2 * np.pi)) * np.exp(-(u**2) / 2)
    return (1 / bandwidth) * k.mean(axis=1)


def test_get_pdf_matches_dense_oracle():
    data = _rand((2, 17, 13), 10)
    ours = np.asarray(get_pdf(jnp.asarray(data), steps=64, bandwidth=0.5))
    ref = _np_pdf(data, 64, 0.5)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)


def test_get_pdf_chunked_matches_unchunked():
    # L > chunk forces the scan path; compare against the dense oracle.
    data = _rand((2, 40, 500), 11)  # L = 20000 > 8192
    ours = np.asarray(get_pdf(jnp.asarray(data), steps=32, bandwidth=1.0))
    ref = _np_pdf(data, 32, 1.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-8)


def _np_nmi(img1, img2, bins, bandwidth):
    h1 = _np_pdf(img1, bins, bandwidth)
    h2 = _np_pdf(img2, bins, bandwidth)
    hj = _np_pdf(np.stack((img1, img2), axis=1), bins, bandwidth)
    p1 = h1 / h1.sum(1, keepdims=True)
    p2 = h2 / h2.sum(1, keepdims=True)
    pj = hj / hj.sum(1, keepdims=True)
    e1 = -np.sum(p1 * -np.log2(p1 + EPS), axis=1)
    e2 = -np.sum(p2 * -np.log2(p2 + EPS), axis=1)
    ej = -np.sum(pj * -np.log2(pj + EPS), axis=1)
    mi = e1 + e2 - ej
    return 2 * mi / (e1 + e2)


def test_nmi_matches_dense_oracle():
    a = _rand((3, 11, 11), 12)
    b = _rand((3, 11, 11), 13)
    ours, _ = nmi(jnp.asarray(a), jnp.asarray(b), bins=48, bandwidth=0.3)
    ref = _np_nmi(a, b, 48, 0.3)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3)


def test_nmi_identical_images_higher_than_random():
    a = _rand((1, 20, 20), 14)
    b = _rand((1, 20, 20), 15)
    n_self, _ = nmi(jnp.asarray(a), jnp.asarray(a), bins=32, bandwidth=0.1)
    n_rand, _ = nmi(jnp.asarray(a), jnp.asarray(b), bins=32, bandwidth=0.1)
    assert float(n_self[0]) > float(n_rand[0])


def test_nmi_loss_runs_and_matches_oracle_small_patch():
    y = _rand((1, 1, 9, 9), 16)
    yp = _rand((1, 1, 9, 9), 17)
    val = float(
        nmi_loss(jnp.asarray(y), jnp.asarray(yp), alpha=10.0, bins=16, patch_size=4,
                 bandwidth=0.5)
    )
    # Oracle: nearest-resize to (8, 8), flat reshape to (4, 4, 4), NMI.
    import torch
    import torch.nn.functional as F

    ty = F.interpolate(torch.from_numpy(y), size=(8, 8), mode="nearest")
    typ = F.interpolate(torch.from_numpy(yp), size=(8, 8), mode="nearest")
    ry = ty.reshape(4, 4, 4).numpy()
    ryp = typ.reshape(4, 4, 4).numpy()
    ref = np.mean(np.abs(_np_nmi(ry, ryp, 16, 0.5) - 1.0)) * 10.0
    # f32 implementation vs f64 oracle; |NMI - 1| is a small difference of
    # near-equal entropies, so allow 1% relative.
    np.testing.assert_allclose(val, ref, rtol=1e-2)


def test_nmi_loss_is_differentiable():
    y = jnp.asarray(_rand((1, 1, 8, 8), 18))
    yp = jnp.asarray(_rand((1, 1, 8, 8), 19))
    g = jax.grad(lambda p: nmi_loss(y, p, alpha=1.0, bins=8, patch_size=4, bandwidth=0.5))(yp)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------- combinator


def test_weighted_loss():
    y = jnp.asarray(_rand((1, 1, 8, 8), 20))
    yp = jnp.asarray(_rand((1, 1, 8, 8), 21))
    loss = weighted_loss([mse, ncc], [0.5, 0.25])
    expected = 0.5 * float(mse(y, yp)) + 0.25 * float(ncc(y, yp))
    np.testing.assert_allclose(float(loss(y, yp)), expected, rtol=1e-6)


def test_resolve_criteria_default_stack():
    crits, w = resolve_criteria(None, None)
    assert len(crits) == 3
    assert w == (0.33, 0.33, 0.33)


def test_resolve_criteria_user_list_is_honored():
    crits, w = resolve_criteria(["mse", "ncc"], [0.7, 0.3])
    assert len(crits) == 2 and w == (0.7, 0.3)
    # Divergence from the reference bug (warpings.py:36-40) which would discard
    # the user's list: here 'ncc' must actually be NCC.
    y = jnp.ones((1, 1, 4, 4))
    assert float(crits[0](y, y)) == 0.0


def test_get_criterion_rejects_unknown():
    with pytest.raises(KeyError):
        get_criterion("nope")


# ------------------------------------------------------------- binned KDE


def test_get_pdf_binned_matches_exact_at_loss_defaults():
    """The fast splat+convolve KDE must agree with the per-voxel exact path
    at the default-stack operating point (normalized intensities,
    NMILoss bandwidth 3.0 — reference utils.py:224-259)."""
    data = np.random.default_rng(30).uniform(size=(4, 40, 40)).astype(np.float32)
    exact = np.asarray(get_pdf(jnp.asarray(data), steps=64, bandwidth=3.0,
                               method="exact"))
    binned = np.asarray(get_pdf(jnp.asarray(data), steps=64, bandwidth=3.0,
                                method="binned"))
    np.testing.assert_allclose(binned, exact, rtol=1e-5, atol=1e-9)


def test_get_pdf_auto_falls_back_on_underresolved_bandwidth():
    """Huge intensity range + small bandwidth: the splat grid cannot resolve
    the kernel (h < 4*delta_fine), so 'auto' must take the exact branch —
    pinned by demanding agreement with 'exact' at a tolerance the binned
    approximation could not meet there."""
    rng = np.random.default_rng(31)
    data = (rng.uniform(size=(2, 30, 30)) * 1000.0).astype(np.float32)
    exact = np.asarray(get_pdf(jnp.asarray(data), steps=32, bandwidth=0.5,
                               method="exact"))
    auto = np.asarray(get_pdf(jnp.asarray(data), steps=32, bandwidth=0.5))
    np.testing.assert_allclose(auto, exact, rtol=1e-5)
    # sanity: the binned path IS wrong here (documents why the cond exists)
    binned = np.asarray(get_pdf(jnp.asarray(data), steps=32, bandwidth=0.5,
                                method="binned"))
    assert np.max(np.abs(binned - exact) / (np.abs(exact) + 1e-12)) > 0.01


def test_binned_kde_is_differentiable():
    from torchregister_tpu.losses.nmi import kde_pdf_binned

    sig = jnp.asarray(_rand((2, 300), 32))

    def f(s):
        xis = jnp.linspace(1.0, 0.0, 16)
        return jnp.sum(kde_pdf_binned(s, xis, 0.5))

    g = jax.grad(f)(sig)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_nmi_loss_gradient_binned_matches_exact():
    """Engine-visible check: d nmi_loss/d yp through the binned path tracks
    the exact path's gradient (the splat's piecewise-linear weights carry the
    kernel's derivative to O(delta_fine))."""
    y = jnp.asarray(_rand((1, 1, 12, 12), 33))
    yp = jnp.asarray(_rand((1, 1, 12, 12), 34))

    def loss_with(method):
        import importlib

        # the package re-exports `nmi` (the function), shadowing the module
        # attribute — import the module explicitly
        nmi_mod = importlib.import_module("torchregister_tpu.losses.nmi")

        def f(p):
            sig_y = y.reshape(1, -1)
            sig_p = p.reshape(1, -1)
            h1 = nmi_mod.get_pdf(sig_y, 16, 0.5, method=method)
            h2 = nmi_mod.get_pdf(sig_p, 16, 0.5, method=method)
            return jnp.sum(h1 * h2)

        return jax.grad(f)(yp)

    g_exact = np.asarray(loss_with("exact")).ravel()
    g_binned = np.asarray(loss_with("binned")).ravel()
    scale = np.abs(g_exact).max() + 1e-12
    err = np.abs(g_binned - g_exact) / scale
    # the batch-extremal voxels sit exactly on the splat-grid boundary
    # (bounds are stop_gradded in both paths, reference utils.py:45-46);
    # their clipped positions give a boundary one-sided difference —
    # 2 voxels of the whole volume, excluded here
    vals = np.asarray(yp.ravel())
    interior = (vals > vals.min()) & (vals < vals.max())
    assert np.max(err[interior]) < 0.02, np.max(err[interior])
    assert np.sqrt(np.mean(err[interior] ** 2)) < 0.005


def test_nmi_loss_bf16_inputs_match_f32():
    """NMI must upcast to f32 internally: bf16 kernel-sum reductions lose the
    density entirely (measured pre-fix: loss off by 4-5 orders, gradient
    cosine ~0 vs f32). Reachable via matrix_dtype='bfloat16' + the reference
    default criterion stack."""
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.random((1, 1, 24, 24), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 1, 24, 24), dtype=np.float32))
    lf32 = float(nmi_loss(a, b))
    lbf16 = float(nmi_loss(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)))
    # identical up to the bf16 input quantization itself
    assert abs(lbf16 - lf32) < 0.05 * max(abs(lf32), 1.0)


def test_get_pdf_rejects_unknown_method():
    import pytest

    from torchregister_tpu.losses.nmi import get_pdf

    with pytest.raises(ValueError, match="method"):
        get_pdf(jnp.zeros((1, 64)), method="binnedd")


def test_lncc_bf16_inputs_match_f32():
    """lncc must upcast like every other loss: bf16 box-filter moment sums
    lose the windows (measured pre-fix: 15% off + a dtype TypeError when the
    scalar reached the f32 loss history)."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((1, 1, 32, 32), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 1, 32, 32), dtype=np.float32))
    lf32 = float(lncc(a, b))
    lbf16 = float(lncc(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)))
    assert jnp.asarray(lncc(a.astype(jnp.bfloat16), b)).dtype == jnp.float32
    assert abs(lbf16 - lf32) < 0.05 * max(abs(lf32), 1.0)


def test_lncc_offset_invariant():
    """One-pass moments cancel catastrophically on a large DC offset unless
    the inputs are globally centered first (pre-fix: uncorrelated noise at
    offset 1000 scored lncc=26 instead of ~100)."""
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.random((1, 1, 32, 32), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 1, 32, 32), dtype=np.float32))
    base = float(lncc(a, b))
    shifted = float(lncc(a + 1000.0, b + 1000.0))
    assert abs(shifted - base) < 0.02 * abs(base)
