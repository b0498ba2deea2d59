"""ROI-gather kernel + warp path tests (interpret mode on CPU).

The compiled kernel's value parity on real hardware is gated by the bench
selftest (bench.py); these pin the kernel *semantics* and the XLA hat side
against the existing exact paths.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from torchregister_tpu.ops.blocked import (
    _roi_supports,
    warp_affine_blocked,
    warp_affine_roi,
)
from torchregister_tpu.ops.pallas.roigather import AW, BW, CW, QB, roigather
from torchregister_tpu.ops.resample import warp_affine
from torchregister_tpu.ops.transforms import rigid_theta


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


def test_roigather_kernel_fetches_and_restacks():
    """out[t, c, ab] == volp[org_z + ab//BW, org_y + ab%BW, ox + c]."""
    Z, Y, Xp = 48, 48, 128
    volp = _rand((Z, Y, Xp), 1)
    rng = np.random.default_rng(2)
    T = 5
    orgz = rng.integers(0, Z - 24, T)
    orgy = rng.integers(0, Y - 24, T)
    ox = rng.integers(0, Xp - CW, T)
    scal = np.stack(
        [orgz // QB, orgy // QB, orgz % QB, orgy % QB, ox], -1
    ).astype(np.int32)
    out = np.asarray(roigather(volp, jnp.asarray(scal)))
    v = np.asarray(volp)
    ab = np.arange(AW * BW)
    for t in range(T):
        want = v[
            np.minimum(orgz[t] + ab // BW, Z - 1)[None, :],
            np.minimum(orgy[t] + ab % BW, Y - 1)[None, :],
            (ox[t] + np.arange(CW))[:, None],
        ]
        # rows within the volume must match exactly (the +8 z/y pad rows a
        # real wrapper provides are absent here, so clamp the oracle and
        # only compare in-range columns)
        in_range = (orgz[t] + ab // BW < Z) & (orgy[t] + ab % BW < Y)
        np.testing.assert_array_equal(out[t][:, in_range], want[:, in_range])


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("shape", [(48, 48, 48), (45, 50, 41)])
def test_warp_affine_roi_matches_exact(align, shape):
    moving = _rand((1, 1) + shape, 3)
    theta = rigid_theta(
        jnp.asarray([0.2, -0.1, 0.15, 0.05, -0.03, 0.08], jnp.float32)
    )[None]
    ours = warp_affine_roi(theta, moving, align)
    assert ours is not None
    ref = warp_affine(theta, moving, align)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5
    )


def test_warp_affine_roi_zeros_padding_at_edges():
    """Support pushed outside the volume: grid_sample zeros semantics."""
    moving = jnp.ones((1, 1, 48, 48, 48), jnp.float32)
    theta = jnp.asarray(
        [[[1.0, 0, 0, 0.9], [0, 1.0, 0, -0.8], [0, 0, 1.0, 0.5]]]
    )
    ours = warp_affine_roi(theta, moving)
    assert ours is not None
    ref = warp_affine(theta, moving)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5
    )


def test_warp_affine_roi_multichannel():
    moving = _rand((1, 3, 48, 48, 48), 4)
    theta = rigid_theta(
        jnp.asarray([0.1, 0.05, -0.08, 0.1, 0.0, -0.05], jnp.float32)
    )[None]
    ours = warp_affine_roi(theta, moving)
    ref = warp_affine(theta, moving)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5
    )


def test_warp_affine_roi_declines_out_of_window_transforms():
    """Support wider than the kernel's static windows -> None (fallback)."""
    moving = _rand((1, 1, 48, 48, 48), 5)
    # 2x zoom-out: per-axis support extent 9*2+3 = 21 > the 16-wide window
    big = jnp.asarray(
        [[[2.0, 0, 0, 0.0], [0, 2.0, 0, 0.0], [0, 0, 2.0, 0.0]]]
    )
    assert (
        _roi_supports(
            np.asarray(big[0], np.float64), (48, 48, 48), False
        )
        is None
    )
    assert warp_affine_roi(big, moving) is None
    # the blocked path still covers it
    res = warp_affine_blocked(big, moving, block=26)
    ref = warp_affine(big, moving)
    np.testing.assert_allclose(
        np.asarray(res), np.asarray(ref), rtol=1e-4, atol=3e-5
    )


def test_warp_affine_roi_agrees_with_blocked():
    """Same values as the slice-gather blocked path (both exact)."""
    shape = (50, 47, 44)
    moving = _rand((1, 1) + shape, 6)
    theta = rigid_theta(
        jnp.asarray([0.15, -0.12, 0.1, 0.12, -0.08, 0.06], jnp.float32)
    )[None]
    roi = warp_affine_roi(theta, moving)
    from torchregister_tpu.ops.blocked import required_block_affine

    B = max(10, required_block_affine(theta, shape))
    blk = warp_affine_blocked(theta, moving, block=B)
    np.testing.assert_allclose(
        np.asarray(roi), np.asarray(blk), rtol=1e-4, atol=3e-5
    )
