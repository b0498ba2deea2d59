"""Blocked exact resampler: grid_sample-parity vs the element-gather oracle.

The blocked path (ops/blocked.py) must reproduce ``warp_affine``/``warp_flow``
(themselves torch-oracle-tested in test_resample.py) to f32 summation
tolerance, including edge clipping / zeros padding, on volumes that are and
aren't TILE multiples.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from torchregister_tpu.ops.blocked import (
    TILE,
    required_block_affine,
    required_block_flow,
    warp_affine_blocked,
    warp_affine_fast,
    warp_flow_blocked,
    warp_flow_fast,
)
from torchregister_tpu.ops.resample import warp_affine, warp_flow
from torchregister_tpu.ops.transforms import rigid_theta


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


def _rot_theta(angle=0.3, t=(0.05, -0.03, 0.08)):
    params = jnp.asarray([angle, -angle / 2, angle / 3, t[0], t[1], t[2]], jnp.float32)
    return rigid_theta(params)[None]


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("shape", [(24, 24, 24), (25, 30, 27)])
def test_warp_affine_blocked_matches_exact(align, shape):
    moving = _rand((1, 1) + shape, 1)
    theta = _rot_theta(0.35)
    B = max(10, required_block_affine(theta, shape, align))
    ours = warp_affine_blocked(theta, moving, align, block=B)
    ref = warp_affine(theta, moving, align)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)


@pytest.mark.slow
def test_warp_affine_blocked_multichannel():
    moving = _rand((1, 3, 24, 24, 24), 2)
    theta = _rot_theta(0.2)
    ours = warp_affine_blocked(theta, moving, block=14)
    ref = warp_affine(theta, moving)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)


def test_warp_affine_blocked_zeros_padding_at_edges():
    """Large translation pushes support outside the volume: zeros semantics."""
    moving = jnp.ones((1, 1, 24, 24, 24), jnp.float32)
    theta = jnp.asarray([[[1.0, 0, 0, 0.9], [0, 1.0, 0, -0.8], [0, 0, 1.0, 0.5]]])
    B = max(10, required_block_affine(theta, (24, 24, 24), False))
    ours = warp_affine_blocked(theta, moving, block=B)
    ref = warp_affine(theta, moving)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)


def test_warp_affine_fast_auto_block_and_fallbacks():
    moving = _rand((1, 1, 24, 24, 24), 3)
    theta = _rot_theta(0.4)
    ours = warp_affine_fast(theta, moving)
    ref = warp_affine(theta, moving)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)
    # 2D input takes the blocked path too (r4): grid_sample-parity tolerance
    m2 = _rand((1, 1, 20, 20), 4)
    t2 = jnp.asarray([[[1.0, 0.1, 0.02], [-0.1, 1.0, -0.01]]])
    np.testing.assert_allclose(
        np.asarray(warp_affine_fast(t2, m2)),
        np.asarray(warp_affine(t2, m2)),
        rtol=1e-4,
        atol=3e-5,
    )
    # tiny 2D input (below TILE) still falls back to the exact path
    m3 = _rand((1, 1, 8, 8), 5)
    np.testing.assert_allclose(
        np.asarray(warp_affine_fast(t2, m3)),
        np.asarray(warp_affine(t2, m3)),
        rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("shape", [(32, 32), (37, 45)])
def test_warp_affine_blocked_2d_matches_exact(align, shape):
    moving = _rand((1, 1) + shape, 11)
    theta = jnp.asarray([[[0.95, 0.22, 0.05], [-0.22, 0.95, -0.08]]])
    B = max(10, required_block_affine(theta, shape, align))
    ours = warp_affine_blocked(theta, moving, align, block=B)
    ref = warp_affine(theta, moving, align)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)


def test_warp_affine_fast_2d_takes_blocked_path():
    """2D fast warps run the blocked path (not the element-gather fallback):
    value parity at grid_sample tolerance plus the multichannel fold."""
    moving = _rand((1, 3, 40, 36), 12)
    theta = jnp.asarray([[[1.0, 0.15, 0.1], [-0.15, 1.0, -0.05]]])
    ours = warp_affine_fast(theta, moving)
    ref = warp_affine(theta, moving)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)


@pytest.mark.parametrize("shape", [(32, 32), (29, 41)])
def test_warp_flow_blocked_2d_matches_exact(shape):
    src = _rand((1, 1) + shape, 13)
    flow = jnp.clip(_rand((1, 2) + shape, 14) * 1.5, -4.0, 4.0)
    B = required_block_flow(float(jnp.max(jnp.abs(flow))))
    ours = warp_flow_blocked(src, flow, block=B)
    ref = warp_flow(src, flow)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)


def test_warp_flow_fast_2d_auto():
    src = _rand((1, 2, 32, 32), 15)
    flow = jnp.clip(_rand((1, 2, 32, 32), 16) * 1.5, -3.0, 3.0)
    ours = warp_flow_fast(src, flow)
    ref = warp_flow(src, flow)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)


def test_required_block_scales_with_rotation():
    small = required_block_affine(_rot_theta(0.05), (64, 64, 64))
    big = required_block_affine(_rot_theta(0.9), (64, 64, 64))
    assert small < big
    assert small >= TILE


@pytest.mark.parametrize("shape", [(24, 24, 24), (22, 26, 25)])
def test_warp_flow_blocked_matches_exact(shape):
    src = _rand((1, 1) + shape, 5)
    flow = jnp.clip(_rand((1, 3) + shape, 6) * 1.5, -4.0, 4.0)
    B = required_block_flow(float(jnp.max(jnp.abs(flow))))
    ours = warp_flow_blocked(src, flow, block=B)
    ref = warp_flow(src, flow)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)


@pytest.mark.slow
def test_warp_flow_fast_auto():
    src = _rand((1, 2, 24, 24, 24), 7)
    flow = jnp.clip(_rand((1, 3, 24, 24, 24), 8) * 1.5, -4.0, 4.0)
    ours = warp_flow_fast(src, flow)
    ref = warp_flow(src, flow)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)
    # explicit max_disp avoids the readback and still matches
    ours2 = warp_flow_fast(src, flow, max_disp=4.0)
    np.testing.assert_allclose(np.asarray(ours2), np.asarray(ref), rtol=1e-4, atol=3e-5)


def test_warp_flow_fast_boundary_tiles_large_mean_flow():
    """Regression: non-TILE-multiple shape + smooth large-mean flow.

    Before edge-padding the flow in ``warp_flow_blocked``, zero-flow pad
    voxels in partial boundary tiles pulled the per-tile block origin toward
    identity coordinates, so real voxels near the high boundary silently
    lost interpolation support (max error ~2 vs the oracle at the advisor's
    repro). Exercises the auto-derived block size (``flow_tile_extent``).
    """
    shape = (25, 27, 26)
    src = _rand((1, 1) + shape, 30)
    # Smooth field with ~6-voxel mean displacement + gentle spatial variation.
    zz, yy, xx = jnp.meshgrid(
        *[jnp.linspace(0, jnp.pi, s) for s in shape], indexing="ij"
    )
    comp = 6.0 + 1.5 * jnp.sin(zz) * jnp.cos(yy) * jnp.sin(xx)
    flow = jnp.stack([comp, -comp, comp])[None].astype(jnp.float32)
    ours = warp_flow_fast(src, flow)
    ref = warp_flow(src, flow)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)
    # and the explicitly-blocked path at a few block sizes
    for B in (16, 20):
        np.testing.assert_allclose(
            np.asarray(warp_flow_blocked(src, flow, block=B)),
            np.asarray(ref), rtol=1e-4, atol=3e-5,
        )


def test_flow_tile_extent_bf16_flow_upcasts():
    """bf16 flows must not under-size the block: extent math runs in f32."""
    shape = (240, 12, 12)
    flow = jnp.zeros((1, 3) + shape, jnp.bfloat16)
    # ramp along z: at coords near 240 a bf16 identity+flow sum quantizes to
    # ~1-2 voxels, under-estimating the within-tile extent
    ramp = jnp.linspace(0.0, 5.0, shape[0]).reshape(-1, 1, 1)
    flow = flow.at[0, 0].set(ramp.astype(jnp.bfloat16))
    from torchregister_tpu.ops.blocked import flow_tile_extent

    ext = float(flow_tile_extent(flow))
    # true within-tile extent: (TILE-1) * (1 + 5/239) ≈ 9.19
    assert ext >= 9.0


@pytest.mark.slow
def test_warp_affine_fast_batched_shared_theta():
    """N volumes, one transform: folded into channels, still exact."""
    moving = _rand((3, 2, 24, 24, 24), 20)
    theta = _rot_theta(0.25)
    ours = warp_affine_fast(theta, moving)
    ref = warp_affine(jnp.broadcast_to(theta, (3, 3, 4)), moving)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)


def test_warp_affine_fast_batched_per_element_theta():
    moving = _rand((2, 1, 24, 24, 24), 21)
    thetas = jnp.concatenate([_rot_theta(0.2), _rot_theta(-0.15, (0.1, 0.0, -0.05))])
    ours = warp_affine_fast(thetas, moving)
    ref = warp_affine(thetas, moving)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)


def test_warp_flow_fast_batched():
    src = _rand((2, 1, 24, 24, 24), 22)
    flow = jnp.clip(_rand((2, 3, 24, 24, 24), 23) * 1.5, -4.0, 4.0)
    ours = warp_flow_fast(src, flow)
    ref = warp_flow(src, flow)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=3e-5)


# ------------------------------------------------------- super-tile resampler


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize(
    "shape,angle",
    [((48, 52, 41), 0.22), ((64, 64, 64), 0.0), ((80, 44, 56), 0.4)],
)
@pytest.mark.slow
def test_warp_affine_supertile_matches_exact(align, shape, angle):
    """Uniform-offset restack parity: non-SUPER-multiple shapes, rotations up
    to 0.4 rad, multichannel."""
    from torchregister_tpu.ops.blocked import (
        _supertile_plan,
        warp_affine_supertile,
    )

    moving = _rand((1, 2) + shape, 7)
    theta = _rot_theta(angle)
    plan = _supertile_plan(theta, shape, align)
    ours = warp_affine_supertile(theta, moving, align, plan=plan)
    ref = warp_affine(theta, moving, align)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=5e-5)


@pytest.mark.slow
def test_warp_affine_supertile_zeros_padding_at_edges():
    """Support pushed past the volume edge: zeros semantics (padded volume,
    no origin clipping)."""
    from torchregister_tpu.ops.blocked import (
        _supertile_plan,
        warp_affine_supertile,
    )

    shape = (44, 48, 41)
    moving = jnp.ones((1, 1) + shape, jnp.float32)
    theta = jnp.asarray([[[1.0, 0, 0, 0.9], [0, 1.0, 0, -0.8], [0, 0, 1.0, 0.5]]])
    plan = _supertile_plan(theta, shape, False)
    ours = warp_affine_supertile(theta, moving, plan=plan)
    ref = warp_affine(theta, moving)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=5e-5)


@pytest.mark.slow
def test_warp_affine_fast_routes_supertile(monkeypatch):
    """With the experimental flag on, the eager wrapper picks the super-tile
    path for >=SUPER volumes and stays exact."""
    from torchregister_tpu.ops import blocked

    monkeypatch.setattr(blocked, "SUPERTILE_ENABLED", True)
    shape = (48, 44, 52)
    moving = _rand((1, 1) + shape, 9)
    theta = _rot_theta(0.3)
    ours = warp_affine_fast(theta, moving)
    ref = warp_affine(theta, moving)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=5e-5)


def test_supertile_plan_scales_with_rotation():
    from torchregister_tpu.ops.blocked import _supertile_plan

    shape = (64, 64, 64)
    p0 = _supertile_plan(_rot_theta(0.0, (0, 0, 0)), shape, False)
    p1 = _supertile_plan(_rot_theta(0.5, (0, 0, 0)), shape, False)
    assert p1.block_sub > p0.block_sub
    assert p1.block_super > p0.block_super
    assert max(p1.bsub) >= max(p0.bsub)


@pytest.mark.parametrize("stile", [8, 5])
@pytest.mark.slow
def test_warp_affine_supertile_stile_variants(stile):
    """The sub-tile edge is a free parameter (divisor of SUPER): every stile
    must reproduce the element-gather oracle exactly (the hat-contraction
    FLOPs/voxel scale as block_sub^3, so smaller stiles are the candidate
    perf knob — measured on hardware, chosen via SUPER_STILE)."""
    from torchregister_tpu.ops.blocked import (
        _supertile_plan,
        warp_affine_supertile,
    )

    shape = (48, 52, 41)
    moving = _rand((1, 2) + shape, 11)
    theta = _rot_theta(0.3)
    plan = _supertile_plan(theta, shape, False, stile=stile)
    ours = warp_affine_supertile(theta, moving, plan=plan)
    ref = warp_affine(theta, moving)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=5e-5)


def test_warp_flow_fast_rejects_batch_mismatch():
    """A flow batch wider than src was silently truncated to flow[0] pre-fix
    (the exact fallback raised a vmap mismatch instead) — both now raise."""
    import pytest

    src = jnp.zeros((1, 1, 16, 16, 16))
    flow = jnp.zeros((2, 3, 16, 16, 16))
    with pytest.raises(ValueError, match="flow batch"):
        warp_flow_fast(src, flow, max_disp=2)
