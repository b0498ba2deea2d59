"""Resampler parity tests vs torch ``affine_grid``/``grid_sample`` oracles and
closed forms.

torch (CPU) is used strictly as an independent numerical oracle for the
grid_sample semantics the reference relies on — no reference code is imported.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from torchregister_tpu.ops.grid import affine_grid, identity_index_grid, normalized_grid
from torchregister_tpu.ops.resample import grid_sample, warp_affine, warp_flow


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


# ---------------------------------------------------------------- affine_grid


@pytest.mark.parametrize("align", [False, True])
def test_affine_grid_matches_torch_2d(align):
    theta = _rand((1, 2, 3), 1) * 0.5
    ours = np.asarray(affine_grid(jnp.asarray(theta), (5, 7), align_corners=align))
    ref = F.affine_grid(torch.from_numpy(theta), (1, 1, 5, 7), align_corners=align)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("align", [False, True])
def test_affine_grid_matches_torch_3d(align):
    theta = _rand((1, 3, 4), 2) * 0.5
    ours = np.asarray(affine_grid(jnp.asarray(theta), (4, 5, 6), align_corners=align))
    ref = F.affine_grid(torch.from_numpy(theta), (1, 1, 4, 5, 6), align_corners=align)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- grid_sample


@pytest.mark.parametrize("align", [False, True])
def test_grid_sample_matches_torch_2d(align):
    src = _rand((1, 2, 9, 11), 3)
    grid = (_rand((1, 6, 5, 2), 4) * 0.9).clip(-1.3, 1.3)
    ours = np.asarray(grid_sample(jnp.asarray(src), jnp.asarray(grid), align))
    ref = F.grid_sample(
        torch.from_numpy(src), torch.from_numpy(grid), mode="bilinear",
        padding_mode="zeros", align_corners=align,
    )
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("align", [False, True])
def test_grid_sample_matches_torch_3d(align):
    src = _rand((2, 1, 6, 7, 8), 5)
    grid = (_rand((2, 4, 3, 5, 3), 6) * 1.2).clip(-1.5, 1.5)
    ours = np.asarray(grid_sample(jnp.asarray(src), jnp.asarray(grid), align))
    ref = F.grid_sample(
        torch.from_numpy(src), torch.from_numpy(grid), mode="bilinear",
        padding_mode="zeros", align_corners=align,
    )
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- warp_affine


def test_warp_affine_identity_is_exact():
    src = _rand((1, 1, 8, 8, 8), 7)
    theta = jnp.asarray([[1.0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0]])  # flat [1,12]
    out = np.asarray(warp_affine(theta, jnp.asarray(src)))
    np.testing.assert_allclose(out, src, atol=1e-5)


def test_warp_affine_matches_torch():
    src = _rand((1, 1, 10, 12, 14), 8)
    theta = np.asarray(
        [[[0.95, 0.05, 0.0, 0.1], [-0.05, 1.02, 0.0, -0.07], [0.0, 0.0, 0.9, 0.03]]],
        dtype=np.float32,
    )
    ours = np.asarray(warp_affine(jnp.asarray(theta), jnp.asarray(src)))
    grid = F.affine_grid(torch.from_numpy(theta), (1, 1, 10, 12, 14), align_corners=False)
    ref = F.grid_sample(
        torch.from_numpy(src), grid, mode="bilinear", padding_mode="zeros",
        align_corners=False,
    )
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_warp_affine_flat_2d_theta():
    src = _rand((1, 1, 16, 16), 9)
    theta = jnp.asarray([[1.0, 0, 0, 0, 1, 0]])
    out = np.asarray(warp_affine(theta, jnp.asarray(src)))
    np.testing.assert_allclose(out, src, atol=1e-5)


# ------------------------------------------------------------------ warp_flow


def test_warp_flow_zero_flow_identity():
    src = _rand((1, 1, 6, 7, 8), 10)
    flow = jnp.zeros((1, 3, 6, 7, 8))
    out = np.asarray(warp_flow(jnp.asarray(src), flow))
    np.testing.assert_allclose(out, src, atol=1e-6)


def test_warp_flow_integer_shift_is_roll_with_zero_fill():
    src = _rand((1, 1, 8, 8), 11)
    flow = np.zeros((1, 2, 8, 8), np.float32)
    flow[:, 0] = 2.0  # sample from index i0+2 -> shifts content up by 2
    out = np.asarray(warp_flow(jnp.asarray(src), jnp.asarray(flow)))[0, 0]
    np.testing.assert_allclose(out[:6], src[0, 0, 2:], atol=1e-6)
    np.testing.assert_allclose(out[6:], 0.0, atol=1e-6)


def test_warp_flow_matches_torch_voxelmorph_convention():
    """Oracle replicating utils.py:350-365: normalize (grid+flow) with
    align_corners=True, reverse channel order, grid_sample align_corners=True."""
    rng = np.random.default_rng(12)
    src = rng.normal(size=(1, 1, 6, 7, 8)).astype(np.float32)
    flow = (rng.normal(size=(1, 3, 6, 7, 8)) * 1.5).astype(np.float32)

    ours = np.asarray(warp_flow(jnp.asarray(src), jnp.asarray(flow)))

    t_src = torch.from_numpy(src)
    t_flow = torch.from_numpy(flow)
    shape = (6, 7, 8)
    mesh = torch.meshgrid(*[torch.arange(s, dtype=torch.float32) for s in shape], indexing="ij")
    grid = torch.stack(mesh)[None]
    new_locs = grid + t_flow
    for i, s in enumerate(shape):
        new_locs[:, i] = 2 * (new_locs[:, i] / (s - 1) - 0.5)
    new_locs = new_locs.permute(0, 2, 3, 4, 1)[..., [2, 1, 0]]
    ref = F.grid_sample(t_src, new_locs, align_corners=True, mode="bilinear")
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_fractional_shift_on_ramp_closed_form():
    # Bilinear sampling of a linear ramp is exact: shifting by f interpolates
    # linearly.
    ramp = np.arange(16, dtype=np.float32).reshape(1, 1, 16, 1)
    ramp = np.broadcast_to(ramp, (1, 1, 16, 4)).copy()
    flow = np.zeros((1, 2, 16, 4), np.float32)
    flow[:, 0] = 0.25
    out = np.asarray(warp_flow(jnp.asarray(ramp), jnp.asarray(flow)))[0, 0]
    np.testing.assert_allclose(out[:15], ramp[0, 0, :15] + 0.25, atol=1e-5)


def test_identity_index_grid():
    g = np.asarray(identity_index_grid((3, 4)))
    assert g.shape == (2, 3, 4)
    np.testing.assert_allclose(g[0, :, 0], [0, 1, 2])
    np.testing.assert_allclose(g[1, 0, :], [0, 1, 2, 3])


def test_normalized_grid_conventions():
    g = np.asarray(normalized_grid((4,), align_corners=False))
    np.testing.assert_allclose(g[:, 0], (2 * np.arange(4) + 1) / 4 - 1, atol=1e-6)
    g = np.asarray(normalized_grid((4,), align_corners=True))
    np.testing.assert_allclose(g[:, 0], 2 * np.arange(4) / 3 - 1, atol=1e-6)


def test_grid_sample_bf16_grid_promotes_before_denorm():
    """A bf16 grid must be promoted BEFORE the normalized->index arithmetic:
    ((x+1)*S-1)/2 in bf16 has ulp ~1-2 voxels at S~200 (pre-fix: max error
    ~0.95 vs the f32 grid)."""
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((1, 1, 200, 8), dtype=np.float32))
    grid = normalized_grid((200, 8))[None] + 0.001
    out_f32 = grid_sample(src, grid)
    out_bf16 = grid_sample(src, grid.astype(jnp.bfloat16))
    # bf16 QUANTIZES the normalized coords themselves (ulp ~0.004 near 1.0
    # -> ~0.4 voxel at S=200); the fix only guarantees no FURTHER loss from
    # doing the denorm arithmetic in bf16 (pre-fix error was ~2.4x larger)
    err = float(jnp.max(jnp.abs(out_f32 - out_bf16)))
    assert err < 0.45, err


def test_warp_flow_bf16_flow_subvoxel_displacements():
    """Sub-voxel bf16 displacements at coordinates >=128 must not be rounded
    away (bf16 index ulp is 1.0 there; pre-fix: max error ~0.24)."""
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.random((1, 1, 200, 8), dtype=np.float32))
    flow = jnp.full((1, 2, 200, 8), 0.25, jnp.float32)
    out_f32 = warp_flow(src, flow)
    out_bf16 = warp_flow(src, flow.astype(jnp.bfloat16))
    err = float(jnp.max(jnp.abs(out_f32[:, :, :199, :7]
                                - out_bf16[:, :, :199, :7])))
    assert err < 1e-2, err
