"""Edge-filter parity tests vs a torch conv oracle of the documented semantics."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from torchregister_tpu.ops.edge import edge_filter, sobel_kernels_2d, sobel_kernels_3d

EPS = 1e-10


def test_sobel_axis_kernels_are_classic_sobel():
    bank = sobel_kernels_3d()
    sx = bank[0]
    # Sx: derivative along the last axis, [1,2,1]x[1,2,1] smoothing elsewhere.
    np.testing.assert_allclose(sx[:, :, 0], -np.outer([1, 2, 1], [1, 2, 1]))
    np.testing.assert_allclose(sx[:, :, 1], 0)
    np.testing.assert_allclose(sx[:, :, 2], np.outer([1, 2, 1], [1, 2, 1]))
    sz = bank[2]
    np.testing.assert_allclose(sz[0], -np.outer([1, 2, 1], [1, 2, 1]))
    np.testing.assert_allclose(sz[2], np.outer([1, 2, 1], [1, 2, 1]))


def test_sobel_diagonal_kernels_antisymmetric():
    bank = sobel_kernels_3d()
    for k in bank[3:]:
        # Diagonal gradient kernels sum to zero and are antisymmetric under
        # index reversal.
        assert abs(k.sum()) < 1e-6
        np.testing.assert_allclose(k, -k[::-1, ::-1, ::-1], atol=1e-6)


def _torch_edge_oracle(img, thresh=(0.2, 0.9)):
    """Oracle of the documented Edge3D semantics (utils.py:150-183) with the
    effective reflect-pad radius (see ops/edge.py docstring)."""
    bank = torch.from_numpy(sobel_kernels_3d()).unsqueeze(1)  # [9,1,3,3,3]
    t = torch.from_numpy(img)
    B, C = t.shape[:2]
    padded = F.pad(t, (1, 1, 1, 1, 1, 1), mode="reflect")
    resp = torch.stack(
        [
            F.conv3d(padded[:, c : c + 1], bank)  # [B, 9, *S]
            for c in range(C)
        ],
        dim=1,
    )  # [B, C, 9, *S]
    chan_sum = torch.sum(resp + EPS, dim=1)
    grad_mag = (1.0 / C) * torch.sqrt(torch.sum(chan_sum**2 + EPS, dim=1))
    e = grad_mag.unsqueeze(1)
    e = (e - e.min()) / (e.max() - e.min() + 1e-9)
    mask = ((e > thresh[0]) & (e < thresh[1])).float()
    return mask.numpy()


def test_edge_filter_3d_matches_oracle():
    rng = np.random.default_rng(0)
    img = rng.random(size=(1, 1, 12, 12, 12)).astype(np.float32)
    img[:, :, 4:8, 4:8, 4:8] += 3.0  # a bright cube -> edges at its faces
    ours = np.asarray(edge_filter(jnp.asarray(img)))
    ref = _torch_edge_oracle(img)
    # Binary masks thresholded at 0.2/0.9: voxels landing exactly on the
    # threshold can flip with fp-level conv differences. Allow <0.5% mismatch.
    assert np.mean(ours != ref) < 0.005


def test_edge_filter_multichannel():
    rng = np.random.default_rng(1)
    img = rng.random(size=(1, 2, 10, 10, 10)).astype(np.float32)
    ours = np.asarray(edge_filter(jnp.asarray(img)))
    ref = _torch_edge_oracle(img)
    assert ours.shape == (1, 1, 10, 10, 10)
    assert np.mean(ours != ref) < 0.005


def test_edge_filter_output_is_binary_and_detached():
    import jax

    img = jnp.asarray(np.random.default_rng(2).random((1, 1, 8, 8, 8)), jnp.float32)
    out = edge_filter(img)
    vals = np.unique(np.asarray(out))
    assert set(vals).issubset({0.0, 1.0})
    g = jax.grad(lambda x: jnp.sum(edge_filter(x)))(img)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_edge_filter_2d_runs():
    # The reference's Edge3D crashes on 2D input (warpings.py:31-34); our 2D
    # bank is an extension.
    img = jnp.asarray(np.random.default_rng(3).random((1, 1, 16, 16)), jnp.float32)
    out = edge_filter(img)
    assert out.shape == (1, 1, 16, 16)
    assert set(np.unique(np.asarray(out))).issubset({0.0, 1.0})
    assert sobel_kernels_2d().shape == (4, 3, 3)


def test_edge_filter_batch_samples_independent():
    """Per-sample min-max norm: one high-dynamic-range volume in the batch
    must not compress the other samples' gradients below threshold (the
    reference only ever normalizes a single volume — per-sample IS its
    semantics batched)."""
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.random((1, 1, 20, 20), dtype=np.float32))
    b = a * 1000.0  # huge-range companion sample
    solo = edge_filter(a)
    batched = edge_filter(jnp.concatenate([a, b]))
    np.testing.assert_array_equal(np.asarray(solo[0]), np.asarray(batched[0]))
