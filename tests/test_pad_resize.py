"""pad_nd / nearest_resize / pooling parity tests vs torch oracles."""
import math

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from torchregister_tpu.ops.pad import pad_like, pad_nd
from torchregister_tpu.ops.resize import downsample_avg, max_pool, nearest_resize


def _torch_padnd(input_, target, mode="constant", value=0):
    """Independent oracle for the reference padNd contract (utils.py:271-277)."""
    dims = len(input_.shape) - 2
    delta = [target.shape[2 + i] - input_.shape[2 + i] for i in range(dims)]
    pairs = [[math.ceil(delta[i] / 2), delta[i] - math.ceil(delta[i] / 2)] for i in range(dims)]
    pads = tuple(np.flip(np.array(pairs)).flatten().tolist())
    return F.pad(input_, pads, mode=mode, value=value)


def test_pad_nd_matches_torch_3d():
    x = np.random.default_rng(0).normal(size=(1, 2, 5, 6, 7)).astype(np.float32)
    tgt = np.zeros((1, 1, 9, 6, 12), np.float32)
    ours = np.asarray(pad_nd(jnp.asarray(x), (9, 6, 12)))
    ref = _torch_padnd(torch.from_numpy(x), torch.from_numpy(tgt)).numpy()
    np.testing.assert_allclose(ours, ref)


def test_pad_nd_crop_matches_torch():
    x = np.random.default_rng(1).normal(size=(1, 1, 10, 11)).astype(np.float32)
    tgt = np.zeros((1, 1, 7, 8), np.float32)
    ours = np.asarray(pad_nd(jnp.asarray(x), (7, 8)))
    ref = _torch_padnd(torch.from_numpy(x), torch.from_numpy(tgt)).numpy()
    np.testing.assert_allclose(ours, ref)


def test_pad_nd_mixed_pad_and_crop():
    x = np.random.default_rng(2).normal(size=(1, 1, 10, 5)).astype(np.float32)
    tgt = np.zeros((1, 1, 7, 9), np.float32)
    ours = np.asarray(pad_nd(jnp.asarray(x), (7, 9)))
    ref = _torch_padnd(torch.from_numpy(x), torch.from_numpy(tgt)).numpy()
    np.testing.assert_allclose(ours, ref)


def test_pad_like():
    x = jnp.ones((1, 1, 3, 3))
    t = jnp.zeros((1, 4, 5, 5))
    assert pad_like(x, t).shape == (1, 1, 5, 5)


def test_nearest_resize_matches_torch_3d():
    x = np.random.default_rng(3).normal(size=(1, 1, 7, 9, 5)).astype(np.float32)
    out_sz = (10, 4, 8)
    ours = np.asarray(nearest_resize(jnp.asarray(x), out_sz))
    ref = F.interpolate(torch.from_numpy(x), size=out_sz, mode="nearest").numpy()
    np.testing.assert_allclose(ours, ref)


def test_nearest_resize_matches_torch_2d():
    x = np.random.default_rng(4).normal(size=(2, 3, 13, 6)).astype(np.float32)
    out_sz = (200, 200)
    ours = np.asarray(nearest_resize(jnp.asarray(x), out_sz))
    ref = F.interpolate(torch.from_numpy(x), size=out_sz, mode="nearest").numpy()
    np.testing.assert_allclose(ours, ref)


def test_max_pool_matches_torch():
    x = np.random.default_rng(5).normal(size=(1, 2, 9, 9, 9)).astype(np.float32)
    ours = np.asarray(max_pool(jnp.asarray(x), 2))
    ref = F.max_pool3d(torch.from_numpy(x), 2, 2).numpy()
    np.testing.assert_allclose(ours, ref)


def test_downsample_avg_matches_torch():
    x = np.random.default_rng(6).normal(size=(1, 1, 8, 8)).astype(np.float32)
    ours = np.asarray(downsample_avg(jnp.asarray(x), 2))
    ref = F.avg_pool2d(torch.from_numpy(x), 2, 2).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_nearest_resize_preserves_dtype():
    """torch F.interpolate preserves dtype; the one-hot matmul must cast back
    (a bf16 network's gate maps must stay bf16 — pre-fix they silently
    promoted to f32)."""
    x16 = jnp.arange(16, dtype=jnp.bfloat16).reshape(1, 1, 4, 4)
    y = nearest_resize(x16, (8, 8))
    assert y.dtype == jnp.bfloat16
    xi = jnp.arange(16, dtype=jnp.int32).reshape(1, 1, 4, 4)
    yi = nearest_resize(xi, (2, 2))
    assert yi.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(yi), [[[[0, 2], [8, 10]]]])


def test_nearest_resize_rejects_rank_mismatch():
    import pytest

    with pytest.raises(ValueError, match="out_spatial"):
        nearest_resize(jnp.zeros((1, 1, 4, 4, 4)), (8, 8))
