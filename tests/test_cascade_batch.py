"""Batched (vmapped / mesh-sharded) cascade tests — BASELINE config #5 shape."""
import numpy as np
import jax.numpy as jnp

from torchregister_tpu.engines.cascade import make_cascade_batch_fn, register_cascade
from torchregister_tpu.parallel.mesh import make_mesh
import pytest

pytestmark = pytest.mark.slow  # batched/sharded full cascades (smoke tier: -m 'not slow')


def _blobs(batch, shape, seed=0):
    rng = np.random.default_rng(seed)
    grids = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    vols = []
    for _ in range(batch):
        vol = np.zeros(shape, np.float32)
        for _ in range(4):
            c = rng.uniform(-0.4, 0.4, len(shape))
            w = rng.uniform(0.15, 0.3)
            vol += np.exp(-sum((g - ci) ** 2 for g, ci in zip(grids, c)) / (2 * w**2))
        vols.append(vol)
    return jnp.asarray(np.stack(vols)[:, None])


CFG = dict(stages=("rigid", "affine"), levels=2, rigid_epochs=20,
           rigid_lr=3e-3, affine_epochs=10, affine_lr=1e-3,
           criterions=("mse",), optimizer="adam")


def test_batched_cascade_matches_per_pair():
    movings = _blobs(3, (24, 24), seed=1)
    targets = _blobs(3, (24, 24), seed=2)
    fn = make_cascade_batch_fn(**CFG)
    res = fn(movings, targets)
    assert res.theta.shape == (3, 1, 2, 3)
    assert res.warped.shape == (3, 1, 1, 24, 24)
    for i in range(3):
        ref = register_cascade(movings[i : i + 1], targets[i : i + 1], **CFG)
        np.testing.assert_allclose(
            np.asarray(res.theta[i]), np.asarray(ref.theta), rtol=1e-4, atol=1e-5
        )


def test_batched_cascade_sharded_over_mesh():
    mesh = make_mesh((8,), ("data",))
    movings = _blobs(8, (20, 20), seed=3)
    targets = _blobs(8, (20, 20), seed=4)
    fn = make_cascade_batch_fn(mesh=mesh, **CFG)
    res = fn(movings, targets)
    assert res.theta.shape == (8, 1, 2, 3)
    assert np.isfinite(np.asarray(res.warped)).all()


def test_batched_cascade_with_flow():
    movings = _blobs(2, (24, 24), seed=5)
    targets = _blobs(2, (24, 24), seed=6)
    fn = make_cascade_batch_fn(
        stages=("rigid", "flow"), levels=2, rigid_epochs=6, rigid_lr=3e-3,
        flow_epochs=4, flow_lr=1e-3, criterions=("mse",), optimizer="adam",
        n=32,
    )
    res = fn(movings, targets)
    assert res.flow.shape[0] == 2
    assert np.isfinite(np.asarray(res.warped)).all()
