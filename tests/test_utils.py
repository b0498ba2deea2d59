"""Utility subsystem tests: profiling accounting, pytree io, engine method flags."""
import numpy as np
import jax.numpy as jnp

from torchregister_tpu.utils.io import load_pytree, save_pytree
from torchregister_tpu.utils.profiling import Throughput, trace


def test_throughput_accounting():
    import time

    t = Throughput()
    t.add(voxels=1000, registrations=2)
    t.add(voxels=500)
    time.sleep(0.01)
    rep = t.report()
    assert t.voxels_resampled == 1500 and t.registrations == 2
    assert rep["seconds"] >= 0.01
    assert rep["registrations_per_min"] > 0
    assert rep["voxel_resamples_per_sec"] > 0


def test_trace_context_manager():
    with trace("unit-test-region"):
        x = jnp.ones((4, 4)) * 2
    assert float(x.sum()) == 32.0


def test_pytree_io_roundtrip(tmp_path):
    tree = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "nested": {"b": np.asarray([1, 2, 3]), "c": [np.ones(2), np.zeros(1)]},
    }
    p = str(tmp_path / "tree.npz")
    save_pytree(p, tree)
    back = load_pytree(p)
    assert set(back) == {"a", "nested"}
    np.testing.assert_allclose(back["a"], tree["a"])
    np.testing.assert_allclose(back["nested"]["b"], [1, 2, 3])
    assert isinstance(back["nested"]["c"], list)


def test_engine_exact_method_matches_separable_result():
    """The 'exact' grid_sample-parity path must work through the engines and
    converge to the same transform as the default separable path."""
    import jax

    from torchregister_tpu.engines.rigid import rigid_register
    from torchregister_tpu.ops.resample import warp_affine
    from torchregister_tpu.ops.transforms import rigid_theta

    rng = np.random.default_rng(0)
    g = np.meshgrid(*[np.linspace(-1, 1, 28)] * 2, indexing="ij")
    vol = sum(
        np.exp(-((g[0] - c0) ** 2 + (g[1] - c1) ** 2) / 0.08)
        for c0, c1 in rng.uniform(-0.4, 0.4, (4, 2))
    ).astype(np.float32)
    moving = jnp.asarray(vol[None, None])
    true = rigid_theta(jnp.asarray([0.08, 0.05, -0.04], jnp.float32))[None]
    target = warp_affine(true, moving)

    kw = dict(lr=5e-3, epochs=120, criterions=["mse"], grad_edges=False,
              optimizer="adam", init="identity")
    _, r_sep = rigid_register(moving, target, method="separable", **kw)
    _, r_ex = rigid_register(moving, target, method="exact", **kw)
    np.testing.assert_allclose(
        np.asarray(r_sep.best_theta), np.asarray(true), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(r_ex.best_theta), np.asarray(r_sep.best_theta), atol=0.02
    )
