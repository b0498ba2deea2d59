"""Multi-device cohort tests on the forced 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from torchregister_tpu.ops.resample import warp_affine
from torchregister_tpu.ops.transforms import rigid_theta
from torchregister_tpu.parallel.cohort import register_cohort
from torchregister_tpu.parallel.mesh import batch_sharding, make_mesh
import pytest

pytestmark = pytest.mark.slow  # full optimizations on the 8-device mesh (smoke tier: -m 'not slow')


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


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_cohort_rigid_unsharded_matches_per_pair():
    movings = _blobs(3, (20, 20))
    thetas = [
        rigid_theta(jnp.asarray(p, jnp.float32))[None]
        for p in ([0.05, 0.1, 0.0], [-0.04, 0.0, 0.08], [0.02, -0.06, 0.03])
    ]
    targets = jnp.concatenate(
        [warp_affine(t, movings[i : i + 1]) for i, t in enumerate(thetas)]
    )
    res = register_cohort(
        movings, targets, mode="rigid", lr=5e-3, epochs=120,
        criterions=["mse"], optimizer="adam", init="identity",
    )
    assert res.best_theta.shape == (3, 1, 2, 3)
    for i, t in enumerate(thetas):
        np.testing.assert_allclose(
            np.asarray(res.best_theta[i]), np.asarray(t), atol=0.06
        )


def test_cohort_rigid_sharded_over_mesh():
    mesh = make_mesh((8,), ("data",))
    movings = _blobs(8, (16, 16), seed=1)
    targets = _blobs(8, (16, 16), seed=2)
    res = register_cohort(
        movings, targets, mode="rigid", mesh=mesh, lr=1e-3, epochs=10,
        criterions=["mse"], optimizer="adam", init="identity",
    )
    assert res.best_theta.shape == (8, 1, 2, 3)
    assert np.isfinite(np.asarray(res.losses)).all()
    # the computation actually spanned the mesh: the batch-sharded output
    # lives on all 8 devices, one pair each
    assert len(res.best_theta.sharding.device_set) == 8
    assert res.best_theta.sharding.shard_shape(res.best_theta.shape)[0] == 1


def test_cohort_sharded_matches_unsharded():
    mesh = make_mesh((8,), ("data",))
    movings = _blobs(8, (12, 12), seed=3)
    targets = _blobs(8, (12, 12), seed=4)
    kw = dict(mode="affine", lr=1e-3, epochs=15, criterions=["mse"],
              optimizer="adam")
    r1 = register_cohort(movings, targets, **kw)
    r2 = register_cohort(movings, targets, mesh=mesh, **kw)
    np.testing.assert_allclose(
        np.asarray(r1.best_theta), np.asarray(r2.best_theta), rtol=1e-4, atol=1e-5
    )


def test_spatially_sharded_warp_matches_unsharded():
    """SP seam: a volume sharded across a spatial axis warps identically —
    XLA GSPMD inserts the halo exchanges for the sweep's shifts."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from torchregister_tpu.ops.separable import warp_affine_separable
    from torchregister_tpu.ops.transforms import rigid_theta
    from torchregister_tpu.parallel.mesh import make_mesh, volume_sharding

    vol = _blobs(1, (32, 32, 32), seed=9)
    theta = rigid_theta(jnp.asarray([0.05, -0.04, 0.03, 0.1, -0.1, 0.05],
                                    jnp.float32))[None]
    ref = np.asarray(warp_affine_separable(theta, vol, max_shift=8))

    mesh = make_mesh((8,), ("space",))
    sh = volume_sharding(mesh, spatial_axis=0, mesh_axis="space", ndim=3)
    vol_sharded = jax.device_put(vol, sh)
    out = np.asarray(
        jax.jit(lambda t, v: warp_affine_separable(t, v, max_shift=8))(
            theta, vol_sharded
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_cohort_hlo_has_zero_collectives():
    """Pairs are independent: the batch-sharded cohort program must contain NO
    cross-device collectives (all-reduce/all-gather/permute/reduce-scatter) —
    throughput then scales linearly over ICI by construction (SURVEY §2)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from torchregister_tpu.engines.rigid import _build_rigid_fn
    from torchregister_tpu.losses.similarity import mse

    mesh = make_mesh((8,), ("data",))
    run = _build_rigid_fn((mse,), (1.0,), 1e-3, 3, "adam", 2).run

    def batched(movs, tgts, p0):
        return jax.vmap(lambda m, t, p: run(m[None], t[None], p))(movs, tgts, p0)

    sh = batch_sharding(mesh)
    movings = jax.device_put(_blobs(8, (16, 16), seed=20), sh)
    targets = jax.device_put(_blobs(8, (16, 16), seed=21), sh)
    p0 = jax.device_put(jnp.zeros((8, 3), jnp.float32), sh)
    compiled = jax.jit(batched).lower(movings, targets, p0).compile()
    hlo = compiled.as_text()
    for op in ("all-reduce", "all-gather", "collective-permute", "reduce-scatter"):
        assert op not in hlo, f"unexpected collective {op} in cohort HLO"


def test_spatially_sharded_warp_has_halo_collectives():
    """Counterpart: sharding a volume across a *spatial* axis forces GSPMD to
    exchange halos for the sweep's shifts — the compiled HLO must contain
    collectives. Together with the zero-collective cohort test this pins that
    the sharding layout, not luck, determines the comm pattern."""
    from torchregister_tpu.ops.separable import warp_affine_separable
    from torchregister_tpu.parallel.mesh import volume_sharding

    mesh = make_mesh((8,), ("space",))
    sh = volume_sharding(mesh, spatial_axis=0, mesh_axis="space", ndim=3)
    vol = jax.device_put(_blobs(1, (32, 32, 32), seed=22), sh)
    theta = rigid_theta(jnp.asarray([0.05, -0.04, 0.03, 0.1, -0.1, 0.05],
                                    jnp.float32))[None]
    compiled = (
        jax.jit(lambda t, v: warp_affine_separable(t, v, max_shift=8))
        .lower(theta, vol)
        .compile()
    )
    hlo = compiled.as_text()
    assert any(
        op in hlo
        for op in ("collective-permute", "all-gather", "all-to-all")
    ), "expected halo-exchange collectives in spatially-sharded warp HLO"


def test_cohort_grad_edges_per_sample():
    """edge_filter's min-max normalization is global over its input; cohort
    filtering must be per-sample or samples couple (ADVICE r1). A batch where
    sample 1 has 100x the intensity must register sample 0 identically to
    registering it alone."""
    from torchregister_tpu.engines.rigid import rigid_register

    m0 = _blobs(1, (16, 16), seed=11)
    t0 = _blobs(1, (16, 16), seed=12)
    movings = jnp.concatenate([m0, 100.0 * _blobs(1, (16, 16), seed=13)])
    targets = jnp.concatenate([t0, 100.0 * _blobs(1, (16, 16), seed=14)])
    kw = dict(lr=1e-3, epochs=8, criterions=["mse"], optimizer="adam")
    res = register_cohort(movings, targets, mode="rigid", grad_edges=True,
                          init="identity", **kw)
    _, solo = rigid_register(m0, t0, grad_edges=True, init="identity", **kw)
    np.testing.assert_allclose(
        np.asarray(res.best_theta[0]), np.asarray(solo.best_theta),
        rtol=1e-5, atol=1e-6,
    )


def test_cohort_flow_runs():
    # flow_model pinned to 'unet': r5 flipped the cohort default to 'field'
    # (matching api/cascade); this test keeps the U-Net cohort path covered.
    movings = _blobs(2, (20, 20), seed=5)
    targets = _blobs(2, (20, 20), seed=6)
    res = register_cohort(
        movings, targets, mode="flow", lr=1e-3, epochs=3,
        criterions=["mse"], n=32, depth=1, flow_model="unet",
        optimizer="sgd", smooth=0.0,
    )
    assert res.flow.shape == (2, 1, 2, 20, 20)


def test_cohort_flow_default_matches_api_resolution():
    """ADVICE r4 (medium): the cohort's out-of-box flow call must run the same
    engine as Register/register_cascade — field model, adam, lr 0.3,
    smooth 0.5 (api.py:119,137,165). A default cohort flow run must therefore
    actually move the loss (SGD+1e-5 on a direct field was a documented
    no-op)."""
    movings = _blobs(2, (16, 16), seed=21)
    targets = jnp.roll(movings, -1, axis=2)
    res = register_cohort(movings, targets, mode="flow", epochs=40,
                          criterions=["mse"], max_disp=3)
    losses = np.asarray(res.losses)
    first = losses[:, 0]
    last = losses[np.arange(2), np.asarray(res.steps) - 1]
    assert (last < 0.5 * first).all(), (first, last)
    assert np.isfinite(np.asarray(res.flow)).all()


def test_cohort_flow_field_mode_recovers_shift():
    """The winning direct-field recipe runs cohort-wide (VERDICT r3 #4):
    flow_model/smooth/stop_rel/patience pass through register_cohort, and a
    sharded field cohort recovers per-pair translations."""
    mesh = make_mesh((2,), ("data",), devices=jax.devices()[:2])
    movings = _blobs(2, (24, 24), seed=7)
    # targets = movings shifted by +2 voxels along axis 0 (exact roll keeps
    # the recoverable field a constant ~-2-voxel displacement)
    targets = jnp.roll(movings, -2, axis=2)
    kw = dict(
        mode="flow", lr=0.5, epochs=120, criterions=["mse"],
        optimizer="adam", flow_model="field", smooth=0.2, max_disp=4,
        stop_rel=1e-4, patience=40,
    )
    res = register_cohort(movings, targets, **kw)
    assert res.flow.shape == (2, 1, 2, 24, 24)
    # interior displacement along axis 0 approaches +2 (sampling coord of the
    # source is v + f(v); target(v) = moving(v+2))
    interior = np.asarray(res.flow)[:, 0, 0, 8:-8, 8:-8]
    assert abs(interior.mean() - 2.0) < 0.5
    # sharded run matches unsharded
    res_sh = register_cohort(movings, targets, mesh=mesh, **kw)
    np.testing.assert_allclose(
        np.asarray(res_sh.flow), np.asarray(res.flow), rtol=2e-4, atol=2e-4
    )


def test_rigid_engine_space_sharded_full_optimization():
    """VERDICT r2 #5 (engine-scope spatial sharding): a COMPLETE rigid
    optimization — the real optimize_scan program with its warp/loss/grad/
    update loop — runs on a space-sharded 3D volume, produces the same theta
    as unsharded, and its compiled HLO carries halo-exchange collectives."""
    from torchregister_tpu.engines.rigid import _build_rigid_fn
    from torchregister_tpu.losses.similarity import mse
    from torchregister_tpu.parallel.mesh import volume_sharding

    vol = _blobs(1, (24, 24, 24), seed=30)
    theta_true = rigid_theta(
        jnp.asarray([0.06, -0.04, 0.05, 0.08, -0.06, 0.04], jnp.float32)
    )[None]
    tgt = warp_affine(theta_true, vol)

    fns = _build_rigid_fn((mse,), (1.0,), 2e-3, 40, "adam", 3, "separable",
                          8, None, 25)
    p0 = jnp.zeros((6,), jnp.float32)
    ref = fns.run(vol, tgt, p0)

    mesh = make_mesh((8,), ("space",))
    sh = volume_sharding(mesh, spatial_axis=0, mesh_axis="space", ndim=3)
    vol_s = jax.device_put(vol, sh)
    tgt_s = jax.device_put(tgt, sh)
    out = fns.run(vol_s, tgt_s, p0)
    np.testing.assert_allclose(
        np.asarray(out.best_theta), np.asarray(ref.best_theta),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.losses), np.asarray(ref.losses), rtol=1e-4, atol=1e-6
    )
    hlo = jax.jit(fns.run).lower(vol_s, tgt_s, p0).compile().as_text()
    assert any(
        op in hlo for op in ("collective-permute", "all-gather", "all-to-all")
    ), "expected halo collectives in space-sharded rigid engine HLO"


def test_flow_engine_space_sharded_full_optimization():
    """Same, for the flow engine's while_loop program (U-Net fwd+bwd, warp,
    optimizer state all space-sharded)."""
    from torchregister_tpu.engines.flow import _build_flow_fn
    from torchregister_tpu.losses.similarity import mse
    from torchregister_tpu.parallel.mesh import volume_sharding

    mov = _blobs(1, (24, 24, 24), seed=31)
    tgt = _blobs(1, (24, 24, 24), seed=32)
    run, model, init_fn, *_ = _build_flow_fn(
        (mse,), (1.0,), 1e-3, 6, 1e-6, "adam", 3, 1, 32.0, 1
    )
    p0 = init_fn(jax.random.key(0), mov)
    ref = run(mov, tgt, p0)

    mesh = make_mesh((8,), ("space",))
    sh = volume_sharding(mesh, spatial_axis=0, mesh_axis="space", ndim=3)
    mov_s = jax.device_put(mov, sh)
    tgt_s = jax.device_put(tgt, sh)
    out = run(mov_s, tgt_s, p0)
    # U-Net convs under GSPMD reassociate reductions across halo boundaries;
    # equality is to f32 tolerance, not bitwise
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), rtol=2e-3, atol=2e-4
    )
    hlo = jax.jit(run).lower(mov_s, tgt_s, p0).compile().as_text()
    assert any(
        op in hlo for op in ("collective-permute", "all-gather", "all-to-all")
    ), "expected halo collectives in space-sharded flow engine HLO"


def test_register_cohort_init_validation():
    """Unknown init strings silently meant 'random' for rigid (and were
    silently ignored for affine/flow) pre-fix — both now raise."""
    movings = jnp.zeros((2, 1, 16, 16))
    with pytest.raises(ValueError, match="init must be"):
        register_cohort(movings, movings, mode="rigid", epochs=1,
                        criterions=["mse"], init="Identity")
    with pytest.raises(ValueError, match="only meaningful"):
        register_cohort(movings, movings, mode="affine", epochs=1,
                        criterions=["mse"], init="random")
