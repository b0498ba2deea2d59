"""Profile the super-tile exact resampler (v2: slab gather + one-hot restack)
on the real chip.

Times the full warp across sub-tile edges and chunk sizes, plus the isolated
slab-gather stage — the sizing data for SUPER_STILE and the chunk default.

Usage: python benchmarks/probe_supertile.py
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def sync(x):
    import jax.numpy as jnp

    return float(jnp.mean(x.astype(jnp.float32)))


def timeit(fn, repeats=3):
    fn()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from torchregister_tpu.ops import blocked as B
    from torchregister_tpu.ops.transforms import rigid_theta

    shape = (240, 240, 240)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((1, 1) + shape, np.float32))
    theta = rigid_theta(jnp.asarray([0.06, -0.04, 0.05, 0.2, -0.15, 0.1]))[None]

    plan = B._supertile_plan(theta, shape)
    print(f"plan: {plan}", flush=True)

    t_full = timeit(
        lambda: sync(B.warp_affine_supertile(theta, vol, plan=plan))
    )
    print(f"full supertile warp (stile=10): {t_full * 1e3:.1f} ms", flush=True)

    # Isolated slab-gather stage.
    from functools import partial

    from torchregister_tpu.ops.separable import affine_to_index_map
    from torchregister_tpu.ops.transforms import as_matrix

    SUPER = B.SUPER

    @partial(jax.jit, static_argnames=("plan",))
    def gather_only(theta, moving, plan):
        theta = as_matrix(theta)
        spatial = moving.shape[2:]
        C = moving.shape[1]
        B2, P = plan.block_super, plan.pad
        SLz, SLy = plan.slab
        M, t = affine_to_index_map(theta[0], spatial, False)
        Gs = [-(-s // SUPER) for s in spatial]
        og = jnp.stack(
            jnp.meshgrid(
                *[jnp.arange(g, dtype=jnp.float32) * SUPER for g in Gs],
                indexing="ij",
            ),
            -1,
        )
        corn = jnp.stack(
            jnp.meshgrid(*[jnp.asarray([0.0, SUPER - 1.0])] * 3, indexing="ij"),
            -1,
        ).reshape(8, 3)
        hi = jax.lax.Precision.HIGHEST
        qcorn = (
            jnp.einsum("zyxj,aj->zyxa", og, M, precision=hi)[..., None, :]
            + (corn @ M.T + t)
        )
        base = jnp.floor(jnp.min(qcorn, axis=-2)) - 1.0
        sizes = jnp.asarray(spatial, jnp.int32)
        base_i = jnp.clip(base.astype(jnp.int32) + P, 0, sizes + 2 * P - B2)
        Xp = spatial[2] + 2 * P
        volp = jnp.pad(moving[0], ((0, 0),) + ((P, P),) * 3)
        slab_zy = jnp.min(base_i[..., :2], axis=2)
        slab_zy = jnp.clip(
            slab_zy, 0,
            jnp.asarray(
                [spatial[0] + 2 * P - SLz, spatial[1] + 2 * P - SLy], jnp.int32
            ),
        )
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(1, 2),
        )
        return jax.lax.gather(
            volp, slab_zy.reshape(-1, 2), dn, slice_sizes=(C, SLz, SLy, Xp),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    t_gather = timeit(lambda: sync(gather_only(theta, vol, plan)))
    print(f"slab gather stage: {t_gather * 1e3:.1f} ms", flush=True)

    for chunk in (216, 432, 864, 1728):
        tt = timeit(
            lambda c=chunk: sync(
                B.warp_affine_supertile(theta, vol, plan=plan, chunk=c)
            )
        )
        print(f"chunk={chunk}: {tt * 1e3:.1f} ms", flush=True)

    # sub-tile edge sweep: hat MACs/voxel scale as ~prod(bsub) while the
    # one-hot restack shrinks with fewer, larger sub-tiles. (stile=5 OOMs:
    # SUB_N=8 makes the one-hot stage-Y output [6,6,6,8,8,8,1,16,16,16],
    # 13.5 GB after the (8,128) trailing-dim padding.)
    for stile in (20, 8):
        plan_s = B._supertile_plan(theta, shape, stile=stile)
        tt = timeit(
            lambda p=plan_s: sync(
                B.warp_affine_supertile(theta, vol, plan=p)
            )
        )
        print(f"stile={stile} (bsub={plan_s.bsub}): {tt * 1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
