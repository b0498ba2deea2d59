"""Profile the super-tile exact resampler's stages on the real chip.

Times (a) the full warp, (b) gather-only, (c) gather+restack, isolating the
hat-contraction share — the sizing data for picking the sub-tile edge.

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

    Bs, B2, P = B._supertile_plan(theta, shape)
    print(f"plan: block_sub={Bs} block_super={B2} pad={P}", flush=True)

    t_full = timeit(
        lambda: sync(
            B.warp_affine_supertile(
                theta, vol, block_sub=Bs, block_super=B2, pad=P
            )
        )
    )
    print(f"full supertile warp: {t_full * 1e3:.1f} ms", flush=True)

    # Stage probes replicate the warp's internals via jitted sub-programs.
    from functools import partial

    from torchregister_tpu.ops.separable import affine_to_index_map

    SUPER = B.SUPER

    @partial(jax.jit, static_argnames=("B2", "P"))
    def gather_only(theta, moving, B2, P):
        from torchregister_tpu.ops.transforms import as_matrix

        theta = as_matrix(theta)
        spatial = moving.shape[2:]
        C = moving.shape[1]
        M, t = affine_to_index_map(theta[0], spatial, False)
        Gs = [-(-s // SUPER) for s in spatial]
        og = jnp.stack(
            jnp.meshgrid(
                *[jnp.arange(g, dtype=jnp.float32) * SUPER for g in Gs],
                indexing="ij",
            ),
            -1,
        ).reshape(-1, 3)
        corn = jnp.stack(
            jnp.meshgrid(*[jnp.asarray([0.0, SUPER - 1.0])] * 3, indexing="ij"),
            -1,
        ).reshape(1, 8, 3)
        oc = og[:, None, :] + corn
        qcorn = jnp.stack(
            [
                M[s, 0] * oc[..., 0]
                + M[s, 1] * oc[..., 1]
                + M[s, 2] * oc[..., 2]
                + t[s]
                for s in range(3)
            ],
            axis=-1,
        )
        base = jnp.floor(jnp.min(qcorn, axis=1)) - 1.0
        sizes = jnp.asarray(spatial, jnp.int32)
        base_i = jnp.clip(base.astype(jnp.int32) + P, 0, sizes + 2 * P - B2)
        volp = jnp.pad(moving[0], ((0, 0),) + ((P, P),) * 3)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(1, 2, 3),
        )
        supers = jax.lax.gather(
            volp,
            base_i,
            dn,
            slice_sizes=(C, B2, B2, B2),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        return supers

    @partial(jax.jit, static_argnames=("Bs", "B2"))
    def restack_only(supers, theta, spatial, Bs, B2):
        from torchregister_tpu.ops.transforms import as_matrix

        theta = as_matrix(theta)
        M, t = affine_to_index_map(theta[0], spatial, False)
        T2 = supers.shape[0]
        C = supers.shape[1]
        SUB = B.SUB
        TILE = B.TILE
        dgrid = jnp.stack(
            jnp.meshgrid(*[jnp.arange(SUB, dtype=jnp.float32)] * 3, indexing="ij"),
            -1,
        ).reshape(-1, 3)
        c_d = float(TILE) * jnp.einsum("dj,aj->da", dgrid, M)
        offs = jnp.floor(c_d - jnp.min(c_d, axis=0)).astype(jnp.int32)
        offs = jnp.clip(offs, 0, B2 - Bs)
        nsub = SUB**3
        blk = jnp.stack(
            [
                jax.lax.dynamic_slice(
                    supers,
                    (0, 0, offs[d, 0], offs[d, 1], offs[d, 2]),
                    (T2, C, Bs, Bs, Bs),
                )
                for d in range(nsub)
            ],
            axis=1,
        ).reshape(T2 * nsub, C, Bs, Bs, Bs)
        return blk

    spatial = (240, 240, 240)
    t_gather = timeit(lambda: sync(gather_only(theta, vol, B2, P)))
    supers = gather_only(theta, vol, B2, P)
    t_restack = timeit(lambda: sync(restack_only(supers, theta, spatial, Bs, B2)))
    print(f"gather stage:  {t_gather * 1e3:.1f} ms", flush=True)
    print(f"restack stage: {t_restack * 1e3:.1f} ms", flush=True)
    print(
        f"hat-contraction (residual): {(t_full - t_gather - t_restack) * 1e3:.1f} ms",
        flush=True,
    )

    # chunk sensitivity
    for chunk in (216, 432, 864, 1728):
        tt = timeit(
            lambda c=chunk: sync(
                B.warp_affine_supertile(
                    theta, vol, block_sub=Bs, block_super=B2, pad=P, chunk=c
                )
            )
        )
        print(f"chunk={chunk}: {tt * 1e3:.1f} ms", flush=True)

    # sub-tile edge sweep: MACs/voxel = block_sub^3 (16^3=4096 at stile 10,
    # 14^3=2744 at 8, 10^3=1000 at 5) vs per-tile einsum shape efficiency
    for stile in (8, 5, 4):
        Bs_s, B2_s, P_s = B._supertile_plan(theta, shape, stile=stile)
        for chunk in (432, 1728):
            tt = timeit(
                lambda s=stile, a=Bs_s, b=B2_s, p=P_s, c=chunk: sync(
                    B.warp_affine_supertile(
                        theta, vol, block_sub=a, block_super=b, pad=p,
                        chunk=c, stile=s,
                    )
                )
            )
            print(
                f"stile={stile} (Bs={Bs_s}, chunk={chunk}): {tt * 1e3:.1f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
