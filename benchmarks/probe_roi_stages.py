"""Stage isolation for the ROI-gather warp at 240^3 (r4): where do the
~9.8 us/grid-step go? Times (min of 3, host readback):

  fetch:   compact kernel with restack short-circuited (DMA + overhead)
  restack: the compact fetch+restack kernel (roigather)
  fused:   the full fused warp kernel (roigather_warp)

Usage: python benchmarks/probe_roi_stages.py
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from torchregister_tpu.ops import blocked
    from torchregister_tpu.ops.blocked import _roi_supports, TILE
    from torchregister_tpu.ops.pallas import roigather as rg
    from torchregister_tpu.ops.transforms import rigid_theta

    S = 240
    shape = (S, S, S)
    vol = jax.random.uniform(jax.random.key(0), shape, jnp.float32)
    theta = rigid_theta(
        jnp.asarray([0.12, -0.08, 0.1, 0.15, -0.1, 0.08], jnp.float32)
    )[None]
    theta_np = np.asarray(jax.device_get(theta), np.float64)[0]
    scal, org, grids, M, t = _roi_supports(theta_np, shape, False)
    QB = rg.QB
    Zp = QB * (-(-S // QB)) + 2 * QB
    Yp = Zp
    Xp = 128 * (-(-S // 128))
    volp = jnp.pad(vol, ((0, Zp - S), (0, Yp - S), (0, Xp - S)))
    scal_j = jnp.asarray(scal)
    mt = jnp.asarray(
        np.concatenate([np.concatenate([M[s], [t[s]]]) for s in range(3)]),
        jnp.float32,
    )

    def timeit(name, fn, n=3):
        out = fn()
        float(jnp.asarray(out).mean())
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(jnp.asarray(fn()).mean())
            ts.append(time.perf_counter() - t0)
        print(f"{name:<28} {min(ts)*1e3:8.1f} ms", flush=True)

    timeit("restack (compact kernel)", lambda: rg.roigather(volp, scal_j))
    timeit("fused warp kernel",
           lambda: rg.roigather_warp(volp, scal_j, mt, grids, TILE))

    # fetch-only: reuse the fused pipeline but reduce the window sum only
    # (keeps the same 9-block DMA pattern, drops restack+hat compute)
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def fetch_kernel(zq, yq, zr, yr, ox, mt_ref, *refs):
        *in_refs, out_ref = refs
        acc = jnp.zeros((1, 128), jnp.float32)
        for r in in_refs:
            acc = acc + jnp.sum(r[:].reshape(-1, 128), axis=0, keepdims=True)
        out_ref[0] = acc

    T = scal.shape[0]
    NB = rg.NB
    in_specs = [
        pl.BlockSpec(
            (QB, QB, Xp),
            (lambda t_, zq, yq, zr, yr, ox, mt_, zi=zi, yj=yj:
             (zq[t_] + zi, yq[t_] + yj, 0)),
        )
        for zi in range(NB)
        for yj in range(NB)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 128), lambda t_, *s: (t_, 0, 0)),
    )
    fetch = pl.pallas_call(
        fetch_kernel,
        out_shape=jax.ShapeDtypeStruct((T, 1, 128), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )
    cols = [scal_j[:, i] for i in range(5)]
    timeit("fetch only (9-block DMA)",
           lambda: fetch(*cols, mt, *([volp] * (NB * NB))))


if __name__ == "__main__":
    main()
