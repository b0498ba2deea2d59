"""Loop-amortized device-side timing: blocked vs fused-ROI exact warp, 240^3.

Eager timings through the axon tunnel carry a multi-ms dispatch floor per
program; this wraps each path in ONE jit with a 10-iteration fori_loop
(dependency-chained so XLA can't CSE the iterations) and reports per-warp
device cost. Usage: python benchmarks/probe_roi_loop.py
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

N_IT = 10


def main():
    import jax
    import jax.numpy as jnp

    from torchregister_tpu.ops.blocked import (
        TILE,
        _roi_supports,
        _untile,
        required_block_affine,
        warp_affine_blocked,
    )
    from torchregister_tpu.ops.pallas import roigather as rg
    from torchregister_tpu.ops.transforms import rigid_theta

    S = 240
    shape = (S, S, S)
    vol = jax.random.uniform(jax.random.key(0), (1, 1) + shape, jnp.float32)
    theta = rigid_theta(
        jnp.asarray([0.12, -0.08, 0.1, 0.15, -0.1, 0.08], jnp.float32)
    )[None]
    B = max(10, required_block_affine(theta, shape))
    B += -B % 2

    theta_np = np.asarray(jax.device_get(theta), np.float64)[0]
    scal, org, grids, M, t = _roi_supports(theta_np, shape, False)
    QB = rg.QB
    Zp = QB * (-(-S // QB)) + 2 * QB
    Xp = 128 * (-(-S // 128))
    mt = jnp.asarray(
        np.concatenate([np.concatenate([M[s], [t[s]]]) for s in range(3)]),
        jnp.float32,
    )
    scal_j = jnp.asarray(scal)

    def chain(warp_fn):
        def run(v):
            def body(i, acc):
                out = warp_fn(v + acc * 1e-30)
                return jnp.float32(out[0, 0, 0, 0, 0] * 1e-30)

            return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

        return jax.jit(run)

    f_blk = chain(lambda v: warp_affine_blocked(theta, v, block=B))

    def roi_warp(v):
        volp = jnp.pad(
            v[0, 0], ((0, Zp - S), (0, Zp - S), (0, Xp - S))
        )
        out = rg.roigather_warp(volp, scal_j, mt, grids, TILE)
        return _untile(out[:, :, : TILE ** 3], grids, shape, 1)[None]

    f_roi = chain(roi_warp)

    def timeit(name, fn, *args):
        float(fn(*args))  # compile
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:<28} {min(ts)/N_IT*1e3:8.1f} ms/warp "
              f"(total {min(ts)*1e3:.0f} ms / {N_IT})", flush=True)

    timeit("blocked slice-gather (jit)", f_blk, vol)
    timeit("fused ROI kernel (jit)", f_roi, vol)


if __name__ == "__main__":
    main()
