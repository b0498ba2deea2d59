"""A/B the exact affine warp paths at 240^3 on the real chip (r3 VERDICT #5).

Paths: element-gather exact (r1), slice-gather blocked (r2, 67 ms),
Pallas ROI-gather + XLA hats (r4). Host-readback timing, min of 3.

Usage: python benchmarks/roi_warp_bench.py [--small]
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
    from torchregister_tpu.ops.blocked import (
        required_block_affine,
        warp_affine_blocked,
        warp_affine_roi,
    )
    from torchregister_tpu.ops.resample import warp_affine
    from torchregister_tpu.ops.transforms import rigid_theta

    S = 120 if "--small" in _sys.argv else 240
    shape = (S, S, S)
    vol = jax.random.uniform(jax.random.key(0), (1, 1) + shape, jnp.float32)
    theta = rigid_theta(
        jnp.asarray([0.12, -0.08, 0.1, 0.15, -0.1, 0.08], jnp.float32)
    )[None]

    def timeit(fn, n=3):
        out = fn()
        ref = float(out.mean())  # completion via host readback
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn().mean())
            ts.append(time.perf_counter() - t0)
        return min(ts), ref, out

    B = max(10, required_block_affine(theta, shape))
    B += -B % 2
    t_blk, _, out_blk = timeit(lambda: warp_affine_blocked(theta, vol, block=B))
    print(f"blocked (slice gather, B={B}): {t_blk*1e3:8.1f} ms", flush=True)

    t_roi, _, out_roi = timeit(lambda: warp_affine_roi(theta, vol))
    err = float(jnp.max(jnp.abs(out_roi - out_blk)))
    print(f"roigather (Pallas):            {t_roi*1e3:8.1f} ms   "
          f"maxdiff vs blocked {err:.2e}", flush=True)

    if "--gather" in _sys.argv:
        t_g, _, _ = timeit(lambda: warp_affine(theta, vol), n=1)
        print(f"element gather exact:          {t_g*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
