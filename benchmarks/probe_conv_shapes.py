"""Per-shape A/B of the fused Pallas conv vs the tap decomposition, fwd+bwd,
at the exact shapes the 128^3 flow engine (n=8, depth 3) runs.

The kernel's probed wins (120^3/240^3 encoder shapes) don't automatically
transfer to small decoder planes (lane padding 58->128 wastes 2.2x; per-grid
-step overhead at ~10-25-row planes) — this measures where the crossover is.

Usage: python benchmarks/probe_conv_shapes.py
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

# (Ci, Co, spatial) for the 128^3 n=8 depth-3 engine (+ the bench cascade's
# 120^3 half-res shapes for reference)
SHAPES = [
    (1, 8, (126, 126, 126)),
    (8, 8, (124, 124, 124)),
    (8, 16, (60, 60, 60)),
    (16, 16, (58, 58, 58)),
    (16, 32, (27, 27, 27)),
    (32, 32, (25, 25, 25)),
    (32, 64, (10, 10, 10)),
    (64, 32, (22, 22, 22)),
    (32, 16, (56, 56, 56)),
    (16, 8, (118, 118, 118)),
]


def main():
    import jax
    import jax.numpy as jnp

    from torchregister_tpu.models.attention_unet import TapConv
    from torchregister_tpu.ops.pallas.conv3d import fits_pallas_conv

    def time_mode(ci, co, sp, use_pallas, iters=3):
        m = TapConv(features=co, ndim=3, use_pallas=use_pallas)
        x = jax.random.normal(jax.random.key(0), (1, ci) + sp, jnp.float32)
        params = m.init(jax.random.key(1), x)

        @jax.jit
        def step(p, x):
            def f(p):
                return jnp.sum(m.apply(p, x) ** 2)

            l, g = jax.value_and_grad(f)(p)
            return l + sum(jnp.sum(v) for v in jax.tree.leaves(g))

        float(step(params, x))  # compile
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(step(params, x))
            times.append(time.perf_counter() - t0)
        return min(times)

    print(f"{'shape':<28} {'fits':<5} {'tap ms':>8} {'pallas ms':>10} ratio")
    for ci, co, sp in SHAPES:
        fits = fits_pallas_conv(ci, co, sp, 4)
        t_tap = time_mode(ci, co, sp, False)
        t_pal = time_mode(ci, co, sp, True) if fits else float("nan")
        print(
            f"{ci}->{co} @{sp[0]}^3{'':<12} {str(fits):<5} "
            f"{t_tap*1e3:>8.2f} {t_pal*1e3:>10.2f} "
            f"{t_pal/t_tap:>5.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
