"""Resampler throughput micro-benchmark (voxel-resamples/sec/chip).

Measures the three warp implementations on one chip at 240^3:
exact XLA-gather (grid_sample semantics), separable sweep (small residual
window, the engine hot path), separable sweep (full window, level re-warps /
one-shot warps; Pallas kernel path). Prints a markdown table.
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from torchregister_tpu.ops.resample import warp_affine
    from torchregister_tpu.ops.separable import warp_affine_separable
    from torchregister_tpu.ops.transforms import rigid_theta

    S = 240
    vox = S**3
    x = jnp.asarray(np.random.default_rng(0).random((1, 1, S, S, S), np.float32))
    p = jnp.asarray([0.05, -0.04, 0.03, 0.1, -0.1, 0.05], jnp.float32)

    def chain(warp_fn, n):
        @jax.jit
        def run():
            def body(i, acc):
                theta = rigid_theta(p + acc * 1e-20)[None]
                return acc + jnp.sum(warp_fn(theta, x)) * 1e-20
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    from torchregister_tpu.ops.blocked import (
        required_block_affine,
        warp_affine_blocked,
    )

    B = max(10, required_block_affine(rigid_theta(p)[None], (S, S, S)))
    B += -B % 2
    rows = []
    cases = [
        ("exact multilinear (XLA gather)", lambda t, m: warp_affine(t, m), 3),
        (f"exact blocked (slice-gather + hat contractions, B={B})",
         lambda t, m: warp_affine_blocked(t, m, block=B), 20),
        ("separable sweep, K=8 (engine residual window)",
         lambda t, m: warp_affine_separable(t, m, max_shift=8), 100),
        ("separable sweep, K=60 (full window; Pallas)",
         lambda t, m: warp_affine_separable(t, m, max_shift=60), 30),
    ]
    for label, fn, n in cases:
        run = chain(fn, n)
        float(run())
        t0 = time.perf_counter()
        float(run())
        dt = (time.perf_counter() - t0) / n
        rows.append((label, dt * 1e3, vox / dt / 1e9))

    print(f"# Resampler throughput at {S}^3 (one v5e chip)\n")
    print("| Path | ms/warp | Gvox-resamples/s |")
    print("|---|---|---|")
    for label, ms, gv in rows:
        print(f"| {label} | {ms:.2f} | {gv:.2f} |")


if __name__ == "__main__":
    main()
