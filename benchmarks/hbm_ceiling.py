"""Measure the single-chip volume-size ceiling for each engine (v5e, 16 GB).

Runs rigid / flow optimizations at growing cubic sizes until the chip OOMs,
printing per-size peak-memory-shaped status. The result feeds BASELINE.md's
spatial-sharding note: beyond the ceiling, `parallel/mesh.volume_sharding`
shards the volume over a device mesh (engine-scope correctness is pinned by
tests/test_parallel.py::test_{rigid,flow}_engine_space_sharded_full_optimization
on an 8-device CPU mesh — halo exchanges ride GSPMD collectives).

Usage: python benchmarks/hbm_ceiling.py [--mode rigid|flow]
"""
from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def _pair(shape, seed=0):
    import jax.numpy as jnp

    from torchregister_tpu.ops.resample import warp_affine
    from torchregister_tpu.ops.transforms import rigid_theta

    rng = np.random.default_rng(seed)
    grids = np.meshgrid(
        *[np.linspace(-1, 1, s, dtype=np.float32) for s in shape], indexing="ij"
    )
    vol = np.zeros(shape, np.float32)
    for _ in range(6):
        c = rng.uniform(-0.4, 0.4, 3)
        w = rng.uniform(0.15, 0.3)
        vol += np.exp(
            -sum((g - ci) ** 2 for g, ci in zip(grids, c)) / (2 * w**2)
        ).astype(np.float32)
    moving = jnp.asarray(vol[None, None])
    theta = rigid_theta(jnp.asarray([0.04, -0.03, 0.03, 0.1, -0.08, 0.06],
                                    jnp.float32))[None]
    target = warp_affine(theta, moving)
    return moving, target


def try_size(mode: str, S: int, epochs: int = 20) -> str:
    import jax
    import jax.numpy as jnp

    from torchregister_tpu.engines.flow import flow_register
    from torchregister_tpu.engines.rigid import rigid_register

    try:
        moving, target = _pair((S, S, S))
        t0 = time.perf_counter()
        if mode == "rigid":
            _, res = rigid_register(
                moving, target, epochs=epochs, lr=3e-3, optimizer="adam",
                criterions=("mse",), init="identity",
            )
            ck = float(jnp.mean(res.best_theta))
        elif mode == "flow":
            _, res = flow_register(
                moving, target, max_epochs=epochs, lr=1e-3, n=8,
                criterions=("mse",), dtype="bfloat16",
            )
        elif mode == "flow-f32":
            _, res = flow_register(
                moving, target, max_epochs=epochs, lr=1e-3, n=8,
                criterions=("mse",), dtype="float32",
            )
        else:  # field (the default flow mode since r4)
            _, res = flow_register(
                moving, target, max_epochs=epochs, lr=0.3, optimizer="adam",
                criterions=("mse",), flow_model="field", smooth=0.5,
            )
        if mode != "rigid":
            ck = float(jnp.mean(res.flow.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        return f"ok ({dt:.1f}s incl. compile, ck={ck:.2e})"
    except Exception as e:  # RESOURCE_EXHAUSTED surfaces as XlaRuntimeError
        msg = str(e)
        if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg.lower() or (
            "memory" in msg.lower() and "hbm" in msg.lower()
        ):
            return "OOM"
        return f"error: {type(e).__name__}: {msg[:160]}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["rigid", "flow", "flow-f32", "field", "both"])
    args = ap.parse_args()
    modes = ["rigid", "flow"] if args.mode == "both" else [args.mode]
    # f32 volume bytes: 320^3=131 MB, 448^3=360 MB, 512^3=537 MB, 576^3=764 MB,
    # 640^3=1.05 GB; engines hold O(10) volume-sized buffers (pyramid, grads,
    # adam moments, sweep temps).
    for mode in modes:
        sizes = {
            "rigid": (240, 320, 384, 448, 512, 576, 640),
            "field": (240, 320, 384, 448),
        }.get(mode, (160, 240, 320, 384, 448))
        for S in sizes:
            status = try_size(mode, S)
            print(f"{mode} {S}^3: {status}", flush=True)
            if status == "OOM" or status.startswith("error"):
                break


if __name__ == "__main__":
    main()
