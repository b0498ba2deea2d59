"""Benchmark the five BASELINE.json configs and emit a markdown table.

Usage: python benchmarks/run_configs.py [--quick]
Writes results to benchmarks/results.md (and prints them).

Configs (BASELINE.json):
 1. 2D rigid, 256^2 pair, 200 Adam steps
 2. 3D rigid, 128^3 pair, 500 epochs
 3. 3D affine, 128^3 pair, 200 epochs (12-param, NCC)
 4. 3D flow, 128^3 pair, 100 epochs lr=1e-3
 5. Batched rigid->affine->flow cascade, 8x 240^3 via vmap, 3-level pyramid
"""
from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
import time

import numpy as np


def _pair(shape, seed=0, rigid_params=None):
    import jax.numpy as jnp

    from torchregister_tpu.ops.resample import warp_affine
    from torchregister_tpu.ops.transforms import rigid_theta

    rng = np.random.default_rng(seed)
    grids = np.meshgrid(
        *[np.linspace(-1, 1, s, dtype=np.float32) for s in shape], indexing="ij"
    )
    vol = np.zeros(shape, np.float32)
    for _ in range(8):
        c = rng.uniform(-0.5, 0.5, len(shape))
        w = rng.uniform(0.1, 0.35)
        vol += np.exp(
            -sum((g - ci) ** 2 for g, ci in zip(grids, c)) / (2 * w**2)
        ).astype(np.float32)
    moving = jnp.asarray(vol[None, None])
    if rigid_params is None:
        rigid_params = [0.06, 0.04, -0.05] if len(shape) == 2 else [
            0.06, -0.04, 0.05, 0.2, -0.15, 0.1]
    theta = rigid_theta(jnp.asarray(rigid_params, jnp.float32))[None]
    target = warp_affine(theta, moving)
    return moving, target


def _timeit(fn, repeats=2):
    fn()  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny epoch counts")
    args = ap.parse_args()
    div = 10 if args.quick else 1

    import jax
    import jax.numpy as jnp

    from torchregister_tpu.engines.affine import affine_register
    from torchregister_tpu.engines.cascade import register_cascade
    from torchregister_tpu.engines.flow import flow_register
    from torchregister_tpu.engines.rigid import rigid_register

    rows = []

    # 1. 2D rigid 256^2, 200 adam steps
    m, t = _pair((256, 256), 0)
    def cfg1():
        _, r = rigid_register(m, t, lr=5e-3, epochs=200 // div,
                              criterions=["mse"], grad_edges=False,
                              optimizer="adam", init="identity")
        return float(r.losses[-1])
    dt = _timeit(cfg1)
    rows.append(("2D rigid 256², 200 Adam steps", dt))

    # 2. 3D rigid 128^3, 500 ep
    m3, t3 = _pair((128, 128, 128), 1)
    def cfg2():
        _, r = rigid_register(m3, t3, lr=3e-3, epochs=500 // div,
                              criterions=["mse", "ncc"], weights=[0.5, 0.5],
                              grad_edges=False, optimizer="adam", init="identity")
        return float(r.losses[-1])
    dt = _timeit(cfg2)
    rows.append(("3D rigid 128³, 500 ep", dt))

    # 3. 3D affine 128^3, 200 ep, NCC
    def cfg3():
        _, r = affine_register(m3, t3, lr=1e-3, epochs=200 // div,
                               criterions=["ncc"], grad_edges=False,
                               optimizer="adam")
        return float(r.losses[-1])
    dt = _timeit(cfg3)
    rows.append(("3D affine 128³, 200 ep (NCC)", dt))

    # 4. 3D flow 128^3, 100 ep lr 1e-3
    def cfg4():
        _, r = flow_register(m3, t3, lr=1e-3, max_epochs=100 // div,
                             criterions=["mse", "ncc"], optimizer="adam", n=8)
        return float(r.flow.mean())
    dt = _timeit(cfg4)
    rows.append(("3D flow 128³, 100 ep", dt))

    # 5. Batched 8x 240^3 cascade, 3-level pyramid (sequential per pair —
    # pairs stream through the same compiled programs).
    B = 2 if args.quick else 8
    S = 120 if args.quick else 240
    pairs = [_pair((S, S, S), 10 + i) for i in range(B)]
    movings = jnp.concatenate([p[0] for p in pairs])
    targets = jnp.concatenate([p[1] for p in pairs])
    from torchregister_tpu.engines.cascade import make_cascade_batch_fn

    import bench  # the headline recipe — ONE source of truth (bench.RECIPE)

    recipe = dict(bench.RECIPE)
    for k in ("rigid_epochs", "affine_epochs", "flow_epochs"):
        recipe[k] = max(1, recipe[k] // div)
    cascade = make_cascade_batch_fn(**recipe)
    # Microbatch 2 on one chip: the r2 recipe's scale-aware final flow window
    # (K=16, 34 sweep terms) is fused-unrolled per vmap element — the
    # footprint guard in ops/separable.py sees per-element shapes only, so at
    # microbatch 4 the batched program OOMs 16 GB HBM. Each 240^3 pair
    # saturates the chip anyway; the 8-wide layout targets an 8-chip mesh.
    mb = 2 if not args.quick else B
    def cfg5():
        acc = 0.0
        for i in range(0, B, mb):
            res = cascade(movings[i:i+mb], targets[i:i+mb])
            acc += float(res.warped.mean())
        return acc
    dt = _timeit(cfg5, repeats=1)
    rows.append((f"Batched cascade {B}x {S}³, 3-level pyramid", dt))

    lines = [
        "# Benchmark results (this repo, one TPU chip)",
        "",
        f"quick={args.quick}; times are best-of-2 wall seconds after compile.",
        "",
        "| Config | Seconds |",
        "|---|---|",
    ]
    for name, dt in rows:
        lines.append(f"| {name} | {dt:.3f} |")
    out = "\n".join(lines)
    print(out)
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/results.md", "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
