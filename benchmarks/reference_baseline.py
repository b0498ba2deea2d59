"""Time the upstream PyTorch reference on CPU for BASELINE.md's ratio column.

Imports the reference package from /root/reference (read-only; executed, not
copied) and measures per-epoch cost of its rigid/affine/flow loops on small
epoch counts, extrapolating to the README recipe budgets. CPU-only (no CUDA in
this image) — the numbers are a sanity ratio, not a GPU baseline.

Usage: python benchmarks/reference_baseline.py
"""
from __future__ import annotations

import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/root/reference/src/TorchRegister")


def _pair(shape, seed=0):
    rng = np.random.default_rng(seed)
    grids = np.meshgrid(*[np.linspace(-1, 1, s, dtype=np.float32) for s in shape],
                        indexing="ij")
    vol = np.zeros(shape, np.float32)
    for _ in range(8):
        c = rng.uniform(-0.5, 0.5, len(shape))
        w = rng.uniform(0.1, 0.35)
        vol += np.exp(-sum((g - ci) ** 2 for g, ci in zip(grids, c)) / (2 * w**2))
    moving = torch.from_numpy(vol)[None, None]
    theta = torch.tensor([[[0.998, -0.06, 0.0, 0.02], [0.06, 0.998, 0.0, -0.01],
                           [0.0, 0.0, 1.0, 0.015]]]) if len(shape) == 3 else \
        torch.tensor([[[0.998, -0.06, 0.02], [0.06, 0.998, -0.01]]])
    grid = torch.nn.functional.affine_grid(theta, moving.shape, align_corners=False)
    target = torch.nn.functional.grid_sample(moving, grid, align_corners=False)
    return moving, target


def time_fn(fn, label, budget_epochs, probe_epochs):
    t0 = time.perf_counter()
    fn(probe_epochs)
    dt = time.perf_counter() - t0
    per = dt / probe_epochs
    print(f"{label}: {per*1000:.1f} ms/epoch -> {per*budget_epochs:.1f} s "
          f"for {budget_epochs} epochs (extrapolated)")
    return per * budget_epochs


def main():
    torch.set_num_threads(8)
    import warpings  # reference module (path-injected, per its own import style)

    rows = {}

    m2, t2 = _pair((256, 256))
    rows["2D rigid 256², 200 ep"] = time_fn(
        lambda n: warpings.rigid_register(m2, t2, lr=1e-5, epochs=n,
                                          debug=False, grad_edges=False),
        "reference 2D rigid 256²", 200, 10,
    )

    # 3D with the default criterion stack is unmeasurable on CPU: the
    # reference NMI loss materializes an [8, 2e6, 256] KDE tensor (~30+ GB)
    # per step and thrashes. Pass an explicit criterion list, which the
    # reference replaces with [MSELoss()] (warpings.py:36-40) — its cheapest
    # configuration, so the ratio is conservative in the reference's favor.
    mse_only = [torch.nn.MSELoss()]
    m3, t3 = _pair((128, 128, 128), seed=1)
    rows["3D rigid 128³, 500 ep (MSE)"] = time_fn(
        lambda n: warpings.rigid_register(m3, t3, lr=1e-5, epochs=n, debug=False,
                                          grad_edges=False, criterions=mse_only),
        "reference 3D rigid 128³ (MSE)", 500, 5,
    )
    rows["3D affine 128³, 200 ep (MSE)"] = time_fn(
        lambda n: warpings.affine_register(m3, t3, lr=1e-5, epochs=n, debug=False,
                                           grad_edges=False, criterions=mse_only),
        "reference 3D affine 128³ (MSE)", 200, 5,
    )

    # Flow at 128^3 crashes in the reference (valid convs underflow at the
    # bottleneck); use 160^3 which its topology supports.
    m4, t4 = _pair((160, 160, 160), seed=2)
    def flow_n(n):
        fr = warpings.flow_register(tuple(m4.shape[2:]), mode="bilinear", n=32,
                                    lr=1e-3, max_epochs=n,
                                    criterions=mse_only, weights=[1.0])
        fr.optimize(m4, t4, "cpu", debug=False)
    try:
        rows["3D flow 160³, 100 ep (n=32)"] = time_fn(flow_n, "reference 3D flow 160³", 100, 2)
    except Exception as e:
        print("reference flow failed:", type(e).__name__, e)

    print()
    for k, v in rows.items():
        print(f"| {k} | {v:.1f} s (extrapolated, CPU) |")


if __name__ == "__main__":
    main()
