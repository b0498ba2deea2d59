"""Roofline accounting for the headline cascade (r4 VERDICT #6).

Per-stage achieved HBM bandwidth vs the v5e peak (~819 GB/s): bytes moved
come from XLA's own compiled cost analysis (``compiled.cost_analysis()``
"bytes accessed" — the compiler's HBM traffic estimate for the fused
program), time from the min-of-2 host-readback protocol. Stage deltas
(rigid-only, +affine, +flow) isolate each stage inside the single fused
program. FLOP counts give an MXU utilization column for completeness (this
workload is bandwidth-shaped, not FLOP-shaped).

Run: python benchmarks/roofline.py   → table for BASELINE.md
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

V5E_HBM_GBPS = 819.0  # v5e HBM peak
V5E_BF16_TFLOPS = 394.0  # v5e bf16 MXU peak


def main():
    import jax

    import bench
    from torchregister_tpu.engines.cascade import register_cascade

    moving, target = bench.make_pair()
    base = {k: v for k, v in bench.RECIPE.items() if k != "stages"}

    rows = []
    prev_t, prev_b, prev_f = 0.0, 0.0, 0.0
    for stages in (("rigid",), ("rigid", "affine"),
                   ("rigid", "affine", "flow")):
        fn = jax.jit(lambda m, t, st=stages: register_cascade(
            m, t, stages=st, **base
        ))
        compiled = fn.lower(moving, target).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        bytes_acc = float(ca.get("bytes accessed", float("nan")))
        flops = float(ca.get("flops", float("nan")))

        def run():
            res = compiled(moving, target)
            float(res.warped.mean())

        run()
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        rows.append((stages[-1], t - prev_t, bytes_acc - prev_b,
                     flops - prev_f))
        prev_t, prev_b, prev_f = t, bytes_acc, flops

    print(f"{'stage':<8} {'time':>9} {'XLA bytes':>12} {'GB/s':>8} "
          f"{'%HBM':>6} {'GFLOP':>9} {'%MXU':>6}")
    tot_t = tot_b = tot_f = 0.0
    for name, t, b, f in rows:
        gbps = b / t / 1e9
        print(f"{name:<8} {t*1e3:8.1f}ms {b/1e9:10.2f}GB {gbps:8.1f} "
              f"{100*gbps/V5E_HBM_GBPS:5.1f}% {f/1e9:9.1f} "
              f"{100*(f/t)/1e12/V5E_BF16_TFLOPS:5.1f}%")
        tot_t += t; tot_b += b; tot_f += f
    gbps = tot_b / tot_t / 1e9
    print(f"{'TOTAL':<8} {tot_t*1e3:8.1f}ms {tot_b/1e9:10.2f}GB {gbps:8.1f} "
          f"{100*gbps/V5E_HBM_GBPS:5.1f}% {tot_f/1e9:9.1f} "
          f"{100*(tot_f/tot_t)/1e12/V5E_BF16_TFLOPS:5.1f}%")


if __name__ == "__main__":
    main()
