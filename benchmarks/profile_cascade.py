"""Stage-level wall-clock split of the headline bench cascade (240^3, 1 chip).

Times the bench recipe with progressively more stages enabled — the
difference between consecutive rows is that stage's cost inside the single
fused program (dispatch/readback overhead cancels). Feeds the "which lever
next" decision for the headline.

Usage: python benchmarks/profile_cascade.py
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import bench
    from torchregister_tpu.engines.cascade import make_cascade_fn

    moving, target = bench.make_pair()

    # Mirror the bench recipe exactly (bench.py:run_cascade) so stage deltas
    # explain the headline number.
    base = dict(
        levels=3, rigid_epochs=500, rigid_lr=3e-3, affine_epochs=200,
        affine_lr=1e-3, flow_epochs=300, flow_lr=0.3,
        criterions=("mse", "ncc"), optimizer="adam", n=8,
        flow_dtype="float32", level_decay=3.5,
        matrix_dtype="bfloat16", matrix_stop_rel=1e-3, matrix_patience=10,
        matrix_levels=2,
        flow_model="field", flow_smooth=0.5,
        flow_stop_rel=1e-3, flow_patience=25,
    )

    def timeit(fn, n=3):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    prev = 0.0
    for stages in (("rigid",), ("rigid", "affine"),
                   ("rigid", "affine", "flow")):
        fn = make_cascade_fn(stages=stages, **base)

        def run(fn=fn):
            res = fn(moving, target)
            return float(res.warped.mean())

        t = timeit(run)
        print(f"{'+'.join(stages):<24} {t*1e3:8.1f} ms  "
              f"(stage delta {max(0.0, t - prev)*1e3:7.1f} ms)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
