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

    # The bench recipe itself (bench.RECIPE) so stage deltas explain the
    # headline number; `stages` is overridden per row below.
    base = {k: v for k, v in bench.RECIPE.items() if k != "stages"}

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
