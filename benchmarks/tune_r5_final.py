"""Final r5 A/B batch: sweep-window trims + flow-prior schedule.

1. Window trims — roofline (benchmarks/roofline.py) shows the rigid stage at
   2.2% of HBM peak: per-step cost is the unrolled sweep's term count, not
   bytes. With moment init the coarse level no longer sees the bulk
   translation, so its S/4 window (15 at 60^3 -> 32 terms/pass) can shrink.
2. Prior-side lever for the field error (r4 VERDICT #3): per-level diffusion
   schedules vs the flat 0.5 — measured against the TOTAL map error.

Run: python benchmarks/tune_r5_final.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from _ab import make_harness


def main():
    run = make_harness()
    run("r5 recipe (moment)", {})
    # window trims: residual_shift bounds the per-level windows (cascade
    # level_shift); the coarse level takes max(residual_shift, S/4)
    run("residual_shift 6", {"residual_shift": 6})
    run("residual_shift 4", {"residual_shift": 4})
    # prior schedule (flow_smooth per level, coarse -> fine)
    run("smooth (1.0,0.5,0.25)", {"flow_smooth": (1.0, 0.5, 0.25)})
    run("smooth (0.5,0.5,0.25)", {"flow_smooth": (0.5, 0.5, 0.25)})
    run("smooth (1.0,0.7,0.5)", {"flow_smooth": (1.0, 0.7, 0.5)})


if __name__ == "__main__":
    main()
