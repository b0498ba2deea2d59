"""A/B: drive the deformable-truth total-map error below 1 voxel (r3 VERDICT #2).

Levers (engines/cascade.py r4 additions): per-level flow_smooth tuples, a
third (finer) flow level via flow_levels+flow_max_size, LNCC as the
flow-stage criterion. Scores the headline pair AND the deformable gate
(harness: _ab.py; base: bench.RECIPE).

Usage: python benchmarks/tune_field.py [variant ...]
"""
from __future__ import annotations

import sys as _sys

from _ab import make_harness

VARIANTS = {
    "base": {},
    # less smoothing at the fine level (the coarse level pins the bulk)
    "sm-tuple": dict(flow_smooth=(0.5, 0.15)),
    "sm-low": dict(flow_smooth=0.2),
    # third flow level at full 240^3 resolution
    "full-res": dict(flow_max_size=256, flow_levels=3, flow_epochs=450),
    "full-res-sm": dict(flow_max_size=256, flow_levels=3, flow_epochs=450,
                        flow_smooth=(0.5, 0.3, 0.1)),
    # LNCC for the flow stage only
    "lncc": dict(flow_criterions=("lncc",)),
    "lncc-full": dict(flow_max_size=256, flow_levels=3, flow_epochs=450,
                      flow_smooth=(0.5, 0.3, 0.1),
                      flow_criterions=("lncc",)),
    # more budget at current resolution (is it budget-limited at all?)
    "ep600": dict(flow_epochs=600, flow_patience=50),
}


def main():
    run_variant = make_harness()
    for tag in (_sys.argv[1:] or ["base", "sm-tuple", "full-res"]):
        run_variant(tag, VARIANTS[tag])


if __name__ == "__main__":
    main()
