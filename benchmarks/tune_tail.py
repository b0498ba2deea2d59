"""A/B the post-matrix tail: flow plateau patience + field smoothing steps.

With matrix_levels=2 the flow stage + full-res final warp dominate the
cascade. Measures recipe variants on BOTH quality gates (harness: _ab.py).

Usage: python benchmarks/tune_tail.py [variant ...]
Variants: base fp15 fp10 decay5
"""
from __future__ import annotations

import sys as _sys

from _ab import make_harness

VARIANTS = {
    "base": {},
    "fp15": dict(flow_patience=15),
    "fp10": dict(flow_patience=10),
    "decay5": dict(level_decay=5.0),
}


def main():
    run_variant = make_harness()
    for tag in (_sys.argv[1:] or ["fp15"]):
        run_variant(tag, VARIANTS[tag])


if __name__ == "__main__":
    main()
