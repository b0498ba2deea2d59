"""A/B: restrict matrix stages to the coarsest pyramid levels (matrix_levels).

Thetas are resolution-independent; the fine-level (240^3) matrix steps cost
~8x a mid-level step. This measures whether dropping them costs quality on
EITHER gate (rigid-recovery RMSE reduction, deformable-truth total-map error).
Harness: _ab.py.

Usage: python benchmarks/tune_matrix_levels.py [levels ...]
"""
from __future__ import annotations

import sys as _sys

from _ab import make_harness


def main():
    run_variant = make_harness()
    for v in (_sys.argv[1:] or ["3", "2", "1"]):
        lv = int(v)
        run_variant(f"matrix_levels={lv}", dict(matrix_levels=lv))


if __name__ == "__main__":
    main()
