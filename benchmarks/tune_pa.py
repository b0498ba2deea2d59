"""A/B: principal-axes moment init vs CoM-only on the bench quality gates.

``moment_init='pa'`` (ops/moments.py:pa_rigid_params) also matches rotation
in closed form when the covariance eigenframe is observable (gated by
eigengap + skewness thresholds — near-isotropic volumes fall back to CoM).
The bench pair's blob volumes are near-isotropic, so the expected outcome is
"gate fires -> identical to CoM" or a small rigid-step saving; this run
records which.

Run: python benchmarks/tune_pa.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from _ab import make_harness


def main():
    run = make_harness()
    run("moment_init='com' (r5)", {})
    run("moment_init='pa'", {"moment_init": "pa"})


if __name__ == "__main__":
    main()
