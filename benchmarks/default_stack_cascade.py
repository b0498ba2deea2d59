"""One 240^3 cascade row with the reference's DEFAULT criterion stack
(r4 VERDICT missing-item #2): the current headline recipe run with
``criterions=('mse','ncc','nmi')`` — MSE + NCC(α=100) + KDE-NMI(α=1000),
weights [0.33]*3 (reference warpings.py:37,124,179) — the one configuration a
reference user upgrading for quality would run. Scores both quality gates.

Run: python benchmarks/default_stack_cascade.py   (appends a row summary to
stdout; copy into benchmarks/default_stack.md / results.md)
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from _ab import make_harness


def main():
    run = make_harness()
    run("headline (mse+ncc)", {})
    run("default stack (mse+ncc+nmi)", {
        "criterions": ("mse", "ncc", "nmi"),
    })


if __name__ == "__main__":
    main()
