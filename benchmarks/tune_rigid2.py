"""Second rigid/flow tail A/B (r5): moment init interacts with the plateau.

tune_rigid.py found: moment init cuts coarse rigid 174->31 executed steps but
the coarse plateau then fires EARLY (relative improvements shrink when you
start close), pushing 53 steps to the fine level. Variants here re-balance
with a tighter coarse stop and probe the flow patience tail (flow_levels=3
at patience 25 = 78 steps of minimum tail).

Run: python benchmarks/tune_rigid2.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from _ab import make_harness
from tune_rigid import step_split


def main():
    step_split("moment lr6e-3", {"moment_init": True, "rigid_lr": 6e-3})
    step_split("moment stop3e-4", {"moment_init": True,
                                   "matrix_stop_rel": 3e-4})

    run = make_harness()
    run("moment stop3e-4", {"moment_init": True, "matrix_stop_rel": 3e-4})
    run("moment lr6e-3 stop3e-4", {"moment_init": True, "rigid_lr": 6e-3,
                                   "matrix_stop_rel": 3e-4})
    run("moment fpat15", {"moment_init": True, "flow_patience": 15})
    run("moment fpat20", {"moment_init": True, "flow_patience": 20})
    run("moment mpat6", {"moment_init": True, "matrix_patience": 6})


if __name__ == "__main__":
    main()
