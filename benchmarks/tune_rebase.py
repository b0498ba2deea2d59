"""A/B: field-mode residual rebase (flow_rebase) on the bench recipe.

Hypothesis (probe_batch.py follow-up, r5): field mode warm-starts the TOTAL
field across flow levels, so the two fine levels (120^3, 240^3) sweep the
full +-flow_max_disp=8 window (17 terms/axis) every optimizer step even
though the post-coarse residual is ~1-2 voxels. flow_rebase=True spends one
full-window warp + one small-window separable compose per fine level to
shrink the per-step window to +-flow_residual_disp (9 terms at 4) —
potentially ~2x on the fine-level step cost, which is most of the ~0.11 s
flow stage.

Risks the gates arbitrate: (a) the separable compose/rebase are O(h^2) in
flow curvature — errors could show in the deform gate / field-err; (b) the
residual smoothness prior regularizes the residual, not the total.

Usage: python benchmarks/tune_rebase.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from _ab import make_harness  # noqa: E402


def main():
    run = make_harness()
    run("baseline (no rebase)")
    run("rebase rd=4", {"flow_rebase": True, "flow_residual_disp": 4})
    run("rebase rd=3", {"flow_rebase": True, "flow_residual_disp": 3})
    run("rebase rd=5", {"flow_rebase": True, "flow_residual_disp": 5})


if __name__ == "__main__":
    main()
