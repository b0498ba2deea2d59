"""Rigid-stage lever A/B (r5): moment init + learning-rate/patience variants.

Profile (r5, benchmarks/profile_cascade.py): rigid 146.9 ms of the 266 ms
cascade, affine only 7.1 ms, flow 112.2 ms. tune_lm.py measured LM (damped
Newton) at 2.2x SLOWER than Adam at identical gates — the Hessian tangent
passes cost what the steps they replace cost — and moment init at -7.5%.
This script probes where the rigid steps go (executed per level, from the
NaN-padding of the concatenated loss history) and whether moment init
enables a faster walk-in (higher lr, tighter patience).

Run: python benchmarks/tune_rigid.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from _ab import make_harness


def step_split(tag, over=None):
    """Executed steps per matrix level (non-NaN run lengths in the padded
    concatenated loss history)."""
    import bench
    from torchregister_tpu.engines.cascade import make_cascade_fn

    moving, target = bench.make_pair()
    cfg = {**bench.RECIPE, **(over or {})}
    fn = make_cascade_fn(**cfg)
    res = fn(moving, target)
    # budgets mirror register_cascade.level_budgets
    lv = cfg.get("matrix_levels", cfg["levels"])
    decay = cfg.get("level_decay", 2.0)
    w = [decay ** (lv - 1 - i) for i in range(lv)]
    s = sum(w)

    for name, losses, total in (
        ("rigid", res.rigid_losses, cfg["rigid_epochs"]),
        ("affine", res.affine_losses, cfg["affine_epochs"]),
    ):
        budgets = [max(1, int(round(total * wi / s))) for wi in w]
        arr = np.asarray(losses)
        out, off = [], 0
        for b in budgets:
            seg = arr[off:off + b]
            out.append(int(np.isfinite(seg).sum()))
            off += b
        print(f"{tag:<24} {name:<6} budgets={budgets} executed={out}",
              flush=True)


def main():
    step_split("base")
    step_split("moment", {"moment_init": True})

    run = make_harness()
    run("base", {})
    run("moment", {"moment_init": True})
    run("moment lr6e-3", {"moment_init": True, "rigid_lr": 6e-3})
    run("moment lr1e-2", {"moment_init": True, "rigid_lr": 1e-2})
    run("moment lr6e-3 pat8", {"moment_init": True, "rigid_lr": 6e-3,
                               "matrix_patience": 8})
    run("moment lr6e-3 decay5", {"moment_init": True, "rigid_lr": 6e-3,
                                 "level_decay": 5.0})


if __name__ == "__main__":
    main()
