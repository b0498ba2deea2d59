"""A/B: lift the U-Net parity flow mode toward >=85-90% deformable-truth
recovery (r4 VERDICT #2).

The r4 number is 71.28% / 3.123 vox (bench.py's pinned unet control:
flow_max_size=160, flow_levels=2, flow_epochs=300). Untried levers named by
the verdict: 3 composition levels, LNCC as the unet-stage criterion, a longer
fine-level budget. Scores the deformable-truth gate only (the unet control's
own metric); timing is secondary.

Run: python benchmarks/tune_unet.py
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


UNET_BASE = {
    "flow_model": "unet", "flow_smooth": None,
    "flow_max_size": 160, "flow_levels": 2, "flow_epochs": 300,
}


def main():
    import bench
    from torchregister_tpu.engines.cascade import make_cascade_fn

    fmov, ftgt, theta_true, flow_true = bench.make_flow_truth_pair()

    def run(tag, over):
        fn = make_cascade_fn(**{**bench.RECIPE, **UNET_BASE, **over})
        res = fn(fmov, ftgt)
        float(res.warped.mean())  # compile + completion
        t0 = time.perf_counter()
        res = fn(fmov, ftgt)
        float(res.warped.mean())
        t = time.perf_counter() - t0
        red, err, obs = bench.flow_truth_metrics(
            res, fmov, ftgt, theta_true, flow_true
        )
        print(f"{tag:<36} {t:7.3f} s   deform-gate {red:6.2f}%   "
              f"field-err {err:.3f} vox (obs {obs:.3f})", flush=True)
        return red, err

    run("unet r4 pinned (2 lvl, 300 ep)", {})
    run("3 compose levels", {"flow_levels": 3})
    run("3 levels + 450 ep", {"flow_levels": 3, "flow_epochs": 450})
    run("lncc criterion", {"flow_criterions": ("lncc",)})
    run("3 levels + lncc + 450 ep", {
        "flow_levels": 3, "flow_criterions": ("lncc",), "flow_epochs": 450,
    })
    run("3 levels + flat budgets", {"flow_levels": 3, "level_decay": 1.5,
                                    "flow_epochs": 450})


if __name__ == "__main__":
    main()
