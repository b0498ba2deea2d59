"""A/B: restrict matrix stages to the coarsest pyramid levels (matrix_levels).

Thetas are resolution-independent; the fine-level (240^3) matrix steps cost
~8x a mid-level step. This measures whether dropping them costs quality on
EITHER gate (rigid-recovery RMSE reduction, deformable-truth total-map error).

Usage: python benchmarks/tune_matrix_levels.py
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import bench
    from torchregister_tpu.engines.cascade import make_cascade_fn

    moving, target = bench.make_pair()
    fmov, ftgt, theta_true, flow_true = bench.make_flow_truth_pair()

    base = dict(
        stages=("rigid", "affine", "flow"),
        levels=3, rigid_epochs=500, rigid_lr=3e-3, affine_epochs=200,
        affine_lr=1e-3, flow_epochs=300, flow_lr=0.3,
        criterions=("mse", "ncc"), optimizer="adam", n=8,
        flow_dtype="float32", level_decay=3.5,
        matrix_dtype="bfloat16", matrix_stop_rel=1e-3, matrix_patience=10,
        flow_model="field", flow_smooth=0.5,
        flow_stop_rel=1e-3, flow_patience=25,
    )

    def run_variant(tag, **over):
        import jax.numpy as jnp

        fn = make_cascade_fn(**{**base, **over})

        def run(m, t):
            res = fn(m, t)
            float(res.warped.mean())  # host readback = real completion
            return res

        res = run(moving, target)  # compile + rigid gate
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            res = run(moving, target)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        r0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
        r1 = float(jnp.sqrt(jnp.mean((res.warped - target) ** 2)))
        rigid_gate = 100.0 * (1.0 - r1 / max(r0, 1e-12))

        fres = run(fmov, ftgt)
        flow_red, field_err = bench.flow_truth_metrics(
            fres, fmov, ftgt, theta_true, flow_true
        )
        print(
            f"{tag:<28} {t:7.3f} s   rigid-gate {rigid_gate:6.2f}%   "
            f"deform-gate {flow_red:6.2f}%   field-err {field_err:.3f} vox",
            flush=True,
        )

    import sys

    variants = sys.argv[1:] or ["3", "2", "1"]
    for v in variants:
        lv = int(v)
        run_variant(f"matrix_levels={lv}", matrix_levels=lv)


if __name__ == "__main__":
    main()
