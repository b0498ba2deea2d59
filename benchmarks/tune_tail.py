"""A/B the post-matrix tail: flow plateau patience + field smoothing steps.

With matrix_levels=2 the flow stage + full-res final warp dominate the
cascade. Measures recipe variants on BOTH quality gates.

Usage: python benchmarks/tune_tail.py [variant ...]
Variants: base fp15 fp10 decay5
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


VARIANTS = {
    "base": {},
    "fp15": dict(flow_patience=15),
    "fp10": dict(flow_patience=10),
    "decay5": dict(level_decay=5.0),
}


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
        matrix_levels=2,
        flow_model="field", flow_smooth=0.5,
        flow_stop_rel=1e-3, flow_patience=25,
    )

    def run_variant(tag, over):
        import jax.numpy as jnp

        fn = make_cascade_fn(**{**base, **over})

        def run(m, t):
            res = fn(m, t)
            float(res.warped.mean())
            return res

        res = run(moving, target)
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
            f"{tag:<10} {t:7.3f} s   rigid-gate {rigid_gate:6.2f}%   "
            f"deform-gate {flow_red:6.2f}%   field-err {field_err:.3f} vox",
            flush=True,
        )

    for tag in (_sys.argv[1:] or ["fp15"]):
        run_variant(tag, VARIANTS[tag])


if __name__ == "__main__":
    main()
