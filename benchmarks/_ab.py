"""Shared A/B harness for cascade recipe tuning (tune_*.py scripts).

One place for the compile-then-min-of-2 timing protocol (host readback =
real completion through the axon tunnel) and the two quality gates:

- **rigid gate**: RMSE reduction registering ``bench.make_pair()`` (a known
  rigid perturbation of a synthetic blob volume);
- **deformable gate**: RMSE reduction + total-sampling-map error (voxels)
  on ``bench.make_flow_truth_pair()`` (a known smooth flow ∘ rigid
  composition — reference README.md:76-93 is exactly this scenario).

The variant base is ``bench.RECIPE`` — the measured headline recipe — so
every A/B starts from what bench.py actually runs.
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def make_harness(base=None, shape=(240, 240, 240)):
    """Build the A/B runner. Returns ``run_variant(tag, over) -> dict`` which
    compiles ``bench.RECIPE | base | over``, times it (min of 2, host
    readback), scores both gates, prints one aligned row, and returns
    ``{"t": s, "rigid_gate": %, "deform_gate": %, "field_err": vox}``."""
    import bench
    import jax.numpy as jnp
    from torchregister_tpu.engines.cascade import make_cascade_fn

    moving, target = bench.make_pair(shape)
    fmov, ftgt, theta_true, flow_true = bench.make_flow_truth_pair(shape)
    base_cfg = {**bench.RECIPE, **(base or {})}

    def run_variant(tag, over=None):
        fn = make_cascade_fn(**{**base_cfg, **(over or {})})

        def run(m, t):
            res = fn(m, t)
            float(res.warped.mean())  # host readback = real completion
            return res

        res = run(moving, target)  # compile
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
        flow_red, field_err, field_err_obs = bench.flow_truth_metrics(
            fres, fmov, ftgt, theta_true, flow_true
        )
        print(
            f"{tag:<28} {t:7.3f} s   rigid-gate {rigid_gate:6.2f}%   "
            f"deform-gate {flow_red:6.2f}%   field-err {field_err:.3f} vox "
            f"(obs {field_err_obs:.3f})",
            flush=True,
        )
        return {
            "t": t,
            "rigid_gate": rigid_gate,
            "deform_gate": flow_red,
            "field_err": field_err,
            "field_err_obs": field_err_obs,
        }

    return run_variant
