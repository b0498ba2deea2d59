"""Observability floor of the deformable-truth field error (r4 VERDICT #2).

Decomposes the recovered-vs-true total-map error on the foreground into the
component ALONG the local image gradient (observable by any intensity
criterion) and the tangential remainder (the aperture problem: motion along
an intensity level set produces zero image change, so no similarity term can
see it — only priors can guess it). If the tangential share dominates, the
residual error is a floor of the benchmark's image content, not of the
optimizer.

Also reports the error of the ORACLE regularized fit: the true field pushed
through the same half-res + diffusion pipeline bound (upsample(downsample))
— the representational floor of the flow grid itself.

Usage: python benchmarks/probe_field_floor.py
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    import bench
    from torchregister_tpu.engines.cascade import make_cascade_fn

    shape = (240, 240, 240)
    fmov, ftgt, theta_true, flow_true = bench.make_flow_truth_pair(shape)
    fn = make_cascade_fn(**bench.RECIPE)
    res = fn(fmov, ftgt)
    float(res.warped.mean())

    phi_true = bench.total_sampling_map(theta_true, flow_true, shape)
    phi_rec = bench.total_sampling_map(res.theta, res.flow, shape)
    e = phi_rec - phi_true  # [3, *S]
    fg = ftgt[0, 0] > 0.1 * float(jnp.max(ftgt))

    # image gradient of the target (the matching signal lives there)
    g = jnp.stack(jnp.gradient(ftgt[0, 0]))  # [3, *S]
    gn = g / (jnp.linalg.norm(g, axis=0, keepdims=True) + 1e-8)
    e_par = jnp.sum(e * gn, axis=0)  # along-gradient (observable)
    e_norm = jnp.linalg.norm(e, axis=0)
    e_tan = jnp.sqrt(jnp.maximum(e_norm**2 - e_par**2, 0.0))

    def fg_mean(x):
        return float(jnp.sum(jnp.where(fg, x, 0.0)) / jnp.sum(fg))

    print(f"total field err (fg mean):      {fg_mean(e_norm):.3f} vox")
    print(f"  along image gradient:         {fg_mean(jnp.abs(e_par)):.3f} vox  (observable)")
    print(f"  tangential (aperture):        {fg_mean(e_tan):.3f} vox  (invisible to intensity)")

    # representational floor: true flow through the half-res grid round trip
    from torchregister_tpu.ops.resize import downsample_avg
    from torchregister_tpu.utils.pyramid import upsample_flow

    # /2: convert displacement values to half-res voxel units (the pipeline's
    # field params live in level-grid units; upsample_flow rescales back)
    f_half = downsample_avg(flow_true, 2) / 2.0
    f_round = upsample_flow(f_half, shape)
    e_repr = jnp.linalg.norm(f_round[0] - flow_true[0], axis=0)
    print(f"half-res grid round-trip floor: {fg_mean(e_repr):.3f} vox")

    # gradient-strength stratification: is the error small where signal is?
    gmag = jnp.linalg.norm(g, axis=0)
    thr = float(jnp.percentile(gmag[fg], 75))
    strong = fg & (gmag > thr)
    print(f"err on strong-gradient voxels:  "
          f"{float(jnp.sum(jnp.where(strong, e_norm, 0.0)) / jnp.sum(strong)):.3f} vox "
          f"(top-quartile |grad|)")


if __name__ == "__main__":
    main()
