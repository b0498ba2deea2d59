"""Why is the batched cascade SLOWER per pair than single-pair?

results.md's r4 row: 8x240^3 at microbatch 2 = 0.315 s/pair vs the 0.228 s
single-pair headline — yet the roofline table (BASELINE.md) shows the rigid
stage at 2.5% of HBM peak (op-overhead-bound), which batching should amortize
near-linearly. This probe splits the batched path per stage (same
progressive-stages trick as profile_cascade.py) and reports executed step
counts per pair, to separate three hypotheses:

  H1 worst-case-steps: a vmapped while_loop runs every pair to the slowest
     pair's step count (plateau stops are per-pair booleans, the loop bound
     is the batch max).
  H2 final-warp/memory pressure: the scale-aware final separable window is
     fused-unrolled per vmap element (the mb=4 OOM — run_configs.py:131-136).
  H3 plain vmap overhead in the unrolled sweeps.

Usage: python benchmarks/probe_batch.py [--size 240] [--mb 2]
"""
from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def timeit(fn, n=2):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=240)
    ap.add_argument("--mb", type=int, default=2, help="microbatch width")
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench
    from torchregister_tpu.engines.cascade import (
        make_cascade_batch_fn,
        make_cascade_fn,
    )

    S = (args.size,) * 3
    pairs = [bench.make_pair(S, seed=10 + i) for i in range(args.mb)]
    movings = jnp.concatenate([p[0] for p in pairs])
    targets = jnp.concatenate([p[1] for p in pairs])

    base = {k: v for k, v in bench.RECIPE.items() if k != "stages"}

    print(f"size={args.size}^3 mb={args.mb}; times are min-of-2 after compile",
          flush=True)

    stage_rows = (("rigid",), ("rigid", "affine"), ("rigid", "affine", "flow"))

    # Single-pair stage deltas (the headline path) for the comparison column.
    single_t = {}
    prev = 0.0
    for stages in stage_rows:
        fn = make_cascade_fn(stages=stages, **base)

        def run(fn=fn):
            return float(fn(pairs[0][0], pairs[0][1]).warped.mean())

        t = timeit(run)
        single_t[stages[-1]] = t - prev
        print(f"single  {'+'.join(stages):<22} {t*1e3:8.1f} ms "
              f"(delta {(t-prev)*1e3:7.1f})", flush=True)
        prev = t
    single_total = prev

    prev = 0.0
    for stages in stage_rows:
        fn = make_cascade_batch_fn(stages=stages, **base)

        def run(fn=fn):
            return float(fn(movings, targets).warped.mean())

        t = timeit(run)
        d = t - prev
        s1 = single_t[stages[-1]]
        print(f"batched {'+'.join(stages):<22} {t*1e3:8.1f} ms "
              f"(delta {d*1e3:7.1f}; {args.mb}x single delta would be "
              f"{args.mb*s1*1e3:7.1f}; amortization x{args.mb*s1/max(d,1e-9):.2f})",
              flush=True)
        prev = t

    print(f"\nper-pair batched: {prev/args.mb*1e3:.1f} ms "
          f"vs single {single_total*1e3:.1f} ms", flush=True)

    # Executed steps per pair (H1): the loss histories are full-budget arrays
    # whose tail goes constant once the plateau stop fires — the last index
    # where the loss still changes is the executed step count.
    import numpy as np

    def steps_of(losses):
        if losses is None:
            return None
        a = np.asarray(losses, np.float64)
        a = a.reshape(a.shape[0], -1) if a.ndim > 1 else a.reshape(1, -1)
        out = []
        for row in a:
            ch = np.nonzero(np.diff(row) != 0)[0]
            out.append(int(ch[-1]) + 2 if ch.size else 1)
        return out

    fn = make_cascade_batch_fn(**base)
    res = fn(movings, targets)
    print(f"batched steps: rigid={steps_of(res.rigid_losses)} "
          f"affine={steps_of(res.affine_losses)} "
          f"flow={steps_of(res.flow_losses)}", flush=True)
    solo = make_cascade_fn(**base)
    for i, (m, t) in enumerate(pairs):
        r = solo(m, t)
        print(f"solo pair {i} steps: rigid={steps_of(r.rigid_losses)} "
              f"affine={steps_of(r.affine_losses)} "
              f"flow={steps_of(r.flow_losses)}", flush=True)


if __name__ == "__main__":
    main()
