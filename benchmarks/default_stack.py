"""Apples-to-apples default-stack benchmark (round-2 verdict item #4).

Measures the reference's *default* criterion stack — MSE + NCC(α=100) +
KDE-NMI(α=1000), weights [0.33]*3 (reference warpings.py:37,124,179) — on TPU
at 128³ for all three engines with the reference epoch budgets. This is the
configuration the headline bench deliberately does NOT use (MSE+NCC is the
practical stack; KDE-NMI dominates step cost), so the default stack gets its
own measured row here.

Also times BASELINE.json config #1 (2D rigid 256², 200 Adam steps) **on CPU**,
matching the config's own wording, next to the TPU number.

Usage: python benchmarks/default_stack.py [--quick]
Writes benchmarks/default_stack.md.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _pair(shape, seed=0):
    import jax.numpy as jnp

    from torchregister_tpu.ops.resample import warp_affine
    from torchregister_tpu.ops.transforms import rigid_theta

    rng = np.random.default_rng(seed)
    grids = np.meshgrid(
        *[np.linspace(-1, 1, s, dtype=np.float32) for s in shape], indexing="ij"
    )
    vol = np.zeros(shape, np.float32)
    for _ in range(8):
        c = rng.uniform(-0.5, 0.5, len(shape))
        w = rng.uniform(0.1, 0.35)
        vol += np.exp(
            -sum((g - ci) ** 2 for g, ci in zip(grids, c)) / (2 * w**2)
        ).astype(np.float32)
    moving = jnp.asarray(vol[None, None])
    params = [0.06, 0.04, -0.05] if len(shape) == 2 else [
        0.06, -0.04, 0.05, 0.2, -0.15, 0.1]
    theta = rigid_theta(jnp.asarray(params, jnp.float32))[None]
    return moving, warp_affine(theta, moving)


def _timeit(fn, repeats=2):
    fn()  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def _cpu_2d_rigid_seconds(steps: int) -> float:
    """Config #1 as written ('on CPU'): run in a CPU-forced subprocess."""
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys, time
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from benchmarks.default_stack import _pair, _timeit
from torchregister_tpu.engines.rigid import rigid_register
m, t = _pair((256, 256), 0)
def run():
    _, r = rigid_register(m, t, lr=5e-3, epochs={steps}, criterions=["mse"],
                          grad_edges=False, optimizer="adam", init="identity")
    return float(r.losses[-1])
print("CPU_SECONDS", _timeit(run))
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("CPU_SECONDS"):
            return float(line.split()[1])
    raise RuntimeError(out.stderr[-500:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    div = 20 if args.quick else 1

    from torchregister_tpu.engines.affine import affine_register
    from torchregister_tpu.engines.flow import flow_register
    from torchregister_tpu.engines.rigid import rigid_register

    rows = []
    m3, t3 = _pair((128, 128, 128), 1)

    # criterions=None -> reference default stack (MSE+NCC+NMI, [0.33]*3)
    def rigid_default():
        _, r = rigid_register(m3, t3, lr=3e-3, epochs=500 // div,
                              criterions=None, grad_edges=False,
                              optimizer="adam", init="identity")
        return float(r.losses[-1])

    rows.append(("3D rigid 128³, 500 ep, default MSE+NCC+NMI", _timeit(rigid_default)))

    def affine_default():
        _, r = affine_register(m3, t3, lr=1e-3, epochs=200 // div,
                               criterions=None, grad_edges=False,
                               optimizer="adam")
        return float(r.losses[-1])

    rows.append(("3D affine 128³, 200 ep, default MSE+NCC+NMI", _timeit(affine_default)))

    def flow_default():
        _, r = flow_register(m3, t3, lr=1e-3, max_epochs=100 // div,
                             criterions=None, optimizer="adam", n=8)
        return float(r.losses[0])

    rows.append(("3D flow 128³, 100 ep, default MSE+NCC+NMI", _timeit(flow_default)))

    cpu_s = _cpu_2d_rigid_seconds(200 // div)
    rows.append(("2D rigid 256², 200 Adam steps, MSE — on CPU (config #1 wording)", cpu_s))

    lines = [
        "# Default-criterion-stack results (reference MSE+NCC+NMI [0.33]*3)",
        "",
        f"quick={args.quick}; engine rows on one TPU v5e chip; best-of-2 after compile.",
        "",
        "| Config | Seconds |",
        "|---|---|",
    ]
    for name, dt in rows:
        lines.append(f"| {name} | {dt:.2f} |")
    out = "\n".join(lines)
    print(out)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "default_stack.md"), "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
