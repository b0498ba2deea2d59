"""Command-line registration driver.

    python -m torchregister_tpu register moving.nii target.nii \
        --mode cascade -o warped.nii --save-transform t.npz

Reads/writes NIfTI-1 volumes through the native volio runtime; runs rigid |
affine | flow | cascade registration on the default JAX device. The reference
has no CLI (SURVEY.md §1: "the API layer is the whole entry surface") — this
is the serving-style entry point for cohort pipelines.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _load(path: str) -> np.ndarray:
    from .utils.volio import read_volume

    vol = read_volume(path).astype(np.float32)
    if vol.ndim not in (2, 3):
        raise SystemExit(f"{path}: expected a 2D/3D volume, got shape {vol.shape}")
    return vol[None, None]


def cmd_register(args) -> int:
    import jax.numpy as jnp

    import torchregister_tpu as tr
    from .utils.volio import write_volume

    moving = jnp.asarray(_load(args.moving))
    target = jnp.asarray(_load(args.target))
    if moving.shape != target.shape:
        raise SystemExit(f"shape mismatch: {moving.shape} vs {target.shape}")

    t0 = time.perf_counter()
    if args.mode == "cascade":
        res = tr.register_cascade(
            moving, target, levels=args.levels,
            rigid_epochs=args.epochs, affine_epochs=max(1, args.epochs // 2),
            flow_epochs=max(1, args.epochs // 5),
            rigid_lr=args.lr, affine_lr=args.lr, flow_lr=args.lr,
            criterions=tuple(args.criterion) if args.criterion else ("mse", "ncc"),
            optimizer=args.optimizer, flow_dtype=args.flow_dtype,
            # exact final warp: the saved transform applied via `apply`
            # (exact blocked resampler) reproduces this output bit-for-bit
            final_warp="exact",
        )
        warped, theta = res.warped, res.theta
        transform = {"theta": np.asarray(res.theta)}
        if res.flow is not None:
            transform["flow"] = np.asarray(res.flow)
    else:
        reg = tr.Register(
            mode=args.mode, criterion=args.criterion or None,
            optimizer=args.optimizer, grad_edges=args.grad_edges,
            init="identity",
        )
        reg.optim(moving, target, lr=args.lr, max_epochs=args.epochs, n=args.n)
        warped = reg(moving)
        theta = reg.theta
        # flow mode stores a [1,d,*S] field — save it under the key `apply`
        # dispatches on (a flow under "theta" would be misapplied as a matrix)
        key = "flow" if args.mode == "flow" else "theta"
        transform = {key: np.asarray(reg.theta)}
    elapsed = time.perf_counter() - t0

    rmse0 = float(jnp.sqrt(jnp.mean((moving - target) ** 2)))
    rmse1 = float(jnp.sqrt(jnp.mean((warped - target) ** 2)))
    print(f"registered in {elapsed:.2f}s | RMSE {rmse0:.5f} -> {rmse1:.5f} "
          f"({100 * (1 - rmse1 / max(rmse0, 1e-12)):.1f}% reduction)")

    if args.output:
        write_volume(args.output, np.asarray(warped)[0, 0])
        print(f"wrote {args.output}")
    if args.save_transform:
        from .utils.io import save_pytree

        save_pytree(args.save_transform, transform)
        print(f"wrote {args.save_transform}")
    return 0


def cmd_apply(args) -> int:
    import jax.numpy as jnp

    from .ops.blocked import warp_affine_fast, warp_flow_fast
    from .utils.io import load_pytree
    from .utils.volio import write_volume

    moving = jnp.asarray(_load(args.moving))
    try:
        tr_ = load_pytree(args.transform)
    except Exception as e:
        raise SystemExit(
            f"{args.transform}: not a torchregister-tpu transform file ({e})"
        )
    base = moving
    if "theta" in tr_:  # cascade order: matrix first, then flow
        base = warp_affine_fast(jnp.asarray(tr_["theta"]), base)
    if "flow" in tr_:
        base = warp_flow_fast(base, jnp.asarray(tr_["flow"]))
    if "theta" not in tr_ and "flow" not in tr_:
        raise SystemExit(f"{args.transform}: no theta/flow in transform file")
    write_volume(args.output, np.asarray(base)[0, 0])
    print(f"wrote {args.output}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="torchregister_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("register", help="register moving onto target")
    r.add_argument("moving")
    r.add_argument("target")
    r.add_argument("--mode", default="cascade",
                   choices=["rigid", "affine", "flow", "cascade"])
    r.add_argument("-o", "--output", help="write warped volume (.nii)")
    r.add_argument("--save-transform", help="write transform pytree (.npz)")
    r.add_argument("--epochs", type=int, default=500)
    r.add_argument("--levels", type=int, default=3)
    r.add_argument("--lr", type=float, default=1e-3)
    r.add_argument("--n", type=float, default=8, help="U-Net width divisor")
    r.add_argument("--criterion", nargs="*", help="e.g. mse ncc nmi lncc ssd")
    r.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
    r.add_argument("--grad-edges", action="store_true")
    r.add_argument("--flow-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    r.set_defaults(fn=cmd_register)

    a = sub.add_parser("apply", help="apply a saved transform to a volume")
    a.add_argument("moving")
    a.add_argument("transform")
    a.add_argument("-o", "--output", required=True)
    a.set_defaults(fn=cmd_apply)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
