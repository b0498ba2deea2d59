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
    # Many real NIfTI-1 files store 3D volumes as 4D with nt=1 (dim[0]=4,
    # trailing singleton) — accept them by squeezing trailing 1-dims.
    while vol.ndim > 2 and vol.shape[-1] == 1:
        vol = vol[..., 0]
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

    # lr resolution mirrors the measured recipe, NOT one shared value: the
    # matrix stages want ~1e-3..3e-3 with Adam, while a direct per-voxel
    # field needs step sizes in voxel units (~0.3; api.py optim note) — a
    # single 1e-3 forced into the flow stage was a measured near-no-op.
    matrix_lr = args.lr if args.lr is not None else 3e-3
    flow_lr = args.flow_lr if args.flow_lr is not None else 0.3

    t0 = time.perf_counter()
    if args.mode == "cascade":
        res = tr.register_cascade(
            moving, target, levels=args.levels,
            rigid_epochs=args.epochs, affine_epochs=max(1, args.epochs // 2),
            flow_epochs=max(1, args.epochs // 5),
            rigid_lr=matrix_lr, affine_lr=matrix_lr, flow_lr=flow_lr,
            criterions=tuple(args.criterion) if args.criterion else ("mse", "ncc"),
            optimizer=args.optimizer, flow_dtype=args.flow_dtype,
            # exact final warp: the saved transform applied via `apply`
            # (exact blocked resampler) reproduces this output bit-for-bit
            final_warp="exact",
        )
        warped, theta = res.warped, res.theta
        transform = {"mode": np.asarray("cascade"),
                     "theta": np.asarray(res.theta)}
        if res.flow is not None:
            transform["flow"] = np.asarray(res.flow)
    else:
        reg = tr.Register(
            mode=args.mode, criterion=args.criterion or None,
            optimizer=args.optimizer, grad_edges=args.grad_edges,
            init="identity",
        )
        if args.mode == "flow":
            # --flow-lr wins; an explicit --lr is still honored (the single-
            # stage mode has only one lr); neither set -> the api default
            # (0.3 for field-mode flow)
            lr = args.flow_lr if args.flow_lr is not None else args.lr
        else:
            lr = matrix_lr
        reg.optim(moving, target, lr=lr, max_epochs=args.epochs, n=args.n)
        warped = reg(moving)
        theta = reg.theta
        # flow mode stores a [1,d,*S] field — save it under the key `apply`
        # dispatches on (a flow under "theta" would be misapplied as a matrix),
        # plus the 'mode' manifest load_transform's misapply guard checks
        key = "flow" if args.mode == "flow" else "theta"
        transform = {"mode": np.asarray(args.mode), key: np.asarray(reg.theta)}
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

        written = save_pytree(args.save_transform, transform)
        print(f"wrote {written}")
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
    r.add_argument("--lr", type=float, default=None,
                   help="matrix-stage lr (default 3e-3 for Adam)")
    r.add_argument("--flow-lr", type=float, default=None,
                   help="flow-stage lr (default 0.3 — direct-field steps "
                        "are in voxel units)")
    r.add_argument("--n", type=float, default=8, help="U-Net width divisor")
    r.add_argument("--criterion", nargs="*", help="e.g. mse ncc nmi lncc ssd")
    r.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
    r.add_argument("--grad-edges", action="store_true")
    # float32: bf16 field-stage images measured a net LOSS on the bench
    # recipe (noisier plateau -> later stop AND lower quality; CLAUDE.md)
    r.add_argument("--flow-dtype", default="float32",
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
