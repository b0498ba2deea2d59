"""Transform (de)serialization — checkpoint/resume capability.

The reference has no persistence at all (SURVEY.md §5): transforms live in
in-memory attributes. Here transforms are plain pytrees, so persistence is a
flat npz with a tiny manifest. Covers: rigid/affine thetas, dense flow fields,
raw engine parameter pytrees (e.g. U-Net weights for resuming a long flow
optimization), and optimizer state.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> str:
    """Save any pytree of arrays to ``path`` (npz + proto treedef manifest).

    Returns the path actually written: ``np.savez`` silently appends ``.npz``
    when missing, so normalizing here keeps callers' reported filenames (and
    subsequent ``load_pytree`` calls) honest."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        treedef.serialize_using_proto(), dtype=np.uint8
    )
    np.savez(path, **arrays)
    return path


def load_pytree(path: str) -> Any:
    data = np.load(path, allow_pickle=False)
    treedef = jax.tree_util.PyTreeDef.deserialize_using_proto(
        jax.tree_util.default_registry, data["__treedef__"].tobytes()
    )
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree.unflatten(treedef, leaves)


def save_transform(path: str, register) -> None:
    """Persist a fitted ``Register``'s transform (theta matrix or flow field).

    Flow fields are stored under the ``flow`` key (matrix thetas under
    ``theta``) so the CLI ``apply`` command — which dispatches on key names,
    matching the files the ``register`` command writes — applies each through
    the right resampler instead of crashing on a field-as-matrix reshape.
    """
    if register.theta is None:
        raise ValueError("Register has no fitted transform to save")
    key = "flow" if register.mode == "flow" else "theta"
    return save_pytree(path, {"mode": np.asarray(register.mode),
                              key: np.asarray(register.theta)})


def load_transform(path: str, register) -> None:
    """Restore a transform saved with :func:`save_transform` into ``register``.

    The saved ``mode`` must be compatible with ``register.mode``: a flow field
    loaded into a rigid/affine ``Register`` (or vice versa) would silently be
    misapplied through the wrong warp (``Register.__call__`` dispatches on
    ``register.mode``), so that raises instead. rigid<->affine interchange is
    fine — both store a ``[1, d, d+1]`` matrix applied identically.
    """
    tree = load_pytree(path)
    import jax.numpy as jnp

    has_theta = "theta" in tree
    has_flow = "flow" in tree
    if has_theta and has_flow:
        # A CLI cascade transform: matrix + field applied in sequence. A
        # Register holds ONE transform — loading either half alone would
        # silently produce a wrong warp.
        raise ValueError(
            f"{path} stores a composite cascade transform (theta AND flow); "
            "a Register holds a single transform. Apply it with the CLI "
            "(`python -m torchregister_tpu apply`), which chains matrix then "
            "flow."
        )
    saved_mode = str(tree.get("mode", ""))
    if not saved_mode or saved_mode == "cascade":
        # Mode-less files (older, or hand-built) and single-component
        # cascade saves: infer from the payload key — the check below is
        # this function's whole purpose and must not be skippable.
        saved_mode = "flow" if has_flow else ("rigid" if has_theta else "")
    matrixish = ("rigid", "affine")
    compatible = saved_mode == register.mode or (
        saved_mode in matrixish and register.mode in matrixish
    )
    if saved_mode and not compatible:
        raise ValueError(
            f"{path} stores a {saved_mode!r} transform; this Register is "
            f"mode={register.mode!r} and would misapply it. Construct "
            f"Register(mode={saved_mode!r}) to load it."
        )
    # Current files keep flow fields under "flow"; fall back to "theta" for
    # files written before that split.
    payload = tree.get("flow", tree.get("theta"))
    if payload is None:
        raise ValueError(f"{path}: no theta/flow entry in transform file")
    register.theta = jnp.asarray(payload)
