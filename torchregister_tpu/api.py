"""Public API: the ``Register`` class and ``norm`` — reference-parity surface.

Mirrors the reference's user API (torchregister.py:11-129): construct with a
mode, call ``.optim(moving, target, ...)``, then call the object to warp images
with the recovered transform. README driver programs written against the
reference port directly.

Reference-parity notes:
- ``optim`` stores the **best** (lowest-loss) theta for rigid/affine
  (torchregister.py:94,106; the engines' ``[final, best]`` pair semantics), and
  the dense flow for flow mode (torchregister.py:81-82).
- ``__call__`` warps a ``[1, C, *S]`` image per-channel with the stored
  transform (torchregister.py:108-129). All channels share one transform, so we
  warp them in a single resample — observably identical to the reference's
  per-channel concat.
- ``grad_edges`` defaults to False at this layer (torchregister.py:12) even
  though the engines default it True — the reference disagrees with itself;
  the API-level default wins here (SURVEY.md §5 config notes). Flow mode never
  applies grad_edges (the reference calls ``optimize`` positionally and leaves
  it False, torchregister.py:80).
- Divergence: user-supplied ``criterion`` lists are honored (the reference
  discards them — warpings.py:36-40); loss histories are exposed as
  ``self.losses``.

Extensions beyond the reference: ``optimizer='adam'``, ``init='identity'``,
``seed``, transform (de)serialization via ``save_transform`` /
``load_transform``, and resampler control — ``method='separable'|'exact'``
plus the sweep bounds ``max_shift`` (rigid/affine, None = auto-derived from
the init theta) and ``max_disp`` (flow, voxels). The separable sweep zeroes
contributions beyond its window; the engines auto-bump/warn (engines/common),
and ``method='exact'`` reproduces grid_sample semantics in-loop.
"""
from __future__ import annotations

from contextlib import nullcontext as _nullcontext
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engines.affine import affine_register
from .engines.flow import flow_register
from .engines.rigid import rigid_register
from .ops.blocked import warp_affine_fast, warp_flow_fast


def norm(x):
    """Min-max normalize to [0, 1] (reference utils.py:262-267, eps=1e-9;
    returns None with a warning on failure)."""
    try:
        x = jnp.asarray(x)
        lo = jnp.min(x)
        hi = jnp.max(x)
        return (x - lo) / ((hi - lo) + 1e-9)
    except Exception:
        print("WARNING: Input could not be normalized!")
        return None


def _resolve_device(device):
    if device is None or isinstance(device, jax.Device):
        return device
    if isinstance(device, str):
        key = device.lower()
        if key in ("cuda", "gpu"):  # convenience mapping for ported scripts
            key = "tpu"
        try:
            return jax.devices(key)[0]
        except RuntimeError:
            return jax.devices()[0]
    raise TypeError(f"device must be None, str, or jax.Device, got {type(device)}")


class Register:
    """Gradient-descent image registration (rigid | affine | flow).

    Drop-in equivalent of the reference ``Register`` (torchregister.py:11-44)
    on TPU: ``device`` selects a JAX device instead of a torch one; everything
    else matches the reference signature, plus the documented extensions.
    """

    def __init__(
        self,
        mode: str = "rigid",
        device=None,
        criterion=None,
        weight=None,
        grad_edges: bool = False,
        debug: bool = False,
        optimizer: str | None = None,
        init: str = "random",
        seed: int = 0,
        method: str = "separable",
        max_shift=None,
        max_disp: int = 8,
        flow_model: str = "field",
        smooth: float | None = None,
    ):
        if mode not in ("rigid", "affine", "flow"):
            raise ValueError(f"mode must be rigid|affine|flow, got {mode!r}")
        if method not in ("separable", "exact"):
            raise ValueError(f"method must be separable|exact, got {method!r}")
        if flow_model not in ("unet", "field"):
            raise ValueError(f"flow_model must be unet|field, got {flow_model!r}")
        self.mode = mode
        self.device = _resolve_device(device)
        self.criterion = criterion
        self.weight = weight
        self.grad_edges = grad_edges
        self.debug = debug
        # Default optimizer: SGD for the parity modes (reference
        # warpings.py:58,131,192) but Adam for field-mode flow — a directly
        # optimized per-voxel field sees ~1/numel-scaled similarity gradients,
        # so un-normalized SGD barely moves it at any sane lr (measured: a
        # 2-voxel shift at 48^3, SGD lr=0.5, 150 ep -> 0.5% RMSE reduction;
        # Adam's per-parameter scaling is what makes direct-field
        # optimization work).
        if optimizer is None:
            optimizer = "adam" if (mode == "flow" and flow_model == "field") else "sgd"
        self.optimizer = optimizer
        self.init = init
        self.seed = seed
        self.method = method
        self.max_shift = max_shift  # rigid/affine sweep bound (None = auto)
        self.max_disp = max_disp  # flow sweep bound in voxels
        # Flow parameterization. DEFAULT IS 'field' (direct dense-field
        # optimization): on a known smooth 7-voxel deformation the field
        # engine recovers ~97% RMSE while the reference-parity U-Net path
        # caps at 54-76% (BASELINE.md deformable-truth control; epochs, lr,
        # dtype and window size all probed). 'unet' remains available as the
        # reference-parity mode (warpings.py:178-242) with its measured
        # number published in bench.py's JSON.
        self.flow_model = flow_model
        # Diffusion regularizer weight: None = per-model default (0.5 for
        # 'field' — the measured bench recipe value; 0.0 for 'unet', which
        # keeps the reference path's loss exactly the reference's).
        self.smooth = (0.5 if flow_model == "field" else 0.0) if smooth is None else smooth
        self.theta = None  # [1,d,d+1] matrix (rigid/affine) or [1,d,*S] flow
        self.losses = None
        self.result = None

    # ------------------------------------------------------------------ optim
    def optim(
        self,
        moving,
        target,
        lr: float | None = None,
        max_epochs: int = 1000,
        n: float = 32,
        per: float = 0.1,
        stop_crit: float = 1e-4,
    ) -> "Register":
        """Estimate the transform warping ``moving [1,1,*S]`` onto ``target``.

        Signature parity with torchregister.py:46 (``n`` = U-Net width divisor,
        default 32; ``per`` accepted for parity, unused — see engines). Returns
        ``self`` for chaining.

        ``lr=None`` resolves per mode: 1e-5 for the parity paths (reference
        torchregister.py:46 default) but 0.3 for field-mode flow — Adam on a
        direct per-voxel field needs step sizes in voxel units (the measured
        bench-recipe value), not MLP-weight units.
        """
        if lr is None:
            lr = 0.3 if (self.mode == "flow" and self.flow_model == "field") else 1e-5
        moving = self._put(moving)
        target = self._put(target)
        if self.debug:
            self._preflight(moving, target)
        # Live in-loop progress under debug: the reference shows a tqdm bar,
        # prints rigid params during optimization (warpings.py:67,135-136,
        # 138,161-169) and flow progress every 100 epochs (warpings.py:
        # 222-229). Segmented chunk programs reproduce that information
        # content at one host sync per decile/century, never per epoch.
        matrix_progress = max(1, max_epochs // 10) if self.debug else None
        flow_progress = min(100, max(1, max_epochs // 10)) if self.debug else None
        with jax.default_device(self.device) if self.device else _nullcontext():
            if self.mode == "flow":
                _, res = flow_register(
                    moving, target, lr=lr, max_epochs=max_epochs, n=n,
                    criterions=self.criterion, weights=self.weight,
                    stop_crit=stop_crit, optimizer=self.optimizer,
                    key=jax.random.key(self.seed),
                    method=self.method, max_disp=self.max_disp,
                    flow_model=self.flow_model, smooth=self.smooth,
                    progress_every=flow_progress,
                )
                self.theta = res.flow
            elif self.mode == "affine":
                _, res = affine_register(
                    moving, target, lr=lr, epochs=max_epochs, per=per,
                    criterions=self.criterion, weights=self.weight,
                    grad_edges=self.grad_edges, optimizer=self.optimizer,
                    method=self.method, max_shift=self.max_shift,
                    progress_every=matrix_progress,
                )
                self.theta = res.best_theta
            else:
                _, res = rigid_register(
                    moving, target, lr=lr, epochs=max_epochs, per=per,
                    criterions=self.criterion, weights=self.weight,
                    grad_edges=self.grad_edges, optimizer=self.optimizer,
                    init=self.init, key=jax.random.key(self.seed),
                    method=self.method, max_shift=self.max_shift,
                    progress_every=matrix_progress,
                )
                self.theta = res.best_theta
        self.result = res
        self.losses = res.losses
        if self.debug:
            self._report()
        return self

    # ----------------------------------------------------------------- warp
    def __call__(self, moving):
        """Warp ``moving [1, C, *S]`` with the stored transform.

        Exact grid_sample-parity semantics via the blocked resampler
        (ops/blocked.py — ~10-20x the element-gather path at 240^3 on TPU;
        falls back to it automatically where the blocked path doesn't apply).
        """
        if self.theta is None:
            raise RuntimeError("call .optim(moving, target) before warping")
        moving = self._put(moving)
        if self.mode == "flow":
            return warp_flow_fast(moving, self.theta)
        return warp_affine_fast(self.theta, moving)

    # ------------------------------------------------------------- internals
    def _put(self, x):
        x = jnp.asarray(x, jnp.float32)
        if self.device is not None:
            x = jax.device_put(x, self.device)
        return x

    def _preflight(self, moving, target):
        """Debug-mode numerics pre-flight (SURVEY §5): when the criterion
        stack includes the KDE-NMI loss, evaluate it once checkified on the
        actual inputs so a non-finite log2/KDE stage raises with a named
        error instead of silently NaN-ing the whole optimization. One-shot:
        the hot loop stays uninstrumented."""
        from .losses import resolve_criteria
        from .losses.nmi import nmi_loss, nmi_loss_checkified

        crits, _ = resolve_criteria(self.criterion, self.weight)
        for c in crits:
            if getattr(c, "func", c) is nmi_loss:
                # Probe with the user's OWN hyperparameters (a partial's
                # keywords): a custom bandwidth/bins is exactly what makes
                # the KDE go non-finite, and probing defaults would let a
                # bad config sail through the preflight.
                kwargs = getattr(c, "keywords", None) or {}
                err, _ = nmi_loss_checkified(moving, target, **kwargs)
                err.throw()

    def _report(self):
        """Debug report — the reference's in-loop observability, post-hoc.

        The reference plots the loss every ``epochs/10`` and prints the
        intermediate rigid parameters during the loop (warpings.py:95-102,
        135-136,161-169) and announces flow convergence (warpings.py:222-236).
        Host syncs inside a TPU loop are the enemy, so the engines carry the
        loss and parameter trajectories device-side and this renders the same
        information content afterwards.
        """
        raw = np.asarray(self.losses)
        # Executed-step count separates early-stop NaN padding from mid-run
        # divergence: within the executed prefix every NaN is a real bad loss.
        steps_v = getattr(self.result, "steps", None)
        executed = int(steps_v) if steps_v is not None else raw.size
        raw = raw[:executed]
        losses = raw[np.isfinite(raw)]
        if losses.size:
            print(
                f"[torchregister-tpu] mode={self.mode} epochs={losses.size} "
                f"loss first={losses[0]:.6g} last={losses[-1]:.6g} "
                f"best={losses.min():.6g}"
            )
            # indices of the finite entries in the RAW arrays: epoch labels,
            # loss values and param rows must refer to the same actual step
            # even when NaNs appear mid-run (exactly the debug scenario)
            fin_idx = np.flatnonzero(np.isfinite(raw))
            nan_at = np.flatnonzero(~np.isfinite(raw))
            if nan_at.size:
                print(f"  WARNING: non-finite loss first at epoch {nan_at[0]}")
            hist = getattr(self.result, "param_history", None)
            marks = sorted({*np.linspace(0, fin_idx.size - 1, 11).astype(int)})
            hist_np = None if hist is None else np.asarray(hist)
            for m in marks:
                e = int(fin_idx[m])
                line = f"  epoch {e:>6d}  loss {raw[e]:.6g}"
                if hist_np is not None:
                    line += "  params " + np.array2string(
                        hist_np[e], precision=4, separator=", "
                    )
                print(line)
        if self.mode == "flow" and self.result is not None:
            steps = int(self.result.steps)
            if bool(self.result.converged):
                # reference warpings.py:231-236 convergence message
                print(f"  flow converged at epoch {steps} (loss <= stop_crit)")
            else:
                print(f"  flow did not converge within {steps} epochs")
        try:  # optional loss-curve plot, parity with the reference debug flag
            from matplotlib import pyplot as plt

            plt.plot(losses, label="Error")
            plt.title("Optimization Criterion")
            plt.xlabel("Epoch")
            plt.ylabel("Error")
            plt.legend()
            plt.show()
        except Exception:
            pass

