"""Per-mode configuration dataclasses — the authoritative default sets.

SURVEY §5: the reference scatters defaults across layers and even disagrees
with itself (``Register`` defaults ``grad_edges=False`` at torchregister.py:12
while its engines default ``True`` at warpings.py:30,117). This module makes
each layer's default set *explicit and typed*:

- ``RigidConfig`` / ``AffineConfig`` / ``FlowConfig`` carry the **engine**
  defaults (reference warpings.py parity, including ``grad_edges=True`` for
  the matrix engines);
- ``API_GRAD_EDGES = False`` records the **API-layer** override
  (torchregister.py:12 parity — the reference's self-disagreement is a
  documented fact, not an accident, and ``tests/test_config.py`` pins both
  layers against drift);
- ``CascadeConfig`` holds the cascade pipeline's recipe.

``tests/test_config.py`` asserts these dataclass defaults equal the engine
signatures' defaults by introspection, so there is exactly one authoritative
set — change a default in either place and CI fails until both agree.

Usage::

    cfg = RigidConfig(lr=3e-3, epochs=500, optimizer="adam")
    warped, result = cfg.run(moving, target)
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple, Union

# The reference API layer's grad_edges default (torchregister.py:12) — wins
# over the engine default at the ``Register`` surface.
API_GRAD_EDGES = False


def _kwargs(cfg) -> dict:
    return {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}


@dataclass(frozen=True)
class RigidConfig:
    """Engine defaults of :func:`engines.rigid.rigid_register`
    (reference warpings.py:117-174)."""

    lr: float = 1e-5
    epochs: int = 1000
    per: float = 0.1  # accepted-and-unused, reference parity
    criterions: Any = None  # None -> reference default MSE+NCC+NMI stack
    weights: Any = None
    grad_edges: bool = True  # engine-layer default (warpings.py:117)
    optimizer: str = "sgd"
    init: str = "random"  # torch.rand parity; 'identity' recommended
    method: str = "separable"
    max_shift: Union[int, Tuple[int, ...], None] = None  # None -> auto-derived
    check_window: bool = True
    stop_rel: Optional[float] = None  # plateau early stop (TPU extension)
    patience: int = 25
    progress_every: Optional[int] = None  # segmented in-loop progress prints

    def run(self, moving, target, **overrides):
        from .engines.rigid import rigid_register

        return rigid_register(moving, target, **{**_kwargs(self), **overrides})


@dataclass(frozen=True)
class AffineConfig:
    """Engine defaults of :func:`engines.affine.affine_register`
    (reference warpings.py:30-113)."""

    lr: float = 1e-5
    epochs: int = 1000
    per: float = 0.1
    criterions: Any = None
    weights: Any = None
    grad_edges: bool = True  # engine-layer default (warpings.py:30)
    optimizer: str = "sgd"
    method: str = "separable"
    max_shift: Union[int, Tuple[int, ...], None] = None
    check_window: bool = True
    stop_rel: Optional[float] = None
    patience: int = 25
    progress_every: Optional[int] = None  # segmented in-loop progress prints

    def run(self, moving, target, **overrides):
        from .engines.affine import affine_register

        return affine_register(moving, target, **{**_kwargs(self), **overrides})


@dataclass(frozen=True)
class FlowConfig:
    """Engine defaults of :func:`engines.flow.flow_register`
    (reference warpings.py:178-242)."""

    lr: float = 1e-3
    max_epochs: int = 2000
    stop_crit: float = 1e-4
    n: float = 1
    in_c: int = 1
    criterions: Any = None
    weights: Any = None
    grad_edges: bool = False  # the reference flow path never enables it
    optimizer: str = "sgd"
    depth: Optional[int] = None
    method: str = "separable"
    max_disp: int = 8
    dtype: str = "float32"
    remat: bool = False
    check_disp: bool = True
    use_attention: bool = True
    use_norm: bool = True
    progress_every: Optional[int] = None
    flow_model: str = "unet"  # 'field' = direct dense-field optimization
    smooth: float = 0.0  # field-mode diffusion regularizer weight
    stop_rel: Optional[float] = None  # plateau early-stop (matrix parity)
    patience: int = 25
    zero_head: bool = False  # zero-init flow head (composition levels)

    def run(self, moving, target, **overrides):
        from .engines.flow import flow_register

        return flow_register(moving, target, **{**_kwargs(self), **overrides})


@dataclass(frozen=True)
class CascadeConfig:
    """Defaults of :func:`engines.cascade.register_cascade` (the productized
    README pipeline; epoch budgets from reference README.md:59-82)."""

    stages: Tuple[str, ...] = ("rigid", "affine", "flow")
    levels: int = 3
    rigid_epochs: int = 500
    rigid_lr: float = 1e-5
    affine_epochs: int = 200
    affine_lr: float = 1e-5
    flow_epochs: int = 100
    flow_lr: float = 1e-3
    criterions: Any = ("mse", "ncc")
    weights: Any = None
    optimizer: str = "adam"
    n: float = 8
    flow_depth: Optional[int] = None
    seed: int = 0
    residual_shift: int = 8
    final_warp: str = "separable"
    flow_max_size: int = 160
    flow_dtype: str = "float32"
    level_decay: float = 2.0
    flow_remat: bool = False
    flow_max_disp: int = 8
    matrix_dtype: str = "float32"
    flow_attention: bool = True
    flow_norm: bool = True
    matrix_stop_rel: Optional[float] = None
    matrix_patience: int = 25
    matrix_levels: Optional[int] = None  # rigid/affine on the coarsest N levels
    matrix_optimizer: Optional[str] = None  # None -> `optimizer`; 'lm' = damped
    # Newton on the 6/12-param matrix stages (engines/second_order.py)
    moment_init: bool | str = False  # closed-form init for the coarsest
    # rigid level (ops/moments.py; the bench recipe enables it): True/'com' =
    # center-of-mass translation, 'pa' = + principal-axes rotation (falls
    # back to CoM when the eigenframe is unobservable)
    flow_model: str = "field"  # default: direct dense-field flow stage (97%
    # deformable-truth recovery vs the U-Net parity path's 54-76%, BASELINE.md);
    # 'unet' = reference-parity mode (warpings.py:178-242)
    flow_smooth: Optional[float] = None  # None -> 0.5 for 'field', 0.0 for 'unet'
    flow_stop_rel: Optional[float] = None  # flow plateau early-stop
    flow_patience: int = 25
    flow_compose: bool = True  # unet mode: per-level residual-flow composition
    flow_levels: Optional[int] = None  # flow mini-pyramid depth (None -> min(2, levels))
    flow_criterions: Any = None  # flow-stage criterion override (None -> criterions)
    flow_rebase: bool = False  # field mode: optimize fine levels as zero-init
    # residuals on a once-rebased input (quality lever — measured +0.2 deform
    # gate points at ~1.8x flow-stage cost; engines/cascade.py docstring)
    flow_residual_disp: int = 4  # per-level residual sweep window under rebase

    def run(self, moving, target, **overrides):
        from .engines.cascade import register_cascade

        return register_cascade(moving, target, **{**_kwargs(self), **overrides})

    def jitted(self, **overrides):
        """The single-program cascade (see :func:`engines.cascade.make_cascade_fn`)."""
        from .engines.cascade import make_cascade_fn

        return make_cascade_fn(**{**_kwargs(self), **overrides})
