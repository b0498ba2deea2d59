"""torchregister-tpu: TPU-native 2D/3D gradient-descent image registration.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
``TorchRegister`` package (rigid / affine / dense-flow intensity registration
of medical images), built TPU-first: jitted ``lax.scan``/``while_loop``
optimization loops, fused XLA resampling, flax Attention U-Net flow model,
``vmap``/``shard_map`` cohort parallelism and multi-resolution pyramids.

Public surface parity (reference README.md:20-94):

    import torchregister_tpu as tr
    warping = tr.Register(mode='rigid', device='tpu')
    warping.optim(moving, target, lr=1e-5, max_epochs=500)
    warped = warping(moving)
    field = tr.norm(abs(warping.theta))
"""
from .api import Register, norm
from .config import AffineConfig, CascadeConfig, FlowConfig, RigidConfig
from .engines import (
    FlowResult,
    RegistrationResult,
    affine_register,
    flow_register,
    rigid_register,
)
from .engines.cascade import CascadeResult, make_cascade_fn, register_cascade
from .parallel import make_mesh, register_cohort
from .losses import get_criterion, lncc, mse, ncc, nmi, nmi_loss, ssd
from .ops.blocked import warp_affine_fast, warp_flow_fast
from .ops.edge import edge_filter
from .ops.resample import grid_sample, warp_affine, warp_flow
from .ops.transforms import compose_theta, identity_theta, rigid_theta

__version__ = "0.1.0"

__all__ = [
    "Register",
    "norm",
    "RigidConfig",
    "AffineConfig",
    "FlowConfig",
    "CascadeConfig",
    "rigid_register",
    "affine_register",
    "flow_register",
    "register_cascade",
    "make_cascade_fn",
    "CascadeResult",
    "register_cohort",
    "make_mesh",
    "RegistrationResult",
    "FlowResult",
    "warp_affine",
    "warp_flow",
    "warp_affine_fast",
    "warp_flow_fast",
    "grid_sample",
    "edge_filter",
    "rigid_theta",
    "identity_theta",
    "compose_theta",
    "mse",
    "ncc",
    "ssd",
    "lncc",
    "nmi",
    "nmi_loss",
    "get_criterion",
    "__version__",
]
