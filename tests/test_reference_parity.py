"""Head-to-head parity vs the actual PyTorch reference implementation.

Runs the reference package (mounted read-only at /root/reference — executed,
never copied) and our engines on identical problems with identical
initializations, SGD and losses, and asserts the recovered transforms match
within interpolation tolerance — the north-star parity gate.

Skipped automatically when the reference mount is absent.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/src/TorchRegister"
pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference package not mounted"
    ),
    # executes the PyTorch reference (smoke tier: -m 'not slow')
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def ref_warpings():
    # The reference imports matplotlib at module scope (warpings.py:12); stub
    # it out (not installed here, and debug=False never touches it).
    mpl = types.ModuleType("matplotlib")
    plt = types.ModuleType("matplotlib.pyplot")
    mpl.pyplot = plt
    sys.modules.setdefault("matplotlib", mpl)
    sys.modules.setdefault("matplotlib.pyplot", plt)
    sys.path.insert(0, REF)
    import warpings  # noqa: E402  (reference module, path-injected)

    return warpings


def _pair_torch(shape, seed=0):
    import torch

    rng = np.random.default_rng(seed)
    grids = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    vol = np.zeros(shape, np.float32)
    for _ in range(5):
        c = rng.uniform(-0.4, 0.4, len(shape))
        w = rng.uniform(0.15, 0.3)
        vol += np.exp(-sum((g - ci) ** 2 for g, ci in zip(grids, c)) / (2 * w**2))
    moving = torch.from_numpy(vol)[None, None]
    theta = torch.tensor([[[0.9962, -0.0872, 0.05], [0.0872, 0.9962, -0.04]]])
    grid = torch.nn.functional.affine_grid(theta, moving.shape, align_corners=False)
    target = torch.nn.functional.grid_sample(moving, grid, align_corners=False)
    return moving, target


def test_rigid_matches_reference_trajectory(ref_warpings):
    """Same random init, same SGD/lr/epochs/loss => same recovered theta."""
    import torch
    import jax.numpy as jnp

    from torchregister_tpu.engines.rigid import rigid_register

    moving, target = _pair_torch((32, 32), seed=0)
    lr, epochs = 5e-3, 60

    # Capture the reference's random init (its only torch.rand call).
    torch.manual_seed(7)
    init = torch.rand(3).numpy()
    torch.manual_seed(7)
    _, thetas = ref_warpings.rigid_register(
        moving, target, lr=lr, epochs=epochs, debug=False, grad_edges=False,
        criterions=[torch.nn.MSELoss()],  # reference replaces with [MSE], w=[1]
    )
    ref_best = thetas[1].detach().numpy().reshape(2, 3)

    _, res = rigid_register(
        jnp.asarray(moving.numpy()), jnp.asarray(target.numpy()),
        lr=lr, epochs=epochs, criterions=["mse"], weights=[1.0],
        grad_edges=False, optimizer="sgd", method="exact",
        init_params=jnp.asarray(init),
    )
    ours_best = np.asarray(res.best_theta[0])

    np.testing.assert_allclose(ours_best, ref_best, atol=2e-3)


def test_affine_matches_reference_trajectory(ref_warpings):
    """The reference's dead-MLP affine == our direct identity-init theta:
    identical SGD trajectories."""
    import torch
    import jax.numpy as jnp

    from torchregister_tpu.engines.affine import affine_register

    moving, target = _pair_torch((28, 28), seed=1)
    lr, epochs = 1e-2, 50

    torch.manual_seed(0)
    _, thetas = ref_warpings.affine_register(
        moving, target, lr=lr, epochs=epochs, debug=False, grad_edges=False,
        criterions=[torch.nn.MSELoss()],
    )
    ref_best = thetas[1].detach().numpy().reshape(2, 3)

    _, res = affine_register(
        jnp.asarray(moving.numpy()), jnp.asarray(target.numpy()),
        lr=lr, epochs=epochs, criterions=["mse"], weights=[1.0],
        grad_edges=False, optimizer="sgd", method="exact",
    )
    ours_best = np.asarray(res.best_theta[0])

    np.testing.assert_allclose(ours_best, ref_best, atol=2e-3)


def test_rigid_default_separable_path_matches_reference(ref_warpings):
    """Round-2 verdict #3: gate the DEFAULT engine path (method='separable')
    head-to-head too, not just method='exact'. The sweep is an O(h^2)
    approximation of grid_sample, so the trajectories drift slightly — the
    recovered transform must still match the reference's within a small
    multiple of that interpolation tolerance."""
    import torch
    import jax.numpy as jnp

    from torchregister_tpu.engines.rigid import rigid_register

    moving, target = _pair_torch((32, 32), seed=0)
    lr, epochs = 5e-3, 60

    torch.manual_seed(7)
    init = torch.rand(3).numpy()
    torch.manual_seed(7)
    _, thetas = ref_warpings.rigid_register(
        moving, target, lr=lr, epochs=epochs, debug=False, grad_edges=False,
        criterions=[torch.nn.MSELoss()],
    )
    ref_best = thetas[1].detach().numpy().reshape(2, 3)

    _, res = rigid_register(
        jnp.asarray(moving.numpy()), jnp.asarray(target.numpy()),
        lr=lr, epochs=epochs, criterions=["mse"], weights=[1.0],
        grad_edges=False, optimizer="sgd",  # method defaults to 'separable'
        init_params=jnp.asarray(init),
    )
    ours_best = np.asarray(res.best_theta[0])

    np.testing.assert_allclose(ours_best, ref_best, atol=2e-2)


def test_warped_volume_matches_reference_within_interp_tolerance(ref_warpings):
    """Applying the same theta through both stacks gives the same image."""
    import torch
    import jax.numpy as jnp

    from torchregister_tpu.ops.resample import warp_affine

    moving, _ = _pair_torch((24, 24), seed=2)
    theta_np = np.asarray([[[0.97, 0.05, 0.02], [-0.04, 1.01, -0.03]]], np.float32)

    ref = ref_warpings.get_affine_warp(
        torch.from_numpy(theta_np), moving
    ).detach().numpy()
    ours = np.asarray(warp_affine(jnp.asarray(theta_np), jnp.asarray(moving.numpy())))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_losses_match_reference_values(ref_warpings):
    """NCC and NMI loss values computed by the reference classes equal ours."""
    import torch
    import jax.numpy as jnp

    import utils as ref_utils  # reference module (path-injected)

    from torchregister_tpu.losses.nmi import nmi_loss
    from torchregister_tpu.losses.similarity import ncc

    rng = np.random.default_rng(3)
    a = rng.random((1, 1, 20, 20)).astype(np.float32)
    b = rng.random((1, 1, 20, 20)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)

    ref_ncc = float(ref_utils.NCCLoss()(ta, tb))
    ours_ncc = float(ncc(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours_ncc, ref_ncc, rtol=1e-4)

    ref_nmi = float(ref_utils.NMILoss(patch_size=5, bins=32, bandwidth=0.5)(ta, tb))
    ours_nmi = float(
        nmi_loss(jnp.asarray(a), jnp.asarray(b), patch_size=5, bins=32,
                 bandwidth=0.5)
    )
    np.testing.assert_allclose(ours_nmi, ref_nmi, rtol=2e-2)
