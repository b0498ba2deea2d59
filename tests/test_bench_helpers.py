"""bench.py deformable ground-truth helpers (VERDICT r2 #2).

The driver runs bench.py on real TPU; these CPU tests pin the *semantics*:
the generator's sampling-map structure matches the cascade applier's, and the
metrics recover ~zero error when fed the ground truth itself.
"""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import flow_truth_metrics, make_flow_truth_pair, total_sampling_map  # noqa: E402


class _FakeRes:
    def __init__(self, warped, theta, flow):
        self.warped, self.theta, self.flow = warped, theta, flow


def test_flow_truth_pair_and_metrics_ground_truth_is_exact():
    shape = (24, 24, 24)
    moving, target, theta_true, flow_true = make_flow_truth_pair(
        shape, seed=0, max_disp=3.0
    )
    assert moving.shape == (1, 1) + shape
    assert flow_true.shape == (1, 3) + shape
    assert float(jnp.max(jnp.abs(flow_true))) <= 3.0 + 1e-4
    # feeding the truth back: perfect RMSE reduction, ~zero field error
    res = _FakeRes(target, theta_true, flow_true)
    rmse_red, field_err, field_err_obs = flow_truth_metrics(
        res, moving, target, theta_true, flow_true
    )
    assert rmse_red == 100.0
    assert field_err < 1e-4
    # the observable (along-gradient) component can never exceed the total
    assert field_err_obs <= field_err + 1e-6


def test_total_sampling_map_identity():
    from torchregister_tpu.ops.transforms import identity_theta

    shape = (8, 9, 10)
    theta = identity_theta(3)[None]
    phi = total_sampling_map(theta, None, shape)
    ident = np.stack(
        np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                    indexing="ij")
    )
    np.testing.assert_allclose(np.asarray(phi), ident, atol=1e-4)


def test_total_sampling_map_composition_order():
    """``total_sampling_map`` must encode the applier's order — affine
    resample first, then flow: ``phi(x) = A(x + f(x))``. The generator's
    two-stage warp interpolates an already-resampled image, so a one-stage
    resample at phi matches only to O(h^2) — but resampling at the *reversed*
    composition ``A(x) + f(x)`` must be distinctly worse."""
    from torchregister_tpu.ops.resample import multilinear_sample

    shape = (20, 20, 20)
    # a substantial rotation makes the two orders diverge by ~(A - I) f
    moving, target, theta_true, flow_true = make_flow_truth_pair(
        shape, seed=2, max_disp=2.0,
        rigid=(0.5, -0.3, 0.2, 0.1, -0.08, 0.05),
    )
    phi = total_sampling_map(theta_true, flow_true, shape)  # [3, *S]
    direct = multilinear_sample(moving, jnp.moveaxis(phi, 0, -1)[None])
    err_correct = float(jnp.mean(jnp.abs(direct - target)))

    phi_wrong = total_sampling_map(theta_true, None, shape) + flow_true[0]
    wrong = multilinear_sample(moving, jnp.moveaxis(phi_wrong, 0, -1)[None])
    err_wrong = float(jnp.mean(jnp.abs(wrong - target)))

    assert err_correct < 0.02, err_correct  # two-stage interp noise only
    assert err_wrong > 2.0 * err_correct, (err_correct, err_wrong)
