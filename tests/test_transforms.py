"""Transform-parameterization unit tests (SE(2)/SE(3) theta construction)."""
import numpy as np
import jax.numpy as jnp

from torchregister_tpu.ops.transforms import (
    as_matrix,
    compose_theta,
    identity_theta,
    rigid_theta,
    rigid_theta_2d,
    rigid_theta_3d,
)


def test_identity_theta():
    t2 = identity_theta(2)
    assert t2.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(t2), [[1, 0, 0], [0, 1, 0]])
    t3 = identity_theta(3)
    assert t3.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(t3)[:, :3], np.eye(3))


def test_rigid_theta_2d_zero_params_is_identity():
    theta = rigid_theta_2d(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(theta), [[1, 0, 0], [0, 1, 0]], atol=1e-7)


def test_rigid_theta_2d_rotation():
    th = 0.3
    theta = np.asarray(rigid_theta_2d(jnp.array([th, 0.1, -0.2])))
    c, s = np.cos(th), np.sin(th)
    np.testing.assert_allclose(theta, [[c, -s, 0.1], [s, c, -0.2]], rtol=1e-6)


def test_rigid_theta_3d_zero_params_is_identity():
    theta = np.asarray(rigid_theta_3d(jnp.zeros(6)))
    np.testing.assert_allclose(theta[:, :3], np.eye(3), atol=1e-7)
    np.testing.assert_allclose(theta[:, 3], 0, atol=1e-7)


def test_rigid_theta_3d_rotation_block_is_orthonormal():
    rng = np.random.default_rng(0)
    for _ in range(5):
        p = rng.normal(size=6).astype(np.float32)
        theta = np.asarray(rigid_theta_3d(jnp.asarray(p)), dtype=np.float64)
        R = theta[:, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        # Reference Euler product (utils.py:288-305) includes a reflection for
        # some param signs only through the sin/cos structure; determinant must
        # still be +1 (proper rotation).
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_rigid_theta_3d_translation_bounded():
    theta = np.asarray(rigid_theta_3d(jnp.array([0, 0, 0, 100.0, -100.0, 0.0])))
    np.testing.assert_allclose(theta[:, 3], [0.25, -0.25, 0.0], atol=1e-5)


def test_rigid_theta_3d_matches_closed_form():
    # Explicit check of one row against the reference formula at utils.py:288-305.
    psi, th, phi = 0.2, -0.4, 0.7
    theta = np.asarray(rigid_theta(jnp.array([psi, th, phi, 0, 0, 0], jnp.float32)))
    np.testing.assert_allclose(
        theta[0],
        [
            np.cos(psi) * np.cos(th),
            np.sin(phi) * np.sin(psi) * np.cos(th) - np.cos(phi) * np.sin(th),
            np.cos(phi) * np.sin(psi) * np.cos(th) + np.sin(phi) * np.sin(th),
            0.0,
        ],
        rtol=1e-5,
        atol=1e-7,
    )
    np.testing.assert_allclose(theta[2, 0], -np.sin(psi), rtol=1e-6)


def test_as_matrix_accepts_flat_thetas():
    assert as_matrix(jnp.zeros((1, 6))).shape == (1, 2, 3)
    assert as_matrix(jnp.zeros((1, 12))).shape == (1, 3, 4)
    assert as_matrix(jnp.zeros((3, 4))).shape == (1, 3, 4)
    assert as_matrix(jnp.zeros((2, 3))).shape == (1, 2, 3)


def test_compose_theta_identity():
    t = rigid_theta(jnp.array([0.3, 0.1, -0.2], jnp.float32))
    ident = identity_theta(2)
    out = compose_theta(t, ident)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(t), atol=1e-6)
    out2 = compose_theta(ident, t)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(t), atol=1e-6)


def test_compose_theta_matches_matrix_product():
    a = np.random.default_rng(1).normal(size=(2, 3)).astype(np.float32)
    b = np.random.default_rng(2).normal(size=(2, 3)).astype(np.float32)
    out = np.asarray(compose_theta(jnp.asarray(a), jnp.asarray(b))[0])
    bh = np.vstack([b, [0, 0, 1]])
    np.testing.assert_allclose(out, a @ bh, rtol=1e-5)
