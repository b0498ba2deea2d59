"""Pallas sweep-resampler kernel tests (interpreter mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from torchregister_tpu.ops.pallas.sweep import _sweep_fwd_raw, sweep_lastaxis
from torchregister_tpu.ops.separable import _sweep_fori


def _case(R=40, X=96, seed=0, scale=5.0):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(R, X)).astype(np.float32)
    base = np.arange(X, dtype=np.float32)[None]
    q = base + rng.uniform(-scale, scale, size=(R, X)).astype(np.float32)
    return jnp.asarray(src), jnp.asarray(q)


def test_pallas_sweep_matches_xla_sweep():
    src, q = _case()
    K = 8
    out = np.asarray(sweep_lastaxis(src, q, K))
    ref = np.asarray(_sweep_fori(src[None, None], q[None, None], 1, K))[0, 0]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_pallas_sweep_window_edge_semantics():
    """Displacements at exactly k = ±(K+1) get half-support (floor-only /
    ceil-only) in the canonical sweep; the kernel must match. Regression for
    a compiled-kernel bug caught by the bench selftest in round 2 (the kernel
    gave k=K+1 full lerp support and k=-(K+1) none)."""
    K = 8
    R, X = 16, 96
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.normal(size=(R, X)).astype(np.float32))
    base = np.arange(X, dtype=np.float32)[None]
    # integer-plus-fraction displacements pinned to the window edges
    disp = rng.choice([-(K + 1), -K, K, K + 1], size=(R, X)).astype(np.float32)
    q = jnp.asarray(base + disp + rng.uniform(0.1, 0.9, size=(R, X)).astype(np.float32))
    out = np.asarray(sweep_lastaxis(src, q, K))
    ref = np.asarray(_sweep_fori(src[None, None], q[None, None], 1, K))[0, 0]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_pallas_sweep_zero_fill_out_of_range():
    src, _ = _case(R=8, X=32, seed=1)
    q = jnp.full((8, 32), -100.0)  # all out of range
    out = np.asarray(sweep_lastaxis(src, q, 4))
    np.testing.assert_allclose(out, 0.0)


def test_pallas_sweep_identity_coords():
    src, _ = _case(R=8, X=64, seed=2)
    q = jnp.broadcast_to(jnp.arange(64, dtype=jnp.float32)[None], (8, 64))
    out = np.asarray(sweep_lastaxis(src, q, 4))
    np.testing.assert_allclose(out, np.asarray(src), atol=1e-6)


def test_pallas_sweep_row_padding():
    # R not a multiple of the row tile
    src, q = _case(R=7, X=40, seed=3, scale=2.0)
    out = np.asarray(sweep_lastaxis(src, q, 4))
    ref = np.asarray(_sweep_fori(src[None, None], q[None, None], 1, 4))[0, 0]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_pallas_sweep_diff_output():
    src, q = _case(R=4, X=32, seed=4, scale=2.0)
    _, diff = _sweep_fwd_raw(src, q, 4)
    # diff = ceil_value - floor_value: finite-difference check of d out / d q.
    eps = 1e-3
    out0 = np.asarray(sweep_lastaxis(src, q, 4))
    out1 = np.asarray(sweep_lastaxis(src, q + eps, 4))
    fd = (out1 - out0) / eps
    # away from integer-crossing coords the derivative equals diff
    mask = np.abs(np.asarray(q) - np.round(np.asarray(q))) > 0.01
    np.testing.assert_allclose(
        np.asarray(diff)[mask], fd[mask], rtol=1e-2, atol=1e-2
    )


def test_pallas_sweep_grad_matches_xla_grad():
    src, q = _case(R=6, X=48, seed=5, scale=3.0)
    K = 5

    def loss_pallas(s, qq):
        return jnp.sum(sweep_lastaxis(s, qq, K) ** 2)

    def loss_xla(s, qq):
        return jnp.sum(_sweep_fori(s[None, None], qq[None, None], 1, K)[0, 0] ** 2)

    gp_s, gp_q = jax.grad(loss_pallas, argnums=(0, 1))(src, q)
    gx_s, gx_q = jax.grad(loss_xla, argnums=(0, 1))(src, q)
    np.testing.assert_allclose(np.asarray(gp_s), np.asarray(gx_s), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_q), np.asarray(gx_q), rtol=1e-4, atol=1e-5)
