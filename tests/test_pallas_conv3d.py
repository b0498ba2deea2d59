"""Fused Pallas 3^3 conv vs torch/XLA oracles (interpret mode on CPU).

The compiled Mosaic kernel is additionally value-gated on hardware by
bench.py's conv self-test (like the sweep kernel's).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from torchregister_tpu.ops.pallas.conv3d import (
    conv3x3x3,
    fits_pallas_conv,
)


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        (np.random.default_rng(seed).normal(size=shape) * scale).astype(np.float32)
    )


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x[None], jnp.asarray(w).transpose(4, 3, 0, 1, 2),
        (1, 1, 1), "VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        precision=jax.lax.Precision.HIGHEST,
    )[0]


@pytest.mark.parametrize("shape,ci,co", [
    ((8, 12, 13), 1, 8),       # first layer: 1 -> C
    ((7, 10, 18), 8, 8),       # odd sizes, W far from 128
    ((6, 9, 130), 4, 6),       # W just past the 128 boundary
    ((6, 140, 140), 8, 8),     # large H: routes to the H-chunked variant C
])
def test_conv3x3x3_matches_xla(shape, ci, co):
    x = _rand((ci,) + shape, 1)
    w = _rand((3, 3, 3, ci, co), 2, 0.2)
    ours = conv3x3x3(x, w)
    ref = _xla_conv(x, w)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3x3_matches_torch():
    import torch
    import torch.nn.functional as F

    ci, co = 3, 5
    x = _rand((ci, 9, 11, 14), 3)
    w = _rand((3, 3, 3, ci, co), 4, 0.2)
    ours = np.asarray(conv3x3x3(x, w))
    tw = torch.from_numpy(np.asarray(w)).permute(4, 3, 0, 1, 2)
    ref = F.conv3d(torch.from_numpy(np.asarray(x))[None], tw)[0].numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_conv3x3x3_grad_matches_xla():
    """Custom VJP (padded-cotangent kernel for dx, big-K einsums for dw) vs
    XLA conv autodiff."""
    ci, co = 4, 6
    x = _rand((ci, 8, 10, 12), 5)
    w = _rand((3, 3, 3, ci, co), 6, 0.2)
    t = _rand((co, 6, 8, 10), 7)

    def loss_ours(x_, w_):
        return jnp.sum((conv3x3x3(x_, w_) - t) ** 2)

    def loss_ref(x_, w_):
        return jnp.sum((_xla_conv(x_, w_) - t) ** 2)

    gx1, gw1 = jax.grad(loss_ours, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3x3_bf16():
    ci, co = 8, 8
    x = _rand((ci, 8, 10, 12), 8).astype(jnp.bfloat16)
    w = _rand((3, 3, 3, ci, co), 9, 0.2).astype(jnp.bfloat16)
    ours = conv3x3x3(x, w)
    assert ours.dtype == jnp.bfloat16
    ref = _xla_conv(x.astype(jnp.float32), w.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref), rtol=3e-2, atol=3e-2
    )


def test_conv3x3x3_vmap_batches():
    """Batched cascades vmap the engines; the kernel must batch."""
    ci, co, B = 2, 3, 2
    x = _rand((B, ci, 7, 9, 11), 10)
    w = _rand((3, 3, 3, ci, co), 11, 0.2)
    ours = jax.vmap(lambda a: conv3x3x3(a, w))(x)
    ref = jnp.stack([_xla_conv(x[b], w) for b in range(B)])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fits_pallas_conv_budget():
    assert fits_pallas_conv(8, 8, (118, 118, 118), 4)
    assert not fits_pallas_conv(64, 64, (236, 236, 236), 4)
    assert not fits_pallas_conv(8, 8, (2, 10, 10), 4)  # too small for valid
    assert not fits_pallas_conv(8, 8, (10, 10), 4)  # 2D


def test_vmem_request_calibration():
    """The scoped-VMEM request covers the worst measured Mosaic stack ratio:
    small estimates get the 48 MB floor (the 128^3 engine's dec2 shape
    needed 38.83 MB against a ~10.5 MB naive estimate — a compile OOM at the
    old 3.5x/32 MB calibration), large kernels are admitted at a smaller
    multiplier than they request so the 240^3 variant-A shape still runs
    under the 100 MB ceiling."""
    from torchregister_tpu.ops.pallas.conv3d import (
        _VMEM_CEIL,
        _est_a,
        _pick_variant,
        _vmem_request,
    )

    # dec2 at the 128^3 engine: Ci=32 -> Co=16, H=58, Wp=130
    est = _est_a(32, 16, 58, 130, 4)
    assert _vmem_request(est) >= int(38.83 * 2**20)
    assert _pick_variant(32, 16, 58, 128, 4) == "a"
    # 240^3 8->8: request saturates near the ceiling but stays admitted
    est_big = _est_a(8, 8, 240, 240, 4)
    assert _vmem_request(est_big) <= _VMEM_CEIL
    assert _pick_variant(8, 8, 240, 240, 4) == "a"


def test_tapconv_pallas_path_matches_tap_path():
    """TapConv with the Pallas kernel produces the same outputs (and grads)
    as the tap decomposition — parameters are interchangeable."""
    from torchregister_tpu.models.attention_unet import TapConv

    x = _rand((1, 4, 9, 10, 12), 20)
    mod_tap = TapConv(features=6, ndim=3, use_pallas=False)
    mod_pal = TapConv(features=6, ndim=3, use_pallas=True)
    params = mod_tap.init(jax.random.key(0), x)
    out_tap = mod_tap.apply(params, x)
    out_pal = mod_pal.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_tap),
                               rtol=1e-5, atol=1e-5)

    def loss(mod, p):
        return jnp.sum(mod.apply(p, x) ** 2)

    g_tap = jax.grad(lambda p: loss(mod_tap, p))(params)
    g_pal = jax.grad(lambda p: loss(mod_pal, p))(params)
    for a, b in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_tap)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_variant_routing():
    """Small shapes use the all-Element variant A; large-H shapes where A's
    working set would blow the calibrated VMEM budget route to the H-chunked
    variant C; oversize channel counts fit neither."""
    from torchregister_tpu.ops.pallas.conv3d import _pick_variant

    assert _pick_variant(8, 8, 118, 118, 4) == "a"
    # A's raised-limit budget now spans benchmark sizes (240^3 measured
    # 21.9 ms vs C's 25.6); C takes over where A's request tops the ceiling.
    assert _pick_variant(8, 8, 240, 240, 4) == "a"
    assert _pick_variant(8, 8, 500, 500, 4) == "c"
    assert _pick_variant(64, 64, 236, 236, 4) is None


def test_variant_c_grad_matches_xla():
    """The VJP through the H-chunked variant (dx kernel also chunked)."""
    ci, co = 8, 8
    x = _rand((ci, 5, 140, 140), 12)
    w = _rand((3, 3, 3, ci, co), 13, 0.2)
    t = _rand((co, 3, 138, 138), 14)

    def loss_ours(x_, w_):
        return jnp.sum((conv3x3x3(x_, w_) - t) ** 2)

    def loss_ref(x_, w_):
        return jnp.sum((_xla_conv(x_, w_) - t) ** 2)

    gx1, gw1 = jax.grad(loss_ours, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-3, atol=1e-3)
