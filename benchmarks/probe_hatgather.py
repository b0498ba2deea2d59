"""Hardware probes for the fused exact-warp Pallas kernel (r4 VERDICT #5).

Questions (each probed independently, smallest shapes that exercise the
feature — run on the real TPU):

P1. Does a scalar-prefetched, data-dependent BLOCK index map lower and run?
    (CLAUDE.md records PrefetchScalarGridSpec working; this pins the
    index-map-from-scalars form we need.)
P2. Does ``pl.Element`` indexing (element-granular start offsets from the
    index map) lower for the three spatial dims of a 4D [C, Z, Y, X] input?
P3. If P2 works: full mini fused hat-contraction kernel vs the XLA oracle.

Usage: python benchmarks/probe_hatgather.py [p1 p2 p3]
"""
from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def p1_scalar_block_index():
    """Gather rows of a [16, 256] array in a scalar-prefetched order, block
    index map (8, 256) blocks."""
    x = jnp.arange(16 * 256, dtype=jnp.float32).reshape(16, 256)
    order = jnp.asarray([1, 0], dtype=jnp.int32)  # block row order

    def kernel(order_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((8, 256), lambda i, order_ref: (order_ref[i], 0)),
        ],
        out_specs=pl.BlockSpec((8, 256), lambda i, order_ref: (i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 256), jnp.float32),
        grid_spec=grid_spec,
    )(order, x)
    want = jnp.concatenate([x[8:], x[:8]]) + 1.0
    err = float(jnp.max(jnp.abs(out - want)))
    print(f"P1 scalar-prefetch block index: err={err:.1e} "
          f"{'OK' if err == 0 else 'FAIL'}")


def p2_element_zy(Bz=14, By=16):
    """Element-granular starts on (Z, Y) of a [Z, Y, X] input with the full X
    in lanes (the fused-kernel fetch shape): block (Bz, By, X), By%8==0,
    arbitrary (incl. non-8-multiple) z/y starts from scalar prefetch."""
    Z, Y, X = 64, 64, 256
    T = 6
    key = jax.random.key(0)
    vol = jax.random.uniform(key, (Z, Y, X), jnp.float32)
    orgs = jnp.asarray(
        [[3, 5], [11, 0], [0, 23], [9, 9], [Z - Bz, Y - By], [17, 31]],
        jnp.int32,
    )

    def kernel(orgs_ref, v_ref, o_ref):
        o_ref[:] = v_ref[:][None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(Bz), pl.Element(By), pl.Element(X)),
                lambda i, orgs_ref: (orgs_ref[i, 0], orgs_ref[i, 1], 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (pl.Blocked(1), pl.Blocked(Bz), pl.Blocked(By), pl.Blocked(X)),
            lambda i, orgs_ref: (i, 0, 0, 0),
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, Bz, By, X), jnp.float32),
        grid_spec=grid_spec,
    )(orgs, vol)
    want = jnp.stack(
        [
            jax.lax.dynamic_slice(
                vol, tuple(np.asarray(orgs[i])) + (0,), (Bz, By, X)
            )
            for i in range(T)
        ]
    )
    err = float(jnp.max(jnp.abs(out - want)))
    print(f"P2 element z/y starts (Bz={Bz}, By={By}): err={err:.1e} "
          f"{'OK' if err == 0 else 'FAIL'}")


def p3_fetch_throughput():
    """Bench-scale fetch: 13824 blocks of [14, 16, 256] f32 from a 240^3
    volume through the Pallas pipeline (trivial kernel). Measures whether the
    per-grid-step DMA pipeline beats XLA's latency-bound slice gather.
    Host-readback timing, loop-amortized inside one jit via lax.fori? — a
    pallas_call can't loop internally over the whole grid, so amortize by
    timing the jitted call with a host readback and subtracting the ~0.8 s
    readback via min-of-N (same protocol as other probes)."""
    import time

    Z = Y = 240
    X = 256
    Bz, By = 14, 16
    TILE = 10
    G = Z // TILE
    T = G * G * G
    vol = jax.random.uniform(jax.random.key(0), (Z, Y, X), jnp.float32)
    rng = np.random.default_rng(0)
    orgs_np = np.stack(
        [
            rng.integers(0, Z - Bz, T),
            rng.integers(0, Y - By, T),
        ],
        axis=-1,
    ).astype(np.int32)
    orgs = jnp.asarray(orgs_np)

    def kernel(orgs_ref, v_ref, o_ref):
        # touch the block, tiny output (sum per tile) to avoid a 3.2 GB write
        o_ref[0, :, :] = jnp.broadcast_to(
            jnp.sum(v_ref[:], axis=(0, 1))[None], (8, v_ref.shape[-1])
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(Bz), pl.Element(By), pl.Element(X)),
                lambda i, orgs_ref: (orgs_ref[i, 0], orgs_ref[i, 1], 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (pl.Blocked(1), pl.Blocked(8), pl.Blocked(X)),
            lambda i, orgs_ref: (i, 0, 0),
        ),
    )
    fetch = jax.jit(
        lambda o, v: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, 8, X), jnp.float32),
            grid_spec=grid_spec,
        )(o, v)
    )
    out = fetch(orgs, vol)
    _ = float(out.mean())  # compile + completion
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(fetch(orgs, vol).mean())
        ts.append(time.perf_counter() - t0)
    gb = T * Bz * By * X * 4 / 1e9
    best = min(ts)
    print(f"P3 fetch {T} x [{Bz},{By},{X}] blocks ({gb:.2f} GB): "
          f"{best*1e3:.1f} ms incl ~0.8s readback floor; times={ts}")
    # correctness spot-check on 3 tiles
    for i in (0, 7, T - 1):
        want = jax.lax.dynamic_slice(
            vol, tuple(orgs_np[i]) + (0,), (Bz, By, X)
        ).sum(axis=(0, 1))
        err = float(jnp.max(jnp.abs(out[i, 0] - want)))
        assert err < 1e-2, (i, err)
    print("P3 values OK")


def main():
    which = sys.argv[1:] or ["p1", "p2", "p3"]
    print(jax.devices())
    if "p1" in which:
        try:
            p1_scalar_block_index()
        except Exception as e:
            print(f"P1 FAIL: {type(e).__name__}: {str(e)[:300]}")
    if "p2" in which:
        try:
            p2_element_zy()
        except Exception as e:
            print(f"P2 FAIL: {type(e).__name__}: {str(e)[:300]}")
    if "p3" in which:
        try:
            p3_fetch_throughput()
        except Exception as e:
            print(f"P3 FAIL: {type(e).__name__}: {str(e)[:300]}")
    if "p4" in which:
        try:
            p4_bounded_slice()
        except Exception as e:
            print(f"P4 FAIL: {type(e).__name__}: {str(e)[:300]}")
    if "p5" in which:
        try:
            p5_inkernel_slice_restack()
        except Exception as e:
            print(f"P5 FAIL: {type(e).__name__}: {str(e)[:300]}")




def p4_bounded_slice():
    """BoundedSlice starts on (Z, Y) of a [Z, Y, X] input (x full): the slab
    fetch the fused kernel wants, with exact (unquantized) dynamic starts."""
    Z, Y, X = 64, 64, 256
    SZ = SY = 16
    T = 5
    vol = jax.random.uniform(jax.random.key(0), (Z, Y, X), jnp.float32)
    orgs = jnp.asarray(
        [[3, 5], [11, 0], [0, 23], [9, 9], [Z - SZ, Y - SY]], jnp.int32
    )

    def kernel(orgs_ref, v_ref, o_ref):
        o_ref[:] = v_ref[:][None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (pl.BoundedSlice(SZ), pl.BoundedSlice(SY), X),
                lambda i, orgs_ref: (
                    pl.ds(orgs_ref[i, 0], SZ),
                    pl.ds(orgs_ref[i, 1], SY),
                    0,
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (pl.Blocked(1), pl.Blocked(SZ), pl.Blocked(SY), pl.Blocked(X)),
            lambda i, orgs_ref: (i, 0, 0, 0),
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, SZ, SY, X), jnp.float32),
        grid_spec=grid_spec,
    )(orgs, vol)
    want = jnp.stack(
        [
            jax.lax.dynamic_slice(
                vol, tuple(np.asarray(orgs[i])) + (0,), (SZ, SY, X)
            )
            for i in range(T)
        ]
    )
    err = float(jnp.max(jnp.abs(out - want)))
    print(f"P4 BoundedSlice z/y starts: err={err:.1e} "
          f"{'OK' if err == 0 else 'FAIL'}")


def p5_inkernel_slice_restack():
    """The per-tile compute path: dynamic sublane/3rd-dim slice of a VMEM
    slab, reshape-merge into sublanes, NT one-hot matmul restack."""
    SZ, SY, X = 32, 32, 256
    Bz, By, CW = 14, 16, 16
    slab = jax.random.uniform(jax.random.key(1), (SZ, SY, X), jnp.float32)
    starts = jnp.asarray([[0, 0, 3], [9, 13, 240 - CW], [18, 16, 0]], jnp.int32)
    T = starts.shape[0]

    def kernel(st_ref, slab_ref, o_ref, scratch):
        i = pl.program_id(0)
        dz, dy, ox = st_ref[i, 0], st_ref[i, 1], st_ref[i, 2]
        blk = slab_ref[pl.ds(dz, Bz), pl.ds(dy, By), :]
        scratch[: Bz * By, :] = blk.reshape(Bz * By, X)
        x_iota = jax.lax.broadcasted_iota(jnp.int32, (CW, X), 1)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (CW, X), 0)
        Sx = (x_iota == c_iota + ox).astype(jnp.float32)
        o_ref[0] = jax.lax.dot_general(
            Sx, scratch[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[pl.BlockSpec((SZ, SY, X), lambda i, st: (0, 0, 0))],
        out_specs=pl.BlockSpec(
            (pl.Blocked(1), pl.Blocked(CW), pl.Blocked(256)),
            lambda i, st: (i, 0, 0),
        ),
        scratch_shapes=[pltpu.VMEM((256, X), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, CW, 256), jnp.float32),
        grid_spec=grid_spec,
    )(starts, slab)
    st = np.asarray(starts)
    for i in range(T):
        blk = np.asarray(slab)[st[i, 0]:st[i, 0]+Bz, st[i, 1]:st[i, 1]+By, :]
        want = blk.reshape(Bz * By, X)[:, st[i, 2]:st[i, 2]+CW].T  # [CW, 224]
        got = np.asarray(out[i])[:, : Bz * By]
        err = np.max(np.abs(got - want))
        assert err < 1e-6, (i, err)
    print("P5 in-kernel slice+restack: OK")


if __name__ == "__main__":
    main()
