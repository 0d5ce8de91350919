"""Pallas backward kernel for the s2d-exit max pool.

`ops.s2d_ops.max_pool_2x_s2d_exit` pools the 8 parity lane groups of an
s2d tensor (the 2x max pool on the original grid). Its backward — an
even gradient split among equal maxima, matching jnp.max — is a pure
elementwise pass, but XLA lowers the 8-way compare/select/divide/concat
chain as several full-tensor fusions measured at ~18 ms of the 186 ms
train step (profile_train_step: select_convert_fusion.2/.3,
slice_compare_fusion, concatenate.753). This kernel does it in one
read of xs and one write of dx per depth row.

Semantics (identical to the XLA form in s2d_ops._pool_bwd):
dx[..., g*c + j] = (xs[..., g*c + j] == m[..., j]) * g_cot[..., j] /
count_of_equal_maxima[..., j].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_tree(v: jnp.ndarray, c: int, op) -> jnp.ndarray:
    """Reduce the 8 parity lane groups (width c) of v's last axis with a
    3-step cyclic lane-rotation tree: every lane ends up holding the
    reduction over all 8 groups, at full VPU width (the per-group lane
    slices run at c/128 vector efficiency and dominated the old form)."""
    for k in (c, 2 * c, 4 * c):
        v = op(v, jnp.roll(v, k, axis=-1))
    return v


def _make_pool_bwd_kernel(c: int):
    def kernel(xs_ref, g_ref, dx_ref):
        # compare in f32: Mosaic rejects bf16 cmpf on v5e; bf16 values
        # are exactly representable in f32 so the semantics are identical
        xs = xs_ref[0, 0].astype(jnp.float32)   # (h2, w2, 8c)
        gc = g_ref[0, 0].astype(jnp.float32)    # (h2, w2, c)
        # the pooled max, recomputed in VMEM (cheaper than an extra DMA)
        # and replicated to every lane by the rotation tree
        m8 = _roll_tree(xs, c, jnp.maximum)
        eq = xs == m8                           # full-lane compare
        cnt = _roll_tree(eq.astype(jnp.float32), c, jnp.add)
        g8 = jnp.concatenate([gc] * 8, axis=-1)
        dx = jnp.where(eq, g8 / cnt, jnp.zeros_like(cnt))
        dx_ref[0, 0] = dx.astype(dx_ref.dtype)

    return kernel


def pool_bwd_pallas(xs: jnp.ndarray, m: jnp.ndarray, g: jnp.ndarray,
                    c: int, *, interpret: bool = False,
                    interior: bool = False) -> jnp.ndarray:
    """xs: (B, d2, h2, w2, 8c) pool input; m: (B, d2, h2, w2, c) pooled
    max; g: cotangent of m. Returns dx with jnp.max-identical tie
    semantics (even split among equal maxima).

    interior: xs carries the padded-chain (+1, +1) zero depth pad; the
    kernel reads its interior rows and dx is returned in the SAME padded
    shape with its (never-written) edge rows zeroed by the caller."""
    b, d2, h2, w2, c8 = xs.shape
    if interior:
        d2 -= 2

    def xrow(bb, z):
        return (bb, z + 1, 0, 0, 0) if interior else (bb, z, 0, 0, 0)

    def grow(bb, z):
        return (bb, z, 0, 0, 0)

    del m  # recomputed in VMEM by the kernel (cheaper than the DMA)
    return pl.pallas_call(
        _make_pool_bwd_kernel(c),
        grid=(b, d2),
        in_specs=[
            pl.BlockSpec((1, 1, h2, w2, c8), xrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2, w2, c), grow, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h2, w2, c8), xrow,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xs.shape, xs.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xs, g)


def pool_bwd_supported(h2: int, w2: int, c: int) -> bool:
    c8 = 8 * c
    slab = h2 * max(w2, 8) * max(c8, 128) * 2
    small = h2 * max(w2, 8) * max(c, 128) * 4
    return 2 * (2 * slab) + 2 * 2 * small + 4 * slab < 80 * 1024 * 1024


def _make_pool_fwd_kernel(c: int, kd: int):
    def kernel(xs_ref, m_ref):
        # max in f32 (Mosaic rejects bf16 cmpf on v5e); exact for bf16
        for i in range(kd):
            m8 = _roll_tree(xs_ref[0, i].astype(jnp.float32), c,
                            jnp.maximum)
            m_ref[0, i] = m8[..., :c].astype(m_ref.dtype)

    return kernel


def _pool_kd(d2: int, h2: int, w2: int, c: int) -> int:
    """Rows per grid step: larger DMAs lift the kernel off its ~47 GB/s
    single-row floor (the per-row slab is ~1 MB at the level-1 shape);
    bounded by VMEM (double-buffered in+out) and divisibility."""
    c8 = 8 * c
    slab = h2 * max(w2, 8) * max(c8, 128) * 2
    small = h2 * max(w2, 8) * max(c, 128) * 2
    for kd in (4, 2):
        if d2 % kd == 0 and 2 * kd * (slab + small) + 2 * slab < 96 * 1024 * 1024:
            return kd
    return 1


def pool_fwd_pallas(xs: jnp.ndarray, c: int, *,
                    interpret: bool = False,
                    interior: bool = False) -> jnp.ndarray:
    """Forward of the s2d-exit max pool: max over the 8 parity lane groups
    via the full-lane rotation tree. XLA's slice-maximum fusion lowers the
    c-wide lane slices at c/128 vector efficiency (~3.3 ms at the level-1
    train shape; this kernel is one read + one write per row).
    (B, d2, h2, w2, 8c) -> (B, d2, h2, w2, c), bit-identical to
    s2d_ops._pool_max.

    interior: the input carries the padded-chain (+1, +1) zero depth pad
    (B, d2+2, ...); the kernel reads rows 1..d2 via its index map — the
    pad costs nothing here."""
    b, d2, h2, w2, c8 = xs.shape
    # interior: pool the PAD rows too (zero lanes pool to exact zeros) —
    # block-granular index maps cannot express a +1 row offset at kd > 1
    # and the two extra rows are cheaper than per-row DMAs; the interior
    # slice below fuses into consumers
    kd = _pool_kd(d2, h2, w2, c)

    def row(bb, z):
        return (bb, z, 0, 0, 0)

    out = pl.pallas_call(
        _make_pool_fwd_kernel(c, kd),
        grid=(b, d2 // kd),
        in_specs=[
            pl.BlockSpec((1, kd, h2, w2, c8), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kd, h2, w2, c), row,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d2, h2, w2, c), xs.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xs)
    return out[:, 1:-1] if interior else out


def pool_fwd_supported(h2: int, w2: int, c: int) -> bool:
    c8 = 8 * c
    slab = h2 * max(w2, 8) * max(c8, 128) * 2
    small = h2 * max(w2, 8) * max(c, 128) * 2
    return 2 * (slab + small) + 2 * slab < 80 * 1024 * 1024


def _make_finale_pool_kernel(c: int, neg_slope: float, kd: int):
    def kernel(y2_ref, r_ref, s2_ref, sh2_ref, sr_ref, shr_ref,
               out_ref, m_ref):
        for i in range(kd):
            y2 = y2_ref[0, i].astype(jnp.float32)     # (h2, w2, 8c)
            r = r_ref[0, i].astype(jnp.float32)
            t = (y2 * s2_ref[0] + sh2_ref[0]) + (r * sr_ref[0] + shr_ref[0])
            f = jnp.where(t >= 0, t, neg_slope * t)
            fb = f.astype(out_ref.dtype)
            out_ref[0, i] = fb
            # pool the bf16-ROUNDED finale (bit-parity with the separate
            # pool consuming the materialized tensor); compare in f32
            m8 = _roll_tree(fb.astype(jnp.float32), c, jnp.maximum)
            m_ref[0, i] = m8[..., :c].astype(m_ref.dtype)

    return kernel


def fused_finale_pool(y2: jnp.ndarray, r: jnp.ndarray,
                      scale2: jnp.ndarray, shift2: jnp.ndarray,
                      scale_r: jnp.ndarray, shift_r: jnp.ndarray,
                      c: int, neg_slope: float, *,
                      out_dtype=jnp.bfloat16,
                      interpret: bool = False):
    """Eval resblock finale + padded-chain emission + 2x max pool in ONE
    pass: out = leaky_relu(y2*scale2+shift2 + r*scale_r+shift_r), written
    with its (+1, +1) zero depth pad, and the parity-lane max pool of the
    same rows — the separate pool pass's full re-read of the finale
    tensor (~0.85 ms/volume at level 1) never happens.

    y2: (B, d2, h2, w2, 8c); r: (B, >=d2, h2, w2, 8c) (the conv kernel's
    res output — its extra halo row is ignored via the index map);
    affines: (B, 8c) f32. Returns (out_padded (B, d2+2, ...), pooled
    (B, d2, h2, w2, c))."""
    b, d2, h2, w2, c8 = y2.shape
    # rows stay un-batched: the padded output's +1-row offset is only
    # expressible in block units at kd == 1 (same constraint as the
    # interior pool reads)
    kd = 1

    def row(bb, z):
        return (bb, z, 0, 0, 0)

    def orow(bb, z):
        return (bb, z + 1, 0, 0, 0)

    aff = pl.BlockSpec((1, 1, c8), lambda bb, z: (bb, 0, 0),
                       memory_space=pltpu.VMEM)
    outp, pooled = pl.pallas_call(
        _make_finale_pool_kernel(c, neg_slope, kd),
        grid=(b, d2 // kd),
        in_specs=[
            pl.BlockSpec((1, kd, h2, w2, c8), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kd, h2, w2, c8), row, memory_space=pltpu.VMEM),
            aff, aff, aff, aff,
        ],
        out_specs=[
            pl.BlockSpec((1, kd, h2, w2, c8), orow, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kd, h2, w2, c), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d2 + 2, h2, w2, c8), out_dtype),
            jax.ShapeDtypeStruct((b, d2, h2, w2, c), out_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(y2, r, scale2.reshape(b, 1, c8).astype(jnp.float32),
      shift2.reshape(b, 1, c8).astype(jnp.float32),
      scale_r.reshape(b, 1, c8).astype(jnp.float32),
      shift_r.reshape(b, 1, c8).astype(jnp.float32))
    # the kernel never writes the pad rows: zero them in place
    zrow = jnp.zeros((b, 1, h2, w2, c8), out_dtype)
    outp = jax.lax.dynamic_update_slice(outp, zrow, (0, 0, 0, 0, 0))
    outp = jax.lax.dynamic_update_slice(outp, zrow, (0, d2 + 1, 0, 0, 0))
    return outp, pooled


def finale_pool_supported(h2: int, w2: int, c: int) -> bool:
    c8 = 8 * c
    slab = h2 * max(w2, 8) * max(c8, 128) * 2
    acc = h2 * max(w2, 8) * max(c8, 128) * 4
    small = h2 * max(w2, 8) * max(c, 128) * 2
    return 2 * (2 * slab + slab + small) + 3 * acc < 90 * 1024 * 1024
