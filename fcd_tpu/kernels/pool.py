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
