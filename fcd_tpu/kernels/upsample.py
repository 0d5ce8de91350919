"""Pallas s2d-to-s2d transposed-conv upsample (k2 s2).

The s2d decoder chaining upsample (`ops.s2d_ops.upsample2x_s2d_to_s2d`)
is one block-diagonal matmul plus a depth_to_space of LANE-DENSE
channels — mathematically clean, but XLA lowers the d2s regroup as
reshape+transpose copies measured at ~2.8 ms (dec1) + ~1.6 ms (dec2)
per volume (profile_patch sw_top: copy.562/copy.563 etc.). This kernel
does the whole op in one pass per coarse depth row: eight GEMMs (one
per output parity) against weight slices, assembled with pure stacks
into a (h4, 2, w4, 2, co8) block — the parity axes land NEXT TO their
spatial axes, so the caller's final reshape to (2h4, 2w4, co8) is an
adjacent-dims bitcast and no Mosaic shape cast (lane split) is ever
needed in-kernel (Mosaic rejects (w4, 2*co8) -> (2w4, co8) casts).

Math (reference transposed conv, conv_blocks.py:548-557 upsample path):
out[2z+pz, 2y+py, 2x+px, q*co + c] = sum_i ys[z, y, x, g*cin + i] *
wm[i, q*co + c] with g = 4pz + 2py + px and wm the flipped kernel in
(cin, 8co) form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_up_kernel(h4: int, w4: int, co8: int, has_bias: bool):
    def kernel(*refs):
        ys_ref, wq_ref = refs[0], refs[1]
        idx = 2
        if has_bias:
            bias_ref = refs[idx]
            idx += 1
        out_ref = refs[idx]

        slab = ys_ref[0, 0]                      # (h4, w4, 8cin)
        for pz in range(2):
            quads = []
            for py in range(2):
                pair = []
                for px in range(2):
                    g = 4 * pz + 2 * py + px
                    t = jax.lax.dot_general(
                        slab, wq_ref[g], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                             # (h4, w4, co8)
                    if has_bias:
                        t = t + bias_ref[0]
                    pair.append(t)
                # px lands right before the lane axis: (h4, w4, 2, co8)
                quads.append(jnp.stack(pair, axis=2))
            # py lands right after h4: (h4, 2, w4, 2, co8)
            val = jnp.stack(quads, axis=1)
            out_ref[0, 0, pz] = val.astype(out_ref.dtype)

    return kernel


def upsample_s2d_pallas(ys: jnp.ndarray, wm: jnp.ndarray, cin: int,
                        cout: int, bias=None, *, out_dtype=jnp.bfloat16,
                        interpret: bool = False) -> jnp.ndarray:
    """ys: (B, d4, h4, w4, 8*cin) coarse s2d; wm: (cin, 8*cout) flipped
    kernel matrix (ops.s2d_ops._upsample_wm). Returns the fine-grid s2d
    tensor (B, 2*d4, 2*h4, 2*w4, 8*cout)."""
    b, d4, h4, w4, c8 = ys.shape
    co8 = 8 * cout
    # per-parity GEMM weights: wq[g, g*cin + i, qc] = wm[i, qc]
    wq = jnp.zeros((8, c8, co8), wm.dtype)
    for g in range(8):
        wq = wq.at[g, g * cin:(g + 1) * cin, :].set(wm)
    wq = wq.astype(jnp.bfloat16)

    in_specs = [
        pl.BlockSpec((1, 1, h4, w4, c8), lambda bb, z: (bb, z, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, c8, co8), lambda bb, z: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [ys.astype(jnp.bfloat16), wq]
    has_bias = bias is not None
    if has_bias:
        # fine-grid lanes are (q, c): tile the bias over the 8 q-groups
        in_specs.append(pl.BlockSpec((1, co8), lambda bb, z: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.tile(bias.astype(jnp.float32), 8)[None])

    # out array (b, d4, 2pz, h4, 2py, w4, 2px, co8): every parity axis
    # sits next to its spatial axis, so the final reshape to
    # (b, 2d4, 2h4, 2w4, co8) merges adjacent dims only (a bitcast)
    out = pl.pallas_call(
        _make_up_kernel(h4, w4, co8, has_bias),
        grid=(b, d4),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 2, h4, 2, w4, 2, co8),
                               lambda bb, z: (bb, z, 0, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d4, 2, h4, 2, w4, 2, co8),
                                       out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return out.reshape(b, 2 * d4, 2 * h4, 2 * w4, co8)


def _make_up_pad_kernel(h4: int, w4: int, ci: int, co8: int, d4: int,
                        has_bias: bool, lane_half: bool):
    """Program z writes fine buffer rows (2z, 2z+1) = fine depth rows
    (2z-1, 2z) of the PADDED fine tensor: fine row 2z-1 is parity pz=1 of
    coarse s2d row z-1 (slab_prev), fine row 2z is pz=0 of coarse row z
    (slab_cur). The first/last buffer rows are the zero depth pad.

    Per row: one GEMM per (py, px) quad against the block-structured
    weight (zero rows outside the g-block), then the parity interleave
    (h4, 2, w4, 2, co8) -> (h2, w2, co8) as an in-VMEM reshape (Mosaic
    compiles this; verified exact on v5e).

    lane_half: each program only needs ONE pz lane-half of each slab
    (pz=1 of prev, pz=0 of cur) — when 4*ci is lane-tileable the in_specs
    fetch just that half (halving input DMA and GEMM contraction); the
    same wq serves both halves (their local g-structure is identical)."""

    def kernel(*refs):
        prev_ref, cur_ref, wq_ref = refs[0], refs[1], refs[2]
        idx = 3
        bias_ref = None
        if has_bias:
            bias_ref = refs[idx]
            idx += 1
        out_ref = refs[idx]
        z = pl.program_id(1)

        def fine_row(slab, pz):
            quads = []
            for py in range(2):
                pair = []
                for px in range(2):
                    j = 2 * py + px
                    g = j if lane_half else 4 * pz + j
                    t = jax.lax.dot_general(
                        slab, wq_ref[g], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                   # (h4, w4, co8)
                    if has_bias:
                        t = t + bias_ref[0]
                    pair.append(t)
                quads.append(jnp.stack(pair, axis=2))    # (h4, w4, 2, co8)
            v = jnp.stack(quads, axis=1)                 # (h4, 2, w4, 2, co8)
            return v.reshape(2 * h4, 2 * w4, co8).astype(out_ref.dtype)

        out_ref[0, 0] = fine_row(prev_ref[0, 0], 1)
        out_ref[0, 1] = fine_row(cur_ref[0, 0], 0)

        @pl.when(z == 0)
        def _():
            out_ref[0, 0] = jnp.zeros_like(out_ref[0, 0])

        @pl.when(z == d4)
        def _():
            out_ref[0, 1] = jnp.zeros_like(out_ref[0, 1])

    return kernel


def upsample_s2d_pad(ysp: jnp.ndarray, wm: jnp.ndarray, cin: int,
                     cout: int, bias=None, *, out_dtype=jnp.bfloat16,
                     interpret: bool = False) -> jnp.ndarray:
    """Padded-chain s2d upsample: PADDED coarse s2d (B, d4+2, h4, w4, 8ci)
    with zero depth edges -> PADDED fine s2d (B, 2*d4+2, 2*h4, 2*w4, 8co)
    with zero depth edges, one Pallas pass. wm: (cin, 8*cout) flipped
    kernel matrix (ops.s2d_ops._upsample_wm). The consumer (a2o with the
    vmem-halo form) reads the output directly — neither the fine-grid
    depth pad nor the XLA d2s regroup copies ever run."""
    b, d4p, h4, w4, c8 = ysp.shape
    d4 = d4p - 2
    co8 = 8 * cout
    half = c8 // 2
    # each program needs only the pz=1 lane-half of slab_prev and the
    # pz=0 half of slab_cur: fetch just that half when it is lane-tileable
    lane_half = half % 128 == 0
    n_wq = 4 if lane_half else 8
    wq = jnp.zeros((n_wq, half if lane_half else c8, co8), wm.dtype)
    for g in range(n_wq):
        wq = wq.at[g, g * cin:(g + 1) * cin, :].set(wm)
    wq = wq.astype(jnp.bfloat16)

    if lane_half:
        in_specs = [
            pl.BlockSpec((1, 1, h4, w4, half),
                         lambda bb, z: (bb, z, 0, 0, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h4, w4, half),
                         lambda bb, z: (bb, z + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((1, 1, h4, w4, c8),
                         lambda bb, z: (bb, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h4, w4, c8),
                         lambda bb, z: (bb, z + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs.append(pl.BlockSpec(wq.shape, lambda bb, z: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    inputs = [ysp.astype(jnp.bfloat16), ysp.astype(jnp.bfloat16), wq]
    has_bias = bias is not None
    if has_bias:
        in_specs.append(pl.BlockSpec((1, co8), lambda bb, z: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.tile(bias.astype(jnp.float32), 8)[None])

    out = pl.pallas_call(
        _make_up_pad_kernel(h4, w4, cin, co8, d4, has_bias, lane_half),
        grid=(b, d4 + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2, 2 * h4, 2 * w4, co8),
                               lambda bb, z: (bb, z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * d4 + 2, 2 * h4, 2 * w4, co8),
                                       out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return out


def upsample_pad_supported(h4: int, w4: int, cin: int, cout: int) -> bool:
    """VMEM bound for the per-program working set: two coarse slabs, the
    f32 GEMM quads, and the 2-row fine out block, double-buffered."""
    c8, co8 = 8 * cin, 8 * cout
    slab = h4 * max(w4, 8) * max(c8, 128) * 2
    quads = 8 * h4 * max(w4, 8) * max(co8, 128) * 4
    outb = 2 * 4 * h4 * max(w4, 8) * max(co8, 128) * 2
    wqb = 8 * c8 * max(co8, 128) * 2
    return 2 * (2 * slab) + quads + 2 * outb + wqb < 80 * 1024 * 1024


def upsample_pallas_supported(h4: int, w4: int, cin: int, cout: int) -> bool:
    """VMEM bound for the per-row working set (bf16 slab + f32 GEMM
    temps + the fine out block, double-buffered)."""
    c8, co8 = 8 * cin, 8 * cout
    slab = h4 * max(w4, 8) * max(c8, 128) * 2
    gtmp = 8 * h4 * max(w4, 8) * max(co8, 128) * 4
    outb = 8 * h4 * max(w4, 8) * max(co8, 128) * 2
    wqb = 8 * c8 * co8 * 2
    return 2 * slab + gtmp + 2 * outb + wqb < 80 * 1024 * 1024
