"""Differentiable fused resblock finale for the TRAIN path.

The composed train-path finale — instance-norm affine on conv2's output,
residual-norm affine, add, leaky-relu, optional (+1, +1) depth-pad
emission and optional 2x max pool — lowers in XLA as ~5 full-tensor
passes forward and ~5 backward at the level-1/2 shapes (profile:
fusion.201/.219/.215/.208, compare_select_fusion.5, pad_add_fusion,
pad.0/.37 — ~12 ms of the 139 ms step at batch 4x128^3). These kernels
do the forward in ONE Pallas pass (emitting the padded tensor and the
pooled tensor directly) and the backward in ONE pass (emitting d_ys,
d_rs and the three affine-gradient row-sum accumulators).

Math (per row, f32 in VMEM; affines are (B, 8c) lane vectors):
    t   = ys*scale2 + shift2 + rs*scale_r + shift_r
    out = where(t >= 0, t, slope*t)            -> bf16, padded emission
    m   = parity-lane max pool of bf16(out)    (roll-tree, pool.py)
Backward (g = cotangent of out; gq = cotangent of m):
    g  += where(bf16(out) == m, gq_tiled / ties, 0)   [pool backward]
    dt  = g * where(t >= 0, 1, slope)
    d_ys = dt*scale2;  d_rs = dt*scale_r
    d_scale2 = sum(dt*ys); d_shift = sum(dt); d_scale_r = sum(dt*rs)
(the shift cotangents of both affines are the same sum(dt)).

Parity target: the reference's UnetResBlock epilogue
(conv_blocks.py:362-452 norm2 + residual + act) under autograd.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fcd_tpu.kernels.pool import _roll_tree


def _make_finale_fwd_kernel(c: int, slope: float, emit_pool: bool, kd: int):
    def kernel(ys_ref, rs_ref, s2_ref, sh2_ref, sr_ref, shr_ref,
               out_ref, *rest):
        for i in range(kd):
            ys = ys_ref[0, i].astype(jnp.float32)   # (h2, w2, 8c)
            rs = rs_ref[0, i].astype(jnp.float32)
            t = (ys * s2_ref[0] + sh2_ref[0]) + (rs * sr_ref[0]
                                                 + shr_ref[0])
            f = jnp.where(t >= 0, t, slope * t)
            fb = f.astype(out_ref.dtype)
            out_ref[0, i] = fb
            if emit_pool:
                # pool the bf16-ROUNDED finale (bit-parity with a separate
                # pool consuming the materialized tensor); compare in f32
                m8 = _roll_tree(fb.astype(jnp.float32), c, jnp.maximum)
                rest[0][0, i] = m8[..., :c].astype(rest[0].dtype)

    return kernel


def _finale_kd(d2: int, h2: int, w2: int, c: int, slabs: int) -> int:
    """Rows per grid step for the UNPADDED variants: bigger DMAs lift the
    pass off the per-row (~1 MB) pipeline floor. Padded emission pins
    kd=1 (the +1-row offset is only expressible in block units)."""
    c8 = 8 * c
    slab = h2 * max(w2, 8) * max(c8, 128) * 2
    for kd in (4, 2):
        if d2 % kd == 0 and 2 * kd * slabs * slab + 6 * slab < 96 * 1024 * 1024:
            return kd
    return 1


def finale_fwd_pallas(ys, rs, scale2, shift2, scale_r, shift_r,
                      c: int, slope: float, *, emit_pad: bool,
                      emit_pool: bool, out_dtype=jnp.bfloat16,
                      interpret: bool = False):
    """ys, rs: (B, d2, h2, w2, 8c); affines: (B, 8c) f32.
    Returns out ((B, d2+2, ...) when emit_pad, edge rows exact zeros)
    and, when emit_pool, the pooled (B, d2, h2, w2, c) tensor."""
    b, d2, h2, w2, c8 = ys.shape
    kd = 1 if emit_pad else _finale_kd(d2, h2, w2, c, 3)

    def row(bb, z):
        return (bb, z, 0, 0, 0)

    def orow(bb, z):
        return (bb, z + 1, 0, 0, 0)

    aff = pl.BlockSpec((1, 1, c8), lambda bb, z: (bb, 0, 0),
                       memory_space=pltpu.VMEM)
    slab = pl.BlockSpec((1, kd, h2, w2, c8), row, memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((1, kd, h2, w2, c8), orow if emit_pad else row,
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct(
        (b, d2 + (2 if emit_pad else 0), h2, w2, c8), out_dtype)]
    if emit_pool:
        out_specs.append(pl.BlockSpec((1, kd, h2, w2, c), row,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, d2, h2, w2, c), out_dtype))
    outs = pl.pallas_call(
        _make_finale_fwd_kernel(c, slope, emit_pool, kd),
        grid=(b, d2 // kd),
        in_specs=[slab, slab, aff, aff, aff, aff],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ys, rs,
      scale2.reshape(b, 1, c8).astype(jnp.float32),
      shift2.reshape(b, 1, c8).astype(jnp.float32),
      scale_r.reshape(b, 1, c8).astype(jnp.float32),
      shift_r.reshape(b, 1, c8).astype(jnp.float32))
    outp = outs[0] if emit_pool else outs
    if isinstance(outp, (list, tuple)):
        outp = outp[0]
    if emit_pad:
        # the kernel never writes the pad rows: zero them in place
        zrow = jnp.zeros((b, 1, h2, w2, c8), out_dtype)
        outp = jax.lax.dynamic_update_slice(outp, zrow, (0, 0, 0, 0, 0))
        outp = jax.lax.dynamic_update_slice(outp, zrow, (0, d2 + 1, 0, 0, 0))
    return (outp, outs[1]) if emit_pool else (outp,)


def _make_finale_bwd_kernel(c: int, slope: float, emit_pool: bool,
                            out_dtype, kd: int):
    def kernel(*refs):
        if emit_pool:
            (ys_ref, rs_ref, s2_ref, sh2_ref, sr_ref, shr_ref, gp_ref,
             gq_ref, dt_ref, a1_ref, a2_ref, a3_ref) = refs
        else:
            (ys_ref, rs_ref, s2_ref, sh2_ref, sr_ref, shr_ref, gp_ref,
             dt_ref, a1_ref, a2_ref, a3_ref) = refs
        z = pl.program_id(1)

        @pl.when(z == 0)
        def _():
            a1_ref[...] = jnp.zeros_like(a1_ref)
            a2_ref[...] = jnp.zeros_like(a2_ref)
            a3_ref[...] = jnp.zeros_like(a3_ref)

        for i in range(kd):
            ys = ys_ref[0, i].astype(jnp.float32)
            rs = rs_ref[0, i].astype(jnp.float32)
            s2 = s2_ref[0]
            sr = sr_ref[0]
            # recompute the preactivation EXACTLY as the forward did: its
            # sign is the act mask and its rounding is the pool operand
            t = (ys * s2 + sh2_ref[0]) + (rs * sr + shr_ref[0])
            g = gp_ref[0, i].astype(jnp.float32)
            if emit_pool:
                fb = jnp.where(t >= 0, t, slope * t).astype(
                    out_dtype).astype(jnp.float32)
                m8 = _roll_tree(fb, c, jnp.maximum)
                eq = fb == m8
                cnt = _roll_tree(eq.astype(jnp.float32), c, jnp.add)
                gq = gq_ref[0, i].astype(jnp.float32)
                g8 = jnp.concatenate([gq] * 8, axis=-1)
                g = g + jnp.where(eq, g8 / cnt, jnp.zeros_like(cnt))
            dt = g * jnp.where(t >= 0, 1.0, slope)
            # ONE slab out: consumers apply their per-lane scale (scale2
            # for the conv-2 adjoint, scale_r for the residual adjoint)
            # inside their own input fusions — the two scaled copies
            # never materialize as standalone passes
            dt_ref[0, i] = dt.astype(dt_ref.dtype)
            a1_ref[0] += jnp.sum(dt * ys, axis=(0, 1), keepdims=True)[0]
            a2_ref[0] += jnp.sum(dt, axis=(0, 1), keepdims=True)[0]
            a3_ref[0] += jnp.sum(dt * rs, axis=(0, 1), keepdims=True)[0]

    return kernel


def finale_bwd_pallas(ys, rs, scale2, shift2, scale_r, shift_r, gp, gq,
                      c: int, slope: float, *, emit_pad: bool,
                      interpret: bool = False):
    """One-pass backward. gp: cotangent of the (padded) output — edge
    rows are ignored via the index map (exact: the producer pad's VJP
    discards them). gq: cotangent of the pooled tensor or None.
    Returns (dt f32-accurate in promote(ys, rs) dtype, d_scale2 (B,8c)
    f32 = sum(dt*ys), d_shift = sum(dt), d_scale_r = sum(dt*rs))."""
    b, d2, h2, w2, c8 = ys.shape
    emit_pool = gq is not None
    kd = 1 if emit_pad else _finale_kd(d2, h2, w2, c, 4)

    def row(bb, z):
        return (bb, z, 0, 0, 0)

    def prow(bb, z):
        return (bb, z + 1, 0, 0, 0)

    aff = pl.BlockSpec((1, 1, c8), lambda bb, z: (bb, 0, 0),
                       memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, 1, c8), lambda bb, z: (bb, 0, 0),
                       memory_space=pltpu.VMEM)
    slab = pl.BlockSpec((1, kd, h2, w2, c8), row, memory_space=pltpu.VMEM)
    in_specs = [slab, slab, aff, aff, aff, aff,
                pl.BlockSpec((1, kd, h2, w2, c8), prow if emit_pad else row,
                             memory_space=pltpu.VMEM)]
    args = [ys, rs,
            scale2.reshape(b, 1, c8).astype(jnp.float32),
            shift2.reshape(b, 1, c8).astype(jnp.float32),
            scale_r.reshape(b, 1, c8).astype(jnp.float32),
            shift_r.reshape(b, 1, c8).astype(jnp.float32),
            gp]
    if emit_pool:
        in_specs.append(pl.BlockSpec((1, kd, h2, w2, c), row,
                                     memory_space=pltpu.VMEM))
        args.append(gq)
    out_dtype = jnp.promote_types(ys.dtype, rs.dtype)
    dt, a1, a2, a3 = pl.pallas_call(
        _make_finale_bwd_kernel(c, slope, emit_pool, out_dtype, kd),
        grid=(b, d2 // kd),
        in_specs=in_specs,
        out_specs=[
            slab, acc, acc, acc,
        ],
        out_shape=[
            jax.ShapeDtypeStruct(ys.shape, out_dtype),
            jax.ShapeDtypeStruct((b, 1, c8), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c8), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return dt, a1[:, 0], a2[:, 0], a3[:, 0]


def finale_train_supported(h2: int, w2: int, c: int) -> bool:
    """VMEM bound for the backward pass (the wider of the two): 5 bf16
    row slabs double-buffered + ~3 f32 temporaries."""
    c8 = 8 * c
    slab = h2 * max(w2, 8) * max(c8, 128) * 2
    small = h2 * max(w2, 8) * max(c, 128) * 2
    return 2 * (5 * slab + small) + 4 * slab < 90 * 1024 * 1024
