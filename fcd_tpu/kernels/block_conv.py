"""Pallas TPU kernels: 3x3x3 conv as output-block GEMMs in s2d form.

Why: any channels-last tensor with C < 128 is lane-padded to 128 in HBM,
and XLA's direct 3D conv at the U-Net's top levels (C=16..32 on 128^3
grids) cannot fill the 128-lane MXU with a 16-wide contraction/output.
Re-blocking so one GEMM row computes a 2x2x2 *block* of output voxels
turns the conv into [H/2*W/2, 8C] x [8C, 8C'] matmuls with every
dimension >= 128 — full MXU tiles at a fixed FLOP redundancy.

Two formulations:
- padded-frame (8 taps, `blocked_conv3x3`): input zero-padded by 1 then
  s2d'd so every patch is the concat of 8 unit-shifted s2d voxels. The
  reinterleave/pad HBM round-trips around the kernel cost more than the
  matmuls — kept for the standalone conv API and as the reference form.
- ALIGNED (27 taps, `blocked_conv_s2d_aligned`): consumes the aligned s2d
  tensor directly; depth shifts come from three clamped row specs, H/W
  shifts are roll+mask reads inside VMEM. 27/8 more matmul work but no
  layout round-trip — the production path (ops.s2d_ops.conv3x3_s2d),
  measured ~2.5x faster end-to-end on v5e.
"""

from __future__ import annotations

import functools
import itertools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fcd_tpu import flags as _fcd_flags


def make_blocked_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Cin,Cout) -> (8, 8*Cin, 8*Cout): per-shift GEMM weights.

    Index layout: shift s=(sz,sy,sx) selects the matrix; input channels are
    the s2d parity-major (pz0,py0,px0,ci) order, output channels the s2d
    (qz,qy,qx,co) order. For output sub-voxel q and kernel tap k, the
    padded patch coordinate is p = q + k in 0..3, split s = p >> 1,
    p0 = p & 1.
    """
    cin, cout = w.shape[3], w.shape[4]
    # static tap-selection tensor: T[s, p0, q, k] = 1 iff padded patch
    # coordinate p = q + k satisfies s = p >> 1 and p0 = p & 1 (per axis)
    global _TAP_TABLE
    if _TAP_TABLE is None:
        t = np.zeros((8, 8, 8, 27), np.float32)
        for q in itertools.product(range(2), repeat=3):
            for ki, kk in enumerate(itertools.product(range(3), repeat=3)):
                p = tuple(q[i] + kk[i] for i in range(3))
                s = tuple(v >> 1 for v in p)
                p0 = tuple(v & 1 for v in p)
                si = 4 * s[0] + 2 * s[1] + s[2]
                pi = 4 * p0[0] + 2 * p0[1] + p0[2]
                qi = 4 * q[0] + 2 * q[1] + q[2]
                t[si, pi, qi, ki] = 1.0
        _TAP_TABLE = t
    table = jnp.asarray(_TAP_TABLE, w.dtype)
    wb = jnp.einsum("kio,spqk->spioq", w.reshape(27, cin, cout), table)
    # (s, p0, cin, cout, q) -> (s, p0*cin, q*cout)
    return wb.transpose(0, 1, 2, 4, 3).reshape(8, 8 * cin, 8 * cout)


_TAP_TABLE = None


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, D/2, H/2, W/2, 8C), parity-major channels."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, d // 2, h // 2, w // 2, 8 * c)


def depth_to_space(x: jnp.ndarray, cout: int) -> jnp.ndarray:
    b, d2, h2, w2, _ = x.shape
    x = x.reshape(b, d2, h2, w2, 2, 2, 2, cout)
    return x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d2 * 2, h2 * 2, w2 * 2, cout)


@functools.lru_cache(maxsize=8)
def _s2d_conv_weights(c: int):
    # cache NUMPY, not a jnp array: inside a jit trace jnp.asarray returns a
    # tracer, and caching that leaks it into later traces (e.g. a second
    # volume shape in the same process)
    w = np.zeros((2, 2, 2, c, 8 * c), np.float32)
    for kz in range(2):
        for ky in range(2):
            for kx in range(2):
                q = 4 * kz + 2 * ky + kx
                for ch in range(c):
                    w[kz, ky, kx, ch, q * c + ch] = 1.0
    return w


@functools.lru_cache(maxsize=8)
def _d2s_conv_weights(c: int):
    w = np.zeros((2, 2, 2, 8 * c, c), np.float32)
    for kz in range(2):
        for ky in range(2):
            for kx in range(2):
                p = 4 * (1 - kz) + 2 * (1 - ky) + (1 - kx)
                for ch in range(c):
                    w[kz, ky, kx, p * c + ch, ch] = 1.0
    return w


def space_to_depth_fast(x: jnp.ndarray) -> jnp.ndarray:
    """Volume-level space_to_depth, bit-identical to space_to_depth.

    Default form (FCD_ENTRY_SLICE=1): W-pairs packed into lanes by a pure
    reshape (W and C are memory-adjacent), stride-2 D/H slices, one lane
    concat — lane order (gz, gy, gx, ch) = g*c + ch exactly. Measured
    6.4 ms vs the one-hot conv's 86.6 ms standalone at the bench volume
    (182x218x182x2; the conv's NDHWC layout assignment is hostile at c=2
    when no consumer constrains it). FCD_ENTRY_SLICE=0 restores the
    stride-2 one-hot conv form (round-1 winner over reshape+transpose:
    11.8 -> 3.9 ms in the SW context of the time)."""
    from fcd_tpu import flags as _fcd_flags

    if _fcd_flags.get("FCD_ENTRY_SLICE") != "0" and x.shape[3] % 2 == 0:
        b, d, h, w, c = x.shape
        xp = x.reshape(b, d, h, w // 2, 2 * c)
        parts = [xp[:, 0::2, 0::2], xp[:, 0::2, 1::2],
                 xp[:, 1::2, 0::2], xp[:, 1::2, 1::2]]
        return jnp.concatenate(parts, axis=-1)
    c = x.shape[-1]
    w = _s2d_conv_weights(int(c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST)


def depth_to_space_fast(xs: jnp.ndarray, cout: int) -> jnp.ndarray:
    """depth_to_space as an lhs-dilated one-hot conv (exact); avoids the
    pathological in-context layout copies of the reshape+transpose form."""
    w = _d2s_conv_weights(int(cout)).astype(xs.dtype)
    return jax.lax.conv_general_dilated(
        xs, w, (1, 1, 1), [(1, 1)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=8)
def _d2s_perm_matrix(w2: int, cout: int) -> np.ndarray:
    """One-hot lane-permutation matrix P (w2*8*cout, 4*2*w2*cout) with
    P[x*8c + g*c + ch, (2pz+py)*2*w2*c + (2x+px)*c + ch] = 1 for parity
    group g = 4pz+2py+px — so (s2d row) @ P lays the x/px/c lanes out in
    native order for all four (pz, py) output-row groups at once. Cached
    as NUMPY (a cached jnp array would leak tracers across traces)."""
    n = w2 * 8 * cout
    p = np.zeros((n, n), np.float32)
    for x in range(w2):
        for g in range(8):
            pz, py, px = (g >> 2) & 1, (g >> 1) & 1, g & 1
            for c in range(cout):
                j = ((2 * pz + py) * 2 * w2 * cout
                     + (2 * x + px) * cout + c)
                p[x * 8 * cout + g * cout + c, j] = 1.0
    return p


def depth_to_space_mm(x: jnp.ndarray, cout: int) -> jnp.ndarray:
    """depth_to_space as one MXU lane-permutation matmul + a chunk-
    contiguous transpose.

    The reshape+transpose form makes XLA move the parity lanes across the
    minor dims element-by-element (measured ~13 ms/volume in the SW exit
    context at (91,109,91,16) f32). Multiplying each (z, y) row by a
    constant permutation matrix does the whole lane shuffle on the MXU,
    leaving only a (d2, h2, 2, 2, Xc) -> (d2, 2, h2, 2, Xc) transpose that
    moves contiguous row chunks. Exact at HIGHEST precision (every output
    is a single x * 1.0 product)."""
    b, d2, h2, w2, c8 = x.shape
    p = jnp.asarray(_d2s_perm_matrix(int(w2), int(cout)), x.dtype)
    flat = x.reshape(b * d2 * h2, w2 * c8)
    out = jax.lax.dot_general(flat, p, (((1,), (0,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=x.dtype)
    out = out.reshape(b, d2, h2, 2, 2, 2 * w2 * cout)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, 2 * d2, 2 * h2, 2 * w2, cout)


def _conv_kernel(x_lo_ref, x_hi_ref, w_ref, out_ref, acc_ref):
    """One (batch, depth-row) step: s2d output row Z from s2d rows Z, Z+1.

    Slice-then-dot ordering matters: slicing H first (row subrange) and
    feeding the W subrange slice straight into dot_general lets Mosaic fuse
    the shifted read into the matmul operand (no materialized copies).
    """
    h2 = out_ref.shape[2]
    w2 = out_ref.shape[3]

    rows = (x_lo_ref[0, 0], x_hi_ref[0, 0])   # each (H2+1, W2+1, 8C)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for sz in range(2):
        base = rows[sz]
        for sy in range(2):
            r = base[sy:sy + h2]              # (H2, W2+1, 8C)
            for sx in range(2):
                sl = r[:, sx:sx + w2, :]
                tap = 4 * sz + 2 * sy + sx
                acc_ref[...] += jax.lax.dot_general(
                    sl, w_ref[tap], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    out_ref[0, 0] = acc_ref[...].astype(out_ref.dtype)


def make_blocked_weights_aligned(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Cin,Cout) -> (27, 8*Cin, 8*Cout) GEMM weights for the ALIGNED
    27-tap formulation: tap (r,u,v) in {-1,0,1}^3 shifts whole s2d blocks;
    input parity p, output parity q and kernel index k relate per axis by
    k = 2*shift + p - q + 1 (k in 0..2)."""
    cin, cout = w.shape[3], w.shape[4]
    global _TAP_TABLE27
    if _TAP_TABLE27 is None:
        t = np.zeros((27, 8, 8, 27), np.float32)
        shifts = [(-1, 0, 1)[i] for i in range(3)]
        import itertools as it

        for ti, (rz, ry, rx) in enumerate(it.product(shifts, repeat=3)):
            for p in it.product(range(2), repeat=3):
                for q in it.product(range(2), repeat=3):
                    ks = [2 * r + pp - qq + 1 for r, pp, qq in
                          zip((rz, ry, rx), p, q)]
                    if all(0 <= kv <= 2 for kv in ks):
                        ki = 9 * ks[0] + 3 * ks[1] + ks[2]
                        pi = 4 * p[0] + 2 * p[1] + p[2]
                        qi = 4 * q[0] + 2 * q[1] + q[2]
                        t[ti, pi, qi, ki] = 1.0
        _TAP_TABLE27 = t
    table = jnp.asarray(_TAP_TABLE27, w.dtype)
    wb = jnp.einsum("kio,tpqk->tpioq", w.reshape(27, cin, cout), table)
    return wb.transpose(0, 1, 2, 4, 3).reshape(27, 8 * cin, 8 * cout)


_TAP_TABLE27 = None


def _roll_mask(x, shift: int, axis: int):
    """Shifted read with zero boundary: out[i] = x[i + shift] (zero outside),
    built from pltpu.roll + an iota mask (Mosaic-friendly; pad/concat are
    not supported on non-trivial dims inside kernels)."""
    if shift == 0:
        return x
    n = x.shape[axis]
    amt = (-shift) % n
    # Mosaic only rotates 32-bit data (bf16 packs SUBLANE pairs, so a
    # bitcast trick would roll W in units of 2): rotate in f32
    orig_dtype = x.dtype
    xr = x.astype(jnp.float32) if orig_dtype == jnp.bfloat16 else x
    rolled = pltpu.roll(xr, amt, axis)
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if shift > 0:
        mask = ids < (n - shift)
    else:
        mask = ids >= (-shift)
    out = jnp.where(mask, rolled, jnp.zeros_like(rolled))
    return out.astype(orig_dtype)


def _make_aligned_kernel(h2: int, w2: int, cin: int):
    """Kernel over ALIGNED s2d rows: out row Z = sum over 27 block-shift taps
    of (shifted slab) @ W_tap. Block shifts in D come from the three row
    specs; H/W shifts are roll+mask reads. No reinterleave tensor ever
    exists — the 27/8 extra matmul work is far cheaper than the HBM
    round-trip + layout conversions it replaces."""

    def kernel(x_m1_ref, x_0_ref, x_p1_ref, w_ref, out_ref, acc_ref):
        z = pl.program_id(1)
        n_z = pl.num_programs(1)
        row_m1 = x_m1_ref[0, 0] * jnp.where(z > 0, 1.0, 0.0).astype(x_m1_ref.dtype)
        row_0 = x_0_ref[0, 0]
        row_p1 = x_p1_ref[0, 0] * jnp.where(z < n_z - 1, 1.0, 0.0).astype(
            x_p1_ref.dtype
        )
        rows = {-1: row_m1, 0: row_0, 1: row_p1}

        acc_ref[...] = jnp.zeros_like(acc_ref)
        tap = 0
        for r in (-1, 0, 1):
            base = rows[r]
            for u in (-1, 0, 1):
                su = _roll_mask(base, u, 0)
                for v in (-1, 0, 1):
                    sl = _roll_mask(su, v, 1)
                    acc_ref[...] += jax.lax.dot_general(
                        sl, w_ref[tap], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    tap += 1
        out_ref[0, 0] = acc_ref[...].astype(out_ref.dtype)

    return kernel


def _make_padded27_kernel(h2: int, w2: int):
    """27-tap kernel over a spatially PRE-PADDED aligned-s2d tensor: every
    block shift is a static slice of the (H2+2, W2+2) slabs, which Mosaic
    fuses straight into the matmul operands — no roll/mask VPU work at all
    (the rolls were the bottleneck: 35% -> ~70% MXU on the level-1 shape)."""

    def kernel(x_m1_ref, x_0_ref, x_p1_ref, w_ref, out_ref, acc_ref):
        rows = (x_m1_ref[0, 0], x_0_ref[0, 0], x_p1_ref[0, 0])
        acc_ref[...] = jnp.zeros_like(acc_ref)
        tap = 0
        for r in range(3):
            base = rows[r]
            for u in range(3):
                su = base[u:u + h2]
                for v in range(3):
                    sl = su[:, v:v + w2, :]
                    acc_ref[...] += jax.lax.dot_general(
                        sl, w_ref[tap], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    tap += 1
        out_ref[0, 0] = acc_ref[...].astype(out_ref.dtype)

    return kernel


def blocked_conv_s2d_padded27(xs: jnp.ndarray, wblk: jnp.ndarray, cin: int,
                              cout8: int, out_dtype, interpret: bool) -> jnp.ndarray:
    """Blocked conv on aligned s2d input (B, D2, H2, W2, 8cin): spatial
    zero-pad by one block per side (pure XLA pad, lane layout untouched),
    then the padded-27-tap kernel. Same weights as the aligned form
    (make_blocked_weights_aligned)."""
    bsz, d2, h2, w2, c8 = xs.shape
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        _make_padded27_kernel(h2, w2),
        grid=(bsz, d2),
        in_specs=[
            pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8), lambda b, z: (b, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8), lambda b, z: (b, z + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8), lambda b, z: (b, z + 2, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, c8, cout8), lambda b, z: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h2, w2, cout8),
                               lambda b, z: (b, z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d2, h2, w2, cout8), out_dtype),
        scratch_shapes=[pltpu.VMEM((h2, w2, cout8), jnp.float32)],
        interpret=interpret,
    )(xp, xp, xp, wblk)


def _make_fused_kernel(h2: int, w2: int, *, has_prologue: bool,
                       neg_slope: float, has_res: bool, want_stats: bool):
    """Padded-27-tap conv kernel with fused input prologue, optional 1x1
    residual output, and accumulated output statistics.

    Prologue: t = leaky_relu(x * scale + shift) applied in VMEM to each
    input slab — the previous norm+activation never touches HBM. The
    spatial zero-padding border is re-zeroed AFTER the prologue (shift
    would otherwise leak into the conv halo), via an iota mask; depth
    border slabs are zeroed by program position.
    Stats: per-lane sum / sum-of-squares of the f32 accumulator, reduced
    over the grid into (1, 8cout) outputs — the next norm's statistics
    come for free with the conv.
    Residual: the center-tap slab (the block input itself) against a 1x1
    blocked weight — the projection shortcut shares the input reads.
    """

    def kernel(*refs):
        idx = 0
        x_m1_ref, x_0_ref, x_p1_ref, w_ref = refs[idx:idx + 4]
        idx += 4
        if has_res:
            rw_ref = refs[idx]
            idx += 1
        if has_prologue:
            scale_ref, shift_ref = refs[idx:idx + 2]
            idx += 2
        out_ref = refs[idx]
        idx += 1
        if want_stats:
            ysum_ref, ysq_ref = refs[idx:idx + 2]
            idx += 2
        if has_res:
            r_ref = refs[idx]
            idx += 1
            if want_stats:
                rsum_ref, rsq_ref = refs[idx:idx + 2]
                idx += 2

        z = pl.program_id(1)
        n_z = pl.num_programs(1)

        # H/W zero border (the input is spatially pre-padded by one block)
        hi = jax.lax.broadcasted_iota(jnp.int32, (h2 + 2, w2 + 2, 1), 0)
        wi = jax.lax.broadcasted_iota(jnp.int32, (h2 + 2, w2 + 2, 1), 1)
        border = ((hi >= 1) & (hi <= h2) & (wi >= 1) & (wi <= w2))

        def load(ref, zvalid):
            t = ref[0, 0]
            if has_prologue:
                t = t.astype(jnp.float32) * scale_ref[0] + shift_ref[0]
                if neg_slope != 1.0:
                    t = jnp.where(t >= 0, t, neg_slope * t)
            m = border & zvalid
            t = jnp.where(m, t, jnp.zeros_like(t))
            return t.astype(out_ref.dtype)

        rows = (
            load(x_m1_ref, z > 0),
            load(x_0_ref, z >= 0),
            load(x_p1_ref, z < n_z - 1),
        )

        acc = None
        tap = 0
        for r in range(3):
            base = rows[r]
            for u in range(3):
                su = base[u:u + h2]
                for v in range(3):
                    sl = su[:, v:v + w2, :]
                    d = jax.lax.dot_general(
                        sl, w_ref[tap], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = d if acc is None else acc + d
                    tap += 1
        out_ref[0, 0] = acc.astype(out_ref.dtype)

        @pl.when(z == 0)
        def _():
            if want_stats:
                ysum_ref[...] = jnp.zeros_like(ysum_ref)
                ysq_ref[...] = jnp.zeros_like(ysq_ref)
                if has_res:
                    rsum_ref[...] = jnp.zeros_like(rsum_ref)
                    rsq_ref[...] = jnp.zeros_like(rsq_ref)

        if want_stats:
            ysum_ref[0] += jnp.sum(acc, axis=(0, 1), keepdims=True)[0]
            ysq_ref[0] += jnp.sum(jnp.square(acc), axis=(0, 1), keepdims=True)[0]
        if has_res:
            center = rows[1][1:1 + h2, 1:1 + w2, :]
            racc = jax.lax.dot_general(
                center, rw_ref[...], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            r_ref[0, 0] = racc.astype(r_ref.dtype)
            if want_stats:
                rsum_ref[0] += jnp.sum(racc, axis=(0, 1), keepdims=True)[0]
                rsq_ref[0] += jnp.sum(jnp.square(racc), axis=(0, 1),
                                      keepdims=True)[0]

    return kernel


def blocked_conv_s2d_fused(
    xs: jnp.ndarray,            # aligned s2d (B, D2, H2, W2, 8cin)
    wblk: jnp.ndarray,          # (27, 8cin, 8cout)
    *,
    in_scale: Optional[jnp.ndarray] = None,   # (B, 8cin) f32
    in_shift: Optional[jnp.ndarray] = None,
    neg_slope: float = 1.0,     # 1.0 = linear (no activation)
    res_wblk: Optional[jnp.ndarray] = None,   # (8cin, 8cout_res) 1x1 weights
    want_stats: bool = False,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fused padded-27-tap blocked conv. Returns
    (y[, ysum, ysumsq][, r, rsum, rsumsq]) — stats are f32 (B, 8cout)."""
    bsz, d2, h2, w2, c8 = xs.shape
    cout8 = wblk.shape[-1]
    has_prologue = in_scale is not None
    has_res = res_wblk is not None
    xp = jnp.pad(xs, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))

    def row(off):
        if off == 0:
            return pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                                lambda b, z: (b, z, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        if off == -1:
            return pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                                lambda b, z: (b, jnp.maximum(z - 1, 0), 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                            lambda b, z: (b, jnp.minimum(z + 1, d2 - 1), 0, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [row(-1), row(0), row(1),
                pl.BlockSpec((27, c8, cout8), lambda b, z: (0, 0, 0),
                             memory_space=pltpu.VMEM)]
    inputs = [xp, xp, xp, wblk]
    if has_res:
        cr8 = res_wblk.shape[-1]
        in_specs.append(pl.BlockSpec((c8, cr8), lambda b, z: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(res_wblk)
    if has_prologue:
        for arr in (in_scale, in_shift):
            in_specs.append(pl.BlockSpec((1, 1, c8), lambda b, z: (b, 0, 0),
                                         memory_space=pltpu.VMEM))
            inputs.append(arr.reshape(bsz, 1, c8).astype(jnp.float32))

    out_specs = [pl.BlockSpec((1, 1, h2, w2, cout8),
                              lambda b, z: (b, z, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((bsz, d2, h2, w2, cout8), out_dtype)]
    stat_spec = pl.BlockSpec((1, 1, cout8), lambda b, z: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    if want_stats:
        out_specs += [stat_spec, stat_spec]
        out_shape += [jax.ShapeDtypeStruct((bsz, 1, cout8), jnp.float32)] * 2
    if has_res:
        cr8 = res_wblk.shape[-1]
        out_specs.append(pl.BlockSpec((1, 1, h2, w2, cr8),
                                      lambda b, z: (b, z, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bsz, d2, h2, w2, cr8), out_dtype))
        if want_stats:
            rstat = pl.BlockSpec((1, 1, cr8), lambda b, z: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
            out_specs += [rstat, rstat]
            out_shape += [jax.ShapeDtypeStruct((bsz, 1, cr8), jnp.float32)] * 2

    result = pl.pallas_call(
        _make_fused_kernel(h2, w2, has_prologue=has_prologue,
                           neg_slope=neg_slope, has_res=has_res,
                           want_stats=want_stats),
        grid=(bsz, d2),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    return result if isinstance(result, (list, tuple)) else (result,)


_TAP_TABLE8H = None


def make_blocked_weights_8tap(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Cin,Cout) -> (8, 8*Cin, 8*Cout) GEMM weights for the
    HALF-OFFSET 8-tap formulation: a 3x3x3 'same' conv between two s2d
    lattices whose blockings are offset by half a block (one voxel).

    Per axis, with slab-read shift s in {0,1}, input parity p, output
    parity q and kernel index k: k = p - q + 2s (valid when 0 <= k <= 2).
    Exactly 6 of the 12 (s,p,q) combinations are valid per axis, so the
    total matmul work is 8*64 / (27*8/8) = 64/27 = 2.37x the logical conv
    FLOPs — vs 8x for the 27-tap aligned form. The SAME table serves both
    directions (aligned->offset and offset->aligned); only the padding
    geometry differs (see blocked_conv_a2o / blocked_conv_o2a).
    """
    cin, cout = w.shape[3], w.shape[4]
    global _TAP_TABLE8H
    if _TAP_TABLE8H is None:
        t = np.zeros((8, 8, 8, 27), np.float32)
        for si, ss in enumerate(itertools.product(range(2), repeat=3)):
            for p in itertools.product(range(2), repeat=3):
                for q in itertools.product(range(2), repeat=3):
                    ks = [pp - qq + 2 * sv for sv, pp, qq in zip(ss, p, q)]
                    if all(0 <= kv <= 2 for kv in ks):
                        ki = 9 * ks[0] + 3 * ks[1] + ks[2]
                        pi = 4 * p[0] + 2 * p[1] + p[2]
                        qi = 4 * q[0] + 2 * q[1] + q[2]
                        t[si, pi, qi, ki] = 1.0
        _TAP_TABLE8H = t
    table = jnp.asarray(_TAP_TABLE8H, w.dtype)
    wb = jnp.einsum("kio,spqk->spioq", w.reshape(27, cin, cout), table)
    return wb.transpose(0, 1, 2, 4, 3).reshape(8, 8 * cin, 8 * cout)


def _parity_lane_masks(h_out: int, w_out: int, c8: int, h_last: int,
                       w_last: int, w_offset: int = 0):
    """(keep_h & keep_w) lane-aware pad-slot mask for an OFFSET-blocked
    (h_out, w_out, 8c) slab: per axis, position 0 parity-0 lanes and the
    LAST REAL position's (h_last/w_last — the slab may carry extra
    zero columns for sublane alignment) parity-1 lanes are half-block
    padding (voxels -1 / N).

    w_offset: the TRUE W position of column j is j + w_offset — used by
    the W-paired layout, whose second lane half holds the W+1 neighbor.

    Built from minimal-shape iotas (broadcast resolves late) so the
    compiler never materializes full (h, w, 128) int32 temps."""
    c = c8 // 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c8), 2)
    hpos = jax.lax.broadcasted_iota(jnp.int32, (h_out, 1, 1), 0)
    wpos = jax.lax.broadcasted_iota(jnp.int32, (1, w_out, 1), 1) + w_offset
    py = (lane // (2 * c)) % 2
    px = (lane // c) % 2
    keep = ((hpos > 0) | (py == 1)) & ((hpos != h_last) | (py == 0))
    keep &= ((wpos > 0) | (px == 1)) & ((wpos != w_last) | (px == 0))
    return keep


def _pz_lanes(h_out: int, w_out: int, c8: int):
    c = c8 // 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c8), 2)
    return (lane // (4 * c)) % 2


def _conv8_paired() -> bool:
    """FCD_CONV8_PAIRED=1 selects the W-PAIRED fused8 form: each slab
    column carries its own lanes plus its W+1 neighbor's (2x8c lanes), so
    the sx=1 taps — sublane-misaligned W slices Mosaic must copy before
    every matmul — become LANE-half selections and the 8 taps collapse
    into 4 aligned GEMMs with a 2x8c contraction (identical MACs)."""
    import os

    return _fcd_flags.get("FCD_CONV8_PAIRED") == "1"


def pair_w_lanes(xp: jnp.ndarray) -> jnp.ndarray:
    """(..., W, C) -> (..., W, 2C): lane-concat each W column with its W+1
    neighbor (the last column pairs with zeros). One XLA pass; the W axis
    length (and its sublane alignment) is unchanged."""
    sh = jnp.pad(xp[:, :, :, 1:, :], ((0, 0),) * 3 + ((0, 1), (0, 0)))
    return jnp.concatenate([xp, sh], axis=-1)


def pair_blocked_weights_8tap(wblk8: jnp.ndarray) -> jnp.ndarray:
    """(8, 8cin, 8cout) half-offset weights -> (4, 16cin, 8cout) W-paired
    weights: tap (sz, sy) stacks the sx=0 and sx=1 matrices along the
    contraction so one GEMM against the paired operand computes both."""
    c8, cout8 = wblk8.shape[1], wblk8.shape[2]
    t = wblk8.reshape(2, 2, 2, c8, cout8)
    return jnp.concatenate([t[:, :, 0], t[:, :, 1]], axis=2).reshape(
        4, 2 * c8, cout8)


def _make_fused8_kernel(h_out: int, w_out: int, *, variant: str,
                        has_prologue: bool, neg_slope: float,
                        want_stats: bool, h_last: int, w_last: int,
                        n_inputs: int = 1, res_hw=None,
                        want_res_stats: bool = False,
                        paired: bool = False, vmem_halo: bool = False,
                        w_pad_to: int = 0, carry: bool = False,
                        vpair: bool = False, kd: int = 1,
                        dualacc: bool = False):
    """Half-offset 8-tap conv kernel (one depth-row per program).

    variant 'a2o' (aligned in -> offset out): reads aligned rows z, z+1 of
    a depth/H/W zero-padded tensor (affine row maps keep the DMA pipeline
    double-buffered); output pad-slot lanes (offset blocking's intrinsic
    half-block halo) are zeroed before store/stats.
    variant 'o2a' (offset in -> aligned out): reads offset rows z, z+1
    (the offset tensor carries its halo intrinsically); the prologue
    (previous norm's affine + leaky-relu) re-zeroes the pad-slot lanes it
    would otherwise corrupt.

    h_last/w_last: index of the LAST REAL off-block (the offset tensor's
    W is padded up to a sublane multiple with zero columns so Mosaic can
    flatten GEMM operands without copies — w_out % 8 == 0 matters; the
    odd-width form ran at ~30% MXU vs ~90%).

    n_inputs > 1 (a2o only): the kernel takes several (x_lo, x_hi, w)
    triples sharing the spatial grid (channel counts may differ) and sums
    their conv outputs in the accumulator — the one-kernel form of
    convolving decoder cat-parts separately (linearity), so the part sum
    and its statistics never need separate XLA passes.

    res_hw (a2o only): (h2, w2) aligned dims — each triple carries a 4th
    ref with block-diag 1x1 weights and the kernel emits the summed
    projection shortcut as a second output, sharing the input reads. On
    step z the x_hi slab IS unpadded aligned depth-row z, so the res
    output writes with an affine map; its last row (z = d2) computes from
    the zero depth-halo (exact zeros, stats-safe) and the caller slices
    it off.
    """
    assert variant in ("a2o", "o2a")
    # a2o's H/W halo is XLA zero-padding; an affine prologue would corrupt it
    assert not (variant == "a2o" and has_prologue)
    # vmem_halo: the a2o input arrives depth-padded ONLY; each loaded row
    # slab gets its H/W zero halo (+ W sublane alignment) composed in VMEM,
    # replacing the ~50 GB/s XLA regrid pad with lane/sublane moves and
    # shrinking the kernel's own input DMA to the unpadded slab
    assert not (vmem_halo and variant != "a2o")
    assert not (vmem_halo and paired)
    # carry: the grid runs depth rows SEQUENTIALLY, so the row fetched as
    # x_hi on step z is exactly x_lo of step z+1 — keep it in a VMEM
    # scratch across steps and fetch each input row ONCE (halves the
    # kernel's input DMA and the per-row halo-pad work). a2o only: its
    # seed row (depth-pad row 0) is known zeros; o2a's row 0 is data.
    assert not (carry and variant != "a2o")
    # vpair: load the UNPAIRED slab (single DMA) and build the W-paired
    # operand in VMEM — the paired compute path's aligned GEMMs without
    # the HBM-paired form's doubled input DMA. The o2a prologue/masking
    # runs on the raw slab BEFORE pairing (unpaired masks).
    assert not (paired and vpair)
    assert not (carry and vpair)
    # kd: output depth rows per program — the kd+1 fetched rows serve kd
    # outputs (row r is both x_hi of output r-1 and x_lo of output r), so
    # the per-kernel input DMA drops from 2 to (kd+1)/kd fetches per row.
    # The big a2o kernels are DMA-bound (dec1: 546 MB fetched for 273 MB
    # of data vs a 0.45 ms compute floor). kd must divide d_out.
    assert not (carry and kd != 1)
    assert n_inputs == 1 or variant == "a2o"
    want_res = res_hw is not None
    assert not (want_res and variant != "a2o")

    def kernel(*refs):
        idx = 0
        per_in = (2 if carry else 3) + (1 if want_res else 0)
        triples = []
        for _ in range(n_inputs):
            triples.append(refs[idx:idx + per_in])
            idx += per_in
        scr_refs = refs[len(refs) - n_inputs:] if carry else ()
        if has_prologue:
            scale_ref, shift_ref = refs[idx:idx + 2]
            idx += 2
        out_ref = refs[idx]
        idx += 1
        if want_stats:
            ysum_ref, ysq_ref = refs[idx:idx + 2]
            idx += 2
        if want_res:
            res_ref = refs[idx]
            idx += 1
            if want_res_stats:
                rsum_ref, rsq_ref = refs[idx:idx + 2]
                idx += 2

        z = pl.program_id(1)
        n_z = pl.num_programs(1)
        h_in, w_in = triples[0][0].shape[2], triples[0][0].shape[3]

        if variant == "o2a":
            c8 = triples[0][0].shape[-1]
            if paired:
                ch = c8 // 2
                in_keep = jnp.concatenate(
                    [_parity_lane_masks(h_in, w_in, ch, h_last, w_last),
                     _parity_lane_masks(h_in, w_in, ch, h_last, w_last,
                                        w_offset=1)], axis=-1)
                pz_half = _pz_lanes(h_in, w_in, ch)
                pz_in = jnp.concatenate([pz_half, pz_half], axis=-1)
            else:
                in_keep = _parity_lane_masks(h_in, w_in, c8, h_last, w_last)
                pz_in = _pz_lanes(h_in, w_in, c8)
            n_z_in = n_z * kd + 1

        def load(ref, jb, r):
            # ref row jb within its block; r = absolute input depth row
            t = ref[0, jb]
            if vmem_halo:
                t = jnp.pad(
                    t, ((1, 1), (1, w_pad_to - 1 - t.shape[1]), (0, 0)))
            if has_prologue:
                t = t.astype(jnp.float32) * scale_ref[0] + shift_ref[0]
                if neg_slope != 1.0:
                    t = jnp.where(t >= 0, t, neg_slope * t)
                if variant == "o2a":
                    # re-zero the offset tensor's pad slots after the affine
                    keep = in_keep & ((r > 0) | (pz_in == 1)) & (
                        (r < n_z_in - 1) | (pz_in == 0))
                    t = jnp.where(keep, t, jnp.zeros_like(t))
                t = t.astype(out_ref.dtype)
            if vpair:
                sh = jnp.pad(t[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
                t = jnp.concatenate([t, sh], axis=-1)
            return t

        accs = [None] * kd
        raccs = [None] * kd
        for ti, trip in enumerate(triples):
            if carry:
                x_hi_ref, w_ref = trip[:2]
                scr = scr_refs[ti]

                @pl.when(z == 0)
                def _(scr=scr):
                    scr[...] = jnp.zeros_like(scr)

                rows_list = [scr[...], load(x_hi_ref, 0, z + 1)]
            else:
                x_blk_ref, x_last_ref, w_ref = trip[:3]
                rows_list = [load(x_blk_ref, j, z * kd + j)
                             for j in range(kd)]
                rows_list.append(load(x_last_ref, 0, z * kd + kd))
            for j in range(kd):
                rows = (rows_list[j], rows_list[j + 1])
                acc = accs[j]
                tap = 0
                for sz in range(2):
                    base = rows[sz]
                    for sy in range(2):
                        su = base[sy:sy + h_out]
                        if dualacc:
                            # DUAL-ACCUMULATOR form: both sx GEMMs run over
                            # the FULL slab width (always sublane-aligned —
                            # no Mosaic operand copies, no lane pairing);
                            # the sx=1 shift happens ONCE per output row as
                            # an f32 accumulator slice-add below. ~11% more
                            # MXU work for ~0 per-tap VPU work.
                            a0, a1 = acc if acc is not None else (None, None)
                            d0 = jax.lax.dot_general(
                                su, w_ref[tap], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            d1 = jax.lax.dot_general(
                                su, w_ref[tap + 1], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            acc = (d0 if a0 is None else a0 + d0,
                                   d1 if a1 is None else a1 + d1)
                            tap += 2
                            continue
                        if paired or vpair:
                            # sx lives in the lane halves: one aligned GEMM
                            # with a doubled contraction covers both W taps
                            sl = su[:, 0:w_out, :]
                            d = jax.lax.dot_general(
                                sl, w_ref[tap], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            acc = d if acc is None else acc + d
                            tap += 1
                            continue
                        for sx in range(2):
                            sl = su[:, sx:sx + w_out, :]
                            d = jax.lax.dot_general(
                                sl, w_ref[tap], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            acc = d if acc is None else acc + d
                            tap += 1
                if dualacc and ti == len(triples) - 1:
                    # combine: out[:, u] = acc0[:, u] + acc1[:, u+1]
                    a0, a1 = acc
                    acc = a0[:, 0:w_out] + a1[:, 1:1 + w_out]
                accs[j] = acc
                if want_res:
                    rh, rw = res_hw
                    # rows[1] IS aligned depth-row z*kd+j (interior of the
                    # H/W halo); paired: W position u+1 is the second lane
                    # half at u
                    if paired or vpair:
                        ch = rows[1].shape[-1] // 2
                        rsl = rows[1][1:1 + rh, 0:rw, ch:]
                    else:
                        rsl = rows[1][1:1 + rh, 1:1 + rw, :]
                    rd = jax.lax.dot_general(
                        rsl, trip[-1][0], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    raccs[j] = rd if raccs[j] is None else raccs[j] + rd
            if carry:
                scr[...] = rows_list[1]

        if variant == "a2o":
            # zero the offset output's pad-slot lanes (voxels -1 / N per
            # axis) so downstream reads and the stats see exact zeros
            cout8 = out_ref.shape[-1]
            keep0 = _parity_lane_masks(h_out, w_out, cout8, h_last, w_last)
            pz = _pz_lanes(h_out, w_out, cout8)
            d_tot = n_z * kd
            for j in range(kd):
                r = z * kd + j
                keep = keep0 & ((r > 0) | (pz == 1)) & (
                    (r < d_tot - 1) | (pz == 0))
                accs[j] = jnp.where(keep, accs[j], jnp.zeros_like(accs[j]))
        for j in range(kd):
            out_ref[0, j] = accs[j].astype(out_ref.dtype)

        if want_stats:
            @pl.when(z == 0)
            def _():
                ysum_ref[...] = jnp.zeros_like(ysum_ref)
                ysq_ref[...] = jnp.zeros_like(ysq_ref)

            ysum = sum(jnp.sum(a, axis=(0, 1), keepdims=True)[0]
                       for a in accs)
            ysq = sum(jnp.sum(jnp.square(a), axis=(0, 1), keepdims=True)[0]
                      for a in accs)
            ysum_ref[0] += ysum
            ysq_ref[0] += ysq

        if want_res:
            for j in range(kd):
                res_ref[0, j] = raccs[j].astype(res_ref.dtype)
            if want_res_stats:
                # rows computed from the zero depth halo are exact zeros,
                # so they contribute nothing to the sums
                @pl.when(z == 0)
                def _():
                    rsum_ref[...] = jnp.zeros_like(rsum_ref)
                    rsq_ref[...] = jnp.zeros_like(rsq_ref)

                rsum_ref[0] += sum(jnp.sum(r, axis=(0, 1), keepdims=True)[0]
                                   for r in raccs)
                rsq_ref[0] += sum(
                    jnp.sum(jnp.square(r), axis=(0, 1), keepdims=True)[0]
                    for r in raccs)

    return kernel


def _fused8_call(xp, wblk8, *, variant, d_out, h_out, w_out, h_last, w_last,
                 in_scale, in_shift, neg_slope, want_stats, out_dtype,
                 interpret, res_wblks=None, res_hw=None,
                 want_res_stats=False, paired=False, vmem_halo=False,
                 w_pad_to=0, carry=False, vpair=False, kd=1,
                 dualacc=False):
    xps = xp if isinstance(xp, (list, tuple)) else [xp]
    wblks = wblk8 if isinstance(wblk8, (list, tuple)) else [wblk8]
    assert len(xps) == len(wblks)
    want_res = res_wblks is not None
    bsz = xps[0].shape[0]
    cout8 = wblks[0].shape[-1]
    has_prologue = in_scale is not None
    h_in, w_in = xps[0].shape[2], xps[0].shape[3]

    # both variants read input rows z, z+1 — affine maps keep Mosaic's
    # double-buffered pipeline (clamped maps serialized the HBM fetches).
    # With kd > 1 the block fetch covers rows kd*z..kd*z+kd-1 and `last`
    # fetches row kd*z+kd (kd+1 rows serving kd outputs).
    assert d_out % kd == 0

    def lo(b, z):
        return (b, z, 0, 0, 0)

    def hi(b, z):
        return (b, kd * z + kd, 0, 0, 0)

    in_specs = []
    inputs = []
    scratch_shapes = []
    for i, (xpi, wblki) in enumerate(zip(xps, wblks)):
        c8i = xpi.shape[-1]
        assert xpi.shape[2] == h_in and xpi.shape[3] == w_in
        if carry:
            in_specs.append(pl.BlockSpec((1, 1, h_in, w_in, c8i), hi,
                                         memory_space=pltpu.VMEM))
            inputs.append(xpi)
            slab = ((h_in + 2, w_pad_to, c8i) if vmem_halo
                    else (h_in, w_in, c8i))
            scratch_shapes.append(pltpu.VMEM(slab, xpi.dtype))
        else:
            in_specs += [
                pl.BlockSpec((1, kd, h_in, w_in, c8i), lo,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, h_in, w_in, c8i), hi,
                             memory_space=pltpu.VMEM),
            ]
            inputs += [xpi, xpi]
        in_specs.append(pl.BlockSpec(tuple(wblki.shape),
                                     lambda b, z: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(wblki)
        if want_res:
            rk = res_wblks[i].shape[-2]
            rcout8 = res_wblks[i].shape[-1]
            in_specs.append(
                pl.BlockSpec((1, rk, rcout8), lambda b, z: (0, 0, 0),
                             memory_space=pltpu.VMEM))
            inputs.append(res_wblks[i].reshape(1, rk, rcout8))
    if has_prologue:
        c8 = xps[0].shape[-1]
        for arr in (in_scale, in_shift):
            in_specs.append(pl.BlockSpec((1, 1, c8), lambda b, z: (b, 0, 0),
                                         memory_space=pltpu.VMEM))
            inputs.append(arr.reshape(bsz, 1, c8).astype(jnp.float32))

    out_specs = [pl.BlockSpec((1, kd, h_out, w_out, cout8),
                              lambda b, z: (b, z, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((bsz, d_out, h_out, w_out, cout8),
                                      out_dtype)]
    if want_stats:
        stat_spec = pl.BlockSpec((1, 1, cout8), lambda b, z: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs += [stat_spec, stat_spec]
        out_shape += [jax.ShapeDtypeStruct((bsz, 1, cout8), jnp.float32)] * 2
    if want_res:
        rh, rw = res_hw
        rcout8 = res_wblks[0].shape[-1]
        out_specs.append(pl.BlockSpec((1, kd, rh, rw, rcout8),
                                      lambda b, z: (b, z, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bsz, d_out, rh, rw, rcout8),
                                              out_dtype))
        if want_res_stats:
            rstat = pl.BlockSpec((1, 1, rcout8), lambda b, z: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
            out_specs += [rstat, rstat]
            out_shape += [jax.ShapeDtypeStruct((bsz, 1, rcout8),
                                               jnp.float32)] * 2

    result = pl.pallas_call(
        _make_fused8_kernel(h_out, w_out, variant=variant,
                            has_prologue=has_prologue, neg_slope=neg_slope,
                            want_stats=want_stats, h_last=h_last,
                            w_last=w_last, n_inputs=len(xps),
                            res_hw=res_hw if want_res else None,
                            want_res_stats=want_res_stats, paired=paired,
                            vmem_halo=vmem_halo, w_pad_to=w_pad_to,
                            carry=carry, vpair=vpair, kd=kd,
                            dualacc=dualacc),
        grid=(bsz, d_out // kd),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        # the full-resolution slabs (66x80x128 + f32 accumulator) overflow
        # the 16M default scoped-VMEM budget; v5e has 128M physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return result if isinstance(result, (list, tuple)) else (result,)


def _pad8(v: int) -> int:
    return (v + 7) // 8 * 8


def _pick_kd(d_out, n_parts, h_in, w_in, c8_max, h_out, w_out, cout8,
             *, vmem_halo, w_pad_to, vpair=False, want_res=False) -> int:
    """Largest kd in {5,4,3,2} dividing d_out whose working set fits VMEM
    (FCD_CONV8_KD=0 disables). kd outputs per program share their fetched
    input rows, cutting kernel input DMA from 2 to (kd+1)/kd per row."""
    import os

    if _fcd_flags.get("FCD_CONV8_KD") == "0":
        return 1
    hp = h_in + 2 if vmem_halo else h_in
    wp = w_pad_to if vmem_halo else w_in
    slab = hp * max(wp, 8) * max(c8_max, 128) * 2
    if vpair:
        slab *= 2
    acc = h_out * max(w_out, 8) * max(cout8, 128) * 4
    out_blk = h_out * max(w_out, 8) * max(cout8, 128) * 2
    for k in (5, 4, 3, 2):
        if d_out % k:
            continue
        need = (n_parts * (k + 1) * slab * 2 + k * acc
                + 2 * k * out_blk * (2 if want_res else 1))
        if need < 64 * 1024 * 1024:
            return k
    return 1


def _a2o_vmem_halo() -> bool:
    """Default a2o halo form: depth-only XLA pad + in-VMEM H/W halo
    (FCD_A2O_PAD=vmem). Set FCD_A2O_PAD=pad/dus/pallas for the full
    XLA-side pad formulations (see _halo_pad)."""
    import os

    return _fcd_flags.get("FCD_A2O_PAD") == "vmem"


def _conv8_vpair() -> bool:
    """In-VMEM W-pairing for the fused8 kernels (FCD_CONV8_VPAIR): load
    the unpaired slab, pair in VMEM, run the 4-tap aligned GEMMs at a
    doubled contraction — no Mosaic misaligned-slice copies, no doubled
    HBM DMA."""
    import os

    return _fcd_flags.get("FCD_CONV8_VPAIR") == "1"


def _conv8_dualacc() -> bool:
    """Dual-accumulator form for the fused8 kernels (FCD_CONV8_DUALACC):
    both sx GEMMs run full-slab-width (aligned operands, no pairing); one
    f32 accumulator shift-add per output row replaces all per-tap VPU
    work. Wins on the VPU-bound level-1/2 shapes, especially the unpaired
    multi-part decoder kernels whose misaligned sx=1 slices Mosaic copies."""
    import os

    return _fcd_flags.get("FCD_CONV8_DUALACC") == "1"


def _a2o_carry() -> bool:
    """Row-carry for the a2o kernels (FCD_CONV8_CARRY): fetch each depth
    row once and carry it across the sequential grid in VMEM scratch."""
    import os

    return _fcd_flags.get("FCD_CONV8_CARRY") == "1"


def _depth_pad(xs: jnp.ndarray) -> jnp.ndarray:
    """One zero depth-row on each side. D is above the (W, C) tile dims,
    so this pad preserves tile geometry and runs at copy bandwidth —
    unlike the H/W halo pad, which regrids every tile."""
    return jnp.pad(xs, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))


def _halo_pad_kernel(h2: int, w2: int, w_in: int):
    """One INTERIOR depth row: compose the zero-bordered row in VMEM and
    write it (XLA's pad op regrids tiles at ~50 GB/s; this runs at copy
    bandwidth). The two edge rows are zero-filled by the caller."""

    def kernel(x_ref, out_ref):
        row = x_ref[0, 0].astype(out_ref.dtype)          # (h2, w2, c8)
        c8 = row.shape[-1]
        zrow_w = jnp.zeros((h2, 1, c8), out_ref.dtype)
        zpad_w = jnp.zeros((h2, w_in - 1 - w2, c8), out_ref.dtype)
        wide = jnp.concatenate([zrow_w, row, zpad_w], axis=1)
        zrow_h = jnp.zeros((1, w_in, c8), out_ref.dtype)
        out_ref[0, 0] = jnp.concatenate([zrow_h, wide, zrow_h], axis=0)

    return kernel


def _halo_pad(xs: jnp.ndarray, w_in: int) -> jnp.ndarray:
    """One-block zero halo (+ W sublane alignment) for the a2o kernels.

    FCD_A2O_PAD selects the formulation, all A/B'd end-to-end on v5e:
    'pad' = jnp.pad — the XLA pad op regrids tiles at
    ~50 GB/s on the level-1 shape but still wins (8.66 vol/s);
    'dus' = dynamic_update_slice into zeros (8.16 — the zeros buffer
    materializes, nothing fuses); 'pallas' = row-wise kernel composing
    the bordered row in VMEM (6.49 — the VMEM concats and the two
    edge-row fixup updates cost far more than the regrid they save).
    'vmem' (default; selected inside blocked_conv_a2o*, not here) =
    depth-only jnp.pad (tile geometry preserved, ~copy bandwidth) with
    the H/W halo composed in the conv kernel's VMEM prologue — no
    full-tensor regrid pass at all, and 20% less kernel input DMA."""
    import os

    b, d2, h2, w2, c8 = xs.shape
    form = _fcd_flags.get("FCD_A2O_PAD")
    if form == "dus":
        buf = jnp.zeros((b, d2 + 2, h2 + 2, w_in, c8), xs.dtype)
        return jax.lax.dynamic_update_slice(buf, xs, (0, 1, 1, 1, 0))
    if form == "pallas" and jax.default_backend() == "tpu":
        out = pl.pallas_call(
            _halo_pad_kernel(h2, w2, w_in),
            grid=(b, d2),
            in_specs=[pl.BlockSpec((1, 1, h2, w2, c8),
                                   lambda bb, z: (bb, z, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, h2 + 2, w_in, c8),
                                   lambda bb, z: (bb, z + 1, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, d2 + 2, h2 + 2, w_in, c8),
                                           xs.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=False,
        )(xs)
        # depth-edge rows were never written: zero them (in-place updates)
        zrow = jnp.zeros((b, 1, h2 + 2, w_in, c8), xs.dtype)
        out = jax.lax.dynamic_update_slice(out, zrow, (0, 0, 0, 0, 0))
        return jax.lax.dynamic_update_slice(out, zrow, (0, d2 + 1, 0, 0, 0))
    return jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (1, w_in - 1 - w2), (0, 0)))


def blocked_conv_a2o(xs: jnp.ndarray, wblk8: jnp.ndarray, *,
                     want_stats: bool = False, out_dtype=jnp.bfloat16,
                     interpret: bool = False, pre_padded: bool = False):
    """Aligned s2d (B, D2, H2, W2, 8cin) -> offset-blocked
    (B, D2+1, H2+1, pad8(W2+1), 8cout), 8-tap half-offset kernel, pad-slot
    lanes zeroed. Returns (y[, ysum, ysumsq]).

    The input is zero-padded by one block on every axis (affine depth-row
    reads) and the W axis — the sublane axis of the flattened GEMM
    operands — is padded so the OUTPUT width is a multiple of 8: Mosaic
    then flattens (h, w, c) operands without copies. The extra output
    columns compute from zero-padding only, so they are exact zeros
    (stats-safe); consumers index real blocks 0..W2.

    pre_padded: the input already carries the (+1, +1) zero depth pad
    (B, D2+2, ...) — the padded-chain convention where PRODUCERS emit the
    depth halo inside their own (fused/free) pass, deleting the ~0.85 ms
    near-fixed standalone pad op per tensor (see flags.FCD_PAD_CHAIN)."""
    bsz, d2, h2, w2, _ = xs.shape
    if pre_padded:
        d2 -= 2
    w_out = _pad8(w2 + 1)
    w_in = _pad8(w_out + 1)
    paired = _conv8_paired()
    dualacc = _conv8_dualacc() and not paired
    vpair = _conv8_vpair() and not paired and not dualacc
    vmem_halo = _a2o_vmem_halo() and not paired
    if pre_padded:
        xp = (xs if vmem_halo
              else _halo_pad_hw(xs, w_in))
    else:
        xp = _depth_pad(xs) if vmem_halo else _halo_pad(xs, w_in)
    if paired:
        xp = pair_w_lanes(xp)
    if paired or vpair:
        wblk8 = pair_blocked_weights_8tap(wblk8)
    kd = _pick_kd(d2 + 1, 1, xp.shape[2], xp.shape[3], xp.shape[-1],
                  h2 + 1, w_out, wblk8.shape[-1],
                  vmem_halo=vmem_halo, w_pad_to=w_in, vpair=vpair)
    return _fused8_call(
        xp, wblk8, variant="a2o", d_out=d2 + 1, h_out=h2 + 1, w_out=w_out,
        h_last=h2, w_last=w2, in_scale=None, in_shift=None, neg_slope=1.0,
        want_stats=want_stats, out_dtype=out_dtype, interpret=interpret,
        paired=paired, vmem_halo=vmem_halo, w_pad_to=w_in,
        carry=_a2o_carry() and not (paired or vpair or dualacc) and kd == 1,
        vpair=vpair, kd=kd, dualacc=dualacc,
    )


def _halo_pad_hw(xs: jnp.ndarray, w_in: int) -> jnp.ndarray:
    """H/W halo (+ W sublane alignment) for an input that ALREADY carries
    the (+1, +1) zero depth pad (the padded-chain convention feeding the
    legacy XLA-halo kernel forms)."""
    w2 = xs.shape[3]
    return jnp.pad(xs, ((0, 0), (0, 0), (1, 1), (1, w_in - 1 - w2), (0, 0)))


def blocked_conv_a2o_multi(xs_list, wblk8_list, *, want_stats: bool = False,
                           res_wblk_list=None, want_res_stats: bool = False,
                           out_dtype=jnp.bfloat16, interpret: bool = False,
                           pre_padded=None):
    """Multi-part blocked_conv_a2o: one kernel convolves every aligned-s2d
    part (same spatial grid, channel counts may differ) with its own
    weights and sums the results in the accumulator — the single-pass form
    of conv(cat(parts)) by linearity. Stats, when requested, are taken on
    the summed output inside the kernel, so neither the part sum nor its
    two reduction passes ever materialize in XLA.

    res_wblk_list: per-part block-diag 1x1 weights (8c, 8oc) — the kernel
    also emits the summed projection shortcut on the ALIGNED grid (sharing
    the input reads), returned as (B, d2+1, h2, w2, 8oc) whose LAST depth
    row computes from the zero halo; callers use res[:, :d2].
    pre_padded: per-part bools — those parts already carry the (+1, +1)
    zero depth pad (padded-chain convention, see blocked_conv_a2o).
    Returns (y[, ysum, ysq][, res[, rsum, rsq]])."""
    if pre_padded is None:
        pre_padded = [False] * len(xs_list)
    bsz = xs_list[0].shape[0]
    d2 = xs_list[0].shape[1] - (2 if pre_padded[0] else 0)
    h2, w2 = xs_list[0].shape[2:4]
    w_out = _pad8(w2 + 1)
    w_in = _pad8(w_out + 1)
    paired = _conv8_paired()
    dualacc = _conv8_dualacc() and not paired
    # vpair measured a win only on the single-part a2o kernel (enc1
    # 4.85 -> 3.50 ms/volume); the multi-part kernels were flat and a
    # downstream finale fusion regressed — keep them unpaired.
    # FCD_CONV8_VPAIR_MULTI=1 re-enables it for A/B (r4: the finale
    # formulation changed with the padded chain).
    vpair = (_conv8_vpair() and not paired and not dualacc
             and (len(xs_list) == 1
                  or _fcd_flags.get("FCD_CONV8_VPAIR_MULTI") == "1"))
    vmem_halo = _a2o_vmem_halo() and not paired

    def pad(xs, pre):
        if pre:
            return xs if vmem_halo else _halo_pad_hw(xs, w_in)
        return _depth_pad(xs) if vmem_halo else _halo_pad(xs, w_in)

    xps = [pad(xs, pre) for xs, pre in zip(xs_list, pre_padded)]
    wblks = list(wblk8_list)
    if paired:
        xps = [pair_w_lanes(x) for x in xps]
    if paired or vpair:
        wblks = [pair_blocked_weights_8tap(w) for w in wblks]
    kd = _pick_kd(d2 + 1, len(xps), xps[0].shape[2], xps[0].shape[3],
                  max(x.shape[-1] for x in xps), h2 + 1, w_out,
                  wblks[0].shape[-1], vmem_halo=vmem_halo, w_pad_to=w_in,
                  vpair=vpair, want_res=res_wblk_list is not None)
    return _fused8_call(
        xps, wblks, variant="a2o", d_out=d2 + 1, h_out=h2 + 1,
        w_out=w_out, h_last=h2, w_last=w2, in_scale=None, in_shift=None,
        neg_slope=1.0, want_stats=want_stats, out_dtype=out_dtype,
        interpret=interpret,
        res_wblks=None if res_wblk_list is None else list(res_wblk_list),
        res_hw=None if res_wblk_list is None else (h2, w2),
        want_res_stats=want_res_stats, paired=paired,
        vmem_halo=vmem_halo, w_pad_to=w_in,
        carry=_a2o_carry() and not (paired or vpair or dualacc) and kd == 1,
        vpair=vpair, kd=kd, dualacc=dualacc,
    )


def blocked_conv_o2a(ys: jnp.ndarray, wblk8: jnp.ndarray, aligned_w: int, *,
                     in_scale: Optional[jnp.ndarray] = None,
                     in_shift: Optional[jnp.ndarray] = None,
                     neg_slope: float = 1.0, want_stats: bool = False,
                     out_dtype=jnp.bfloat16, interpret: bool = False):
    """Offset-blocked (B, D2+1, H2+1, pad8(W2+1), 8cin) — as produced by
    blocked_conv_a2o — -> aligned s2d (B, D2, H2, aligned_w, 8cout).
    `aligned_w` = W2, the aligned block count along W (the offset tensor's
    W axis carries sublane-alignment zero columns). Optional fused prologue
    applies the previous norm's eval affine + leaky-relu in VMEM
    (re-zeroing pad slots). Returns (y[, ysum, ysumsq])."""
    bsz, d2p, h2p, w2p, _ = ys.shape
    d2, h2, w2 = d2p - 1, h2p - 1, int(aligned_w)
    assert w2p == _pad8(w2 + 1), (ys.shape, "expected a2o-padded W axis")
    paired = _conv8_paired()
    dualacc = _conv8_dualacc() and not paired
    # vpair on o2a measured flat (the kernel already runs ~77% MXU)
    vpair = False
    if paired:
        ys = pair_w_lanes(ys)
        if in_scale is not None:
            in_scale = jnp.concatenate([in_scale, in_scale], axis=-1)
            in_shift = jnp.concatenate([in_shift, in_shift], axis=-1)
    if paired or vpair:
        wblk8 = pair_blocked_weights_8tap(wblk8)
    kd = _pick_kd(d2, 1, ys.shape[2], ys.shape[3], ys.shape[-1],
                  h2, w2, wblk8.shape[-1], vmem_halo=False,
                  w_pad_to=0, vpair=vpair)
    return _fused8_call(
        ys, wblk8, variant="o2a", d_out=d2, h_out=h2, w_out=w2,
        h_last=h2, w_last=w2, in_scale=in_scale, in_shift=in_shift,
        neg_slope=neg_slope, want_stats=want_stats, out_dtype=out_dtype,
        interpret=interpret, paired=paired, vpair=vpair, kd=kd,
        dualacc=dualacc,
    )


def _make_dw8_kernel(h_t: int, w_t: int, *, vmem_halo: bool = False,
                     w_pad_to: int = 0, prologue: bool = False,
                     neg_slope: float = 1.0, h_last: int = 0,
                     w_last: int = 0, n_rows: int = 0):
    """Weight-gradient kernel for the half-offset 8-tap pair: for each of
    the 8 slab shifts s, dW_blk[s] += (shifted source slab)^T (cotangent
    slab) — the exact adjoint of _make_fused8_kernel's tap loop,
    accumulated across the (batch, depth-row) grid. Serves BOTH
    directions: a2o (source = padded aligned rows, cotangent = offset
    rows) and o2a (source = offset rows, cotangent = aligned rows) —
    only the slab dims differ. vmem_halo (a2o direction): the source
    arrives depth-padded only; H/W halo composed in VMEM per row.

    prologue (o2a direction): apply the previous norm's affine +
    leaky-relu + offset pad-slot re-zeroing to the source slabs in VMEM
    (mirroring _make_fused8_kernel's o2a prologue) — the backward's
    activated tensor never materializes in HBM. n_rows = d2+1 (the
    offset tensor's depth rows, for the depth-parity mask)."""

    def kernel(*refs):
        if prologue:
            x_lo_ref, x_hi_ref, g_ref, scale_ref, shift_ref, dw_ref = refs
        else:
            x_lo_ref, x_hi_ref, g_ref, dw_ref = refs
        z = pl.program_id(1)
        b = pl.program_id(0)

        @pl.when((z == 0) & (b == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        if prologue:
            h_in, w_in = x_lo_ref.shape[2], x_lo_ref.shape[3]
            c8 = x_lo_ref.shape[-1]
            in_keep = _parity_lane_masks(h_in, w_in, c8, h_last, w_last)
            pz_in = _pz_lanes(h_in, w_in, c8)

        def load(ref, r):
            t = ref[0, 0]
            if vmem_halo:
                t = jnp.pad(
                    t, ((1, 1), (1, w_pad_to - 1 - t.shape[1]), (0, 0)))
            if prologue:
                tf = t.astype(jnp.float32) * scale_ref[0] + shift_ref[0]
                if neg_slope != 1.0:
                    tf = jnp.where(tf >= 0, tf, neg_slope * tf)
                keep = in_keep & ((r > 0) | (pz_in == 1)) & (
                    (r < n_rows - 1) | (pz_in == 0))
                t = jnp.where(keep, tf, 0.0).astype(g_ref.dtype)
            return t

        rows = (load(x_lo_ref, z), load(x_hi_ref, z + 1))
        g2 = g_ref[0, 0].reshape(h_t * w_t, g_ref.shape[-1])
        si = 0
        for sz in range(2):
            base = rows[sz]
            for sy in range(2):
                su = base[sy:sy + h_t]
                for sx in range(2):
                    sl = su[:, sx:sx + w_t, :].reshape(h_t * w_t,
                                                       su.shape[-1])
                    dw_ref[si] += jax.lax.dot_general(
                        sl, g2, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    si += 1

    return kernel


def blocked_conv_a2o_dw(xs: jnp.ndarray, g: jnp.ndarray,
                        interpret: bool,
                        pre_padded: bool = False) -> jnp.ndarray:
    """dW (8, 8cin, 8cout) f32 for the a2o direction: xs aligned
    (B, D2, H2, W2, 8cin), g the OFFSET-grid cotangent
    (B, D2+1, H2+1, pad8(W2+1), 8cout) with pad-slot lanes already
    zeroed (they are forward constants). pre_padded: xs already carries
    the (+1, +1) zero depth pad (padded-chain convention) — the forward
    conv's padded input is reused and no second pad op runs."""
    bsz, d2, h2, w2, c8 = xs.shape
    if pre_padded:
        d2 -= 2
    cout8 = g.shape[-1]
    h_t, w_t = g.shape[2], g.shape[3]
    w_in = _pad8(w_t + 1)
    vmem_halo = _a2o_vmem_halo()
    if pre_padded:
        xp = xs if vmem_halo else _halo_pad_hw(xs, w_in)
    else:
        xp = _depth_pad(xs) if vmem_halo else _halo_pad(xs, w_in)
    h_slab, w_slab = (h2, w2) if vmem_halo else (h2 + 2, w_in)

    return pl.pallas_call(
        _make_dw8_kernel(h_t, w_t, vmem_halo=vmem_halo, w_pad_to=w_in),
        grid=(bsz, d2 + 1),
        in_specs=[
            pl.BlockSpec((1, 1, h_slab, w_slab, c8),
                         lambda b, z: (b, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h_slab, w_slab, c8),
                         lambda b, z: (b, z + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h_t, w_t, cout8),
                         lambda b, z: (b, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, c8, cout8), lambda b, z: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, c8, cout8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, g)


def blocked_conv_o2a_dw(ys: jnp.ndarray, g: jnp.ndarray, aligned_w: int,
                        interpret: bool,
                        g_pre_padded: bool = False,
                        in_scale: Optional[jnp.ndarray] = None,
                        in_shift: Optional[jnp.ndarray] = None,
                        neg_slope: float = 1.0) -> jnp.ndarray:
    """dW (8, 8cin, 8cout) f32 for the o2a direction: ys the OFFSET-grid
    input (B, D2+1, H2+1, pad8(W2+1), 8cin) with exact-zero pad slots,
    g the aligned cotangent (B, D2, H2, aligned_w, 8cout).
    g_pre_padded: g carries the (+1, +1) zero depth pad (shared with the
    adjoint a2o conv of the same backward) — read via index offset.
    in_scale/in_shift (B, 8cin) + neg_slope: norm+act prologue applied
    to ys in VMEM (the fused-prologue backward's activated tensor never
    materializes; ys is then the RAW conv1 output)."""
    bsz, d2p, h2p, w2p, c8 = ys.shape
    d2, h2, w2 = d2p - 1, h2p - 1, int(aligned_w)
    cout8 = g.shape[-1]
    prologue = in_scale is not None

    def grow(b, z):
        return (b, z + 1, 0, 0, 0) if g_pre_padded else (b, z, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, h2p, w2p, c8),
                     lambda b, z: (b, z, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, h2p, w2p, c8),
                     lambda b, z: (b, z + 1, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, h2, w2, cout8), grow,
                     memory_space=pltpu.VMEM),
    ]
    inputs = [ys, ys, g]
    if prologue:
        aff = pl.BlockSpec((1, 1, c8), lambda b, z: (b, 0, 0),
                           memory_space=pltpu.VMEM)
        in_specs += [aff, aff]
        inputs += [in_scale.reshape(bsz, 1, c8).astype(jnp.float32),
                   in_shift.reshape(bsz, 1, c8).astype(jnp.float32)]

    return pl.pallas_call(
        _make_dw8_kernel(h2, w2, prologue=prologue, neg_slope=neg_slope,
                         h_last=h2, w_last=w2, n_rows=d2p),
        grid=(bsz, d2),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, c8, cout8), lambda b, z: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, c8, cout8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


def unblock_dw8(dwblk: jnp.ndarray, cin: int, cout: int) -> jnp.ndarray:
    """(8, 8cin, 8cout) half-offset blocked weight-grad ->
    (3,3,3,cin,cout): the adjoint of make_blocked_weights_8tap's
    tap-table expansion."""
    global _TAP_TABLE8H
    if _TAP_TABLE8H is None:
        make_blocked_weights_8tap(jnp.zeros((3, 3, 3, 1, 1)))
    table = jnp.asarray(_TAP_TABLE8H, dwblk.dtype)    # (8, 8, 8, 27)
    v = dwblk.reshape(8, 8, cin, 8, cout)
    dw = jnp.einsum("spiqo,spqk->kio", v, table)
    return dw.reshape(3, 3, 3, cin, cout)


def offset_keep_mask(d_out: int, h_out: int, w_out: int, c8: int,
                     h_last: int, w_last: int):
    """Boolean pad-slot mask of a full OFFSET-grid tensor
    (d_out, h_out, w_out, 8c) — _parity_lane_masks extended with the
    depth-axis terms (built from iotas; fuses into consumers)."""
    keep = _parity_lane_masks(h_out, w_out, c8, h_last, w_last)[None]
    c = c8 // 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, c8), 3)
    pz = (lane // (4 * c)) % 2
    zpos = jax.lax.broadcasted_iota(jnp.int32, (d_out, 1, 1, 1), 0)
    return keep & ((zpos > 0) | (pz == 1)) & (
        (zpos < d_out - 1) | (pz == 0))


def _make_finale_head_kernel(neg_slope: float, has_bias: bool):
    """Residual-block finale + segmentation head in one pass: reads the
    conv2 output y2 and the projection shortcut r (both aligned s2d),
    applies both norm affines, the residual add and the activation in f32,
    then the block-diagonal 1x1 head GEMM — the activated block output
    never round-trips HBM and the head never tempts XLA into a W-minor
    layout for the lane-sparse logits."""

    def kernel(*refs):
        y2_ref, r_ref, s2_ref, sh2_ref, sr_ref, shr_ref, wh_ref = refs[:7]
        idx = 7
        if has_bias:
            bh_ref = refs[idx]
            idx += 1
        out_ref = refs[idx]
        t = (y2_ref[0, 0].astype(jnp.float32) * s2_ref[0] + sh2_ref[0]
             + r_ref[0, 0].astype(jnp.float32) * sr_ref[0] + shr_ref[0])
        if neg_slope != 1.0:
            t = jnp.where(t >= 0, t, neg_slope * t)
        out = jax.lax.dot_general(
            t.astype(jnp.bfloat16), wh_ref[0], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bias:
            out = out + bh_ref[0]
        out_ref[0, 0] = out.astype(out_ref.dtype)

    return kernel


def fused_finale_head(y2, r, scale2, shift2, scale_r, shift_r, wh_blk,
                      bias8=None, *, neg_slope: float = 0.01,
                      out_dtype=jnp.bfloat16, interpret: bool = False):
    """act(y2*scale2+shift2 + r*scale_r+shift_r) @ wh_blk (+ bias8), one
    Pallas pass per depth row. y2/r: (B, D2, H2, W2, 8c) aligned s2d;
    scales/shifts: (B, 8c) f32; wh_blk: (8c, 8oc) block-diag head weights;
    bias8: (8oc,) parity-tiled bias. Returns (B, D2, H2, W2, 8oc)."""
    bsz, d2, h2, w2, c8 = y2.shape
    co8 = wh_blk.shape[-1]

    def row(b, z):
        return (b, z, 0, 0, 0)

    def bc(b, z):
        return (b, 0, 0)

    row_spec = pl.BlockSpec((1, 1, h2, w2, c8), row, memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((1, 1, c8), bc, memory_space=pltpu.VMEM)
    in_specs = [row_spec, row_spec, aff_spec, aff_spec, aff_spec, aff_spec,
                pl.BlockSpec((1, c8, co8), lambda b, z: (0, 0, 0),
                             memory_space=pltpu.VMEM)]
    inputs = [y2, r,
              scale2.reshape(bsz, 1, c8).astype(jnp.float32),
              shift2.reshape(bsz, 1, c8).astype(jnp.float32),
              scale_r.reshape(bsz, 1, c8).astype(jnp.float32),
              shift_r.reshape(bsz, 1, c8).astype(jnp.float32),
              wh_blk.reshape(1, c8, co8)]
    if bias8 is not None:
        in_specs.append(pl.BlockSpec((1, 1, co8), bc,
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.broadcast_to(
            bias8.reshape(1, 1, co8), (bsz, 1, co8)).astype(jnp.float32))
    return pl.pallas_call(
        _make_finale_head_kernel(neg_slope, bias8 is not None),
        grid=(bsz, d2),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, h2, w2, co8), row,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d2, h2, w2, co8), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


def _make_dw_kernel(h2: int, w2: int):
    """Weight-gradient kernel: dW_blk[tap] = sum over output blocks of
    (shifted input slab)^T (output cotangent slab) — the exact adjoint of
    the padded-27-tap forward, accumulated across the (batch, depth) grid
    entirely in the s2d layout (the XLA fallback had to de-s2d both
    tensors to f32 dense first)."""

    def kernel(x_m1_ref, x_0_ref, x_p1_ref, g_ref, dw_ref):
        z = pl.program_id(1)
        b = pl.program_id(0)

        @pl.when((z == 0) & (b == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        rows = (x_m1_ref[0, 0], x_0_ref[0, 0], x_p1_ref[0, 0])
        # Mosaic's tpu.matmul needs rank-2 operands (a single contracting
        # dim): flatten (h2, w2, c) -> (h2*w2, c) before each GEMM
        g2 = g_ref[0, 0].reshape(h2 * w2, g_ref.shape[-1])
        tap = 0
        for r in range(3):
            base = rows[r]
            for u in range(3):
                su = base[u:u + h2]
                for v in range(3):
                    sl = su[:, v:v + w2, :].reshape(h2 * w2, su.shape[-1])
                    dw_ref[tap] += jax.lax.dot_general(
                        sl, g2, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    tap += 1

    return kernel


def blocked_conv_s2d_dw(xs: jnp.ndarray, g: jnp.ndarray,
                        interpret: bool) -> jnp.ndarray:
    """dW in blocked form (27, 8cin, 8cout) f32 from aligned-s2d input and
    output-cotangent. Spatial zero-pad on the input mirrors the forward."""
    bsz, d2, h2, w2, c8 = xs.shape
    cout8 = g.shape[-1]
    xp = jnp.pad(xs, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))

    def rowspec(off):
        if off == 0:
            return pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                                lambda b, z: (b, z, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        if off == -1:
            return pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                                lambda b, z: (b, jnp.maximum(z - 1, 0), 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                            lambda b, z: (b, jnp.minimum(z + 1, d2 - 1), 0, 0, 0),
                            memory_space=pltpu.VMEM)

    # depth-boundary correctness: rows z-1 / z+1 are clamped, so zero the
    # contribution by zeroing the INPUT slab at the borders — do it on the
    # XLA side by masking the first/last depth rows into dedicated pads
    xlo = jnp.concatenate(
        [jnp.zeros_like(xp[:, :1]), xp[:, :-1]], axis=1)
    xhi = jnp.concatenate(
        [xp[:, 1:], jnp.zeros_like(xp[:, :1])], axis=1)

    return pl.pallas_call(
        _make_dw_kernel(h2, w2),
        grid=(bsz, d2),
        in_specs=[
            pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                         lambda b, z: (b, z, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                         lambda b, z: (b, z + 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2 + 2, w2 + 2, c8),
                         lambda b, z: (b, z, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2, w2, cout8), lambda b, z: (b, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((27, c8, cout8), lambda b, z: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27, c8, cout8), jnp.float32),
        # the (27, 8cin, 8cout) f32 accumulator is 27M at c=64 — over the
        # 16M default scoped budget (v5e has 128M physical VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xlo, xp, xhi, g)


def unblock_dw(dwblk: jnp.ndarray, cin: int, cout: int) -> jnp.ndarray:
    """(27, 8cin, 8cout) blocked weight-grad -> (3,3,3,cin,cout), the
    adjoint of make_blocked_weights_aligned's tap-table expansion."""
    global _TAP_TABLE27
    if _TAP_TABLE27 is None:
        make_blocked_weights_aligned(jnp.zeros((3, 3, 3, 1, 1)))
    table = jnp.asarray(_TAP_TABLE27, dwblk.dtype)   # (27, 8, 8, 27)
    dwp = dwblk.reshape(27, 8, cin, 8, cout)
    dw27 = jnp.einsum("tpiqo,tpqk->kio", dwp, table)
    return dw27.reshape(3, 3, 3, cin, cout)


def make_blocked_weights_1x1(w: jnp.ndarray) -> jnp.ndarray:
    """(cin, cout) -> (8cin, 8cout) block-diagonal 1x1 blocked weights."""
    cin, cout = w.shape
    wbig = jnp.zeros((8 * cin, 8 * cout), w.dtype)
    for g in range(8):
        wbig = wbig.at[g * cin:(g + 1) * cin, g * cout:(g + 1) * cout].set(w)
    return wbig


def blocked_conv_s2d_aligned(xs: jnp.ndarray, wblk: jnp.ndarray, cin: int,
                             cout8: int, out_dtype, interpret: bool) -> jnp.ndarray:
    """Blocked conv consuming the ALIGNED s2d tensor (B, D2, H2, W2, 8cin)."""
    bsz, d2, h2, w2, c8 = xs.shape

    def clamp_lo(b, z):
        return (b, jnp.maximum(z - 1, 0), 0, 0, 0)

    def clamp_hi(b, z):
        return (b, jnp.minimum(z + 1, d2 - 1), 0, 0, 0)

    return pl.pallas_call(
        _make_aligned_kernel(h2, w2, cin),
        grid=(bsz, d2),
        in_specs=[
            pl.BlockSpec((1, 1, h2, w2, c8), clamp_lo, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2, w2, c8), lambda b, z: (b, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2, w2, c8), clamp_hi, memory_space=pltpu.VMEM),
            pl.BlockSpec((27, c8, cout8), lambda b, z: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h2, w2, cout8),
                               lambda b, z: (b, z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d2, h2, w2, cout8), out_dtype),
        scratch_shapes=[pltpu.VMEM((h2, w2, cout8), jnp.float32)],
        interpret=interpret,
    )(xs, xs, xs, wblk)


def _blocked_conv_s2d(xs: jnp.ndarray, wblk: jnp.ndarray, cout8: int,
                      out_dtype, interpret: bool) -> jnp.ndarray:
    bsz, d2p, h2p, w2p, c8 = xs.shape
    d2, h2, w2 = d2p - 1, h2p - 1, w2p - 1
    return pl.pallas_call(
        _conv_kernel,
        grid=(bsz, d2),
        in_specs=[
            pl.BlockSpec((1, 1, h2p, w2p, c8), lambda b, z: (b, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h2p, w2p, c8), lambda b, z: (b, z + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c8, cout8), lambda b, z: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h2, w2, cout8),
                               lambda b, z: (b, z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d2, h2, w2, cout8), out_dtype),
        scratch_shapes=[pltpu.VMEM((h2, w2, cout8), jnp.float32)],
        interpret=interpret,
    )(xs, xs, wblk)


def _forward(x, w, out_dtype, interpret):
    bsz, d, h, w_dim, cin = x.shape
    cout = w.shape[-1]
    # pad tiny channel counts (e.g. the 2-channel stem) so 8*cin fills lanes
    if cin < 16:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, 16 - cin),))
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, 16 - cin), (0, 0)))
        cin = 16
    wblk = make_blocked_weights(w.astype(jnp.float32)).astype(jnp.bfloat16)
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xs = space_to_depth(xp)
    out_s2d = _blocked_conv_s2d(xs, wblk, 8 * cout, out_dtype, interpret)
    return depth_to_space(out_s2d, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def blocked_conv3x3(x: jnp.ndarray, w: jnp.ndarray, out_dtype=jnp.bfloat16,
                    interpret: bool = False) -> jnp.ndarray:
    """3x3x3 stride-1 'same' conv, NDHWC, via the blocked-GEMM Pallas kernel.

    Differentiable: dx reuses the same kernel with spatially-flipped,
    in/out-transposed weights; dw falls back to XLA's conv weight-grad.
    """
    return _forward(x, w, out_dtype, interpret)


def _fwd(x, w, out_dtype, interpret):
    return _forward(x, w, out_dtype, interpret), (x, w)


def _bwd(out_dtype, interpret, res, g):
    x, w = res
    # dx: correlate g with flipped weights, channels transposed
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _forward(g.astype(jnp.bfloat16), w_flip, jnp.float32, interpret)
    dx = dx[..., : x.shape[-1]].astype(x.dtype)
    # dw: XLA's conv weight-grad (different GEMM shape; XLA handles it fine)
    _, w_vjp = jax.vjp(
        lambda wv: jax.lax.conv_general_dilated(
            x.astype(jnp.float32), wv, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ),
        w.astype(jnp.float32),
    )
    (dw,) = w_vjp(g.astype(jnp.float32))
    return dx, dw.astype(w.dtype)


blocked_conv3x3.defvjp(_fwd, _bwd)


def fast_conv_supported(shape, cin: int, cout: int, kernel_size, stride,
                        taps: int = 27) -> bool:
    """Applicability: k3 s1, even spatial dims, channel counts where the
    blocked GEMM beats XLA's direct conv, VMEM-fitting slabs.

    taps=27: the differentiable padded-27-tap form (training path, default
    16M scoped VMEM). taps=8: the eval-only half-offset pair, which runs
    with a raised VMEM limit and much smaller weights — wider channel
    range (e.g. the 64->128 level-4 encoder qualifies)."""
    if tuple(kernel_size) != (3, 3, 3) or tuple(stride) != (1, 1, 1):
        return False
    d, h, w = shape
    if d % 2 or h % 2 or w % 2 or min(d, h, w) < 8:
        return False
    cmax = 128 if taps == 8 else 64
    if cin > cmax or cout > cmax or cout < 8:
        return False

    def pad_to(v, m):
        return (v + m - 1) // m * m

    cin_eff = max(cin, 2)
    h2, w2 = h // 2, w // 2
    if taps == 8:
        # fused8 geometry: 2 double-buffered padded slabs, offset-blocked
        # output (+1 block, W sublane-padded), f32 accumulator, 8-tap
        # weights — against the raised (100M) scoped-VMEM budget
        w_out = pad_to(w2 + 1, 8)
        w_in = pad_to(w_out + 1, 8)
        slab = (h2 + 2) * w_in * pad_to(8 * cin_eff, 128) * 2
        out_b = (h2 + 1) * w_out * pad_to(8 * cout, 128) * 2
        acc = (h2 + 1) * w_out * pad_to(8 * cout, 128) * 4
        wbytes = 8 * pad_to(8 * cin_eff, 128) * 8 * cout * 2
        return 4 * slab + 2 * out_b + 2 * acc + wbytes < 80 * 1024 * 1024
    # VMEM estimate for the padded-27-tap kernel with Mosaic (8,128) tiling:
    # 3 double-buffered input slabs, double-buffered output, f32 accumulator,
    # 27-tap weights — against the 16M scoped budget with headroom
    slab = (h2 + 2) * pad_to(w2 + 2, 8) * pad_to(8 * cin_eff, 128) * 2
    out_b = h2 * pad_to(w2, 8) * pad_to(8 * cout, 128) * 2
    acc = h2 * pad_to(w2, 8) * pad_to(8 * cout, 128) * 4
    wbytes = 27 * pad_to(8 * cin_eff, 128) * 8 * cout * 2
    return 6 * slab + 2 * out_b + acc + wbytes < 15 * 1024 * 1024


def reference_conv3x3(x, w, b=None):
    """lax direct conv (parity oracle and fallback)."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        out = out + b
    return out
