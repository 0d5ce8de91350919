"""Space-to-depth-resident ops for the lane-padding-bound U-Net levels.

On TPU, any channels-last tensor with C < 128 is physically padded to 128
lanes in HBM (T(8,128) tiling) — a (B,128^3,16) activation occupies ~1 GB
and every elementwise pass moves all of it. The top U-Net levels are
therefore HBM-bound on padding, not compute (profiled: enc1+dec1 = ~39 ms
of a 58 ms MS_DSA_NET forward). These ops keep whole residual blocks
resident in the s2d layout (B, D/2, H/2, W/2, 8C) — lane-dense for
C >= 16 — so convs run on the blocked-GEMM Pallas kernel and every
norm/act/residual pass moves 8x fewer bytes.

Layout convention: parity-major channel groups, group g = 4*pz + 2*py + px
holding the original channels of the voxel at intra-block parity
(pz, py, px) (same as kernels.block_conv.space_to_depth).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fcd_tpu import flags as _fcd_flags
from fcd_tpu.kernels.block_conv import (
    _blocked_conv_s2d,
    depth_to_space,
    make_blocked_weights,
    space_to_depth,
)


def to_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """Model-path space_to_depth. Slice+lane-concat form by default
    (bit-identical; see kernels.block_conv.space_to_depth_fast — the 8-D
    transpose form lowers as T(2,128) copies on feature-map-sized
    tensors, e.g. the eval enc2 entry's 1.05 ms/volume copy.651)."""
    if _fcd_flags.get("FCD_ENTRY_SLICE") != "0" and x.shape[3] % 2 == 0:
        b, d, h, w, c = x.shape
        xp = x.reshape(b, d, h, w // 2, 2 * c)
        return jnp.concatenate(
            [xp[:, 0::2, 0::2], xp[:, 0::2, 1::2],
             xp[:, 1::2, 0::2], xp[:, 1::2, 1::2]],
            axis=-1)
    return space_to_depth(x)


def from_s2d(xs: jnp.ndarray, c: int) -> jnp.ndarray:
    return depth_to_space(xs, c)


def reinterleave_to_padded(xs: jnp.ndarray, c: int) -> jnp.ndarray:
    """Aligned s2d -> s2d of the zero-padded (by 1 voxel) volume.

    For output group g' with parity bits b', the source is the complement
    group, spatially shifted back by (1 - b') blocks. Pure slice+pad+concat
    at lane-dense layouts.
    """
    b, d2, h2, w2, c8 = xs.shape
    parts = []
    for g_out in range(8):
        bz, by, bx = (g_out >> 2) & 1, (g_out >> 1) & 1, g_out & 1
        g_src = (4 * (1 - bz) + 2 * (1 - by) + (1 - bx))
        src = xs[..., g_src * c:(g_src + 1) * c]
        pad = [(0, 0)]
        for bit in (bz, by, bx):
            pad.append((1, 0) if bit == 0 else (0, 1))
        pad.append((0, 0))
        parts.append(jnp.pad(src, pad))
    return jnp.concatenate(parts, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_s2d(xs: jnp.ndarray, w: jnp.ndarray, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """3x3x3 'same' conv on an aligned-s2d tensor: reinterleave + blocked-GEMM
    Pallas kernel. Output is aligned s2d of the conv output (8*cout channels).
    w: (3, 3, 3, cin, cout)."""
    return _conv3x3_s2d_fwd_impl(xs, w, out_dtype)


def _lane_narrow_ok() -> bool:
    """Whether the fused8 kernels accept sub-128-lane (c<16) operands
    directly: the in-VMEM halo form does (verified on v5e, 1-ulp
    accumulation diff vs the lane-padded form); the XLA-padded-halo and
    W-paired forms hit the Mosaic odd-slab-cast rejection and need the
    HBM lane pad."""
    from fcd_tpu.kernels.block_conv import _a2o_vmem_halo, _conv8_paired

    return _a2o_vmem_halo() and not _conv8_paired()


def _conv_form() -> str:
    """Which blocked-conv formulation conv3x3_s2d uses (FCD_S2D_CONV):

    'padded27' (default): XLA spatial zero-pad of the aligned s2d tensor
    (no lane manipulation) + 27-tap kernel whose shifts are static slices
    fused into the matmul operands. No VPU shift work.
    'aligned': 27-tap roll+mask kernel on the unpadded tensor (VPU-bound
    shift construction; the round-1 form).
    '8tap': reinterleave (lane-granular slice+pad+concat — slow in XLA)
    feeding the 8-tap kernel; 2.37x FLOP redundancy but loses to the
    reinterleave cost. Kept for A/B reference.
    """
    import os

    return _fcd_flags.get("FCD_S2D_CONV")


def _conv3x3_s2d_fwd_impl(xs, w, out_dtype):
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_s2d_aligned,
        blocked_conv_s2d_padded27,
        make_blocked_weights_aligned,
    )

    cin, cout = w.shape[3], w.shape[4]
    interpret = jax.default_backend() != "tpu"   # CPU tests run interpreted
    form = _conv_form()
    if form == "8tap":
        wblk = make_blocked_weights(w.astype(jnp.float32)).astype(jnp.bfloat16)
        xp = reinterleave_to_padded(xs.astype(jnp.bfloat16), cin)
        return _blocked_conv_s2d(xp, wblk, 8 * cout, out_dtype, interpret)
    wblk = make_blocked_weights_aligned(w.astype(jnp.float32)).astype(jnp.bfloat16)
    if form == "padded27":
        return blocked_conv_s2d_padded27(xs.astype(jnp.bfloat16), wblk, cin,
                                         8 * cout, out_dtype, interpret)
    return blocked_conv_s2d_aligned(xs.astype(jnp.bfloat16), wblk, cin,
                                    8 * cout, out_dtype, interpret)


def _conv3x3_s2d_fwd(xs, w, out_dtype):
    return _conv3x3_s2d_fwd_impl(xs, w, out_dtype), (xs, w)


def _conv3x3_s2d_bwd(out_dtype, res, g):
    xs, w = res
    cin, cout = w.shape[3], w.shape[4]
    # dx: conv of g with spatially-flipped, channel-transposed weights
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dxs = _conv3x3_s2d_fwd_impl(g, w_flip, jnp.float32).astype(xs.dtype)
    # dw: blocked weight-grad kernel, fully s2d-resident (the earlier XLA
    # fallback de-s2d'd both tensors to f32 dense — ~10x the HBM traffic)
    from fcd_tpu.kernels.block_conv import blocked_conv_s2d_dw, unblock_dw

    interpret = jax.default_backend() != "tpu"
    dwblk = blocked_conv_s2d_dw(xs.astype(jnp.bfloat16),
                                g.astype(jnp.bfloat16), interpret)
    dw = unblock_dw(dwblk, cin, cout)
    return dxs, dw.astype(w.dtype)


conv3x3_s2d.defvjp(_conv3x3_s2d_fwd, _conv3x3_s2d_bwd)


def conv1x1_s2d(xs: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """1x1x1 conv in s2d: one dense matmul with a block-diagonal (per-group)
    weight. w: (cin, cout) or (1,1,1,cin,cout)."""
    if w.ndim == 5:
        w = w[0, 0, 0]
    cin, cout = w.shape
    wbig = jnp.zeros((8 * cin, 8 * cout), w.dtype)
    for g in range(8):
        wbig = wbig.at[g * cin:(g + 1) * cin, g * cout:(g + 1) * cout].set(w)
    return jnp.einsum("bdhwk,kc->bdhwc", xs, wbig.astype(xs.dtype),
                      preferred_element_type=jnp.float32).astype(xs.dtype)


def instance_norm_s2d(xs: jnp.ndarray, c: int, eps: float = 1e-5,
                      stats=None) -> jnp.ndarray:
    """Instance norm over (spatial x parity groups) per true channel, without
    materializing any lane-sparse intermediate: spatial sums give (B, 8c)
    which is tiny to regroup. With `stats=(s1, s2)` — per-lane sums the
    producing conv kernel accumulated (conv8_*_stats) — the two reduction
    passes are skipped entirely."""
    b = xs.shape[0]
    n = xs.shape[1] * xs.shape[2] * xs.shape[3] * 8
    xf = xs.astype(jnp.float32)
    if stats is None:
        s1 = jnp.sum(xf, axis=(1, 2, 3))               # (B, 8c)
        s2 = jnp.sum(jnp.square(xf), axis=(1, 2, 3))
    else:
        s1, s2 = (s.astype(jnp.float32) for s in stats)
    s1 = s1.reshape(b, 8, c).sum(axis=1)               # (B, c)
    s2 = s2.reshape(b, 8, c).sum(axis=1)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)                   # (B, c)
    shift = -mean * scale
    scale8 = jnp.tile(scale, (1, 8))[:, None, None, None, :]
    shift8 = jnp.tile(shift, (1, 8))[:, None, None, None, :]
    return (xf * scale8 + shift8).astype(xs.dtype)


def leaky_relu_s2d(xs: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jax.nn.leaky_relu(xs, negative_slope=negative_slope)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_2x_s2d_exit(xs: jnp.ndarray, c: int) -> jnp.ndarray:
    """2x max pool consuming an s2d tensor: max over the 8 parity groups ->
    the pooled volume at the s2d grid resolution, dense exit for the next
    (half-resolution) level. Returns (B, D/2, H/2, W/2, C).

    Written as a max chain over static LANE slices, not reshape+reduce:
    the (.., 8, c) reshape makes XLA relayout the whole tensor to reduce
    across what were lane sub-groups (profiled ~3 ms/volume in copies +
    reduce at level 1); slice-max fuses into one lane-dense read pass.

    Custom VJP: jnp.max's generic backward materialized eight lane-sparse
    select/divide fusions (~24 ms/step at batch 4x128^3); one fused
    expression emits all 128 grad lanes with jnp.max-identical tie
    semantics (even split among equal maxima)."""
    return _pool_max(xs, c)


def _pool_max(xs, c):
    import os

    if (jax.default_backend() == "tpu"
            and _fcd_flags.get("FCD_POOL_FWD_KERNEL") != "0"):
        from fcd_tpu.kernels.pool import pool_fwd_pallas, pool_fwd_supported

        if pool_fwd_supported(xs.shape[2], xs.shape[3], c):
            return pool_fwd_pallas(xs, c)
    m = xs[..., :c]
    for g in range(1, 8):
        m = jnp.maximum(m, xs[..., g * c:(g + 1) * c])
    return m


def _pool_fwd(xs, c):
    m = _pool_max(xs, c)
    return m, (xs, m)


def _pool_bwd(c, res, g):
    xs, m = res
    import os

    if (jax.default_backend() == "tpu"
            and _fcd_flags.get("FCD_POOL_BWD_KERNEL") != "0"):
        from fcd_tpu.kernels.pool import pool_bwd_pallas, pool_bwd_supported

        if pool_bwd_supported(xs.shape[2], xs.shape[3], c):
            return (pool_bwd_pallas(xs, m, g, c),)
    eqs = [xs[..., i * c:(i + 1) * c] == m for i in range(8)]
    cnt = sum(e.astype(jnp.float32) for e in eqs)
    scale = g.astype(jnp.float32) / cnt
    dx = jnp.concatenate(
        [jnp.where(e, scale, 0.0) for e in eqs], axis=-1)
    return (dx.astype(xs.dtype),)


max_pool_2x_s2d_exit.defvjp(_pool_fwd, _pool_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_2x_s2d_exit_pad(xsp: jnp.ndarray, c: int) -> jnp.ndarray:
    """max_pool_2x_s2d_exit on a PADDED-chain input (B, D2+2, ...): the
    Pallas kernels read/write the interior rows via their index maps, so
    neither the producer-side depth pad nor the cotangent's padded shape
    costs a standalone pass. Differentiable (VJP mirrors
    max_pool_2x_s2d_exit; the dx edge rows are exact zeros)."""
    return _pool_pad_impl(xsp, c)


def _pool_pad_impl(xsp, c):
    if (jax.default_backend() == "tpu"
            and _fcd_flags.get("FCD_POOL_FWD_KERNEL") != "0"):
        from fcd_tpu.kernels.pool import pool_fwd_pallas, pool_fwd_supported

        if pool_fwd_supported(xsp.shape[2], xsp.shape[3], c):
            return pool_fwd_pallas(xsp, c, interior=True)
    return _pool_max(xsp[:, 1:-1], c)


def _pool_pad_fwd(xsp, c):
    m = _pool_pad_impl(xsp, c)
    return m, (xsp, m)


def _pool_pad_bwd(c, res, g):
    xsp, m = res
    if (jax.default_backend() == "tpu"
            and _fcd_flags.get("FCD_POOL_BWD_KERNEL") != "0"):
        from fcd_tpu.kernels.pool import pool_bwd_pallas, pool_bwd_supported

        if pool_bwd_supported(xsp.shape[2], xsp.shape[3], c):
            dx = pool_bwd_pallas(xsp, m, g, c, interior=True)
            # the kernel never writes the edge rows: zero them in place
            zrow = jnp.zeros((xsp.shape[0], 1) + xsp.shape[2:], xsp.dtype)
            dx = jax.lax.dynamic_update_slice(dx, zrow, (0, 0, 0, 0, 0))
            dx = jax.lax.dynamic_update_slice(
                dx, zrow, (0, dx.shape[1] - 1, 0, 0, 0))
            return (dx,)
    dxi = _pool_bwd(c, (xsp[:, 1:-1], m), g)[0]
    return (jnp.pad(dxi, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0))),)


max_pool_2x_s2d_exit_pad.defvjp(_pool_pad_fwd, _pool_pad_bwd)


def max_pool_2x_s2d_to_s2d(xs: jnp.ndarray, c: int) -> jnp.ndarray:
    """2x max pool from one level's s2d tensor straight to the NEXT level's
    s2d tensor: max over the fine-grid parity lanes, regrouping the coarse
    2x2x2 blocks into the new parity lanes in the same pass.

    Measured SLOWER than max_pool_2x_s2d_exit + the next block's to_s2d on
    v5e (bench 8.00 -> 6.82 vol/s): the spatial-dims-into-lanes transpose
    XLA emits here costs more than the 8x tile-padded pass it saves. Kept
    for shapes where a cheaper lowering exists; not used by the models.
    (B, D2, H2, W2, 8c) -> (B, D2/2, H2/2, W2/2, 8c)."""
    b, d2, h2, w2, c8 = xs.shape
    v = xs.reshape(b, d2 // 2, 2, h2 // 2, 2, w2 // 2, 2, 8, c)
    m = jnp.max(v, axis=7)                      # old parity lanes
    m = m.transpose(0, 1, 3, 5, 2, 4, 6, 7)     # new parity into lanes
    return m.reshape(b, d2 // 2, h2 // 2, w2 // 2, 8 * c)


def upsample2x_into_s2d(x: jnp.ndarray, w: jnp.ndarray,
                        b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Transposed conv k2 s2 emitting directly into s2d layout: every output
    2x2x2 block depends on exactly one input voxel, so the whole op is one
    matmul [.., cin] x [cin, 8*cout] — no spatial rearrangement at all.
    w: (2, 2, 2, cin, cout) (DHWIO with flax ConvTranspose orientation)."""
    cin, cout = w.shape[3], w.shape[4]
    # lax.conv_transpose flips the kernel: output sub-voxel (qz,qy,qx)
    # uses tap (1-qz, 1-qy, 1-qx)
    wf = jnp.flip(w, axis=(0, 1, 2))
    wm = wf.reshape(8, cin, cout).transpose(1, 0, 2).reshape(cin, 8 * cout)
    out = jnp.einsum("bdhwc,ck->bdhwk", x, wm.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + jnp.tile(b, 8).astype(out.dtype)
    return out


def _interp() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv8_a2o(xs_tuple, w_tuple, out_dtype=jnp.bfloat16, pre_padded=None):
    """Differentiable half-offset conv, aligned -> offset: convolves each
    aligned-s2d part with its (3,3,3,ci,co) kernel and sums (the
    never-materialized-concat form), emitting the OFFSET-grid tensor at
    64/27 = 2.37x FLOP redundancy (the padded-27 training form pays 8x).
    VJP: dx per part is the o2a pass with flipped/transposed weights (the
    conv adjoint on the half-offset lattice pair); dw via the 8-tap
    blocked weight-grad kernel.

    pre_padded (tuple of bools per part): padded-chain parts carry the
    (+1, +1) zero depth pad from their PRODUCER — the forward consumes
    them directly, the dw kernel reuses the same padded tensor, and the
    returned dx matches the padded shape (zero edge rows — exact in
    composition with a jnp.pad producer, whose VJP slices them off)."""
    return _conv8_a2o_impl(xs_tuple, w_tuple, out_dtype, pre_padded)


def _conv8_a2o_impl(xs_tuple, w_tuple, out_dtype, pre_padded=None):
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_a2o_multi,
        make_blocked_weights_8tap,
    )

    wblks = [make_blocked_weights_8tap(w.astype(jnp.float32)).astype(jnp.bfloat16)
             for w in w_tuple]
    outs = blocked_conv_a2o_multi(
        [x.astype(jnp.bfloat16) for x in xs_tuple], wblks,
        want_stats=False, out_dtype=out_dtype, interpret=_interp(),
        pre_padded=list(pre_padded) if pre_padded else None)
    return outs[0]


def _conv8_a2o_fwd(xs_tuple, w_tuple, out_dtype, pre_padded):
    return (_conv8_a2o_impl(xs_tuple, w_tuple, out_dtype, pre_padded),
            (xs_tuple, w_tuple))


def _conv8_a2o_bwd(out_dtype, pre_padded, res, g):
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_a2o_dw,
        blocked_conv_o2a,
        make_blocked_weights_8tap,
        offset_keep_mask,
        unblock_dw8,
    )

    if pre_padded is None:
        pre_padded = (False,) * len(res[0])
    xs_tuple, w_tuple = res
    d_out, h_out, w_out = g.shape[1], g.shape[2], g.shape[3]
    h2, w2 = xs_tuple[0].shape[2], xs_tuple[0].shape[3]
    keep = offset_keep_mask(d_out, h_out, w_out, g.shape[-1], h2, w2)
    gm = jnp.where(keep, g.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
    dxs, dws = [], []
    for x, w, pre in zip(xs_tuple, w_tuple, pre_padded):
        wadj = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
        wab = make_blocked_weights_8tap(
            wadj.astype(jnp.float32)).astype(jnp.bfloat16)
        # emit dx in the cotangent dtype directly: the kernel accumulates
        # in f32 and rounds on store, identical to storing f32 and casting
        # (which paid a doubled write + a separate cast pass, ~2 ms/step)
        dx = blocked_conv_o2a(gm, wab, w2, want_stats=False,
                              out_dtype=x.dtype,
                              interpret=_interp())[0]
        if pre:
            # padded-chain part: its cotangent matches the padded shape;
            # the edge rows' values are discarded by the producer pad's
            # VJP (a slice), so exact zeros are correct in composition
            dx = jnp.pad(dx, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        dxs.append(dx)
        dwblk = blocked_conv_a2o_dw(x.astype(jnp.bfloat16), gm, _interp(),
                                    pre_padded=pre)
        dws.append(unblock_dw8(dwblk, w.shape[3], w.shape[4]).astype(w.dtype))
    return tuple(dxs), tuple(dws)


conv8_a2o.defvjp(_conv8_a2o_fwd, _conv8_a2o_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv8_a2o_stats(xs_tuple, w_tuple, out_dtype=jnp.bfloat16,
                    pre_padded=None):
    """conv8_a2o that also returns the kernel-accumulated per-lane output
    sums (s1, s2) — the instance-norm statistics — so the norm's two
    full-tensor reduction passes never run in XLA (~2 ms/step at batch
    4x128^3). Pad slots are exact zeros, so the sums are exact.
    Returns (y, s1, s2) with s1/s2 f32 (B, 8*cout)."""
    return _conv8_a2o_stats_impl(xs_tuple, w_tuple, out_dtype, pre_padded)


def _conv8_a2o_stats_impl(xs_tuple, w_tuple, out_dtype, pre_padded=None):
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_a2o_multi,
        make_blocked_weights_8tap,
    )

    wblks = [make_blocked_weights_8tap(w.astype(jnp.float32)).astype(jnp.bfloat16)
             for w in w_tuple]
    y, s1, s2 = blocked_conv_a2o_multi(
        [x.astype(jnp.bfloat16) for x in xs_tuple], wblks,
        want_stats=True, out_dtype=out_dtype, interpret=_interp(),
        pre_padded=list(pre_padded) if pre_padded else None)
    return y, s1[:, 0], s2[:, 0]          # (B, 1, 8c) -> (B, 8c)


def _conv8_a2o_stats_fwd(xs_tuple, w_tuple, out_dtype, pre_padded):
    out = _conv8_a2o_stats_impl(xs_tuple, w_tuple, out_dtype, pre_padded)
    return out, (xs_tuple, w_tuple, out[0])


def _stats_cotangent(gy, gs1, gs2, y):
    """Fold the sums' cotangents into the output cotangent:
    s1 = sum(y), s2 = sum(y^2) => dy += gs1 + 2*y*gs2 (broadcast over
    spatial dims). One elementwise pass, fused by XLA into the adjoint
    chain — the same ops its autodiff emitted for the explicit sums."""
    g = gy.astype(jnp.float32)
    if gs1 is not None:
        g = g + gs1.astype(jnp.float32)[:, None, None, None, :]
    if gs2 is not None:
        g = g + 2.0 * y.astype(jnp.float32) * (
            gs2.astype(jnp.float32)[:, None, None, None, :])
    return g


def _conv8_a2o_stats_bwd(out_dtype, pre_padded, res, g):
    xs_tuple, w_tuple, y = res
    gy, gs1, gs2 = g
    return _conv8_a2o_bwd(out_dtype, pre_padded, (xs_tuple, w_tuple),
                          _stats_cotangent(gy, gs1, gs2, y))


conv8_a2o_stats.defvjp(_conv8_a2o_stats_fwd, _conv8_a2o_stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv8_o2a(ys, w, aligned_w: int, out_dtype=jnp.bfloat16):
    """Differentiable half-offset conv, offset -> aligned (the second conv
    of the pair). ys must carry exact-zero pad slots (the offset norm/act
    re-masks them). VJP mirrors conv8_a2o."""
    return _conv8_o2a_impl(ys, w, aligned_w, out_dtype)


def _conv8_o2a_impl(ys, w, aligned_w, out_dtype):
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_o2a,
        make_blocked_weights_8tap,
    )

    wblk = make_blocked_weights_8tap(
        w.astype(jnp.float32)).astype(jnp.bfloat16)
    return blocked_conv_o2a(ys.astype(jnp.bfloat16), wblk, aligned_w,
                            want_stats=False, out_dtype=out_dtype,
                            interpret=_interp())[0]


def _conv8_o2a_fwd(ys, w, aligned_w, out_dtype):
    return _conv8_o2a_impl(ys, w, aligned_w, out_dtype), (ys, w)


def _conv8_o2a_bwd(aligned_w, out_dtype, res, g):
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_a2o,
        blocked_conv_o2a_dw,
        make_blocked_weights_8tap,
        unblock_dw8,
    )

    ys, w = res
    wadj = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    wab = make_blocked_weights_8tap(
        wadj.astype(jnp.float32)).astype(jnp.bfloat16)
    # ONE padded cotangent serves both consumers: the pad fuses into the
    # cast (elementwise producer), the adjoint conv consumes it directly
    # (pre_padded) and the dw kernel reads its interior via index offset
    gb = jnp.pad(g.astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    dy = blocked_conv_a2o(gb, wab, want_stats=False, out_dtype=ys.dtype,
                          interpret=_interp(), pre_padded=True)[0]
    dwblk = blocked_conv_o2a_dw(ys.astype(jnp.bfloat16), gb, aligned_w,
                                _interp(), g_pre_padded=True)
    dw = unblock_dw8(dwblk, w.shape[3], w.shape[4])
    return dy.astype(ys.dtype), dw.astype(w.dtype)


conv8_o2a.defvjp(_conv8_o2a_fwd, _conv8_o2a_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv8_o2a_stats(ys, w, aligned_w: int, out_dtype=jnp.bfloat16):
    """conv8_o2a that also returns the kernel-accumulated per-lane output
    sums (s1, s2) for the following instance norm (see conv8_a2o_stats)."""
    return _conv8_o2a_stats_impl(ys, w, aligned_w, out_dtype)


def _conv8_o2a_stats_impl(ys, w, aligned_w, out_dtype):
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_o2a,
        make_blocked_weights_8tap,
    )

    wblk = make_blocked_weights_8tap(
        w.astype(jnp.float32)).astype(jnp.bfloat16)
    y, s1, s2 = blocked_conv_o2a(ys.astype(jnp.bfloat16), wblk, aligned_w,
                                 want_stats=True, out_dtype=out_dtype,
                                 interpret=_interp())
    return y, s1[:, 0], s2[:, 0]          # (B, 1, 8c) -> (B, 8c)


def _conv8_o2a_stats_fwd(ys, w, aligned_w, out_dtype):
    out = _conv8_o2a_stats_impl(ys, w, aligned_w, out_dtype)
    return out, (ys, w, out[0])


def _conv8_o2a_stats_bwd(aligned_w, out_dtype, res, g):
    ys, w, y = res
    gy, gs1, gs2 = g
    return _conv8_o2a_bwd(aligned_w, out_dtype, (ys, w),
                          _stats_cotangent(gy, gs1, gs2, y))


conv8_o2a_stats.defvjp(_conv8_o2a_stats_fwd, _conv8_o2a_stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def conv8_o2a_act_stats(y1o, s1, s2, w, aligned_w: int, slope: float,
                        out_dtype=jnp.bfloat16):
    """conv2 of the training pair with norm1 + leaky-relu FUSED into its
    VMEM prologue (the eval path's formulation, now differentiable): the
    instance-norm affine is computed from the conv1 kernel's accumulated
    sums (s1, s2) and applied inside the o2a kernel, so the offset
    tensor's standalone norm/act/mask pass (a full f32 read+write of the
    (B, d2+1, h2+1, w2p, 8c) tensor, ~4 ms/step/level at batch 4x128^3)
    never runs in XLA.

    Backward: the prologue output `a` and the act mask are recomputed
    from (y1o, s1, s2) inside the adjoint chain — the same elementwise
    work the composed path's autodiff emitted — and the affine's
    cotangent chains to (s1, s2) through jax.vjp of the tiny
    sums->affine function. Returns (y, os1, os2) like conv8_o2a_stats."""
    return _conv8_o2a_act_impl(y1o, s1, s2, w, aligned_w, slope,
                               out_dtype)[0]


def _o2a_act_dims(y1o, aligned_w):
    d2, h2 = y1o.shape[1] - 1, y1o.shape[2] - 1
    return d2, h2, int(aligned_w)


def _conv8_o2a_act_impl(y1o, s1, s2, w, aligned_w, slope, out_dtype):
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_o2a,
        make_blocked_weights_8tap,
    )

    c = w.shape[3]
    d2, h2, w2 = _o2a_act_dims(y1o, aligned_w)
    n_true = d2 * h2 * w2 * 8
    scale, shift = _inorm_affine_from_sums(
        s1.astype(jnp.float32), s2.astype(jnp.float32), c, n_true)
    wblk = make_blocked_weights_8tap(
        w.astype(jnp.float32)).astype(jnp.bfloat16)
    y, os1, os2 = blocked_conv_o2a(
        y1o.astype(jnp.bfloat16), wblk, aligned_w,
        in_scale=scale, in_shift=shift, neg_slope=slope,
        want_stats=True, out_dtype=out_dtype, interpret=_interp())
    return (y, os1[:, 0], os2[:, 0]), (scale, shift)


def _conv8_o2a_act_fwd(y1o, s1, s2, w, aligned_w, slope, out_dtype):
    out, (scale, shift) = _conv8_o2a_act_impl(
        y1o, s1, s2, w, aligned_w, slope, out_dtype)
    return out, (y1o, s1, s2, w, out[0], scale, shift)


def _conv8_o2a_act_bwd(aligned_w, slope, out_dtype, res, g):
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_a2o,
        blocked_conv_o2a_dw,
        make_blocked_weights_8tap,
        offset_keep_mask,
        unblock_dw8,
    )

    y1o, s1, s2, w, y, scale, shift = res
    gy, gs1, gs2 = g
    c = w.shape[3]
    d2, h2, w2 = _o2a_act_dims(y1o, aligned_w)
    n_true = d2 * h2 * w2 * 8

    # ONE padded cotangent for the adjoint conv and the dw kernel (the
    # pad fuses into the _stats_cotangent elementwise chain)
    gb = jnp.pad(_stats_cotangent(gy, gs1, gs2, y).astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    # adjoint conv back onto the offset grid (cotangent w.r.t. `a`)
    wadj = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    wab = make_blocked_weights_8tap(
        wadj.astype(jnp.float32)).astype(jnp.bfloat16)
    da = blocked_conv_a2o(gb, wab, want_stats=False, out_dtype=jnp.bfloat16,
                          interpret=_interp(), pre_padded=True)[0]

    # the dw kernel recomputes the prologue (affine + act + mask) in its
    # own VMEM — the activated tensor never materializes in HBM
    dwblk = blocked_conv_o2a_dw(y1o.astype(jnp.bfloat16), gb, aligned_w,
                                _interp(), g_pre_padded=True,
                                in_scale=scale, in_shift=shift,
                                neg_slope=slope)
    dw = unblock_dw8(dwblk, c, w.shape[4]).astype(w.dtype)

    # prologue backward (one fused elementwise pass + two reductions)
    keep = offset_keep_mask(y1o.shape[1], y1o.shape[2], y1o.shape[3],
                            y1o.shape[4], h2, w2)[None]
    yf = y1o.astype(jnp.float32)
    t = yf * scale[:, None, None, None, :] + shift[:, None, None, None, :]
    dt = (da.astype(jnp.float32)
          * jnp.where(t >= 0, 1.0, slope)
          * keep.astype(jnp.float32))
    d_y1o = (dt * scale[:, None, None, None, :]).astype(y1o.dtype)
    d_scale = jnp.sum(dt * yf, axis=(1, 2, 3))
    d_shift = jnp.sum(dt, axis=(1, 2, 3))

    def _affine(s1_, s2_):
        return _inorm_affine_from_sums(s1_, s2_, c, n_true)

    _, aff_vjp = jax.vjp(_affine, s1.astype(jnp.float32),
                         s2.astype(jnp.float32))
    ds1, ds2 = aff_vjp((d_scale, d_shift))
    return d_y1o, ds1.astype(s1.dtype), ds2.astype(s2.dtype), dw


conv8_o2a_act_stats.defvjp(_conv8_o2a_act_fwd, _conv8_o2a_act_bwd)


def instance_norm_act_offset(ys: jnp.ndarray, c: int, n_true: int,
                             neg_slope: float, h_last: int, w_last: int,
                             eps: float = 1e-5, stats=None) -> jnp.ndarray:
    """Instance norm + leaky-relu on an OFFSET-grid tensor, re-zeroing the
    pad slots the affine shift would otherwise corrupt (pad slots are
    exact zeros, so the sums need no masking; n_true = real voxel count =
    d2*h2*w2*8 of the aligned grid). Differentiable (XLA ops only; the
    where() VJP zeroes pad-slot cotangents, which the conv8 VJPs rely
    on). With `stats=(s1, s2)` the kernel-accumulated sums are used and
    the reduction passes are skipped (see instance_norm_s2d)."""
    from fcd_tpu.kernels.block_conv import offset_keep_mask

    b = ys.shape[0]
    yf = ys.astype(jnp.float32)
    if stats is None:
        s1 = jnp.sum(yf, axis=(1, 2, 3))
        s2 = jnp.sum(jnp.square(yf), axis=(1, 2, 3))
    else:
        s1, s2 = (s.astype(jnp.float32) for s in stats)
    scale, shift = _inorm_affine_from_sums(s1, s2, c, n_true, eps)
    t = yf * scale[:, None, None, None, :] + shift[:, None, None, None, :]
    t = jnp.where(t >= 0, t, neg_slope * t)
    keep = offset_keep_mask(ys.shape[1], ys.shape[2], ys.shape[3],
                            ys.shape[4], h_last, w_last)
    return jnp.where(keep[None], t, 0.0).astype(ys.dtype)


def _finale_train_use_pallas(h2: int, w2: int, c: int) -> bool:
    from fcd_tpu.kernels.finale import finale_train_supported

    return (_fcd_flags.get("FCD_FINALE_TRAIN") != "0"
            and finale_train_supported(h2, w2, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def finale_s2d_train(ys, rs, scale2, shift2, scale_r, shift_r,
                     c: int, slope: float, emit_pad: bool, emit_pool: bool):
    """Differentiable fused resblock finale (train path):
    out = leaky_relu(ys*scale2+shift2 + rs*scale_r+shift_r), emitted with
    an optional (+1, +1) zero depth pad and an optional fused parity-lane
    2x max pool — ONE Pallas pass each way instead of XLA's ~5 full-tensor
    fusions per direction at the level-1/2 train shapes (FCD_FINALE_TRAIN;
    kernels/finale.py has the math and the profile evidence).

    ys: conv2's s2d output (B, d2, h2, w2, 8c); rs: the RAW (pre-norm)
    residual; affines (B, 8c) — from _inorm_affine_from_sums, so their
    cotangents chain to the producing sums in XLA (tiny ops). The affine
    is applied in f32 and rounded ONCE (the composed path rounds each
    normed operand before the add — same-ulp class as the other gated
    formulation pairs, parity-tested with bf16 tolerances).
    Returns (out,) or (out, pooled)."""
    return _finale_train_impl(ys, rs, scale2, shift2, scale_r, shift_r,
                              c, slope, emit_pad, emit_pool)


def _finale_train_impl(ys, rs, scale2, shift2, scale_r, shift_r,
                       c, slope, emit_pad, emit_pool):
    out_dtype = jnp.promote_types(ys.dtype, rs.dtype)
    if _finale_train_use_pallas(ys.shape[2], ys.shape[3], c):
        from fcd_tpu.kernels.finale import finale_fwd_pallas

        return finale_fwd_pallas(
            ys, rs, scale2, shift2, scale_r, shift_r, c, slope,
            emit_pad=emit_pad, emit_pool=emit_pool, out_dtype=out_dtype,
            interpret=_interp())
    bc = (slice(None), None, None, None, slice(None))
    # same association order as the kernel: (ys*s2+sh2) + (rs*sr+shr)
    t = ((ys.astype(jnp.float32) * scale2.astype(jnp.float32)[bc]
          + shift2.astype(jnp.float32)[bc])
         + (rs.astype(jnp.float32) * scale_r.astype(jnp.float32)[bc]
            + shift_r.astype(jnp.float32)[bc]))
    out = jnp.where(t >= 0, t, slope * t).astype(out_dtype)
    res = (jnp.pad(out, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
           if emit_pad else out)
    if emit_pool:
        return res, _pool_max(out, c)
    return (res,)


def _finale_train_fwd(ys, rs, scale2, shift2, scale_r, shift_r,
                      c, slope, emit_pad, emit_pool):
    out = _finale_train_impl(ys, rs, scale2, shift2, scale_r, shift_r,
                             c, slope, emit_pad, emit_pool)
    return out, (ys, rs, scale2, shift2, scale_r, shift_r)


def _finale_train_bwd(c, slope, emit_pad, emit_pool, resids, g):
    ys, rs, scale2, shift2, scale_r, shift_r = resids
    gp = g[0]
    gq = g[1] if emit_pool else None
    bc = (slice(None), None, None, None, slice(None))
    out_dtype = jnp.promote_types(ys.dtype, rs.dtype)
    if _finale_train_use_pallas(ys.shape[2], ys.shape[3], c):
        from fcd_tpu.kernels.finale import finale_bwd_pallas

        dtv, a1, a2, a3 = finale_bwd_pallas(
            ys, rs, scale2, shift2, scale_r, shift_r, gp, gq, c, slope,
            emit_pad=emit_pad, interpret=_interp())
    else:
        yf = ys.astype(jnp.float32)
        rf = rs.astype(jnp.float32)
        s2b = scale2.astype(jnp.float32)[bc]
        srb = scale_r.astype(jnp.float32)[bc]
        t = ((yf * s2b + shift2.astype(jnp.float32)[bc])
             + (rf * srb + shift_r.astype(jnp.float32)[bc]))
        gf = (gp[:, 1:-1] if emit_pad else gp).astype(jnp.float32)
        if emit_pool:
            fb = jnp.where(t >= 0, t, slope * t).astype(
                out_dtype).astype(jnp.float32)
            m = fb[..., :c]
            for gi in range(1, 8):
                m = jnp.maximum(m, fb[..., gi * c:(gi + 1) * c])
            eqs = [fb[..., i * c:(i + 1) * c] == m for i in range(8)]
            cnt = sum(e.astype(jnp.float32) for e in eqs)
            gqs = gq.astype(jnp.float32) / cnt
            gf = gf + jnp.concatenate(
                [jnp.where(e, gqs, 0.0) for e in eqs], axis=-1)
        dt = gf * jnp.where(t >= 0, 1.0, slope)
        a1 = jnp.sum(dt * yf, axis=(1, 2, 3))
        a2 = jnp.sum(dt, axis=(1, 2, 3))
        a3 = jnp.sum(dt * rf, axis=(1, 2, 3))
        dtv = dt.astype(out_dtype)
    # the kernel emits ONE dt slab; the per-lane scalings fuse into the
    # consumers (conv-2 adjoint pad chain, residual-1x1 adjoint einsum)
    d_ys = (dtv.astype(jnp.float32)
            * scale2.astype(jnp.float32)[bc]).astype(ys.dtype)
    d_rs = (dtv.astype(jnp.float32)
            * scale_r.astype(jnp.float32)[bc]).astype(rs.dtype)
    d_shift = a2.astype(shift2.dtype)
    return (d_ys, d_rs, a1.astype(scale2.dtype), d_shift,
            a3.astype(scale_r.dtype), d_shift)


finale_s2d_train.defvjp(_finale_train_fwd, _finale_train_bwd)


def _upsample_wm(w: jnp.ndarray, cin: int) -> jnp.ndarray:
    """(2,2,2,cin,cout) transposed-conv kernel (flax orientation) ->
    (cin, 8*cout) matrix: lax.conv_transpose flips the kernel, so output
    sub-voxel q uses tap (1-qz, 1-qy, 1-qx)."""
    cout = w.shape[4]
    wf = jnp.flip(w, axis=(0, 1, 2))
    return wf.reshape(8, cin, cout).transpose(1, 0, 2).reshape(cin, 8 * cout)


def _upsample_s2d_impl(ys, cin, w):
    import os

    cout = w.shape[4]
    wm = _upsample_wm(w, cin)
    # FCD_UP_KERNEL=1: Pallas one-pass upsample. A/B on v5e (full bench):
    # 9.75 vs 9.78 vol/s — NEUTRAL. The d2s copies attributed to this op
    # belong elsewhere (profile_patch: copy.544/545 persist either way),
    # and the kernel's 8-D output carries a T(2,128) tiling whose final
    # reshape is a real copy. Kept gated off as the parity-tested basis
    # for a future upsample+conv fusion.
    if (jax.default_backend() == "tpu"
            and _fcd_flags.get("FCD_UP_KERNEL") == "1"):
        from fcd_tpu.kernels.upsample import (
            upsample_pallas_supported,
            upsample_s2d_pallas,
        )

        if upsample_pallas_supported(ys.shape[2], ys.shape[3], cin, cout):
            return upsample_s2d_pallas(
                ys.astype(jnp.bfloat16), wm, cin, cout, out_dtype=ys.dtype)
    z = conv1x1_s2d(ys, wm)                  # (B, d4, h4, w4, 8*(8*cout))
    return from_s2d(z, 8 * cout)             # (B, d2, h2, w2, 8*cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _upsample_s2d_core(ys, cin, w):
    return _upsample_s2d_impl(ys, cin, w)


def _upsample_s2d_fwd(ys, cin, w):
    return _upsample_s2d_impl(ys, cin, w), (ys, w)


def _upsample_s2d_bwd(cin, res, dy):
    """Manual adjoint (keeps the Pallas forward differentiable without a
    backward recompute): regroup the fine cotangent back onto the coarse
    grid (a space_to_depth of lane-dense channels), then the block-diag
    matmul with wm^T gives d_ys and a grouped einsum gives dw."""
    ys, w = res
    cout = w.shape[4]
    wm = _upsample_wm(w, cin)
    # regroup the cotangent in ITS dtype (a pure permutation — f32-casting
    # first doubled the d2s copy bytes, ~2 GB/step at batch 4x128^3) and
    # let the dots accumulate in f32; ys/dy are bf16-valued either way so
    # the products are identical, only the dwm sum reassociates.
    # Slice+lane-concat form (bit-identical to space_to_depth): the 8-D
    # transpose form lowered as T(2,128) copies (~3 ms/step cluster at
    # batch 4x128^3; 79.8 vs 7.8 ms standalone at the level-1 shape)
    b_, df, hf, wf, cf = dy.shape
    dyp = dy.reshape(b_, df, hf, wf // 2, 2 * cf)
    dz = jnp.concatenate(
        [dyp[:, 0::2, 0::2], dyp[:, 0::2, 1::2],
         dyp[:, 1::2, 0::2], dyp[:, 1::2, 1::2]],
        axis=-1)                             # (B, d4, h4, w4, 8*(8*cout))
    d_ys = conv1x1_s2d(dz, wm.T.astype(dz.dtype)).astype(ys.dtype)
    ysf = ys.reshape(-1, 8, cin)
    dzf = dz.reshape(-1, 8, 8 * cout)
    dwm = jnp.einsum("ngi,ngq->iq", ysf, dzf,
                     preferred_element_type=jnp.float32)
    dwf = dwm.reshape(cin, 8, cout).transpose(1, 0, 2).reshape(
        2, 2, 2, cin, cout)
    dw = jnp.flip(dwf, axis=(0, 1, 2)).astype(w.dtype)
    return d_ys, dw


_upsample_s2d_core.defvjp(_upsample_s2d_fwd, _upsample_s2d_bwd)


def upsample2x_s2d_to_s2d_pad(ysp: jnp.ndarray, cin: int, w: jnp.ndarray,
                              b: Optional[jnp.ndarray] = None,
                              in_padded: bool = True) -> jnp.ndarray:
    """Padded-chain s2d-to-s2d transposed-conv upsample: consumes the
    coarse s2d tensor WITH its (+1, +1) zero depth pad and emits the fine
    s2d tensor with the same pad, in one Pallas pass
    (kernels/upsample.upsample_s2d_pad) — the XLA form's d2s regroup
    copies (~2.5 ms/volume at dec-1/dec-2) and the fine-grid depth pad
    both disappear. Differentiable (manual adjoint mirroring
    upsample2x_s2d_to_s2d's). Falls back to the XLA form + explicit pads
    off-TPU or when unsupported."""
    if not in_padded:
        ysp = jnp.pad(ysp, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    return _upsample_pad_core(ysp, cin, w, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _upsample_pad_core(ysp, cin, w, b):
    return _upsample_pad_impl(ysp, cin, w, b)


def _upsample_pad_impl(ysp, cin, w, b):
    cout = w.shape[4]
    if jax.default_backend() == "tpu" and _fcd_flags.get("FCD_PAD_CHAIN") != "0":
        from fcd_tpu.kernels.upsample import (
            upsample_pad_supported,
            upsample_s2d_pad,
        )

        if upsample_pad_supported(ysp.shape[2], ysp.shape[3], cin, cout):
            wm = _upsample_wm(w, cin)
            return upsample_s2d_pad(
                ysp.astype(jnp.bfloat16), wm, cin, cout, b,
                out_dtype=ysp.dtype)
    out = upsample2x_s2d_to_s2d(ysp[:, 1:-1], cin, w, b)
    return jnp.pad(out, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))


def _upsample_pad_fwd(ysp, cin, w, b):
    return _upsample_pad_impl(ysp, cin, w, b), (ysp, w, b is not None)


def _upsample_pad_bwd(cin, res, dyp):
    """Adjoint of the padded upsample: the fine cotangent's interior
    drives the same regroup + matmul adjoint as _upsample_s2d_bwd; the
    coarse cotangent re-wears the depth pad (zero edges — exact: the
    forward's edge outputs are constants)."""
    ysp, w, has_bias = res
    cout = w.shape[4]
    wm = _upsample_wm(w, cin)
    dy = dyp[:, 1:-1]
    # slice+lane-concat regroup (bit-identical to space_to_depth): the
    # 8-D transpose form lowered as a ~3 ms/step T(2,128) copy cluster
    # at batch 4x128^3 (profile_train_step fusion.4420/reshape.1533)
    b_, df, hf, wf, cf = dy.shape
    dyp2 = dy.reshape(b_, df, hf, wf // 2, 2 * cf)
    dz = jnp.concatenate(
        [dyp2[:, 0::2, 0::2], dyp2[:, 0::2, 1::2],
         dyp2[:, 1::2, 0::2], dyp2[:, 1::2, 1::2]],
        axis=-1)                             # (B, d4, h4, w4, 8*(8*cout))
    d_ys = conv1x1_s2d(dz, wm.T.astype(dz.dtype)).astype(ysp.dtype)
    d_ysp = jnp.pad(d_ys, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    ysf = ysp[:, 1:-1].reshape(-1, 8, cin)
    dzf = dz.reshape(-1, 8, 8 * cout)
    dwm = jnp.einsum("ngi,ngq->iq", ysf, dzf,
                     preferred_element_type=jnp.float32)
    dwf = dwm.reshape(cin, 8, cout).transpose(1, 0, 2).reshape(
        2, 2, 2, cin, cout)
    dw = jnp.flip(dwf, axis=(0, 1, 2)).astype(w.dtype)
    if has_bias:
        db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2, 3))
        db = db.reshape(8, cout).sum(axis=0)
    else:
        db = None
    return d_ysp, dw, db


_upsample_pad_core.defvjp(_upsample_pad_fwd, _upsample_pad_bwd)


def upsample2x_s2d_to_s2d(ys: jnp.ndarray, cin: int, w: jnp.ndarray,
                          b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Transposed conv k2 s2 from the COARSE grid's s2d tensor straight to
    the FINE grid's s2d tensor — the s2d-chained form of upsample2x_into_s2d.

    For fine-block position V = 2*vs + p, the upsampled block is
    ys[vs, p-group] @ W (one input voxel per output block). On TPU the
    whole op runs as one Pallas pass (kernels/upsample.py) — the XLA
    form's depth-to-space regroup cost ~4.4 ms/volume in reshape/
    transpose copies; elsewhere it is one block-diag matmul + from_s2d.
    Differentiable via a manual adjoint (the exact transpose of the
    block-diag matmul on the regrouped cotangent).
    ys: (B, d4, h4, w4, 8*cin) s2d of the coarse grid;
    w: (2, 2, 2, cin, cout) (flax ConvTranspose orientation);
    returns (B, d2, h2, w2, 8*cout) s2d of the fine grid."""
    out = _upsample_s2d_core(ys, cin, w)
    if b is not None:
        out = out + jnp.tile(b, 8).astype(out.dtype)
    return out


def _inorm_affine_from_sums(s1: jnp.ndarray, s2: jnp.ndarray, c: int,
                            n: int, eps: float = 1e-5):
    """Instance-norm scale/shift (B, 8c) from per-lane sums (B, 8c):
    regroup the 8 parity copies per true channel, n = total voxels."""
    b = s1.shape[0]
    g1 = s1.reshape(b, 8, c).sum(axis=1)
    g2 = s2.reshape(b, 8, c).sum(axis=1)
    mean = g1 / n
    var = jnp.maximum(g2 / n - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    shift = -mean * scale
    return jnp.tile(scale, (1, 8)), jnp.tile(shift, (1, 8))


def _fused_resblock_eval8(parts, w1, w2, wres, oc: int, slope: float,
                          norm_name: str, bn_affines, out_dtype, head=None,
                          emit_pad: bool = False, emit_pool: bool = False):
    """Eval-mode UnetResBlock via the HALF-OFFSET 8-tap kernel pair:
    conv1 runs aligned->offset, conv2 offset->aligned (with norm1 + act
    fused into its VMEM prologue), so each conv carries only 64/27 = 2.37x
    FLOP redundancy instead of the 27-tap form's 8x. The projection
    shortcut is a separate block-diagonal 1x1 matmul on the aligned input
    (bytes-bound; fusing it into conv1 would exceed scoped VMEM at the
    full-resolution shapes)."""
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_a2o_multi,
        blocked_conv_o2a,
        make_blocked_weights_1x1,
        make_blocked_weights_8tap,
    )

    interpret = jax.default_backend() != "tpu"
    parts = [p if len(p) == 3 else (p[0], p[1], False) for p in parts]
    b = parts[0][0].shape[0]
    d2, h2, w2s = parts[0][0].shape[1:4]
    if parts[0][2]:
        d2 -= 2
    is_batch = norm_name == "batch"
    want_stats = not is_batch
    need_res = wres is not None
    n_vox = d2 * h2 * w2s * 8

    # --- conv1: aligned -> offset, every part in ONE kernel (the part sum
    # and its statistics accumulate in VMEM — no XLA sum/reduction passes);
    # the projection shortcut rides along as a second output sharing the
    # input reads, with its own in-kernel statistics ---
    pre_list = []
    xs_list, wblk_list, rwblk_list = [], [], []
    off = 0
    for xs, c, pre in parts:
        w1p = w1[..., off:off + c, :].astype(jnp.float32)
        wrp = wres[off:off + c].astype(jnp.float32) if need_res else None
        if c < 16 and not _lane_narrow_ok():
            # legacy XLA-padded halo form: Mosaic rejects the odd-slab
            # shape cast on sub-128-lane operands; pad the parity groups
            # (and weights) to c=16 in HBM (8x the bytes of the data).
            # The vmem-halo kernels consume the narrow operand directly.
            b_, d_, h_, w_ = xs.shape[:4]
            xs = jnp.pad(
                xs.reshape(b_, d_, h_, w_, 8, c),
                ((0, 0),) * 4 + ((0, 0), (0, 16 - c)),
            ).reshape(b_, d_, h_, w_, 8 * 16)
            w1p = jnp.pad(w1p, ((0, 0),) * 3 + ((0, 16 - c), (0, 0)))
            if need_res:
                wrp = jnp.pad(wrp, ((0, 16 - c), (0, 0)))
        xs_list.append(xs.astype(jnp.bfloat16))
        pre_list.append(pre)
        wblk_list.append(make_blocked_weights_8tap(w1p).astype(jnp.bfloat16))
        if need_res:
            rwblk_list.append(
                make_blocked_weights_1x1(wrp).astype(jnp.bfloat16))
        off += c
    outs = blocked_conv_a2o_multi(
        xs_list, wblk_list, want_stats=want_stats,
        res_wblk_list=rwblk_list if need_res else None,
        want_res_stats=need_res and want_stats,
        out_dtype=out_dtype, interpret=interpret,
        pre_padded=pre_list,
    )
    y1 = outs[0]
    i = 1
    s1sum = s1sq = None
    if want_stats:
        s1sum, s1sq = outs[i], outs[i + 1]
        i += 2
    r = r_full = rsum8 = rsq8 = None
    if need_res:
        r_full = outs[i]             # (B, d2+1, ...): halo row kept for
        r = r_full[:, :d2]           # the finale-pool kernel's index map
        i += 1
        if want_stats:
            rsum8, rsq8 = outs[i], outs[i + 1]

    # --- norm1 affine -> conv2 prologue ---
    if is_batch:
        wn, bn = bn_affines[0]
        scale1 = jnp.broadcast_to(jnp.tile(wn, 8)[None], (b, 8 * oc))
        shift1 = jnp.broadcast_to(jnp.tile(bn, 8)[None], (b, 8 * oc))
    else:
        scale1, shift1 = _inorm_affine_from_sums(
            s1sum.reshape(b, -1), s1sq.reshape(b, -1), oc, n_vox)

    w2blk = make_blocked_weights_8tap(
        w2.astype(jnp.float32)).astype(jnp.bfloat16)
    outs2 = blocked_conv_o2a(
        y1, w2blk, w2s, in_scale=scale1, in_shift=shift1, neg_slope=slope,
        want_stats=want_stats, out_dtype=out_dtype, interpret=interpret,
    )
    y2 = outs2[0]

    # --- norm2 + residual norm + add + act (+ optional fused head) ---
    if is_batch:
        wn2, bn2 = bn_affines[1]
        sc = jnp.broadcast_to(jnp.tile(wn2, 8)[None], (b, 8 * oc))
        sh = jnp.broadcast_to(jnp.tile(bn2, 8)[None], (b, 8 * oc))
    else:
        sc, sh = _inorm_affine_from_sums(
            outs2[1].reshape(b, -1), outs2[2].reshape(b, -1), oc, n_vox)

    if need_res:
        if is_batch:
            wnr, bnr = bn_affines[2]
            scr = jnp.broadcast_to(jnp.tile(wnr, 8)[None], (b, 8 * oc))
            shr = jnp.broadcast_to(jnp.tile(bnr, 8)[None], (b, 8 * oc))
        else:
            scr, shr = _inorm_affine_from_sums(
                rsum8.reshape(b, -1), rsq8.reshape(b, -1), oc, n_vox)
        rin = r
    else:
        # identity shortcut: fold as r*1 + 0
        rin = parts[0][0]
        if parts[0][2]:
            rin = rin[:, 1:-1]
        scr = jnp.ones((b, 8 * oc), jnp.float32)
        shr = jnp.zeros((b, 8 * oc), jnp.float32)

    if head is not None:
        # segmentation-head fusion: the finale and the 1x1 head run as one
        # Pallas pass; the activated block output never hits HBM
        from fcd_tpu.kernels.block_conv import (
            fused_finale_head,
            make_blocked_weights_1x1,
        )

        whk, bhb = head
        if whk.ndim == 5:
            whk = whk[0, 0, 0]
        wh_blk = make_blocked_weights_1x1(
            whk.astype(jnp.float32)).astype(jnp.bfloat16)
        bias8 = None if bhb is None else jnp.tile(bhb, 8)
        return fused_finale_head(
            y2, rin, sc, sh, scr, shr, wh_blk, bias8, neg_slope=slope,
            out_dtype=out_dtype, interpret=interpret)

    if emit_pool and emit_pad and need_res:
        # finale + padded emission + 2x max pool in ONE Pallas pass: the
        # pool's full re-read of the finale tensor never happens
        # (kernels/pool.fused_finale_pool); r's halo row is skipped by
        # the kernel's index map
        from fcd_tpu.kernels.pool import (
            finale_pool_supported,
            fused_finale_pool,
        )

        if finale_pool_supported(h2, w2s, oc):
            return fused_finale_pool(
                y2, r_full, sc, sh, scr, shr, oc, slope,
                out_dtype=out_dtype, interpret=interpret)

    scale2 = sc[:, None, None, None, :]
    shift2 = sh[:, None, None, None, :]
    if need_res:
        res = (rin.astype(jnp.float32) * scr[:, None, None, None, :]
               + shr[:, None, None, None, :])
    else:
        res = rin.astype(jnp.float32)
    out = y2.astype(jnp.float32) * scale2 + shift2 + res
    out = jnp.where(out >= 0, out, slope * out)
    out = out.astype(out_dtype)
    if emit_pad:
        # padded-chain emission: the depth pad fuses into this elementwise
        # finale (probe: elementwise+pad 0.607 ms vs elementwise alone
        # 0.712 on v5e) — the consumer a2o/pool kernels read it directly
        out = jnp.pad(out, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    if emit_pool:
        # route through the padded-interior Pallas pool (one pass, no
        # standalone interior-slice materialization) when the input
        # carries the pad; _pool_max itself dispatches to pool_fwd_pallas
        # when supported, so both branches take the kernel path on TPU
        pooled = _pool_pad_impl(out, oc) if emit_pad else _pool_max(out, oc)
        return out, pooled
    return out


def fused_resblock_eval(parts, w1, w2, wres, oc: int, slope: float,
                        norm_name: str = "instance", bn_affines=None,
                        out_dtype=jnp.bfloat16, head=None,
                        emit_pad: bool = False, emit_pool: bool = False):
    """Eval-mode UnetResBlock on aligned s2d parts with kernel-fused norms.

    head=(kernel, bias|None): fuse a 1x1 segmentation head into the block
    finale (one Pallas pass emits the s2d logits directly); the returned
    tensor is then the logits, not the block output.

    Three fused kernel passes replace the ~10 memory passes of the
    composed form: conv1 (+ fused 1x1 residual sharing the input reads,
    + output statistics), conv2 (with norm1+activation applied in its
    VMEM prologue, + statistics), and one XLA elementwise finale
    (norm2 + residual-norm + add + activation). Forward-only (no VJP) —
    callers gate on eval.

    Padded-chain convention (FCD_PAD_CHAIN): each part is (xs, c) or
    (xs, c, pre_padded) — pre_padded parts carry the (+1, +1) zero depth
    pad and feed the conv kernels directly (no standalone pad op). With
    emit_pad=True the returned tensor carries the same pad, emitted
    inside the (fused, ~free) elementwise finale.

    w1: (3,3,3,cin_total,oc), w2: (3,3,3,oc,oc), wres: (cin_total,oc)|None.
    bn_affines (norm 'batch'): ((w,b) eval affines per norm, (c,) each)
    in order (norm1, norm2, norm_res|None).
    """
    import os

    parts = [p if len(p) == 3 else (p[0], p[1], False) for p in parts]
    if _fcd_flags.get("FCD_CONV8") != "0":
        return _fused_resblock_eval8(parts, w1, w2, wres, oc, slope,
                                     norm_name, bn_affines, out_dtype,
                                     head=head, emit_pad=emit_pad,
                                     emit_pool=emit_pool)
    # 27-tap fallback path consumes the interior view (the pads were free
    # to produce; a slice here costs one pass — acceptable for the A/B
    # reference form)
    parts = [(xs[:, 1:-1] if pre else xs, c) for xs, c, pre in parts]
    if emit_pad or emit_pool:
        out = fused_resblock_eval(parts, w1, w2, wres, oc, slope,
                                  norm_name, bn_affines, out_dtype,
                                  head=head)
        if emit_pad:
            out = jnp.pad(out, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        if emit_pool:
            pooled = _pool_max(out[:, 1:-1] if emit_pad else out, oc)
            return out, pooled
        return out
    from fcd_tpu.kernels.block_conv import (
        blocked_conv_s2d_fused,
        make_blocked_weights_1x1,
        make_blocked_weights_aligned,
    )

    interpret = jax.default_backend() != "tpu"
    b = parts[0][0].shape[0]
    d2, h2, w2s = parts[0][0].shape[1:4]
    n_vox = d2 * h2 * w2s * 8
    is_batch = norm_name == "batch"
    want_stats = not is_batch
    need_res = wres is not None

    def pad8(v, m):
        return (v + m - 1) // m * m

    def vmem_ok(c8, cout8, with_res):
        # double-buffered slabs/outputs/weights + f32 accumulator temps,
        # against the 16M scoped-vmem budget (with headroom — Mosaic's
        # stack accounting runs well above the naive sum)
        slab = (h2 + 2) * pad8(w2s + 2, 8) * pad8(c8, 128) * 2
        outb = h2 * pad8(w2s, 8) * pad8(cout8, 128) * 2
        acc = h2 * pad8(w2s, 8) * pad8(cout8, 128) * 4
        wb = 27 * pad8(c8, 128) * cout8 * 2
        total = 6 * slab + 2 * outb + 2 * acc + 2 * wb
        if with_res:
            total += 2 * outb + acc
        return total < 12 * 1024 * 1024

    # the fused 1x1-residual output costs an extra out buffer + accumulator;
    # at the largest grids that exceeds scoped VMEM — compute the residual
    # as a separate block-diag matmul there instead
    res_in_kernel = need_res and all(
        vmem_ok(8 * c, w1.shape[-1] * 8, True) for _, c in parts)

    # --- conv1 (+ residual + stats), summed over input parts ---
    y1 = r = None
    s1sum = s1sq = rsum = rsq = None
    off = 0
    single = len(parts) == 1
    for xs, c in parts:
        wblk = make_blocked_weights_aligned(
            w1[..., off:off + c, :].astype(jnp.float32)).astype(jnp.bfloat16)
        res_wblk = None
        if res_in_kernel:
            res_wblk = make_blocked_weights_1x1(
                wres[off:off + c].astype(jnp.float32)).astype(jnp.bfloat16)
        outs = blocked_conv_s2d_fused(
            xs.astype(jnp.bfloat16), wblk,
            res_wblk=res_wblk, want_stats=want_stats and single,
            out_dtype=out_dtype, interpret=interpret,
        )
        i = 0
        yi = outs[i]; i += 1
        if want_stats and single:
            s1sum, s1sq = outs[i], outs[i + 1]; i += 2
        if res_in_kernel:
            ri = outs[i]; i += 1
            if want_stats and single:
                rsum, rsq = outs[i], outs[i + 1]; i += 2
            r = ri if r is None else r + ri
        elif need_res:
            ri = conv1x1_s2d(xs, wres[off:off + c])
            r = ri if r is None else r + ri
        y1 = yi if y1 is None else y1 + yi
        off += c

    if single and need_res and not res_in_kernel and want_stats:
        rf = r.astype(jnp.float32)
        rsum = jnp.sum(rf, axis=(1, 2, 3)).reshape(b, 1, -1)
        rsq = jnp.sum(jnp.square(rf), axis=(1, 2, 3)).reshape(b, 1, -1)

    if not single and want_stats:
        # stats of the part-sum cannot be accumulated per part (cross terms);
        # like the composed path, they are taken on the out_dtype sum
        y1f = y1.astype(jnp.float32)
        s1sum = jnp.sum(y1f, axis=(1, 2, 3)).reshape(b, 1, -1)
        s1sq = jnp.sum(jnp.square(y1f), axis=(1, 2, 3)).reshape(b, 1, -1)
        if need_res:
            rf = r.astype(jnp.float32)
            rsum = jnp.sum(rf, axis=(1, 2, 3)).reshape(b, 1, -1)
            rsq = jnp.sum(jnp.square(rf), axis=(1, 2, 3)).reshape(b, 1, -1)

    # --- norm1 affine -> conv2 prologue ---
    if is_batch:
        wn, bn = bn_affines[0]
        scale1 = jnp.broadcast_to(jnp.tile(wn, 8)[None], (b, 8 * oc))
        shift1 = jnp.broadcast_to(jnp.tile(bn, 8)[None], (b, 8 * oc))
    else:
        scale1, shift1 = _inorm_affine_from_sums(
            s1sum.reshape(b, -1), s1sq.reshape(b, -1), oc, n_vox)

    w2blk = make_blocked_weights_aligned(
        w2.astype(jnp.float32)).astype(jnp.bfloat16)
    outs2 = blocked_conv_s2d_fused(
        y1, w2blk, in_scale=scale1, in_shift=shift1, neg_slope=slope,
        want_stats=want_stats, out_dtype=out_dtype, interpret=interpret,
    )
    y2 = outs2[0]

    # --- norm2 + residual norm + add + act (one fused XLA pass) ---
    if is_batch:
        wn2, bn2 = bn_affines[1]
        scale2 = jnp.tile(wn2, 8)[None, None, None, None, :]
        shift2 = jnp.tile(bn2, 8)[None, None, None, None, :]
    else:
        sc, sh = _inorm_affine_from_sums(
            outs2[1].reshape(b, -1), outs2[2].reshape(b, -1), oc, n_vox)
        scale2 = sc[:, None, None, None, :]
        shift2 = sh[:, None, None, None, :]

    if need_res:
        if is_batch:
            wnr, bnr = bn_affines[2]
            res = (r.astype(jnp.float32) * jnp.tile(wnr, 8)[None, None, None, None, :]
                   + jnp.tile(bnr, 8)[None, None, None, None, :])
        else:
            scr, shr = _inorm_affine_from_sums(
                rsum.reshape(b, -1), rsq.reshape(b, -1), oc, n_vox)
            res = (r.astype(jnp.float32) * scr[:, None, None, None, :]
                   + shr[:, None, None, None, :])
    else:
        res = parts[0][0].astype(jnp.float32)

    out = y2.astype(jnp.float32) * scale2 + shift2 + res
    out = jnp.where(out >= 0, out, slope * out)
    out = out.astype(out_dtype)
    if head is not None:
        whk, bhb = head
        if whk.ndim == 5:
            whk = whk[0, 0, 0]
        out = conv1x1_s2d(out, whk)
        if bhb is not None:
            out = out + jnp.tile(bhb, 8).astype(out.dtype)
    return out


def s2d_supported(shape: Sequence[int], cin: int, cout: int,
                  taps: int = 27) -> bool:
    """Eligibility of a residual block for s2d-resident execution."""
    from fcd_tpu.kernels.block_conv import fast_conv_supported

    return fast_conv_supported(shape, cin, cout, (3, 3, 3), (1, 1, 1),
                               taps=taps)
