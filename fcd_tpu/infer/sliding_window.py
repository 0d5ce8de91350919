"""Batched sliding-window inference with fused on-device blending.

TPU-native re-design of MONAI's sliding_window_inference as used by the
reference (train.py:148-165: roi=patch_size, overlap=0.25, constant
blending; seg_fcd_test.py:37-54). Instead of a host loop over patch
crops, the whole volume stays device-resident: a static patch grid is
computed on host, patches are gathered with dynamic slices inside one
jitted scan, run through the network in batches of `sw_batch`, and
blended (constant or Gaussian-weighted) by read-modify-write
dynamic-slice accumulation into HBM accumulators. One compilation per
(volume-shape-bucket, roi, sw_batch).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fcd_tpu import flags as _fcd_flags


def _exit_d2s(out, out_channels: int):
    """Volume-exit depth_to_space, formulation selected by FCD_SW_EXIT:
    'mm' (default) = MXU lane-permutation matmul (depth_to_space_mm);
    'reshape' = reshape+transpose; 'conv' = lhs-dilated one-hot conv.
    A/B on v5e (full bench): mm 8.66 vs reshape 7.49 vol/s in the
    static-grid build (mm 7.98 vs 7.75 in the earlier dynamic build) —
    the matmul replaces the lane-crossing pass, though a boundary-layout
    copy+reshape (~10 ms) remains either way (the jit output layout for
    (D,H,W,2) f32 is transfer-oriented; pinning it to standard measured
    8.48, FCD_SW_OUT_LAYOUT=std)."""
    import os

    from fcd_tpu.kernels.block_conv import (
        depth_to_space,
        depth_to_space_fast,
        depth_to_space_mm,
    )

    form = _fcd_flags.get("FCD_SW_EXIT")
    if form == "reshape":
        return depth_to_space(out, out_channels)
    if form == "conv":
        return depth_to_space_fast(out, out_channels)
    return depth_to_space_mm(out, out_channels)


def dense_patch_starts(
    image_size: Sequence[int], roi_size: Sequence[int], overlap: float
) -> np.ndarray:
    """Start coordinates of the dense patch grid (MONAI parity).

    interval = round(roi * (1 - overlap)); starts cover the volume with the
    final patch clamped flush to the end (MONAI dense_patch_slices).
    """
    starts_per_axis = []
    for dim, roi in zip(image_size, roi_size):
        if roi >= dim:
            starts_per_axis.append([0])
            continue
        interval = int(roi * (1.0 - overlap))
        interval = max(interval, 1)
        n = int(math.ceil((dim - roi) / interval)) + 1
        starts = [min(i * interval, dim - roi) for i in range(n)]
        # dedupe while keeping order (clamping can repeat the last start)
        seen, uniq = set(), []
        for s in starts:
            if s not in seen:
                seen.add(s)
                uniq.append(s)
        starts_per_axis.append(uniq)
    grid = np.stack(
        np.meshgrid(*starts_per_axis, indexing="ij"), axis=-1
    ).reshape(-1, len(image_size))
    return grid.astype(np.int32)


def gaussian_importance(roi_size: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    """MONAI-style Gaussian importance map: centered, sigma = sigma_scale*roi,
    normalized to max 1, clipped to a small positive floor."""
    grids = []
    for r in roi_size:
        center = (r - 1) / 2.0
        sigma = sigma_scale * r
        x = np.arange(r, dtype=np.float64)
        grids.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    imp = functools.reduce(np.multiply.outer, grids)
    imp = imp / imp.max()
    # clamp the floor (MONAI does the same) so single-coverage corner voxels
    # don't underflow the float32 accumulator
    imp = np.maximum(imp, 1e-3)
    return imp.astype(np.float32)


_SW_STATIC_ARGNAMES = ("predictor", "roi_size", "sw_batch", "out_channels",
                       "blend", "sigma_scale", "compute_dtype", "patch_s2d",
                       "s2d_logits", "exit_form", "vol_pre_s2d")


def _sliding_window_impl(
    volume: jnp.ndarray,            # (D, H, W, C) already padded to >= roi
    starts: jnp.ndarray,            # (n_padded, 3) int32 patch starts
    valid: jnp.ndarray,             # (n_padded,) float32 1/0 validity weights
    inv_cnt: jnp.ndarray,           # reciprocal coverage, host-precomputed:
                                    # (D,H,W,1) f32, or (D/2,H/2,W/2,8) when
                                    # s2d_logits (coverage is a static
                                    # function of the grid — no accumulator)
    *,
    predictor: Callable,            # (B, rd, rh, rw, C) -> (B, rd, rh, rw, out_channels)
    roi_size: Tuple[int, int, int],
    sw_batch: int,
    out_channels: int,
    blend: str,
    sigma_scale: float,
    compute_dtype,
    patch_s2d: bool = False,
    s2d_logits: bool = False,
    exit_form: str = "mm",
    vol_pre_s2d: bool = False,
):
    if vol_pre_s2d:
        d, h, w = (2 * volume.shape[0], 2 * volume.shape[1],
                   2 * volume.shape[2])
        c = volume.shape[3] // 8
    else:
        d, h, w, c = volume.shape
    rd, rh, rw = roi_size
    n = starts.shape[0]
    n_batches = n // sw_batch

    if blend == "gaussian":
        imp = jnp.asarray(gaussian_importance(roi_size, sigma_scale))
    else:
        imp = jnp.ones(roi_size, jnp.float32)
    imp4 = imp[..., None]  # (rd, rh, rw, 1)

    vol_c = volume if vol_pre_s2d else volume.astype(compute_dtype)
    if patch_s2d:
        if not vol_pre_s2d:
            # one volume-level s2d transform; patches gather lane-dense
            # slabs (starts are even: even roi, interval = 0.75*roi, even
            # padded dims). The bucketed caller pre-s2d's in its own jit
            # (vol_pre_s2d) — in-program the entry couples this program's
            # layout assignment to the raw-volume parameter (~15 ms of
            # relayout copies, the r2 lesson).
            from fcd_tpu.kernels.block_conv import space_to_depth_fast

            vol_c = space_to_depth_fast(vol_c[None])[0]

        def gather(start):
            return jax.lax.dynamic_slice(
                vol_c,
                (start[0] // 2, start[1] // 2, start[2] // 2, 0),
                (rd // 2, rh // 2, rw // 2, 8 * c),
            )
    else:
        def gather(start):
            return jax.lax.dynamic_slice(
                vol_c, (start[0], start[1], start[2], 0), (rd, rh, rw, c)
            )

    if s2d_logits:
        # blend in s2d space: the predictor emits (B, rd/2, rh/2, rw/2, 8*O)
        # s2d logits, the accumulators live on the s2d grid (lane-dense),
        # and the full-resolution exit transpose happens ONCE per volume
        from fcd_tpu.kernels.block_conv import depth_to_space, space_to_depth

        imp_s2d = space_to_depth(imp[None, ..., None])[0]      # (rd2, rh2, rw2, 8)
        imp_lanes = jnp.repeat(imp_s2d, out_channels, axis=-1)  # (.., 8*O)
        rd2, rh2, rw2 = rd // 2, rh // 2, rw // 2
        acc = jnp.zeros((d // 2, h // 2, w // 2, 8 * out_channels), jnp.float32)

        def body(acc, batch_idx):
            idx0 = batch_idx * sw_batch
            batch_starts = jax.lax.dynamic_slice(starts, (idx0, 0), (sw_batch, 3))
            batch_valid = jax.lax.dynamic_slice(valid, (idx0,), (sw_batch,))
            patches = jax.vmap(gather)(batch_starts)
            logits = predictor(patches).astype(jnp.float32)    # (B, rd2, rh2, rw2, 8O)

            def scatter(i, acc):
                s = batch_starts[i]
                pos = (s[0] // 2, s[1] // 2, s[2] // 2, 0)
                cur = jax.lax.dynamic_slice(acc, pos, (rd2, rh2, rw2, 8 * out_channels))
                return jax.lax.dynamic_update_slice(
                    acc, cur + logits[i] * (imp_lanes * batch_valid[i]), pos)

            return jax.lax.fori_loop(0, sw_batch, scatter, acc), None

        acc, _ = jax.lax.scan(body, acc, jnp.arange(n_batches))
        if exit_form == "pallas":
            # fused flat exit (kernels/d2s_exit.py): inv_cnt arrives
            # TRANSPOSED (d2, h2, 8O, w2); returns the FLAT (D, H, W*O)
            # f32 volume (C-order bytes of the 4-D volume)
            from fcd_tpu.kernels.d2s_exit import d2s_exit_flat

            acc_t = jnp.transpose(acc, (0, 1, 3, 2))
            return d2s_exit_flat(acc_t, inv_cnt, out_channels,
                                 interpret=jax.default_backend() != "tpu")
        out = acc * jnp.repeat(inv_cnt, out_channels, axis=-1)
        return _exit_d2s(out[None], out_channels)[0]

    acc = jnp.zeros((d, h, w, out_channels), jnp.float32)

    def body(acc, batch_idx):
        idx0 = batch_idx * sw_batch
        batch_starts = jax.lax.dynamic_slice(starts, (idx0, 0), (sw_batch, 3))
        batch_valid = jax.lax.dynamic_slice(valid, (idx0,), (sw_batch,))
        patches = jax.vmap(gather)(batch_starts)               # (B, rd, rh, rw, C)
        logits = predictor(patches).astype(jnp.float32)        # (B, rd, rh, rw, O)

        def scatter(i, acc):
            s = batch_starts[i]
            wgt = imp4 * batch_valid[i]
            pos = (s[0], s[1], s[2], 0)
            cur = jax.lax.dynamic_slice(acc, pos, (rd, rh, rw, out_channels))
            return jax.lax.dynamic_update_slice(acc, cur + logits[i] * wgt, pos)

        return jax.lax.fori_loop(0, sw_batch, scatter, acc), None

    acc, _ = jax.lax.scan(body, acc, jnp.arange(n_batches))
    return acc * inv_cnt


_sliding_window_jit = jax.jit(_sliding_window_impl,
                              static_argnames=_SW_STATIC_ARGNAMES)


@functools.lru_cache(maxsize=1)
def _sliding_window_jit_stdlayout():
    """Same computation, but the jit OUTPUT pinned to the standard
    major-to-minor layout (FCD_SW_OUT_LAYOUT=std). Rationale: the default
    boundary layout XLA picks for a (D, H, W, 2) f32 result is a
    transfer-oriented T(2,128) form (lanes along H) whose production
    costs ~10 ms/volume of layout copies after the exit d2s. A/B on v5e:
    8.03 vs 7.98 vol/s — within run noise, because the forced standard
    layout pays its own lane-padding on the C=2 minor dim; kept as an
    env-gated alternative, default off."""
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    fmt = Format(Layout(major_to_minor=(0, 1, 2, 3)),
                 SingleDeviceSharding(jax.devices()[0]))
    return jax.jit(_sliding_window_impl,
                   static_argnames=_SW_STATIC_ARGNAMES, out_shardings=fmt)


_SW_STATIC_GRID_ARGNAMES = (
    "predictor", "starts_t", "valid_t", "roi_size", "sw_batch",
    "out_channels", "blend", "sigma_scale", "compute_dtype", "patch_s2d",
    "s2d_logits", "exit_form", "vol_pre_s2d", "patch_pad")


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _entry_s2d(volume, *, compute_dtype):
    """Volume entry transform as its OWN jit: cast + s2d.
    Keeping it out of the sliding-window program stops that program's
    layout assignment from forcing a relayout of the raw-volume
    parameter (profiled at ~15 ms/volume when coupled).

    Default form: the Pallas entry kernel (kernels/s2d_entry.py) — the
    one-hot-conv form cost ~3.6 ms/volume in an input relayout copy plus
    the conv fusion (FCD_ENTRY_KERNEL=0 restores it; bit-identical)."""
    import os

    from fcd_tpu.kernels.block_conv import space_to_depth_fast
    from fcd_tpu.kernels.s2d_entry import s2d_entry, s2d_entry_supported

    d, h, w, c = (int(v) for v in volume.shape)
    if (jax.default_backend() == "tpu"
            and _fcd_flags.get("FCD_ENTRY_KERNEL") == "1"
            and compute_dtype == jnp.bfloat16
            and s2d_entry_supported(d, h, w, c)):
        return s2d_entry(volume, out_dtype=compute_dtype)
    return space_to_depth_fast(volume.astype(compute_dtype)[None])[0]


@functools.lru_cache(maxsize=1)
def _sliding_window_jit_static_stdlayout():
    """Static-grid variant with the output pinned to the standard layout
    (FCD_SW_OUT_LAYOUT=std A/B; see _sliding_window_jit_stdlayout)."""
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    fmt = Format(Layout(major_to_minor=(0, 1, 2, 3)),
                 SingleDeviceSharding(jax.devices()[0]))
    return jax.jit(_sliding_window_static_impl,
                   static_argnames=_SW_STATIC_GRID_ARGNAMES,
                   out_shardings=fmt)


def _sliding_window_static_impl(
    volume: jnp.ndarray,
    inv_cnt: jnp.ndarray,
    *,
    predictor: Callable,
    starts_t: Tuple[Tuple[int, int, int], ...],   # STATIC patch starts
    valid_t: Tuple[bool, ...],
    roi_size: Tuple[int, int, int],
    sw_batch: int,
    out_channels: int,
    blend: str,
    sigma_scale: float,
    compute_dtype,
    patch_s2d: bool = False,
    s2d_logits: bool = False,
    exit_form: str = "mm",
    vol_pre_s2d: bool = False,
    patch_pad: bool = False,
):
    """Static-grid sliding window: the patch grid is host-known, so gathers
    are static slices, the predictor runs under one lax.map trace over the
    pre-gathered patch stack, and blending is a short chain of
    static-position updates — no while-carried accumulator, no dynamic
    slicing, nothing for XLA to serialize defensively.

    vol_pre_s2d: the volume argument is ALREADY the s2d transform
    (pd/2, ph/2, pw/2, 8C) — the entry transform ran in its own jit
    (_entry_s2d) so this program's global layout assignment cannot force
    a parameter relayout of the raw volume (profiled: +15 ms/volume of
    entry copies when the flat-exit output changed the layout solution).

    exit_form (s2d_logits only): 'mm' = coverage multiply + perm-matmul
    depth_to_space, returns (D, H, W, O); 'pallas' = the fused exit
    kernel (kernels/d2s_exit.py) — inv_cnt must then be the TRANSPOSED
    (d2, h2, 8*O, w2) coverage and the return is the FLAT (D, H, W*O)
    f32 volume (C-order bytes of the 4-D volume; free host-side view).
    """
    if vol_pre_s2d:
        d, h, w = (2 * volume.shape[0], 2 * volume.shape[1],
                   2 * volume.shape[2])
        c = volume.shape[3] // 8
    else:
        d, h, w, c = volume.shape
    rd, rh, rw = roi_size
    n = len(starts_t)

    if blend == "gaussian":
        imp = jnp.asarray(gaussian_importance(roi_size, sigma_scale))
    else:
        imp = jnp.ones(roi_size, jnp.float32)

    vol_c = volume if vol_pre_s2d else volume.astype(compute_dtype)
    if patch_s2d:
        if not vol_pre_s2d:
            from fcd_tpu.kernels.block_conv import space_to_depth_fast

            vol_c = space_to_depth_fast(vol_c[None])[0]

        def gather(s):
            s0, s1, s2 = s[0] // 2, s[1] // 2, s[2] // 2
            p = jax.lax.slice(
                vol_c, (s0, s1, s2, 0),
                (s0 + rd // 2, s1 + rh // 2, s2 + rw // 2, vol_c.shape[-1]))
            if patch_pad:
                # padded-chain patches: the depth halo rides the gather's
                # stack write; the model consumes it directly (inferred
                # from the patch shape) — no per-patch pad op in the loop
                p = jnp.pad(p, ((1, 1), (0, 0), (0, 0), (0, 0)))
            return p
    else:
        def gather(s):
            return jax.lax.slice(
                vol_c, (s[0], s[1], s[2], 0),
                (s[0] + rd, s[1] + rh, s[2] + rw, c))

    patches = jnp.stack([gather(s) for s in starts_t])
    nb = n // sw_batch
    batched = patches.reshape((nb, sw_batch) + patches.shape[1:])
    logits = jax.lax.map(lambda p: predictor(p), batched)
    # keep the stack in the predictor dtype: each blend term converts to
    # f32 inside its own pad fusion (pre-converting materialized a full
    # f32 stack — a ~1 ms/volume standalone pass on the bench grid)
    logits = logits.reshape((n,) + logits.shape[2:])

    # blending: with STATIC offsets every contribution is a zero-pad of the
    # weighted patch logits and the pad-tree sum fuses into one output pass
    # — no read-modify-write scatter chain (the dynamic path's
    # dynamic-update-slices cost ~6 ms/volume on the bench grid)
    if s2d_logits:
        from fcd_tpu.kernels.block_conv import space_to_depth

        imp_s2d = space_to_depth(imp[None, ..., None])[0]
        imp_lanes = jnp.repeat(imp_s2d, out_channels, axis=-1)
        full = (d // 2, h // 2, w // 2)
        ext = (rd // 2, rh // 2, rw // 2)
        acc = None
        for i, s in enumerate(starts_t):
            if not valid_t[i]:
                continue
            pos = (s[0] // 2, s[1] // 2, s[2] // 2)
            cfg = [(p, f - p - e) for p, f, e in zip(pos, full, ext)]
            term = jnp.pad(logits[i].astype(jnp.float32) * imp_lanes,
                           cfg + [(0, 0)])
            acc = term if acc is None else acc + term
        if exit_form == "pallas":
            from fcd_tpu.kernels.d2s_exit import d2s_exit_flat

            # (d2, h2, w2, 8O) -> (d2, h2, 8O, w2): a layout-only
            # transpose (the blend accumulator's natural XLA layout is
            # W-minor), consumed by the fused exit kernel
            acc_t = jnp.transpose(acc, (0, 1, 3, 2))
            return d2s_exit_flat(acc_t, inv_cnt, out_channels,
                                 interpret=jax.default_backend() != "tpu")
        out = acc * jnp.repeat(inv_cnt, out_channels, axis=-1)
        return _exit_d2s(out[None], out_channels)[0]

    imp4 = imp[..., None]
    acc = None
    for i, s in enumerate(starts_t):
        if not valid_t[i]:
            continue
        pos = (int(s[0]), int(s[1]), int(s[2]))
        cfg = [(p, f - p - e)
               for p, f, e in zip(pos, (d, h, w), (rd, rh, rw))]
        term = jnp.pad(logits[i].astype(jnp.float32) * imp4, cfg + [(0, 0)])
        acc = term if acc is None else acc + term
    return acc * inv_cnt


_sliding_window_jit_static = jax.jit(
    _sliding_window_static_impl, static_argnames=_SW_STATIC_GRID_ARGNAMES)


@functools.lru_cache(maxsize=8)
def _inverse_coverage(padded_shape, roi_size, overlap, sw_batch, blend,
                      sigma_scale, s2d_logits) -> jnp.ndarray:
    """Reciprocal blend coverage as a DEVICE-RESIDENT array, cached per grid
    config: coverage is a static function of the grid, and recomputing or
    re-uploading it per volume costs ~300 ms through the relay (~29 MB).
    Safe to cache a jnp array here — it is created outside any trace."""
    pd, ph, pw = padded_shape
    starts = dense_patch_starts(padded_shape, roi_size, overlap)
    if blend == "gaussian":
        imp_np = gaussian_importance(roi_size, sigma_scale)
    else:
        imp_np = np.ones(roi_size, np.float32)
    cnt_np = np.zeros((pd, ph, pw), np.float32)
    for sd, sh_, sw_ in starts:
        cnt_np[sd:sd + roi_size[0], sh_:sh_ + roi_size[1],
               sw_:sw_ + roi_size[2]] += imp_np
    inv_cnt_np = 1.0 / np.maximum(cnt_np, 1e-8)
    if s2d_logits:
        # space_to_depth of (pd, ph, pw, 1): (pd/2, ph/2, pw/2, 8) parity-major
        inv_cnt_np = (
            inv_cnt_np
            .reshape(pd // 2, 2, ph // 2, 2, pw // 2, 2)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(pd // 2, ph // 2, pw // 2, 8)
        )
    else:
        inv_cnt_np = inv_cnt_np[..., None]
    return jnp.asarray(inv_cnt_np)


@functools.lru_cache(maxsize=8)
def _inverse_coverage_exit_t(padded_shape, roi_size, overlap, blend,
                             sigma_scale, out_channels) -> jnp.ndarray:
    """Reciprocal blend coverage for the fused Pallas exit: the s2d
    coverage repeated to 8*O lanes and TRANSPOSED to (d2, h2, 8*O, w2),
    device-resident and cached per grid config."""
    pd, ph, pw = padded_shape
    starts = dense_patch_starts(padded_shape, roi_size, overlap)
    if blend == "gaussian":
        imp_np = gaussian_importance(roi_size, sigma_scale)
    else:
        imp_np = np.ones(roi_size, np.float32)
    cnt_np = np.zeros((pd, ph, pw), np.float32)
    for sd, sh_, sw_ in starts:
        cnt_np[sd:sd + roi_size[0], sh_:sh_ + roi_size[1],
               sw_:sw_ + roi_size[2]] += imp_np
    inv = 1.0 / np.maximum(cnt_np, 1e-8)
    inv = (inv.reshape(pd // 2, 2, ph // 2, 2, pw // 2, 2)
              .transpose(0, 2, 4, 1, 3, 5)
              .reshape(pd // 2, ph // 2, pw // 2, 8))
    inv = np.repeat(inv, out_channels, axis=-1)       # (d2, h2, w2, 8O)
    return jnp.asarray(np.ascontiguousarray(inv.transpose(0, 1, 3, 2)))


@functools.lru_cache(maxsize=8)
def _host_grid(padded_shape, roi_size, overlap, sw_batch):
    """Patch starts/validity as HOST tuples for the static-grid path,
    cached per grid config. (The earlier form fetched the device arrays
    back with np.asarray each call — a relay round-trip per volume.)"""
    starts = dense_patch_starts(padded_shape, roi_size, overlap)
    n = starts.shape[0]
    n_pad = (-n) % sw_batch
    valid = [True] * n + [False] * n_pad
    if n_pad:
        starts = np.concatenate(
            [starts, np.repeat(starts[-1:], n_pad, axis=0)], axis=0)
    return (tuple(tuple(int(v) for v in s) for s in starts), tuple(valid))


@functools.lru_cache(maxsize=8)
def _device_grid(padded_shape, roi_size, overlap, sw_batch):
    """Patch-start and validity arrays as DEVICE-RESIDENT constants, cached
    per grid config: they are static functions of the grid, and re-uploading
    them per volume costs relay round-trips that show up as host gap."""
    starts = dense_patch_starts(padded_shape, roi_size, overlap)
    n = starts.shape[0]
    n_pad = (-n) % sw_batch
    valid = np.ones((n + n_pad,), np.float32)
    if n_pad:
        starts = np.concatenate(
            [starts, np.repeat(starts[-1:], n_pad, axis=0)], axis=0)
        valid[n:] = 0.0
    return jnp.asarray(starts), jnp.asarray(valid)


def patch_s2d_compatible(shape, roi_size, overlap: float) -> bool:
    """Whether the s2d patch-gather fast path applies: even dims/rois and an
    even patch interval (so every grid start is even and the MONAI-parity
    grid is unchanged)."""
    if any(int(s) % 2 for s in shape[:3]) or any(int(r) % 2 for r in roi_size):
        return False
    if any(max(int(r * (1.0 - overlap)), 1) % 2 for r in roi_size):
        return False
    return True


def sliding_window_inference(
    volume: jnp.ndarray,
    predictor: Callable,
    *,
    roi_size: Sequence[int],
    out_channels: int,
    sw_batch: int = 8,
    overlap: float = 0.25,
    blend: str = "constant",
    sigma_scale: float = 0.125,
    compute_dtype=jnp.float32,
    patch_s2d: bool = False,
    s2d_logits: bool = False,
    flat_output: bool = False,
    patch_pad: bool = False,
) -> jnp.ndarray:
    """Run `predictor` over a (D, H, W, C) volume in overlapping roi-size
    patches and blend the logits. Returns (D, H, W, out_channels) float32.

    flat_output=True (s2d_logits static path only): return the volume as
    (D, H, W*out_channels) f32 via the fused Pallas exit kernel — the
    C-order bytes of the 4-D volume (``np.asarray(out).reshape(D, H, W,
    O)`` is a free view). This skips the ~12 ms/volume of XLA boundary-
    layout copies the 4-D device array costs on v5e; used by bench.py
    and anywhere the next consumer is the host. Falls back to the 4-D
    return when the kernel does not apply (padding needed, W too wide,
    non-TPU backend without interpret parity, dynamic-grid path).

    The predictor must map (B, rd, rh, rw, C) -> (B, rd, rh, rw, out_channels)
    and should already be parameter-bound (and jittable). With
    patch_s2d=True the volume is space-to-depth'd once and the predictor
    receives (B, rd/2, rh/2, rw/2, 8C) lane-dense patches instead — the
    fast path for models with supports_s2d_input. With s2d_logits=True the
    predictor must also RETURN s2d logits (B, rd/2, rh/2, rw/2, 8*O) —
    blending then runs on the lane-dense s2d grid and the full-resolution
    exit transpose happens once per volume instead of once per patch.

    patch_pad=True (opt-in, padded-chain predictors only): s2d patches are
    gathered WITH their (+1, +1) zero depth pad — (B, rd/2 + 2, ...) —
    so the model's entry conv kernel consumes them without a per-patch
    pad op. The predictor must accept the padded shape (MS_DSA_NET
    infers it from the patch depth).
    """
    roi_size = tuple(int(r) for r in roi_size)
    d, h, w, c = volume.shape
    pad = [max(r - s, 0) for r, s in zip(roi_size, (d, h, w))]
    padded = volume
    if patch_s2d or s2d_logits:
        if not patch_s2d_compatible((d, h, w), roi_size, overlap):
            raise ValueError(
                "patch_s2d/s2d_logits require even rois, an even patch "
                "interval and even volume dims; check patch_s2d_compatible"
            )
    if any(pad):
        # symmetric padding (MONAI pads half before, half after)
        cfg = [(p // 2, p - p // 2) for p in pad] + [(0, 0)]
        padded = jnp.pad(volume, cfg)
    pd, ph, pw, _ = padded.shape

    import os

    static_grid = _fcd_flags.get("FCD_SW_STATIC") != "0"
    exit_form = "mm"
    if (flat_output and s2d_logits and static_grid and not any(pad)
            and _fcd_flags.get("FCD_SW_FLAT_EXIT") != "0"):
        from fcd_tpu.kernels.d2s_exit import d2s_exit_supported

        if d2s_exit_supported(pd // 2, ph // 2, pw // 2, out_channels):
            exit_form = "pallas"

    if exit_form == "pallas":
        inv_cnt = _inverse_coverage_exit_t(
            (pd, ph, pw), roi_size, overlap, blend, sigma_scale,
            out_channels)
    else:
        inv_cnt = _inverse_coverage(
            (pd, ph, pw), roi_size, overlap, sw_batch, blend, sigma_scale,
            s2d_logits)

    if static_grid:
        # Default since the pad-tree blend rewrite: static offsets let the
        # 8 blend contributions fuse into one output pass instead of a
        # dynamic-update-slice scatter chain. A/B on v5e (full bench):
        # static 8.61 vs dynamic 8.37 vol/s. (The earlier static variant
        # with a dus blend chain measured 7.48 — the blend formulation,
        # not the pre-gather, was the difference.)
        starts_t, valid_t = _host_grid((pd, ph, pw), roi_size, overlap,
                                       sw_batch)
        sw_fn = (_sliding_window_jit_static_stdlayout()
                 if _fcd_flags.get("FCD_SW_OUT_LAYOUT") == "std"
                 else _sliding_window_jit_static)
        vol_pre_s2d = exit_form == "pallas" and patch_s2d
        vol_in = (_entry_s2d(padded, compute_dtype=compute_dtype)
                  if vol_pre_s2d else padded)
        out = sw_fn(
            vol_in,
            inv_cnt,
            predictor=predictor,
            starts_t=starts_t,
            valid_t=valid_t,
            roi_size=roi_size,
            sw_batch=sw_batch,
            out_channels=out_channels,
            blend=blend,
            sigma_scale=sigma_scale,
            compute_dtype=compute_dtype,
            patch_s2d=patch_s2d,
            s2d_logits=s2d_logits,
            exit_form=exit_form,
            vol_pre_s2d=vol_pre_s2d,
            patch_pad=(patch_pad and patch_s2d
                       and _fcd_flags.get("FCD_PAD_CHAIN") != "0"),
        )
    else:
        starts_dev, valid_dev = _device_grid((pd, ph, pw), roi_size,
                                             overlap, sw_batch)
        sw_fn = (_sliding_window_jit_stdlayout()
                 if _fcd_flags.get("FCD_SW_OUT_LAYOUT") == "std"
                 else _sliding_window_jit)
        out = sw_fn(
            padded,
            starts_dev,
            valid_dev,
            inv_cnt,
            predictor=predictor,
            roi_size=roi_size,
            sw_batch=sw_batch,
            out_channels=out_channels,
            blend=blend,
            sigma_scale=sigma_scale,
            compute_dtype=compute_dtype,
            patch_s2d=patch_s2d,
            s2d_logits=s2d_logits,
        )
    if any(pad):
        sl = tuple(slice(p // 2, p // 2 + s) for p, s in zip(pad, (d, h, w)))
        out = out[sl[0], sl[1], sl[2], :]
    return out

# ---------------------------------------------------------------------------
# Volume-shape bucketing (SURVEY §7 hard part (d)): real datasets have
# per-subject volume shapes (the reference resamples to 1 mm and gets
# ~182x218x182 +/- a few voxels, get_transforms.py:129). The exact engine
# compiles once per (volume shape, grid); the bucketed engine bounds the
# compile count by padding the volume to a small bucket set while keeping
# the ORIGINAL patch grid as device-side data (the dynamic-grid program),
# so the blended output at the original voxels is IDENTICAL — padded
# regions are never gathered from or scattered to.
# ---------------------------------------------------------------------------


def bucket_shape_for(grid_shape, roi_size, bucket_multiple: int = 32):
    """Round each (roi-padded) axis up to the bucket multiple."""
    return tuple(
        max(-(-int(s) // bucket_multiple) * bucket_multiple, int(r))
        for s, r in zip(grid_shape, roi_size)
    )


@functools.lru_cache(maxsize=32)
def _bucket_grid(grid_shape, roi_size, overlap, sw_batch, slot_multiple):
    """Device-resident starts/validity for grid_shape, the slot count
    rounded up to slot_multiple (bounds compiles across patch counts;
    invalid slots blend with weight 0)."""
    starts = dense_patch_starts(grid_shape, roi_size, overlap)
    n = starts.shape[0]
    mult = max(int(slot_multiple), int(sw_batch))
    n_pad = (-n) % mult
    valid = np.ones((n + n_pad,), np.float32)
    if n_pad:
        starts = np.concatenate(
            [starts, np.repeat(starts[-1:], n_pad, axis=0)], axis=0)
        valid[n:] = 0.0
    return jnp.asarray(starts), jnp.asarray(valid)


@functools.lru_cache(maxsize=32)
def _bucket_inv_coverage(grid_shape, bucket_shape, roi_size, overlap, blend,
                         sigma_scale, s2d_logits) -> jnp.ndarray:
    """Reciprocal coverage of the ORIGINAL grid, padded with ones to the
    bucket shape (the padded region's accumulator is exactly zero — no
    patch covers it), device-resident per (grid, bucket) config."""
    pd, ph, pw = grid_shape
    bd, bh, bw = bucket_shape
    starts = dense_patch_starts(grid_shape, roi_size, overlap)
    if blend == "gaussian":
        imp_np = gaussian_importance(roi_size, sigma_scale)
    else:
        imp_np = np.ones(roi_size, np.float32)
    cnt_np = np.zeros((pd, ph, pw), np.float32)
    for sd, sh_, sw_ in starts:
        cnt_np[sd:sd + roi_size[0], sh_:sh_ + roi_size[1],
               sw_:sw_ + roi_size[2]] += imp_np
    inv = 1.0 / np.maximum(cnt_np, 1e-8)
    inv = np.pad(inv, [(0, bd - pd), (0, bh - ph), (0, bw - pw)],
                 constant_values=1.0)
    if s2d_logits:
        inv = (inv.reshape(bd // 2, 2, bh // 2, 2, bw // 2, 2)
                  .transpose(0, 2, 4, 1, 3, 5)
                  .reshape(bd // 2, bh // 2, bw // 2, 8))
    else:
        inv = inv[..., None]
    return jnp.asarray(inv)


@functools.lru_cache(maxsize=32)
def _bucket_inv_coverage_exit_t(grid_shape, bucket_shape, roi_size, overlap,
                                blend, sigma_scale,
                                out_channels) -> jnp.ndarray:
    """_bucket_inv_coverage in the fused flat exit's TRANSPOSED
    (d2, h2, 8*O, w2) form (see _inverse_coverage_exit_t)."""
    inv = np.asarray(_bucket_inv_coverage(
        grid_shape, bucket_shape, roi_size, overlap, blend, sigma_scale,
        True))
    inv = np.repeat(inv, out_channels, axis=-1)       # (d2, h2, w2, 8O)
    return jnp.asarray(np.ascontiguousarray(inv.transpose(0, 1, 3, 2)))


def sliding_window_inference_bucketed(
    volume: jnp.ndarray,
    predictor: Callable,
    *,
    roi_size: Sequence[int],
    out_channels: int,
    sw_batch: int = 8,
    overlap: float = 0.25,
    blend: str = "constant",
    sigma_scale: float = 0.125,
    compute_dtype=jnp.float32,
    patch_s2d: bool = False,
    s2d_logits: bool = False,
    bucket_multiple: int = 32,
    slot_multiple: int = 8,
    flat_output: bool = False,
    engine: str = "dynamic",
) -> jnp.ndarray:
    """sliding_window_inference with a BOUNDED compile count over
    heterogeneous volume shapes.

    engine='dynamic' (default): the dynamic-grid program — compile key =
    (bucket shape, rounded slot count) only, the strongest compile bound.
    engine='static': the static pad-tree program on the bucket-padded
    volume with the ORIGINAL grid's starts baked in as constants — exact
    same math and patch set as the exact engine at the static engine's
    throughput (the dynamic program runs at ~81-93% of it, BENCH_NOTES);
    compile key = (bucket shape, starts tuple), i.e. one compile per
    distinct GRID shape, like the exact engine — use it when the shape
    set is closed (bucketed datasets after resampling) or warmup budget
    allows.

    The volume is zero-padded (after the engine's usual symmetric >=roi
    pad) at the END of each axis to a multiple of `bucket_multiple`, but
    the patch grid is the ORIGINAL shape's grid, passed as device data to
    the dynamic-grid program — compile key = (bucket shape, rounded slot
    count), result at the original voxels identical to the exact engine
    (padded voxels are never gathered or blended; invalid grid slots carry
    weight 0, adding exact zeros to the accumulator).

    flat_output (s2d_logits, >=roi volumes, exit-kernel-supported bucket
    dims): return the BUCKET-shaped volume as (Db, Hb, Wb*O) f32 via the
    fused Pallas exit — skipping the ~10 ms/volume of XLA boundary-layout
    copies the 4-D exit pays.  The caller recovers the original volume as
    a zero-copy numpy view:
        np.asarray(out).reshape(Db, Hb, Wb, O)[:D, :H, :W]
    Falls back to the 4-D sliced return when the kernel does not apply.
    """
    roi_size = tuple(int(r) for r in roi_size)
    d, h, w, c = volume.shape
    if patch_s2d or s2d_logits:
        if not patch_s2d_compatible((d, h, w), roi_size, overlap):
            raise ValueError(
                "patch_s2d/s2d_logits require even rois, an even patch "
                "interval and even volume dims; check patch_s2d_compatible"
            )
    pad = [max(r - s, 0) for r, s in zip(roi_size, (d, h, w))]
    grid_shape = tuple(s + p for s, p in zip((d, h, w), pad))
    bucket = bucket_shape_for(grid_shape, roi_size, bucket_multiple)
    cfg = [
        (p // 2, p - p // 2 + b - g)
        for p, g, b in zip(pad, grid_shape, bucket)
    ] + [(0, 0)]
    padded = jnp.pad(volume, cfg) if any(any(t) for t in cfg) else volume

    # pre-s2d in its own jit (the layout-domain lesson): in-program the
    # entry transform forces a relayout of the raw-volume parameter
    vol_pre_s2d = patch_s2d
    if vol_pre_s2d:
        padded = _entry_s2d(padded, compute_dtype=compute_dtype)

    exit_form = "mm"
    if (flat_output and s2d_logits and not any(pad)
            and _fcd_flags.get("FCD_SW_FLAT_EXIT") != "0"):
        from fcd_tpu.kernels.d2s_exit import d2s_exit_supported

        bd, bh, bw = bucket
        if d2s_exit_supported(bd // 2, bh // 2, bw // 2, out_channels):
            exit_form = "pallas"
    if exit_form == "pallas":
        inv_cnt = _bucket_inv_coverage_exit_t(
            grid_shape, bucket, roi_size, overlap, blend, sigma_scale,
            out_channels)
    else:
        inv_cnt = _bucket_inv_coverage(
            grid_shape, bucket, roi_size, overlap, blend, sigma_scale,
            s2d_logits)

    if engine == "static":
        starts_t, valid_t = _host_grid(grid_shape, roi_size, overlap,
                                       sw_batch)
        out = _sliding_window_jit_static(
            padded,
            inv_cnt,
            predictor=predictor,
            starts_t=starts_t,
            valid_t=valid_t,
            roi_size=roi_size,
            sw_batch=sw_batch,
            out_channels=out_channels,
            blend=blend,
            sigma_scale=sigma_scale,
            compute_dtype=compute_dtype,
            patch_s2d=patch_s2d,
            s2d_logits=s2d_logits,
            exit_form=exit_form,
            vol_pre_s2d=vol_pre_s2d,
        )
    else:
        starts_dev, valid_dev = _bucket_grid(
            grid_shape, roi_size, overlap, sw_batch, slot_multiple)
        out = _sliding_window_jit(
            padded,
            starts_dev,
            valid_dev,
            inv_cnt,
            predictor=predictor,
            roi_size=roi_size,
            sw_batch=sw_batch,
            out_channels=out_channels,
            blend=blend,
            sigma_scale=sigma_scale,
            compute_dtype=compute_dtype,
            patch_s2d=patch_s2d,
            s2d_logits=s2d_logits,
            exit_form=exit_form,
            vol_pre_s2d=vol_pre_s2d,
        )
    if exit_form == "pallas":
        return out                       # (Db, Hb, Wb*O) flat bucket volume
    sl = tuple(slice(p // 2, p // 2 + s) for p, s in zip(pad, (d, h, w)))
    return out[sl[0], sl[1], sl[2], :]
