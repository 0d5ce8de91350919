"""Mesh-sharded sliding-window inference: the patch grid as a parallel axis.

The reference's long-context story is sliding-window inference over full
volumes (train.py:148-165); multi-chip, the natural TPU-native sharding is
the *patch grid* (SURVEY.md §2.2): the volume is replicated, each device
runs its share of the overlapping patches through the network and blends
into a local accumulator, and one psum over the mesh merges the partial
accumulators and blend weights.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fcd_tpu.infer.sliding_window import dense_patch_starts, gaussian_importance


def sharded_sliding_window_inference(
    volume: jnp.ndarray,
    predictor: Callable,
    mesh: Mesh,
    *,
    roi_size: Sequence[int],
    out_channels: int,
    sw_batch: int = 2,
    overlap: float = 0.25,
    blend: str = "constant",
    sigma_scale: float = 0.125,
    compute_dtype=jnp.float32,
    axis: str = "data",
    patch_s2d: bool = False,
) -> jnp.ndarray:
    """Like infer.sliding_window_inference but with the patch grid sharded
    over `axis` of `mesh`. Returns the blended (D, H, W, out_channels)
    logits, replicated. patch_s2d feeds the predictor lane-dense s2d
    patches (see infer.sliding_window.patch_s2d_compatible)."""
    roi_size = tuple(int(r) for r in roi_size)
    d, h, w, c = volume.shape
    if patch_s2d:
        from fcd_tpu.infer.sliding_window import patch_s2d_compatible

        if not patch_s2d_compatible((d, h, w), roi_size, overlap):
            raise ValueError("patch_s2d incompatible with volume/roi/overlap")
    pad = [max(r - s, 0) for r, s in zip(roi_size, (d, h, w))]
    padded = volume
    if any(pad):
        cfg = [(p // 2, p - p // 2) for p in pad] + [(0, 0)]
        padded = jnp.pad(volume, cfg)
    pd, ph, pw, _ = padded.shape

    starts = dense_patch_starts((pd, ph, pw), roi_size, overlap)
    n = starts.shape[0]
    n_dev = mesh.shape[axis]
    per_dev = -(-n // (sw_batch * n_dev)) * sw_batch  # round to sw_batch multiple
    total = per_dev * n_dev
    valid = np.ones((total,), np.float32)
    if total > n:
        starts = np.concatenate([starts, np.repeat(starts[-1:], total - n, axis=0)])
        valid[n:] = 0.0

    rd, rh, rw = roi_size
    if blend == "gaussian":
        imp = jnp.asarray(gaussian_importance(roi_size, sigma_scale))
    else:
        imp = jnp.ones(roi_size, jnp.float32)
    imp4 = imp[..., None]

    # global blend coverage is a static function of the grid: use the cached
    # device-resident reciprocal (saves the second accumulator and its psum)
    from fcd_tpu.infer.sliding_window import _inverse_coverage

    inv_cnt = _inverse_coverage((pd, ph, pw), roi_size, overlap, sw_batch,
                                blend, sigma_scale, False)

    def local_sw(vol, starts_local, valid_local):
        n_local = starts_local.shape[0]
        n_batches = n_local // sw_batch
        acc = jnp.zeros((pd, ph, pw, out_channels), jnp.float32)
        vol_c = vol.astype(compute_dtype)

        if patch_s2d:
            from fcd_tpu.kernels.block_conv import space_to_depth

            vol_s = space_to_depth(vol_c[None])[0]

            def gather(start):
                return jax.lax.dynamic_slice(
                    vol_s,
                    (start[0] // 2, start[1] // 2, start[2] // 2, 0),
                    (rd // 2, rh // 2, rw // 2, 8 * c),
                )
        else:
            def gather(start):
                return jax.lax.dynamic_slice(
                    vol_c, (start[0], start[1], start[2], 0), (rd, rh, rw, c)
                )

        def body(acc, i):
            idx0 = i * sw_batch
            bs = jax.lax.dynamic_slice(starts_local, (idx0, 0), (sw_batch, 3))
            bv = jax.lax.dynamic_slice(valid_local, (idx0,), (sw_batch,))
            patches = jax.vmap(gather)(bs)
            logits = predictor(patches).astype(jnp.float32)

            def scatter(j, acc):
                s = bs[j]
                wgt = imp4 * bv[j]
                pos = (s[0], s[1], s[2], 0)
                cur = jax.lax.dynamic_slice(acc, pos, (rd, rh, rw, out_channels))
                return jax.lax.dynamic_update_slice(acc, cur + logits[j] * wgt, pos)

            return jax.lax.fori_loop(0, sw_batch, scatter, acc), None

        acc, _ = jax.lax.scan(body, acc, jnp.arange(n_batches))
        # merge partial accumulators across the patch-grid shards
        acc = jax.lax.psum(acc, axis)
        return acc * inv_cnt

    from jax import shard_map

    fn = shard_map(
        local_sw,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    out = jax.jit(fn)(padded, jnp.asarray(starts), jnp.asarray(valid))
    if any(pad):
        sl = tuple(slice(p // 2, p // 2 + s) for p, s in zip(pad, (d, h, w)))
        out = out[sl[0], sl[1], sl[2], :]
    return out
