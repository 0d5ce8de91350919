"""Device-side random augmentations, jitted and batched.

TPU-native re-design of the reference's per-worker CPU augmentations
(get_transforms.py:69-88 and utils/gridmask.py:8-146): the whole
augmentation chain is one jitted program over the batch, driven by an
explicit PRNG key, with the epoch-scheduled probabilities
(coarse-dropout / GridMask ramps, get_transforms.py:108-120) passed as
traced scalars so the schedule never retraces.

Chain (matching the reference order): flips over the 3 spatial axes
(p=.5 each) -> random rotation about the y axis, angle U(-pi/2, pi/2),
bilinear image / nearest label (p=.5) -> intensity shift U(-.1, .1)
(p=.5) -> additive Gaussian noise, std U(0, .1) (p=.5) -> coarse dropout
(5 holes of 16^3, scheduled prob) -> GridMask (period U{16..31}, ratio
.5, scheduled prob).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _rotate_y(vol: jnp.ndarray, angle: jnp.ndarray, order: int) -> jnp.ndarray:
    """Rotate a (D, H, W, C) volume about the y (2nd spatial) axis around the
    center, 'border' padding (MONAI RandRotated parity,
    get_transforms.py:74)."""
    d, h, w, c = vol.shape
    c0 = (d - 1) / 2.0
    c2 = (w - 1) / 2.0
    xs = jnp.arange(d, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    zs = jnp.arange(w, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    sx = cos * (gx - c0) + sin * (gz - c2) + c0
    sz = -sin * (gx - c0) + cos * (gz - c2) + c2
    coords = jnp.stack([sx, gy, sz])

    def one_channel(v):
        return jax.scipy.ndimage.map_coordinates(v, list(coords), order=order,
                                                 mode="nearest")

    return jnp.stack([one_channel(vol[..., i]) for i in range(c)], axis=-1)


def _gridmask(img: jnp.ndarray, key: jnp.ndarray, apply: jnp.ndarray,
              d1: int = 16, d2: int = 32) -> jnp.ndarray:
    """GridMask (utils/gridmask.py:20-80): random grid period d in [d1,d2),
    mask bands of ceil(d/2) along all three axes of an oversized cube,
    center-cropped back to the volume."""
    dd, hh_, ww, c = img.shape
    hh = int(math.ceil(math.sqrt(dd * dd + hh_ * hh_ + ww * ww)))
    k_d, k_s = jax.random.split(key)
    d = jax.random.randint(k_d, (), d1, d2)
    band = (d + 1) // 2  # ceil(d * 0.5)
    st = jax.random.randint(k_s, (3,), 0, d)

    def axis_mask_ref(n, off, sti):
        # reference zeroes [d*i + st, d*i + st + band) for i >= -1 over the
        # oversized cube; equivalently a voxel y is zeroed iff
        # (y - st) mod d < band (valid for y >= st - d, always true here)
        y = jnp.arange(n) + off
        return jnp.mod(y - sti, d) >= band

    m0 = axis_mask_ref(dd, (hh - dd) // 2, st[0])
    m1 = axis_mask_ref(hh_, (hh - hh_) // 2, st[1])
    m2 = axis_mask_ref(ww, (hh - ww) // 2, st[2])
    mask = (m0[:, None, None] & m1[None, :, None] & m2[None, None, :]).astype(img.dtype)
    masked = img * mask[..., None]
    return jnp.where(apply, masked, img)


def _augment_one(image, label, key, coarse_prob, gridmask_prob):
    keys = jax.random.split(key, 12)

    # flips (get_transforms.py:70-72)
    for ax, k in zip(range(3), keys[:3]):
        do = jax.random.bernoulli(k, 0.5)
        image = jnp.where(do, jnp.flip(image, axis=ax), image)
        label = jnp.where(do, jnp.flip(label, axis=ax), label)

    # rotation about y (get_transforms.py:74)
    do_rot = jax.random.bernoulli(keys[3], 0.5)
    angle = jax.random.uniform(keys[4], (), minval=-jnp.pi / 2, maxval=jnp.pi / 2)
    angle = jnp.where(do_rot, angle, 0.0)
    image = _rotate_y(image.astype(jnp.float32), angle, order=1)
    label = _rotate_y(label.astype(jnp.float32), angle, order=0)

    # intensity shift (get_transforms.py:81)
    do_shift = jax.random.bernoulli(keys[5], 0.5)
    shift = jax.random.uniform(keys[6], (), minval=-0.1, maxval=0.1)
    image = image + jnp.where(do_shift, shift, 0.0)

    # gaussian noise, std ~ U(0, 0.1) (get_transforms.py:82)
    do_noise = jax.random.bernoulli(keys[7], 0.5)
    std = jax.random.uniform(keys[8], (), minval=0.0, maxval=0.1)
    noise = jax.random.normal(keys[9], image.shape, jnp.float32) * std
    image = image + jnp.where(do_noise, 1.0, 0.0) * noise

    # coarse dropout: 5 holes of 16^3 (get_transforms.py:44)
    do_cd = jax.random.bernoulli(keys[10], coarse_prob)
    d, h, w, _ = image.shape
    hole = (min(16, d), min(16, h), min(16, w))
    starts = jax.random.randint(
        keys[11], (5, 3), 0,
        jnp.array([max(d - hole[0], 1), max(h - hole[1], 1), max(w - hole[2], 1)]),
    )
    gx = jnp.arange(d)[:, None, None]
    gy = jnp.arange(h)[None, :, None]
    gz = jnp.arange(w)[None, None, :]
    keep = jnp.ones((d, h, w), bool)
    for i in range(5):
        inside = (
            (gx >= starts[i, 0]) & (gx < starts[i, 0] + hole[0])
            & (gy >= starts[i, 1]) & (gy < starts[i, 1] + hole[1])
            & (gz >= starts[i, 2]) & (gz < starts[i, 2] + hole[2])
        )
        keep = keep & ~inside
    dropped = image * keep[..., None].astype(image.dtype)
    image = jnp.where(do_cd, dropped, image)

    # gridmask (scheduled prob)
    gm_key, apply_key = jax.random.split(keys[0])
    do_gm = jax.random.bernoulli(apply_key, gridmask_prob)
    image = _gridmask(image, gm_key, do_gm)

    return image, label


@jax.jit
def augment_batch(
    images: jnp.ndarray,       # (B, D, H, W, C) float32
    labels: jnp.ndarray,       # (B, D, H, W, 1)
    key: jnp.ndarray,
    coarse_prob: jnp.ndarray,  # traced scalar (epoch schedule)
    gridmask_prob: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(
        lambda im, lb, k: _augment_one(im, lb, k, coarse_prob, gridmask_prob)
    )(images, labels, keys)


def scheduled_probs(params, epoch: int) -> Tuple[float, float]:
    """Epoch-ramped coarse-dropout / GridMask probabilities
    (get_transforms.py:108-120)."""
    max_epochs = params["max_epochs"]

    def ramp(max_prob, start):
        if max_prob == 0 or epoch < start:
            return 0.0
        return max_prob * min(1.0, (epoch - start) / max(max_epochs - start, 1e-9))

    cd = ramp(params.get("coarse_dropout_max_prob", 0.0),
              params.get("coarse_dropout_start_epoch", 0.0))
    # GridMask: prob = max_prob * min(1, (epoch - start) / (max - start))
    gm_max = params.get("gridmask_max_prob", 0.0)
    gm_start = params.get("gridmask_start_epoch", 0.0)
    if gm_max == 0 or epoch < gm_start:
        gm = 0.0
    else:
        gm = gm_max * min(1.0, (epoch - gm_start) / max(max_epochs - gm_start, 1e-9))
    return cd, gm
