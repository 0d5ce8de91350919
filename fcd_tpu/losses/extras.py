"""Regularization losses: total-variation, boundary, cortical-awareness.

Parity targets: get_loss.py:100-190. All functions take channels-last
(B, D, H, W, C) arrays; gradients/shifts run over the three spatial axes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_SPATIAL = (1, 2, 3)


def dilate_mask(mask: jnp.ndarray, kernel_size: int = 3, iterations: int = 1) -> jnp.ndarray:
    """Binary dilation via an all-ones conv (get_loss.py:100-113).
    mask: (B, D, H, W, 1)."""
    k = kernel_size
    pad = k // 2
    out = mask.astype(jnp.float32)
    for _ in range(iterations):
        summed = jax.lax.reduce_window(
            out,
            0.0,
            jax.lax.add,
            window_dimensions=(1, k, k, k, 1),
            window_strides=(1, 1, 1, 1, 1),
            padding=((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)),
        )
        out = (summed > 0).astype(jnp.float32)
    return out


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean weighting batch axis 0 by the (B,) validity mask (== jnp.mean
    when mask is None) — ragged-batch DP pad-and-mask support."""
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(jnp.float32).reshape(mask.shape[0], *([1] * (x.ndim - 1)))
    n_other = 1
    for s in x.shape[1:]:
        n_other *= int(s)
    return jnp.sum(x * m) / (jnp.maximum(jnp.sum(m), 1.0) * n_other)


def total_variation_loss(
    pred: jnp.ndarray,
    gt: Optional[jnp.ndarray] = None,
    *,
    norm: int = 1,
    sigmoid: bool = False,
    softmax: bool = True,
    exclude_borders: bool = True,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """3D TV loss on the FCD channel (get_loss.py:116-165)."""
    n_ch = pred.shape[-1]
    if sigmoid:
        pred = jax.nn.sigmoid(pred)
    if softmax and n_ch > 1:
        pred = jax.nn.softmax(pred, axis=-1)
    if n_ch > 1:
        pred = pred[..., 1:2]
    pred = pred.astype(jnp.float32)

    if exclude_borders and gt is not None:
        gt = gt.astype(jnp.float32)
        dilated = dilate_mask(gt, kernel_size=3, iterations=2)
        eroded = 1.0 - dilate_mask(1.0 - gt, kernel_size=3, iterations=2)
        border = ((dilated - eroded) > 0).astype(jnp.float32)
        pred = pred * (1.0 - border)

    def tv_axis(axis):
        a = jax.lax.slice_in_dim(pred, 1, pred.shape[axis], axis=axis)
        b = jax.lax.slice_in_dim(pred, 0, pred.shape[axis] - 1, axis=axis)
        d = a - b
        if norm == 1:
            return _masked_mean(jnp.abs(d), sample_mask)
        return jnp.sqrt(_masked_mean(jnp.square(d), sample_mask) + 1e-10)

    return tv_axis(1) + tv_axis(2) + tv_axis(3)


def _gradient(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """torch.gradient / np.gradient parity: central differences in the
    interior, one-sided at the edges, unit spacing."""
    n = x.shape[axis]
    upper = jax.lax.slice_in_dim(x, 2, n, axis=axis)
    lower = jax.lax.slice_in_dim(x, 0, n - 2, axis=axis)
    interior = (upper - lower) * 0.5
    first = jax.lax.slice_in_dim(x, 1, 2, axis=axis) - jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis) - jax.lax.slice_in_dim(
        x, n - 2, n - 1, axis=axis
    )
    return jnp.concatenate([first, interior, last], axis=axis)


def boundary_loss(pred: jnp.ndarray, target: jnp.ndarray,
                  sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gradient-matching boundary loss (get_loss.py:167-178)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    total = 0.0
    for ax in _SPATIAL:
        total = total + _masked_mean(
            jnp.abs(_gradient(pred, ax) - _gradient(target, ax)), sample_mask)
    return total / 3.0


def cortical_boundary_loss(pred: jnp.ndarray, thickness_map: jnp.ndarray,
                           sample_mask: Optional[jnp.ndarray] = None,
                           ) -> jnp.ndarray:
    """Cortical-thickness gradient consistency loss (get_loss.py:180-190)."""
    pred = pred.astype(jnp.float32)
    thickness_map = thickness_map.astype(jnp.float32)
    total = 0.0
    for ax in _SPATIAL:
        total = total + _masked_mean(
            jnp.abs(_gradient(pred, ax) * _gradient(thickness_map, ax)),
            sample_mask)
    return total / 3.0
