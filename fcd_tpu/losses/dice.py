"""Dice-family segmentation losses with MONAI-parity semantics.

Pure-jax re-implementations of the loss configurations the reference
selects in get_loss.py:42-97 (DiceLoss / DiceCELoss / DiceFocalLoss /
GeneralizedDiceLoss / GeneralizedDiceFocalLoss with include_background=False,
smooth_nr=smooth_dr=1e-5, batch=True). Layout is channels-last:
pred (B, D, H, W, C) logits, target (B, D, H, W, 1) labels or
(B, D, H, W, C) one-hot.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def one_hot(target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B, ..., 1) class indices -> (B, ..., num_classes) one-hot."""
    idx = jnp.squeeze(target, axis=-1).astype(jnp.int32)
    return jax.nn.one_hot(idx, num_classes, dtype=jnp.float32)


def _mask_cols(mask: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """(B,) validity mask -> broadcastable (B, 1, ..., 1) float32."""
    return mask.astype(jnp.float32).reshape(mask.shape[0],
                                            *([1] * (ndim - 1)))


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over valid samples only: batch axis 0 weighted by mask, all
    other axes averaged normally (== jnp.mean(x) when mask is None)."""
    if mask is None:
        return jnp.mean(x)
    m = _mask_cols(mask, x.ndim)
    denom = jnp.maximum(jnp.sum(m), 1.0) * float(np_prod(x.shape[1:]))
    return jnp.sum(x * m) / denom


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


def _prepare(pred, target, *, sigmoid, softmax, to_onehot_y, include_background):
    n_ch = pred.shape[-1]
    if sigmoid:
        pred = jax.nn.sigmoid(pred)
    if softmax and n_ch > 1:
        pred = jax.nn.softmax(pred, axis=-1)
    if to_onehot_y and n_ch > 1:
        target = one_hot(target, n_ch)
    if not include_background and n_ch > 1:
        pred = pred[..., 1:]
        target = target[..., 1:]
    return pred.astype(jnp.float32), target.astype(jnp.float32)


def dice_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    *,
    include_background: bool = False,
    sigmoid: bool = False,
    softmax: bool = True,
    to_onehot_y: bool = True,
    squared_pred: bool = False,
    jaccard: bool = False,
    batch: bool = True,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MONAI DiceLoss parity (reference default loss, get_loss.py:56-57).

    sample_mask: optional (B,) 0/1 validity weights (ragged-batch DP
    pad-and-mask). With batch=True the pooled sums then exclude padded
    samples exactly; with batch=False the per-sample scores are
    mask-weighted in the final mean."""
    pred, target = _prepare(
        pred, target, sigmoid=sigmoid, softmax=softmax,
        to_onehot_y=to_onehot_y, include_background=include_background,
    )
    if sample_mask is not None and batch:
        m = _mask_cols(sample_mask, pred.ndim)
        pred, target = pred * m, target * m
    reduce_axes = tuple(range(1, pred.ndim - 1))
    if batch:
        reduce_axes = (0,) + reduce_axes

    intersection = jnp.sum(target * pred, axis=reduce_axes)
    if squared_pred:
        ground_o = jnp.sum(jnp.square(target), axis=reduce_axes)
        pred_o = jnp.sum(jnp.square(pred), axis=reduce_axes)
    else:
        ground_o = jnp.sum(target, axis=reduce_axes)
        pred_o = jnp.sum(pred, axis=reduce_axes)
    denominator = ground_o + pred_o
    if jaccard:
        denominator = 2.0 * (denominator - intersection)
    f = 1.0 - (2.0 * intersection + smooth_nr) / (denominator + smooth_dr)
    if not batch and sample_mask is not None:
        return _masked_mean(f, sample_mask)
    return jnp.mean(f)


def cross_entropy_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    *,
    weight: Optional[jnp.ndarray] = None,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss parity on logits: weighted mean
    sum(w[y]*ce)/sum(w[y]) (the CE term of DiceCELoss, get_loss.py:58-69).
    sample_mask (B,): padded samples get weight 0 (exact masked mean)."""
    n_ch = pred.shape[-1]
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    if target.shape[-1] == n_ch and n_ch > 1:
        idx = jnp.argmax(target, axis=-1)
    else:
        idx = jnp.squeeze(target, axis=-1).astype(jnp.int32)
    # select via one-hot arithmetic, NOT take_along_axis / table indexing:
    # XLA lowers per-voxel gathers on TPU to a serialized ~0.4 GB/s fusion
    # (profiled at 137 + 67 ms/step at batch 4x128^3 — 39% of the step)
    oh = jax.nn.one_hot(idx, n_ch, dtype=jnp.float32)
    picked = jnp.sum(logp * oh, axis=-1)
    if weight is not None:
        w = jnp.sum(jnp.asarray(weight, jnp.float32) * oh, axis=-1)
        if sample_mask is not None:
            w = w * _mask_cols(sample_mask, w.ndim)
        return -jnp.sum(w * picked) / jnp.maximum(jnp.sum(w), 1e-12)
    if sample_mask is not None:
        return -_masked_mean(picked, sample_mask)
    return -jnp.mean(picked)


def focal_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    *,
    gamma: float = 2.0,
    include_background: bool = False,
    to_onehot_y: bool = True,
    use_softmax: bool = True,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MONAI FocalLoss parity (the focal term of DiceFocalLoss,
    get_loss.py:70-78). Softmax form: mean over all voxels x channels of
    -(1 - p_t)^gamma * t * log(p_t)."""
    n_ch = pred.shape[-1]
    predf = pred.astype(jnp.float32)
    if to_onehot_y and n_ch > 1:
        target = one_hot(target, n_ch)
    target = target.astype(jnp.float32)
    if use_softmax:
        logp = jax.nn.log_softmax(predf, axis=-1)
        if not include_background and n_ch > 1:
            logp = logp[..., 1:]
            target = target[..., 1:]
        p = jnp.exp(logp)
        loss = -jnp.power(1.0 - p, gamma) * logp * target
    else:
        if not include_background and n_ch > 1:
            predf = predf[..., 1:]
            target = target[..., 1:]
        # stable BCE-with-logits focal form
        p = jax.nn.sigmoid(predf)
        bce = jnp.maximum(predf, 0) - predf * target + jnp.log1p(jnp.exp(-jnp.abs(predf)))
        p_t = p * target + (1 - p) * (1 - target)
        loss = jnp.power(1.0 - p_t, gamma) * bce
    return _masked_mean(loss, sample_mask)


def generalized_dice_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    *,
    include_background: bool = True,
    sigmoid: bool = False,
    softmax: bool = True,
    to_onehot_y: bool = True,
    w_type: str = "square",
    batch: bool = True,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MONAI GeneralizedDiceLoss parity (get_loss.py:79-84)."""
    pred, target = _prepare(
        pred, target, sigmoid=sigmoid, softmax=softmax,
        to_onehot_y=to_onehot_y, include_background=include_background,
    )
    if sample_mask is not None and batch:
        m = _mask_cols(sample_mask, pred.ndim)
        pred, target = pred * m, target * m
    reduce_axes = tuple(range(1, pred.ndim - 1))
    if batch:
        reduce_axes = (0,) + reduce_axes

    intersection = jnp.sum(target * pred, axis=reduce_axes)
    ground_o = jnp.sum(target, axis=reduce_axes)
    pred_o = jnp.sum(pred, axis=reduce_axes)
    denominator = ground_o + pred_o

    if w_type == "square":
        w = 1.0 / jnp.square(ground_o)
    elif w_type == "simple":
        w = 1.0 / ground_o
    else:
        w = jnp.ones_like(ground_o)
    infs = jnp.isinf(w)
    w = jnp.where(infs, 0.0, w)
    if batch:
        w = w + infs.astype(w.dtype) * jnp.max(w)
    else:
        max_values = jnp.max(w, axis=1, keepdims=True)
        w = w + infs.astype(w.dtype) * max_values

    reduce_dim = 0 if batch else 1
    numer = 2.0 * jnp.sum(intersection * w, axis=reduce_dim, keepdims=True) + smooth_nr
    denom = jnp.sum(denominator * w, axis=reduce_dim, keepdims=True) + smooth_dr
    if not batch and sample_mask is not None:
        return _masked_mean(1.0 - numer / denom, sample_mask)
    return jnp.mean(1.0 - numer / denom)
