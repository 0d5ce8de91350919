"""Loss parity tests: jax implementations vs torch / independent numpy."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from fcd_tpu.losses.dice import (
    cross_entropy_loss,
    dice_loss,
    focal_loss,
    generalized_dice_loss,
    one_hot,
)
from fcd_tpu.losses.extras import boundary_loss, dilate_mask, total_variation_loss
from fcd_tpu.losses.combined import make_combined_loss
from fcd_tpu.config import get_default_params


def _rand_pred_target(shape=(2, 8, 8, 8), n_ch=2, seed=0):
    rng = np.random.RandomState(seed)
    pred = rng.randn(*shape, n_ch).astype(np.float32)
    target = rng.randint(0, n_ch, size=shape + (1,)).astype(np.float32)
    return pred, target


def _np_dice_reference(pred, target, include_background=False, batch=True,
                       smooth=1e-5, squared=False, jaccard=False):
    """Independent numpy transcription of the MONAI DiceLoss formula."""
    p = np.exp(pred) / np.exp(pred).sum(-1, keepdims=True)  # softmax
    n_ch = pred.shape[-1]
    t = np.eye(n_ch)[target[..., 0].astype(int)]
    if not include_background:
        p, t = p[..., 1:], t[..., 1:]
    axes = tuple(range(1, p.ndim - 1))
    if batch:
        axes = (0,) + axes
    inter = (p * t).sum(axes)
    if squared:
        denom = (p ** 2).sum(axes) + (t ** 2).sum(axes)
    else:
        denom = p.sum(axes) + t.sum(axes)
    if jaccard:
        denom = 2 * (denom - inter)
    return float(np.mean(1 - (2 * inter + smooth) / (denom + smooth)))


def test_dice_loss_matches_reference_formula():
    pred, target = _rand_pred_target()
    got = float(dice_loss(jnp.asarray(pred), jnp.asarray(target)))
    want = _np_dice_reference(pred, target)
    assert abs(got - want) < 1e-6


def test_dice_loss_perfect_prediction_near_zero():
    target = np.zeros((1, 8, 8, 8, 1), np.float32)
    target[0, 2:5, 2:5, 2:5, 0] = 1
    pred = np.concatenate([10 * (1 - target), 10 * target], axis=-1)
    got = float(dice_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert got < 1e-3


@pytest.mark.parametrize("squared,jaccard", [(True, False), (False, True)])
def test_dice_loss_variants(squared, jaccard):
    pred, target = _rand_pred_target(seed=3)
    got = float(dice_loss(jnp.asarray(pred), jnp.asarray(target),
                          squared_pred=squared, jaccard=jaccard))
    want = _np_dice_reference(pred, target, squared=squared, jaccard=jaccard)
    assert abs(got - want) < 1e-6


def test_cross_entropy_matches_torch():
    pred, target = _rand_pred_target(seed=1)
    weight = np.array([0.5, 0.5], np.float32)
    got = float(cross_entropy_loss(jnp.asarray(pred), jnp.asarray(target),
                                   weight=jnp.asarray(weight)))
    # torch layout: (B, C, D, H, W)
    tp = torch.tensor(np.moveaxis(pred, -1, 1))
    tt = torch.tensor(target[..., 0]).long()
    want = torch.nn.CrossEntropyLoss(weight=torch.tensor(weight))(tp, tt).item()
    assert abs(got - want) < 1e-5


def test_focal_loss_softmax_form():
    pred, target = _rand_pred_target(seed=2)
    got = float(focal_loss(jnp.asarray(pred), jnp.asarray(target), gamma=2.0))
    # independent torch computation of the softmax focal form
    tp = torch.tensor(pred)
    tt = torch.tensor(np.eye(2)[target[..., 0].astype(int)]).float()
    logp = torch.log_softmax(tp, dim=-1)[..., 1:]
    t = tt[..., 1:]
    p = logp.exp()
    want = float((-((1 - p) ** 2.0) * logp * t).mean())
    assert abs(got - want) < 1e-6


def test_generalized_dice_handles_empty_class():
    pred, target = _rand_pred_target(seed=4)
    target[..., 0] = 0.0  # no foreground -> 1/0^2 weight must be neutralized
    got = float(generalized_dice_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert np.isfinite(got)


def test_tv_loss_shifted_difference():
    pred, target = _rand_pred_target(seed=5)
    got = float(total_variation_loss(jnp.asarray(pred), jnp.asarray(target),
                                     norm=1, softmax=True, exclude_borders=False))
    p = np.exp(pred) / np.exp(pred).sum(-1, keepdims=True)
    p = p[..., 1:2]
    want = (
        np.abs(np.diff(p, axis=1)).mean()
        + np.abs(np.diff(p, axis=2)).mean()
        + np.abs(np.diff(p, axis=3)).mean()
    )
    assert abs(got - want) < 1e-6


def test_dilate_mask_matches_conv_threshold():
    mask = np.zeros((1, 8, 8, 8, 1), np.float32)
    mask[0, 4, 4, 4, 0] = 1
    out = np.asarray(dilate_mask(jnp.asarray(mask), kernel_size=3, iterations=1))
    assert out.sum() == 27  # 3x3x3 cube


def test_boundary_loss_matches_np_gradient():
    pred, target = _rand_pred_target(seed=6, n_ch=1)
    got = float(boundary_loss(jnp.asarray(pred), jnp.asarray(target)))
    want = np.mean(
        [
            np.abs(np.gradient(pred, axis=ax) - np.gradient(target, axis=ax)).mean()
            for ax in (1, 2, 3)
        ]
    )
    assert abs(got - want) < 1e-6


def test_combined_loss_runs_all_terms():
    params = get_default_params()
    params.update(
        loss="DiceCELoss", tv_loss_weight=0.1, boundaryloss_weight=0.3,
        caloss_weight=0.1, tvloss_exclude_borders=True,
    )
    fn = make_combined_loss(params)
    pred, target = _rand_pred_target(seed=7)
    thickness = np.random.RandomState(8).rand(2, 8, 8, 8, 1).astype(np.float32)
    val = float(fn(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(thickness)))
    assert np.isfinite(val) and val > 0


def test_one_hot():
    t = jnp.asarray(np.array([[[0.0], [1.0]]]))
    oh = np.asarray(one_hot(t, 2))
    assert oh.shape == (1, 2, 2)
    assert np.array_equal(oh[0], [[1, 0], [0, 1]])


@pytest.mark.parametrize("loss_type", [
    "DiceLoss", "DiceCELoss", "DiceFocalLoss", "GeneralizedDiceLoss",
    "GeneralizedDiceFocalLoss",
])
def test_sample_mask_excludes_padded_samples(loss_type):
    """Pad-and-mask exactness: loss(padded batch, mask) == loss(real batch)
    for every main loss family plus the TV/boundary extras."""
    from fcd_tpu.config import get_default_params
    from fcd_tpu.losses.combined import make_combined_loss

    params = get_default_params()
    params.update(chans_out=2, loss=loss_type, tv_loss_weight=0.1,
                  boundaryloss_weight=0.1)
    loss_fn = make_combined_loss(params)

    rng = np.random.RandomState(0)
    n, pad = 3, 2
    pred = rng.normal(size=(n, 6, 6, 6, 2)).astype(np.float32)
    tgt = (rng.rand(n, 6, 6, 6, 1) > 0.6).astype(np.float32)
    base = float(loss_fn(jnp.asarray(pred), jnp.asarray(tgt)))

    idx = np.arange(n + pad) % n
    mask = (np.arange(n + pad) < n).astype(np.float32)
    masked = float(loss_fn(jnp.asarray(pred[idx]), jnp.asarray(tgt[idx]),
                           None, jnp.asarray(mask)))
    assert masked == pytest.approx(base, rel=1e-6)
