"""CombinedLoss: main Dice-family loss + weighted regularizers.

Parity target: get_loss.py:10-97. Builds a jittable closure from the
flat params dict: main loss selected by params['loss'], plus TV /
boundary / cortical-awareness terms when their weights are non-zero.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from fcd_tpu.losses.dice import (
    cross_entropy_loss,
    dice_loss,
    focal_loss,
    generalized_dice_loss,
)
from fcd_tpu.losses.extras import boundary_loss, cortical_boundary_loss, total_variation_loss

LossFn = Callable[..., jnp.ndarray]


def get_main_loss(params: Dict[str, Any]) -> Optional[LossFn]:
    """Select and configure the main loss (get_loss.py:42-97)."""
    loss_type = params.get("loss", "DiceLoss")
    common = dict(
        include_background=False,
        smooth_nr=1e-5,
        smooth_dr=1e-5,
        to_onehot_y=params["chans_out"] > 1,
        sigmoid=params["sigmoid"],
        softmax=params["softmax"],
        batch=True,
    )

    if loss_type == "DiceLoss":
        return partial(
            dice_loss, **common,
            squared_pred=params["square_pred"], jaccard=params["jaccard"],
        )

    if loss_type == "DiceCELoss":
        weight = jnp.asarray(
            [params["ce_background_weight"], params["ce_fcd_weight"]], jnp.float32
        )
        d = partial(
            dice_loss, **common,
            squared_pred=params["square_pred"], jaccard=params["jaccard"],
        )
        l_dice, l_ce = params["lambda_dice"], params["lambda_ce"]

        def dice_ce(pred, target, sample_mask=None):
            return l_dice * d(pred, target, sample_mask=sample_mask) + \
                l_ce * cross_entropy_loss(
                    pred, target, weight=weight, sample_mask=sample_mask
                )

        return dice_ce

    if loss_type == "DiceFocalLoss":
        d = partial(
            dice_loss, **common,
            squared_pred=params["square_pred"], jaccard=params["jaccard"],
        )
        f = partial(
            focal_loss,
            gamma=params["gamma_focal"],
            include_background=False,
            to_onehot_y=params["chans_out"] > 1,
            use_softmax=params["softmax"],
        )
        l_dice, l_focal = params["lambda_dice"], params["lambda_focal"]

        def dice_focal(pred, target, sample_mask=None):
            return (l_dice * d(pred, target, sample_mask=sample_mask)
                    + l_focal * f(pred, target, sample_mask=sample_mask))

        return dice_focal

    if loss_type == "GeneralizedDiceLoss":
        return partial(
            generalized_dice_loss,
            include_background=True,
            to_onehot_y=params["chans_out"] > 1,
            sigmoid=params["sigmoid"],
            softmax=params["softmax"],
            w_type=params["gdice_wtype"],
            batch=True,
        )

    if loss_type == "GeneralizedDiceFocalLoss":
        g = partial(
            generalized_dice_loss,
            include_background=True,
            to_onehot_y=params["chans_out"] > 1,
            sigmoid=params["sigmoid"],
            softmax=params["softmax"],
            w_type=params["gdice_wtype"],
            batch=True,
        )
        f = partial(
            focal_loss,
            gamma=params["gamma_focal"],
            include_background=True,
            to_onehot_y=params["chans_out"] > 1,
            use_softmax=params["softmax"],
        )
        l_g, l_focal = params["lambda_dice"], params["lambda_focal"]

        def gdice_focal(pred, target, sample_mask=None):
            return (l_g * g(pred, target, sample_mask=sample_mask)
                    + l_focal * f(pred, target, sample_mask=sample_mask))

        return gdice_focal

    return None


def s2d_loss_supported(params: Dict[str, Any]) -> bool:
    """Whether the loss can run on space-to-depth tensors: the Dice/CE/
    focal families are permutation-invariant over voxels, but the TV /
    boundary / cortical extras differentiate along spatial axes and need
    the dense layout."""
    return (
        params.get("tv_loss_weight", 0.0) == 0
        and params.get("boundaryloss_weight", 0.0) == 0
        and params.get("caloss_weight", 0.0) == 0
        and get_main_loss(params) is not None
    )


def make_combined_loss(params: Dict[str, Any], s2d: bool = False) -> LossFn:
    """CombinedLoss closure (get_loss.py:10-39).

    Returns loss_fn(pred_logits, target, thickness_map=None) -> scalar
    with pred (B, D, H, W, C) and target (B, D, H, W, 1).

    With s2d=True the closure instead consumes SPACE-TO-DEPTH tensors:
    pred (B, D/2, H/2, W/2, 8*C) s2d logits and target (B, D/2, H/2,
    W/2, 8) s2d labels. The Dice-family losses are voxel-permutation-
    invariant, so a lane reshape is the whole adapter — and the loss
    math then runs lane-dense instead of on the C=2-lane full-resolution
    layout (profiled ~25 ms/step at batch 4x128^3). Requires
    s2d_loss_supported(params)."""
    main = get_main_loss(params)
    if s2d:
        if not s2d_loss_supported(params):
            raise ValueError("s2d loss requires s2d_loss_supported(params)")

        def s2d_loss_fn(pred, target, thickness_map=None, sample_mask=None):
            b, d2, h2, w2, c8 = pred.shape
            return main(pred.reshape(b, d2, h2, w2, 8, c8 // 8),
                        target[..., None], sample_mask=sample_mask)

        return s2d_loss_fn
    tv_w = params.get("tv_loss_weight", 0.0)
    b_w = params.get("boundaryloss_weight", 0.0)
    ca_w = params.get("caloss_weight", 0.0)
    tv_norm = 2 if params.get("tv_loss_norm", "l1") == "l2" else 1
    tv_excl = params.get("tvloss_exclude_borders", False)
    sigmoid, softmax = params["sigmoid"], params["softmax"]

    def loss_fn(pred, target, thickness_map=None, sample_mask=None):
        # sample_mask (B,): 0/1 validity weights for ragged-batch DP
        # pad-and-mask — every term excludes padded samples exactly
        total = 0.0
        if main is not None:
            total = total + main(pred, target, sample_mask=sample_mask)
        if tv_w > 0:
            total = total + tv_w * total_variation_loss(
                pred, target, norm=tv_norm, sigmoid=sigmoid, softmax=softmax,
                exclude_borders=tv_excl, sample_mask=sample_mask,
            )
        if b_w > 0:
            total = total + b_w * boundary_loss(pred, target,
                                                sample_mask=sample_mask)
        if ca_w > 0 and thickness_map is not None:
            total = total + ca_w * cortical_boundary_loss(
                pred, thickness_map, sample_mask=sample_mask)
        return total

    return loss_fn
