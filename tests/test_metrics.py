"""Voxel and lesion-wise metric tests."""

import numpy as np
import pytest
import torch

from fcd_tpu.metrics import (
    calculate_lesion_wise_metrics,
    calculate_subject_level_metrics,
    calculate_voxel_level_metrics,
    hausdorff_distance_95,
    roc_auc,
)


def _vols(seed=0, n=3, shape=(20, 22, 18)):
    rng = np.random.RandomState(seed)
    preds, trues = [], []
    for _ in range(n):
        preds.append((rng.rand(*shape) > 0.7).astype(np.float32))
        trues.append((rng.rand(*shape) > 0.7).astype(np.float32))
    return preds, trues


def test_voxel_metrics_formulas():
    preds, trues = _vols()
    m = calculate_voxel_level_metrics(preds, trues)
    # independent computation: per-sample then mean
    dcs, precs, senss, f1s = [], [], [], []
    for p, t in zip(preds, trues):
        tp = (p * t).sum(); fp = (p * (1 - t)).sum(); fn = ((1 - p) * t).sum()
        dcs.append(2 * tp / (p.sum() + t.sum()))
        precs.append(tp / (tp + fp))
        senss.append(tp / (tp + fn))
        f1s.append(2 * tp / (2 * tp + fp + fn))
    assert m["DC"] == pytest.approx(np.mean(dcs))
    assert m["Prec"] == pytest.approx(np.mean(precs))
    assert m["Sens"] == pytest.approx(np.mean(senss))
    assert m["F1"] == pytest.approx(np.mean(f1s))


def test_voxel_metrics_empty_cases():
    z = np.zeros((8, 8, 8), np.float32)
    o = np.zeros((8, 8, 8), np.float32); o[2:4, 2:4, 2:4] = 1
    m = calculate_voxel_level_metrics([z, o], [z, o])
    assert m["DC"] == pytest.approx(1.0)  # empty-empty sample is nan -> ignored


def test_roc_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.RandomState(0)
    scores = rng.rand(1000)
    labels = (rng.rand(1000) > 0.6).astype(float)
    assert roc_auc(scores, labels) == pytest.approx(roc_auc_score(labels, scores))
    # with heavy ties (binarized scores, like the reference feeds it)
    b = (scores > 0.5).astype(float)
    assert roc_auc(b, labels) == pytest.approx(roc_auc_score(labels, b))


def test_hd95_identical_masks_zero():
    m = np.zeros((16, 16, 16), bool)
    m[4:10, 4:10, 4:10] = True
    assert hausdorff_distance_95(m, m) == 0.0


def test_hd95_translated_cube():
    a = np.zeros((20, 20, 20), bool); a[4:10, 4:10, 4:10] = True
    b = np.zeros((20, 20, 20), bool); b[6:12, 4:10, 4:10] = True
    v = hausdorff_distance_95(a, b)
    assert 1.0 <= v <= 3.0  # 2-voxel shift


def test_hd95_empty_mask_nan():
    a = np.zeros((8, 8, 8), bool)
    b = np.zeros((8, 8, 8), bool); b[2:4, 2:4, 2:4] = True
    assert np.isnan(hausdorff_distance_95(a, b))


def test_lesion_metrics_perfect_prediction():
    gt = np.zeros((24, 24, 24), np.float32)
    gt[4:9, 4:9, 4:9] = 1
    gt[15:19, 15:19, 15:19] = 1
    m = calculate_lesion_wise_metrics([gt], [gt])
    assert m["Lesion_Sens"] == 1.0 and m["Lesion_Prec"] == 1.0
    assert m["Lesion_Dice"] == pytest.approx(1.0)
    assert m["Lesion_HD95"] == pytest.approx(0.0)
    assert m["Lesion_FP"] == 0 and m["Lesion_FN"] == 0
    assert m["sSens"] == 1.0


def test_lesion_metrics_miss_and_false_positive():
    gt = np.zeros((24, 24, 24), np.float32)
    gt[4:8, 4:8, 4:8] = 1
    pred = np.zeros_like(gt)
    pred[16:20, 16:20, 16:20] = 1  # far away: FP, and the GT lesion is FN
    m = calculate_lesion_wise_metrics([pred], [gt])
    assert m["Lesion_FP"] == 1 and m["Lesion_FN"] == 1
    assert m["Lesion_Sens"] == 0.0
    assert m["sSens"] == 0.0


def test_lesion_metrics_merge_by_dilation():
    # two GT blobs 2 voxels apart merge after 3 dilations -> ONE lesion
    gt = np.zeros((24, 24, 24), np.float32)
    gt[4:8, 4:8, 4:8] = 1
    gt[4:8, 4:8, 10:14] = 1
    pred = gt.copy()
    m = calculate_lesion_wise_metrics([pred], [gt])
    assert m["Lesion_Sens"] == 1.0
    assert m["Lesion_Dice"] == pytest.approx(1.0)


def test_lesion_metrics_nearby_pred_matches_via_dilation():
    gt = np.zeros((24, 24, 24), np.float32)
    gt[4:8, 4:8, 4:8] = 1
    pred = np.zeros_like(gt)
    pred[5:9, 5:9, 6:11] = 1  # overlaps GT partially, tail into dilated zone
    m = calculate_lesion_wise_metrics([pred], [gt])
    assert m["Lesion_Sens"] == 1.0  # matched via dilation
    assert m["Lesion_FP"] == 0
    assert 0 < m["Lesion_Dice"] < 1


def test_lesion_metrics_penalized_golden():
    """Hand-computed penalized aggregates (reference metrics.py:274-343).

    Subject A: one GT lesion matched exactly (dice 1, hd95 0) + one distant
    FP lesion. Subject B: one GT lesion entirely missed.
      A: denom = 1 lesion + 1 FP + 0 FN -> dice_pen = 1/2, hd95_pen = 374/2
      B: denom = 1 lesion + 0 FP + 1 FN -> dice_pen = 0/2, hd95_pen = 374/2
      micro lists (NaN-corrected): dice [1, 0(FP), 0(B)] -> 1/3,
      hd95 [0, 374(FP), 374(B)] -> 2*374/3
    """
    shape = (24, 24, 24)
    gt = np.zeros(shape, np.float32)
    gt[4:9, 4:9, 4:9] = 1
    pred_a = gt.copy()
    pred_a[16:20, 16:20, 16:20] = 1  # far outside the 6-voxel dilation reach
    pred_b = np.zeros(shape, np.float32)

    m = calculate_lesion_wise_metrics([pred_a, pred_b], [gt, gt], extended=True)
    assert m["Lesion_Dice_penalized_macro"] == pytest.approx(0.25)
    assert m["Lesion_HD95_penalized_macro"] == pytest.approx(187.0)
    assert m["Lesion_Dice_penalized"] == pytest.approx(1 / 3)
    assert m["Lesion_HD95_penalized"] == pytest.approx(2 * 374 / 3)
    assert m["Lesion_Prec_macro"] == pytest.approx(0.75)   # mean(1/2, 1)
    assert m["Lesion_Sens_macro"] == pytest.approx(0.5)    # mean(1, 0)
    assert m["Lesion_F1_macro"] == pytest.approx(1 / 3)    # mean(2/3, 0)
    assert m["Lesion_Dice_macro"] == pytest.approx(1.0)    # nanmean(1, nan)
    assert m["Lesion_HD95_macro"] == pytest.approx(0.0)
    assert m["Lesion_FP"] == 0.5 and m["Lesion_FN"] == 0.5

    # custom penalty distance actually flows through
    m2 = calculate_lesion_wise_metrics(
        [pred_a, pred_b], [gt, gt], extended=True, penalty_distance=100.0
    )
    assert m2["Lesion_HD95_penalized"] == pytest.approx(200 / 3)

    # default call keeps the reference's returned-dict surface
    m0 = calculate_lesion_wise_metrics([pred_a, pred_b], [gt, gt])
    assert "Lesion_Dice_penalized" not in m0
    assert "Lesion_Prec_macro" not in m0


def test_subject_level_metrics():
    gt = np.zeros((16, 16, 16), np.float32); gt[2:5, 2:5, 2:5] = 1
    hit = gt.copy()
    miss = np.zeros_like(gt); miss[10:12, 10:12, 10:12] = 1
    m = calculate_subject_level_metrics([hit, miss], [gt, gt])
    assert m["sSens"] == 0.5
    assert m["nFPC"] == 0.5  # one FP cluster over two subjects
