"""BraTS standalone scorer and misc utility tests."""

import os

import numpy as np
import pytest

from fcd_tpu.data import nifti
from fcd_tpu.data.misc import copy_thickness_maps, delete_folders
from fcd_tpu.metrics.brats_scorer import (
    get_lesion_wise_results,
    get_sensitivity_and_specificity,
    get_tissue_wise_seg,
)


def test_tissue_wise_seg():
    pred = np.array([0, 1, 2, 3, 4])
    gt = np.array([3, 3, 0, 1, 2])
    p, g = get_tissue_wise_seg(pred.copy(), gt.copy(), "WT")
    np.testing.assert_array_equal(p, [0, 1, 1, 1, 0])
    np.testing.assert_array_equal(g, [1, 1, 0, 1, 1])
    p, g = get_tissue_wise_seg(pred.copy(), gt.copy(), "TC")
    np.testing.assert_array_equal(p, [0, 1, 0, 1, 0])
    p, g = get_tissue_wise_seg(pred.copy(), gt.copy(), "ET")
    np.testing.assert_array_equal(p, [0, 0, 0, 1, 0])


def test_sensitivity_specificity():
    pred = np.array([1, 1, 0, 0])
    gt = np.array([1, 0, 1, 0])
    sens, spec = get_sensitivity_and_specificity(pred, gt)
    assert sens == pytest.approx(0.5)
    assert spec == pytest.approx(0.5)
    sens, spec = get_sensitivity_and_specificity(np.zeros(4), np.zeros(4))
    assert sens == 1.0


def test_lesion_wise_results_perfect(tmp_path):
    # multi-label volume: 1 = necrotic core, 2 = edema, 3 = enhancing
    vol = np.zeros((24, 24, 24), np.float32)
    vol[4:8, 4:8, 4:8] = 1
    vol[8:12, 4:8, 4:8] = 2
    vol[6:8, 6:8, 6:8] = 3
    pred_p = str(tmp_path / "pred.nii.gz")
    gt_p = str(tmp_path / "gt.nii.gz")
    nifti.save(pred_p, vol)
    nifti.save(gt_p, vol)

    df = get_lesion_wise_results(pred_p, gt_p, "BraTS-GLI",
                                 output=str(tmp_path / "out.csv"))
    assert list(df["Labels"]) == ["WT", "TC", "ET"]
    assert (df["Legacy_Dice"] == 1.0).all()
    assert (df["Legacy_HD95"] == 0.0).all()
    assert (df["Num_FP"] == 0).all()
    assert os.path.exists(tmp_path / "out.csv")


def test_lesion_wise_results_fp_penalty(tmp_path):
    gt = np.zeros((24, 24, 24), np.float32)
    gt[4:10, 4:10, 4:10] = 1
    pred = gt.copy()
    pred[16:20, 16:20, 16:20] = 1  # extra false-positive lesion
    pred_p, gt_p = str(tmp_path / "p.nii.gz"), str(tmp_path / "g.nii.gz")
    nifti.save(pred_p, pred)
    nifti.save(gt_p, gt)
    df = get_lesion_wise_results(pred_p, gt_p, "BraTS-GLI")
    wt = df[df["Labels"] == "WT"].iloc[0]
    assert wt["Num_FP"] == 1
    # FP penalty pulls lesion-wise HD95 toward 374/2
    assert wt["LesionWise_Score_HD95"] == pytest.approx(374 / 2, rel=0.01)
    assert 0.4 < wt["LesionWise_Score_Dice"] <= 0.51


def test_copy_thickness_maps_and_delete_folders(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    for s in ["sub-01", "sub-02"]:
        os.makedirs(src / s)
        nifti.save(str(src / s / "thickness.nii.gz"), np.zeros((4, 4, 4), np.float32))
    copied = copy_thickness_maps(str(src), str(dst))
    assert len(copied) == 2
    assert (dst / "sub-01" / "anat" / "thickness.nii.gz").exists()

    names = tmp_path / "names.txt"
    names.write_text("sub-01\nmissing\n")
    n = delete_folders(str(src), str(names))
    assert n == 1
    assert not (src / "sub-01").exists()


def test_inspect_cli(tmp_path, capsys):
    from fcd_tpu.cli.inspect import inspect_nifti

    p = str(tmp_path / "x.nii.gz")
    nifti.save(p, np.random.RandomState(0).rand(6, 7, 8).astype(np.float32))
    info = inspect_nifti(p, plot=str(tmp_path / "slices.png"))
    assert info["shape"] == (6, 7, 8)
    assert (tmp_path / "slices.png").exists()
