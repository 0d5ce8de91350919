"""NIfTI I/O, orientation, and manifest tests."""

import os

import numpy as np
import pytest

from fcd_tpu.data import nifti
from fcd_tpu.data.manifest import get_data, read_split_file


def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vol = rng.rand(7, 9, 11).astype(np.float32)
    affine = np.array(
        [[1.0, 0, 0, -3.5], [0, 2.0, 0, -9.0], [0, 0, 1.5, 2.0], [0, 0, 0, 1]]
    )
    p = str(tmp_path / "x.nii.gz")
    nifti.save(p, vol, affine)
    img = nifti.load(p)
    np.testing.assert_allclose(img.data, vol, rtol=1e-6)
    np.testing.assert_allclose(img.affine, affine, rtol=1e-5)
    assert img.spacing == pytest.approx((1.0, 2.0, 1.5))


def test_nifti_uncompressed_and_int(tmp_path):
    vol = (np.arange(24).reshape(2, 3, 4) % 7).astype(np.int16)
    p = str(tmp_path / "y.nii")
    nifti.save(p, vol)
    img = nifti.load(p, dtype=None)
    np.testing.assert_array_equal(img.data, vol)


def test_to_ras_reorients_flips_and_transposes():
    vol = np.random.RandomState(1).rand(4, 5, 6).astype(np.float32)
    # LPS-oriented affine (flip x and y) with a transpose of axes 0 and 2
    aff = np.array(
        [
            [0, 0, -1.0, 3.0],
            [0, -1.0, 0, 4.0],
            [1.0, 0, 0, -5.0],
            [0, 0, 0, 1.0],
        ]
    )
    out, new_aff = nifti.to_ras(vol, aff)
    # world position of voxel (i,j,k) must be preserved
    for idx in [(0, 0, 0), (3, 4, 5), (1, 2, 3)]:
        world_orig = aff @ np.array([*idx, 1.0])
        # find voxel in out with same value
        val = vol[idx]
        pos = np.argwhere(np.isclose(out, val))[0]
        world_new = new_aff @ np.array([*pos, 1.0])
        np.testing.assert_allclose(world_new, world_orig, atol=1e-5)
    # resulting affine must be RAS+ (positive diagonal-dominant rotation)
    R = new_aff[:3, :3]
    assert np.all(np.diag(R) > 0)


def test_manifest_and_split(tmp_path):
    # build two subjects, one missing flair -> skipped
    for subj, full in [("sub-01", True), ("sub-02", False)]:
        d = tmp_path / subj / "anat"
        os.makedirs(d)
        vol = np.zeros((4, 4, 4), np.float32)
        nifti.save(str(d / "t1_reg.nii.gz"), vol)
        if full:
            nifti.save(str(d / "flair_reg.nii.gz"), vol)
        nifti.save(str(d / "gt_reg.nii.gz"), vol)

    params = {"seq": "t1_reg+flair_reg"}
    entries = get_data(str(tmp_path), params)
    assert len(entries) == 1
    assert entries[0]["subject"] == "sub-01"
    assert len(entries[0]["image"]) == 2
    assert entries[0]["label"].endswith("gt_reg.nii.gz")

    split_file = tmp_path / "split.txt"
    split_file.write_text("sub-01 train\nsub-02 Val\nbadline\n")
    splits = read_split_file(str(split_file))
    assert splits == {"train": ["sub-01"], "val": ["sub-02"]}
