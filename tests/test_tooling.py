"""Dataset organization, k-fold generation, and inference CLI tests."""

import os

import numpy as np
import pytest

from fcd_tpu.data import nifti
from fcd_tpu.data.organize import (
    create_kfold_splits,
    deorganize_data,
    load_split_assignments,
    organize_data_splits,
    save_kfold_splits,
    save_split_assignments,
)


def _make_subjects(root, n, labeled_frac=0.8):
    rng = np.random.RandomState(0)
    for i in range(n):
        d = root / f"sub-{i:02d}"
        os.makedirs(d)
        vol = rng.rand(8, 8, 8).astype(np.float32)
        nifti.save(str(d / "t1_reg.nii.gz"), vol)
        gt = np.zeros((8, 8, 8), np.float32)
        if i < int(n * labeled_frac):
            gt[2:4, 2:4, 2:4] = 1
        nifti.save(str(d / "gt_reg.nii.gz"), gt)


def test_organize_and_deorganize_roundtrip(tmp_path):
    _make_subjects(tmp_path, 10)
    summary = organize_data_splits(str(tmp_path), 0.5, 0.25, 0.25, seed=1)
    assert summary["labeled_subjects"] == 8
    assert summary["unlabeled_subjects"] == 2
    assert summary["train_subjects"] == 4
    assert summary["val_subjects"] == 2
    assert summary["test_subjects"] == 2
    assert os.path.exists(tmp_path / "split_assignments.txt")
    assert len(list((tmp_path / "train").iterdir())) == 4
    deorganize_data(str(tmp_path))
    assert len(list((tmp_path / "train").iterdir())) == 0
    subs = [d for d in os.listdir(tmp_path) if d.startswith("sub-")]
    assert len(subs) == 10


def test_split_assignments_roundtrip(tmp_path):
    d = {"train": ["b", "a"], "val": ["c"], "test": ["d"]}
    path = str(tmp_path / "s.txt")
    save_split_assignments(d, path)
    loaded = load_split_assignments(path)
    assert loaded == {"train": ["a", "b"], "val": ["c"], "test": ["d"]}


def test_kfold_matches_sklearn_partition(tmp_path):
    from sklearn.model_selection import KFold

    _make_subjects(tmp_path, 17)
    splits = create_kfold_splits(str(tmp_path), k=5, val_fraction=0.1, random_seed=42)
    assert len(splits) == 5
    subjects = sorted(d for d in os.listdir(tmp_path) if d.startswith("sub-"))
    kf = KFold(n_splits=5, shuffle=True, random_state=42)
    for split, (train_idx, test_idx) in zip(splits, kf.split(subjects)):
        want_test = sorted(subjects[i] for i in test_idx)
        assert sorted(split["test"]) == want_test
        # train + val partition the remaining subjects
        assert sorted(split["train"] + split["val"]) == sorted(
            subjects[i] for i in train_idx
        )
        assert len(split["val"]) == max(1, int(len(train_idx) * 0.1))
        # every subject appears exactly once per fold
        assert len(set(split["train"]) | set(split["val"]) | set(split["test"])) == 17


def test_save_kfold_splits_files(tmp_path):
    _make_subjects(tmp_path, 8)
    out = tmp_path / "folds"
    paths = save_kfold_splits(str(tmp_path), str(out), k=3)
    assert len(paths) == 3
    loaded = load_split_assignments(paths[0])
    assert loaded["train"] and loaded["val"] and loaded["test"]


@pytest.mark.slow
def test_infer_cli_end_to_end(tmp_path, monkeypatch):
    """Checkpoint -> python -m fcd_tpu.cli.infer -> native NIfTI + metrics."""
    monkeypatch.setenv("WANDB_MODE", "disabled")
    rng = np.random.RandomState(0)
    data = tmp_path / "data"
    for subj in ["sub-01"]:
        d = data / subj / "anat"
        os.makedirs(d)
        vol = rng.rand(24, 24, 24).astype(np.float32) * 0.2
        gt = np.zeros_like(vol)
        gt[8:16, 8:16, 8:16] = 1
        # non-identity affine: 2mm spacing so Spacingd(1mm) actually resamples
        aff = np.diag([2.0, 2.0, 2.0, 1.0])
        nifti.save(str(d / "t1_reg.nii.gz"), vol + gt * 0.8, aff)
        nifti.save(str(d / "flair_reg.nii.gz"), (vol + gt * 0.8) * 0.9, aff)
        nifti.save(str(d / "gt_reg.nii.gz"), gt, aff)

    # make a checkpoint with a tiny model
    from fcd_tpu.cli.args import parse_kwargs
    from fcd_tpu.config import get_default_params
    from fcd_tpu.models.factory import get_model
    from fcd_tpu.train.trainer import ModelTrainer

    kwargs = ["patch_size=16", "feature_size=4", "use_amp=False",
              "min_region_size=1"]
    params = get_default_params()
    params["model_type"] = "BASEUNET"
    params = parse_kwargs(params, kwargs)
    _, params = get_model(params, return_model=False)
    params["chans_in"] = 2
    trainer = ModelTrainer(params, verbose=False)
    ckpt_path = str(tmp_path / "model.msgpack")
    trainer.save_model(ckpt_path, epoch=0)

    from fcd_tpu.cli.infer import main

    out_dir = tmp_path / "out"
    main([
        "--data_dir", str(data), "--save_dir", str(out_dir),
        "--checkpoint_path", ckpt_path, "--model_type", "BASEUNET",
        "--kwargs", *kwargs,
    ])
    seg_path = out_dir / "sub-01" / "sub-01_seg.nii.gz"
    assert seg_path.exists()
    seg = nifti.load(str(seg_path), dtype=None)
    assert seg.data.shape == (24, 24, 24)  # native grid, not the 1mm grid
    assert np.linalg.norm(seg.affine[:3, 0]) == pytest.approx(2.0)
    assert set(np.unique(seg.data)) <= {0, 1}
