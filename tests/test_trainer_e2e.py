"""End-to-end trainer + CLI tests on a tiny synthetic dataset."""

import os

import numpy as np
import pytest

from fcd_tpu.data import nifti


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.RandomState(0)
    for subj in ["sub-01", "sub-02", "sub-03"]:
        d = root / subj / "anat"
        os.makedirs(d)
        vol = rng.rand(24, 24, 24).astype(np.float32) * 0.2
        gt = np.zeros_like(vol)
        gt[8:16, 8:16, 8:16] = 1
        vol = vol + gt * 0.8
        nifti.save(str(d / "t1_reg.nii.gz"), vol)
        nifti.save(str(d / "flair_reg.nii.gz"), vol * 0.9)
        nifti.save(str(d / "gt_reg.nii.gz"), gt)
    split = root / "split.txt"
    split.write_text("sub-01 train\nsub-02 val\nsub-03 test\n")
    return root


TINY_KWARGS = [
    "patch_size=16", "feature_size=4", "project_size=8", "max_epochs=2",
    "min_epochs=0", "warmup_epochs=1", "use_amp=False", "loss=DiceCELoss",
    "min_region_size=1", "samples_per_case=2", "keep_latest_model=True",
    "early_stopping_patience=50",
]


@pytest.mark.slow
def test_cli_train_and_resume(data_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("WANDB_MODE", "disabled")
    from fcd_tpu.cli.train import main

    save_root = tmp_path / "runs"
    argv = [
        "--data_dir", str(data_dir), "--split_file", str(data_dir / "split.txt"),
        "--splits", "train", "val", "--model_type", "BASEUNET",
        "--save_dir", str(save_root), "--kwargs", *TINY_KWARGS,
    ]
    main(argv)

    run_dirs = list((save_root / "BASEUNET").iterdir())
    assert len(run_dirs) == 1
    run_dir = run_dirs[0]
    assert (run_dir / "best_model.msgpack").exists()
    assert (run_dir / "latest_model.msgpack").exists()
    log = (run_dir / "training_log.csv").read_text().strip().splitlines()
    assert log[0].startswith("epoch,train_loss,val_loss,ema_val_loss")
    assert len(log) == 3  # header + 2 epochs

    # resume: continues from epoch 2 with more epochs
    argv_resume = [
        "--data_dir", str(data_dir), "--split_file", str(data_dir / "split.txt"),
        "--splits", "train", "val", "--model_type", "BASEUNET",
        "--save_dir", str(run_dir), "--resume", "--kwargs",
        *[k if not k.startswith("max_epochs") else "max_epochs=3" for k in TINY_KWARGS],
    ]
    main(argv_resume)
    log = (run_dir / "training_log.csv").read_text().strip().splitlines()
    # resume appends epoch 3
    assert any(line.startswith("3,") for line in log)


def test_trainer_test_path_with_metrics(data_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("WANDB_MODE", "disabled")
    from fcd_tpu.cli.args import parse_kwargs
    from fcd_tpu.config import get_default_params
    from fcd_tpu.models.factory import get_model
    from fcd_tpu.train.trainer import ModelTrainer

    params = get_default_params()
    params["model_type"] = "BASEUNET"
    params = parse_kwargs(params, TINY_KWARGS)
    _, params = get_model(params, return_model=False)
    params["chans_in"] = 2

    trainer = ModelTrainer(params, verbose=False)
    metrics = trainer.test(str(data_dir), ["sub-03"], post_process=True)
    for key in ["Prec", "Sens", "F1", "DC", "HD95", "Lesion_Prec", "Lesion_Sens",
                "Lesion_F1", "Lesion_Dice", "Lesion_HD95", "sSens",
                "Lesion_FP", "Lesion_FN"]:
        assert key in metrics, key


def test_cli_validation_errors(data_dir, tmp_path):
    from fcd_tpu.cli.train import main

    with pytest.raises(ValueError, match="must include 'val'"):
        main(["--data_dir", str(data_dir), "--split_file", str(data_dir / "split.txt"),
              "--splits", "train", "--save_dir", str(tmp_path)])
    with pytest.raises(ValueError, match="data_dir not found"):
        main(["--data_dir", "/nonexistent", "--split_file", str(data_dir / "split.txt")])


@pytest.fixture(scope="module")
def overfit_data_dir(tmp_path_factory):
    """One synthetic subject, 32^3 (MS_DSA_NET needs dims % 32 == 0), with
    an intensity-separable lesion."""
    root = tmp_path_factory.mktemp("ds_overfit")
    rng = np.random.RandomState(1)
    vol = rng.rand(32, 32, 32).astype(np.float32) * 0.2
    gt = np.zeros_like(vol)
    gt[8:24, 8:24, 8:24] = 1
    vol = vol + gt * 0.8
    # sub-02 = identical data as the val subject (monitoring only)
    for subj in ["sub-01", "sub-02"]:
        d = root / subj / "anat"
        os.makedirs(d)
        nifti.save(str(d / "t1_reg.nii.gz"), vol)
        nifti.save(str(d / "flair_reg.nii.gz"), vol * 0.9)
        nifti.save(str(d / "gt_reg.nii.gz"), gt)
    (root / "split.txt").write_text("sub-01 train\nsub-02 val\n")
    return root


@pytest.mark.slow
def test_overfit_one_sample_msdsanet(overfit_data_dir, tmp_path, monkeypatch):
    """SURVEY §4 plan item 3: the default MS_DSA_NET (tiny config) overfits
    one synthetic subject through the real CLI — train Dice > 0.9 on the
    post-train test pass, full metric row emitted."""
    monkeypatch.setenv("WANDB_MODE", "disabled")
    from fcd_tpu.cli.args import parse_kwargs
    from fcd_tpu.cli.train import main
    from fcd_tpu.config import get_default_params
    from fcd_tpu.models.factory import get_model
    from fcd_tpu.train.trainer import ModelTrainer

    kwargs = [
        "patch_size=32", "feature_size=4", "project_size=8",
        "max_epochs=28", "min_epochs=0", "warmup_epochs=2", "lr=1e-2",
        "use_amp=False", "loss=DiceCELoss", "samples_per_case=8",
        "batch_size=4", "early_stopping_patience=50", "min_region_size=1",
        "augment=False",
    ]
    save_root = tmp_path / "runs"
    main([
        "--data_dir", str(overfit_data_dir),
        "--split_file", str(overfit_data_dir / "split.txt"),
        "--splits", "train", "val", "--model_type", "MS_DSA_NET",
        "--save_dir", str(save_root), "--kwargs", *kwargs,
    ])
    run_dir = next((save_root / "MS_DSA_NET").iterdir())
    assert (run_dir / "best_model.msgpack").exists()

    # post-train test pass on the (single, trained-on) subject
    params = get_default_params()
    params["model_type"] = "MS_DSA_NET"
    params = parse_kwargs(params, kwargs)
    _, params = get_model(params, return_model=False)
    params["chans_in"] = 2
    trainer = ModelTrainer(params, verbose=False)
    trainer.load_model(str(run_dir / "best_model.msgpack"),
                       with_optimizer=False)
    metrics = trainer.test(str(overfit_data_dir), ["sub-01"],
                           post_process=False)
    assert metrics["DC"] > 0.9, metrics
    for key in ["Prec", "Sens", "F1", "DC", "Lesion_Dice", "sSens"]:
        assert key in metrics, key
