"""Standalone inference CLI: checkpoint -> sliding-window -> native-space
NIfTI segmentations + per-subject Dice/IoU table.

Parity target: seg_fcd_test.py:37-261 — load checkpoint, optional FSL
preprocessing, test transforms (RAS + 1mm Spacing + percentile scale,
get_transforms.py:123-139), sliding-window inference, softmax, inverse
spatial transform back to the native grid (Invertd semantics), argmax,
optional post-processing, NIfTI save, per-subject Dice/IoU with the
all-zero-GT edge case (seg_fcd_test.py:163-169).

Run: python -m fcd_tpu.cli.infer --data_dir ... --checkpoint_path ... --save_dir ...
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np

from fcd_tpu.cli.args import parse_kwargs
from fcd_tpu.config import get_default_params
from fcd_tpu.data import nifti
from fcd_tpu.data.manifest import get_data
from fcd_tpu.data.preprocess import (
    invert_to_grid,
    replace_nan,
    resample_spacing,
    scale_channels,
)
from fcd_tpu.models.factory import get_model


def run_inference(
    data_dir: str,
    save_dir: str,
    checkpoint_path: str,
    params: Dict,
    preprocess: bool = False,
    postprocess: bool = True,
    subjects=None,
) -> Dict[str, Dict[str, float]]:
    import jax
    import jax.numpy as jnp

    from fcd_tpu.postproc.segment import post_process_prediction
    from fcd_tpu.train.trainer import ModelTrainer

    os.makedirs(save_dir, exist_ok=True)

    if preprocess:
        from fcd_tpu.data.fsl import preprocess_dataset_fsl

        preprocessed = os.path.join(save_dir, "preprocessed")
        preprocess_dataset_fsl(data_dir, preprocessed, delete_intermediate_files=True)
        data_dir = preprocessed

    trainer = ModelTrainer(params, verbose=False)
    if checkpoint_path and os.path.exists(checkpoint_path):
        trainer.load_model(checkpoint_path, with_optimizer=False)
        print(f"pretrained model {checkpoint_path} loaded")
    else:
        print("no pretrained model found")

    entries = get_data(data_dir, params, subjects)
    metrics: Dict[str, Dict[str, float]] = {}

    for entry in entries:
        subj = entry.get("subject", "subject")
        # -- test transforms: RAS + Spacing 1mm + percentile scale ----------
        raw_imgs = [nifti.load(p) for p in entry["image"]]
        orig_shape = raw_imgs[0].data.shape
        orig_affine = raw_imgs[0].affine

        chans = []
        cur_affine = None
        for img in raw_imgs:
            data, aff = nifti.to_ras(replace_nan(img.data), img.affine)
            data, aff = resample_spacing(data, aff, (1.0, 1.0, 1.0), order=1)
            chans.append(data)
            cur_affine = aff
        image = scale_channels(np.stack(chans, axis=-1))

        # -- inference -------------------------------------------------------
        logits = trainer.inference(image)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))

        # -- inverse spatial transform (Invertd) + argmax ---------------------
        native_probs = invert_to_grid(probs, cur_affine, orig_shape, orig_affine,
                                      order=1)
        pred = np.argmax(native_probs, axis=-1).astype(np.float32)
        if postprocess:
            onehot = np.stack([1.0 - pred, pred], axis=-1)[None]
            onehot = post_process_prediction(onehot, params["min_region_size"])
            pred = onehot[0, ..., 1]

        # -- save native-space segmentation ----------------------------------
        out_dir = os.path.join(save_dir, subj)
        os.makedirs(out_dir, exist_ok=True)
        nifti.save(os.path.join(out_dir, f"{subj}_seg.nii.gz"),
                   pred.astype(np.uint8), orig_affine)

        # -- per-subject Dice/IoU against the native-space label -------------
        if "label" in entry:
            gt = (nifti.load(entry["label"]).data > 0).astype(np.float32)
            if gt.sum() == 0:
                dice = iou = 1.0 if pred.sum() == 0 else 0.0
            else:
                inter = float((pred * gt).sum())
                union = float(((pred + gt) > 0).sum())
                denom = float(pred.sum() + gt.sum())
                dice = 2 * inter / denom if denom > 0 else np.nan
                iou = inter / union if union > 0 else np.nan
            metrics[subj] = {"dice": dice, "iou": iou}

    if metrics:
        print("Subject, Dice, IOU")
        for name, m in metrics.items():
            print(f"{name}, {m['dice']:.4f}, {m['iou']:.4f}")
        print(
            f"Average Dice: {np.mean([m['dice'] for m in metrics.values()]):.4f}, "
            f"Average IOU: {np.mean([m['iou'] for m in metrics.values()]):.4f}"
        )
    return metrics


def main(argv=None):
    from fcd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser(description="FCD segmentation inference (TPU)")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("--model_type", type=str, default=None)
    parser.add_argument("--preprocess", action="store_true",
                        help="Run FSL registration first")
    parser.add_argument("--no_postprocess", action="store_true")
    parser.add_argument("--kwargs", nargs="*", help="key=value param overrides")
    args = parser.parse_args(argv)

    params = get_default_params()
    if args.model_type:
        params["model_type"] = args.model_type
    if args.kwargs:
        params = parse_kwargs(params, args.kwargs)
    _, params = get_model(params, return_model=False)
    params["chans_in"] = len(params["seq"].split("+"))

    run_inference(
        args.data_dir, args.save_dir, args.checkpoint_path, params,
        preprocess=args.preprocess, postprocess=not args.no_postprocess,
    )


if __name__ == "__main__":
    main()
