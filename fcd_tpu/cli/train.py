"""Training/testing CLI: `python -m fcd_tpu.cli.train ...`.

Parity target: train.py:428-487 (main): default params + CLI + kwargs
overrides, derived chans_in from `seq`, timestamped save dirs, train/test
split dispatch, optional energy tracking.
"""

from __future__ import annotations

import os
from contextlib import nullcontext
from datetime import datetime

from fcd_tpu.cli.args import parse_args, parse_kwargs
from fcd_tpu.config import get_default_params
from fcd_tpu.data.manifest import read_split_file
from fcd_tpu.models.factory import get_model
from fcd_tpu.utils.energy import EmissionsTracker


def main(argv=None):
    from fcd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    params = get_default_params()
    args = parse_args(default_params=params, argv=argv)
    params["model_type"] = args.model_type
    if args.kwargs:
        params = parse_kwargs(params, args.kwargs)

    _, params = get_model(params, return_model=False)
    params["chans_in"] = len(params["seq"].split("+"))
    params["mesh_data"] = int(args.devices)

    from fcd_tpu.train.trainer import ModelTrainer

    trainer = ModelTrainer(params)
    if args.checkpoint_path:
        trainer.load_model(args.checkpoint_path, with_optimizer=False)

    split_dict = read_split_file(args.split_file)
    requested = {s.lower() for s in args.splits}

    if "train" in requested:
        train_subjects = split_dict.get("train", [])
        val_subjects = split_dict.get("val", [])
        test_subjects = split_dict.get("test", []) if "test" in requested else []

        if args.resume:
            save_dir = args.save_dir
        else:
            timestamp = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
            if args.prefix:
                timestamp = f"{args.prefix}_{timestamp}"
            save_dir = os.path.join(args.save_dir, params["model_type"], timestamp)
        os.makedirs(save_dir, exist_ok=True)

        context = (
            EmissionsTracker(project_name="fcd_detection", output_dir=save_dir,
                             output_file="train_emission.csv")
            if args.emission_tracking else nullcontext()
        )
        with context as tracker:
            trainer.train(args.data_dir, train_subjects, val_subjects, save_dir,
                          test_subjects, resume=args.resume)
        if args.emission_tracking and tracker is not None:
            print(f"\nCarbon emissions from computation: "
                  f"{tracker.final_emissions * 1000:.4f} g CO2eq")

    elif "test" in requested:
        test_subjects = split_dict.get("test", [])
        model_dir = os.path.dirname(args.checkpoint_path)
        stamp = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
        context = (
            EmissionsTracker(project_name="fcd_detection", output_dir=model_dir,
                             output_file=f"test_emission_{stamp}.csv")
            if args.emission_tracking else nullcontext()
        )
        with context as tracker:
            trainer.test(args.data_dir, test_subjects, post_process=False)
            trainer.test(args.data_dir, test_subjects, post_process=True)
        if args.emission_tracking and tracker is not None:
            print(f"\nCarbon emissions from computation: "
                  f"{tracker.final_emissions * 1000:.4f} g CO2eq")


if __name__ == "__main__":
    main()
