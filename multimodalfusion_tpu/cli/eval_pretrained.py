"""Stage-4 evaluation CLI (c-index + integrated Brier score) — rewrite of
ref eval_pretrained.py.  Args are hydrated from the experiment settings
txt written by main_pretrained (ref :104-121), parsed safely with
ast.literal_eval instead of eval()."""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

from multimodalfusion_tpu.data.io import save_pkl
from multimodalfusion_tpu.data.survival_dataset import SurvivalDataset
from multimodalfusion_tpu.engine.evaluate import eval_model
from multimodalfusion_tpu.utils.experiment import read_settings


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate pretrained-head folds")
    p.add_argument("--model_path", type=str, required=True,
                   help="results dir containing experiment_*.txt and "
                        "s_{k}_minloss_checkpoint.msgpack")
    p.add_argument("--results_dir", type=str, default=None,
                   help="where eval outputs go (default: model_path)")
    p.add_argument("--k_start", type=int, default=-1)
    p.add_argument("--k_end", type=int, default=-1)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--which_splits", type=str, default=None,
                   help="evaluate against a different split set: replaces "
                        "the last component of the training split_dir "
                        "(ref eval_pretrained.py:97,120 rebuilds "
                        "splits/{cancer_type}/{which_splits})")
    p.add_argument("--split_mode", type=str, default=None,
                   choices=["train_val", "train_val_test"],
                   help="override the training run's split_mode "
                        "(ref eval_pretrained.py:99)")
    p.add_argument("--overwrite", action="store_true", default=False,
                   help="re-evaluate even if eval_summary.csv already "
                        "exists (ref eval_pretrained.py:101,160-162)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    exp_code = os.path.basename(os.path.normpath(args.model_path))
    settings_path = os.path.join(args.model_path,
                                 f"experiment_{exp_code}.txt")
    settings = read_settings(settings_path)
    out_dir = args.results_dir or args.model_path
    os.makedirs(out_dir, exist_ok=True)
    summary_path = os.path.join(out_dir, "eval_summary.csv")
    if os.path.exists(summary_path) and not args.overwrite:
        print(f"eval results already exist at {summary_path} — pass "
              "--overwrite to re-evaluate (ref eval_pretrained.py:160)")
        return 0
    if args.which_splits:
        # point the settings' split_dir at a sibling split set
        # (ref eval_pretrained.py:120: splits/{cancer}/{which_splits})
        settings["split_dir"] = os.path.join(
            os.path.dirname(os.path.normpath(settings["split_dir"])),
            args.which_splits)

    dataset = SurvivalDataset(
        csv_path=settings["csv_path"], mode=settings["mode"],
        modalities=settings["radio_modality"],
        data_dir=settings["data_root_dir"],
        n_bins=settings["n_classes"], label_col="survival_months",
        seed=settings["seed"], pretrained=True, print_info=True)

    split_mode = args.split_mode or settings.get("split_mode", "train_val")
    k = settings["num_splits"]
    start = 0 if args.k_start == -1 else args.k_start
    end = k if args.k_end == -1 else args.k_end
    folds = list(range(start, end))
    rows = []
    for i in folds:
        split_csv = os.path.join(settings["split_dir"], f"splits_{i}.csv")
        keys = (("train", "val", "test") if split_mode == "train_val_test"
                else ("train", "val"))
        splits = dataset.load_splits(split_csv, keys=keys)
        from multimodalfusion_tpu.utils.experiment import \
            config_from_settings
        cfg = config_from_settings(
            settings,
            batch_size=args.batch_size or settings.get("batch_size", 1),
            results_dir=args.model_path, split_mode=split_mode,
            pretrained=True)
        out = eval_model(splits, i, cfg, dataset.bins,
                         model_path=args.model_path)
        if split_mode == "train_val_test":
            (res_val, val_c, val_ibs, res_test, test_c, test_ibs) = out
            rows.append({"folds": i, "val_cindex": val_c,
                         "val_ibs": val_ibs, "test_cindex": test_c,
                         "test_ibs": test_ibs})
            save_pkl(os.path.join(out_dir,
                                  f"eval_test_{i}_results.pkl"), res_test)
        else:
            res_val, val_c, val_ibs = out
            rows.append({"folds": i, "val_cindex": val_c,
                         "val_ibs": val_ibs})
        save_pkl(os.path.join(out_dir, f"eval_val_{i}_results.pkl"), res_val)
        print(f"fold {i}: " + ", ".join(
            f"{k2}={v:.4f}" if isinstance(v, float) else f"{k2}={v}"
            for k2, v in rows[-1].items()))

    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(out_dir, "eval_summary.csv"), index=False)
    print("mean:", {c: float(np.nanmean(df[c])) for c in df.columns
                    if c != "folds"})
    return 0


if __name__ == "__main__":
    sys.exit(main())
