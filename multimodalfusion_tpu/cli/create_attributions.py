"""Modality attribution CLI — rewrite of ref create_attributions.py:
per fold, load the trained stage-4 fusion head, compute integrated
gradients of the risk wrt each modality embedding over the fold's val
split, and write per-subject |attr| sums (attr.csv) and signed sums
(attr_orig.csv), averaged across folds."""
from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from multimodalfusion_tpu.data.loaders import iter_batches
from multimodalfusion_tpu.data.survival_dataset import SurvivalDataset
from multimodalfusion_tpu.engine.train import (build_model,
                                               load_checkpoint,
                                               model_inputs)
from multimodalfusion_tpu.interpret.ig import integrated_gradients
from multimodalfusion_tpu.utils.experiment import read_settings

_ATTR_COL = {"radio": "radio_attr", "path": "path_attr",
             "omic": "omic_attr"}


def build_parser():
    p = argparse.ArgumentParser(description="IG modality attributions")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--save_dir", type=str, default="./attributions")
    p.add_argument("--n_steps", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=16)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    exp_code = os.path.basename(os.path.normpath(args.model_path))
    settings = read_settings(os.path.join(args.model_path,
                                          f"experiment_{exp_code}.txt"))
    mode = settings["mode"]
    present = [m for m in ("radio", "path", "omic") if m in mode]

    dataset = SurvivalDataset(
        csv_path=settings["csv_path"], mode=mode,
        modalities=settings["radio_modality"],
        data_dir=settings["data_root_dir"], n_bins=settings["n_classes"],
        label_col="survival_months", seed=settings["seed"],
        pretrained=True)

    from multimodalfusion_tpu.utils.experiment import config_from_settings
    cfg = config_from_settings(settings, batch_size=args.batch_size,
                               pretrained=True)
    model = build_model(cfg)

    all_attr, all_attr_orig = [], []
    for split_i in range(settings["num_splits"]):
        split_csv = os.path.join(settings["split_dir"],
                                 f"splits_{split_i}.csv")
        train_split, val_split = dataset.load_splits(split_csv)
        first = next(iter_batches(val_split, batch_size=cfg.batch_size))
        first.pop("subject_ids")
        variables = dict(model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, deterministic=True,
            **model_inputs(cfg, first)))
        ckpt = os.path.join(args.model_path,
                            f"s_{split_i}_minloss_checkpoint.msgpack")
        variables = load_checkpoint(ckpt, variables)

        def risk_fn(*embeds):
            kw = dict(zip([f"h_{m}" for m in present], embeds))
            for m in ("radio", "path", "omic"):
                kw.setdefault(f"h_{m}", jnp.zeros_like(embeds[0]))
            out = model.apply(variables, deterministic=True, **kw)
            return out["risk"]

        for batch in iter_batches(val_split, batch_size=cfg.batch_size):
            subject_ids = batch.pop("subject_ids")
            valid = batch["valid"] > 0
            embeds = tuple(jnp.asarray(batch[f"h_{m}"]) for m in present)
            attrs = integrated_gradients(risk_fn, embeds,
                                         n_steps=args.n_steps)
            row = {"subject_id": np.asarray(subject_ids)[valid]}
            row_orig = dict(row)
            for m, a in zip(present, attrs):
                a = np.asarray(a)[valid]
                row[_ATTR_COL[m]] = np.sum(np.abs(a), axis=1)
                row_orig[_ATTR_COL[m]] = np.sum(a, axis=1)
            all_attr.append(pd.DataFrame(row))
            all_attr_orig.append(pd.DataFrame(row_orig))

    save_path = os.path.join(args.save_dir, settings["cancer_type"],
                             os.path.basename(settings["split_dir"]),
                             exp_code)
    os.makedirs(save_path, exist_ok=True)
    attr = pd.concat(all_attr).groupby("subject_id").mean()
    attr.to_csv(os.path.join(save_path, "attr.csv"))
    attr_orig = pd.concat(all_attr_orig).groupby("subject_id").mean()
    attr_orig.to_csv(os.path.join(save_path, "attr_orig.csv"))
    print(f"wrote attributions for {len(attr)} subjects to {save_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
