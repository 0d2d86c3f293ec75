"""Stage-3 bridge: extract 256-d pretrained unimodal embeddings for every
subject using a trained stage-2 model — rewrite of ref
pre_trained_feature.py.

Reads the stage-2 experiment settings txt + minloss checkpoint, runs the
whole cohort through the model with return_features=True, and writes
{radio,path,omic}_pt_files/{subject}.pt (torch format, interop with the
reference's stage-4 artifacts)."""
from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from multimodalfusion_tpu.data.io import ensure_dir, save_pt
from multimodalfusion_tpu.data.loaders import iter_batches, usable_indices
from multimodalfusion_tpu.data.survival_dataset import SurvivalDataset
from multimodalfusion_tpu.engine.train import (build_model,
                                               load_checkpoint,
                                               model_inputs)
from multimodalfusion_tpu.utils.experiment import read_settings


def build_parser():
    p = argparse.ArgumentParser(
        description="Pre-trained Unimodal Model Feature Extraction")
    p.add_argument("--checkpoint_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="pretrained_feature")
    p.add_argument("--which_k", type=int, required=True)
    p.add_argument("--extraction_csv_path", type=str, default=None,
                   help="CSV with a subject_id column restricting which "
                        "subjects are extracted")
    p.add_argument("--batch_size", type=int, default=8)
    return p


_MODE_TO_MODEL = {"radio": "radio_attention_mil",
                  "path": "path_attention_mil",
                  "omic": "max_net"}
_MODE_TO_DIR = {"radio": "radio_pt_files", "path": "path_pt_files",
                "omic": "omic_pt_files"}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    exp_code = os.path.basename(os.path.normpath(args.checkpoint_path))
    settings = read_settings(os.path.join(
        args.checkpoint_path, f"experiment_{exp_code}.txt"))
    mode = settings["mode"]
    output_dir = ensure_dir(os.path.join(args.output_dir,
                                         settings["cancer_type"],
                                         _MODE_TO_DIR[mode]))

    dataset = SurvivalDataset(
        csv_path=settings["csv_path"], mode=mode,
        modalities=settings["radio_modality"],
        data_dir=settings["data_root_dir"],
        n_bins=settings["n_classes"], label_col="survival_months",
        seed=settings["seed"], print_info=True)
    split_csv = os.path.join(settings["split_dir"],
                             f"splits_{args.which_k}.csv")
    whole = dataset.whole_split(csv_file=split_csv)

    if args.extraction_csv_path:
        keep = set(np.unique(
            pd.read_csv(args.extraction_csv_path).subject_id))
    else:
        keep = None

    from multimodalfusion_tpu.utils.experiment import config_from_settings
    cfg = config_from_settings(
        settings, batch_size=args.batch_size,
        model_type=settings.get("model_type") or _MODE_TO_MODEL[mode],
        pretrained=False)
    model = build_model(cfg)

    idx = usable_indices(whole)
    first = next(iter_batches(whole, batch_size=cfg.batch_size,
                              indices=idx))
    first.pop("subject_ids")
    variables = dict(model.init({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                                deterministic=True,
                                **model_inputs(cfg, first)))
    ckpt = os.path.join(args.checkpoint_path,
                        f"s_{args.which_k}_minloss_checkpoint.msgpack")
    variables = load_checkpoint(ckpt, variables)

    @jax.jit
    def extract(variables, batch_kwargs):
        return model.apply(variables, deterministic=True,
                           return_features=True, **batch_kwargs)

    n_written = 0
    for batch in iter_batches(whole, batch_size=cfg.batch_size,
                              indices=idx):
        subject_ids = batch.pop("subject_ids")
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        feats = np.asarray(extract(variables, model_inputs(cfg, jbatch)))
        for i, sid in enumerate(subject_ids):
            if not sid or batch["valid"][i] == 0:
                continue
            if keep is not None and sid not in keep:
                continue
            out_path = os.path.join(output_dir, f"{sid}.pt")
            if os.path.isfile(out_path):
                continue  # idempotent (ref :125-133)
            save_pt(out_path, feats[i].reshape(1, -1))
            n_written += 1
    print(f"wrote {n_written} embeddings to {output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
