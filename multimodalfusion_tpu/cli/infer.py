"""Label-free scoring CLI (serving path, no reference equivalent).

Every reference entry point requires survival labels; deployment needs
to score NEW patients that have none.  ``infer`` loads a trained
experiment (stage-2 unimodal or stage-4 fusion head), reads a cohort
CSV that may lack ``survival_months``/``censorship``, and writes
``risks.csv`` with one row per scoreable subject (risk, plus per-bin
hazards/survival for the discrete-hazard families).

Genomic inputs are z-scored with the TRAINING cohort's scaler (refit
from the experiment's own csv/split, exactly as training fitted it) so
new patients are normalized consistently; stage-4 omic embeddings keep
their per-subject min-max (ref dataset_survival.py:416).
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile

import jax
import numpy as np
import pandas as pd

from multimodalfusion_tpu.data.loaders import iter_batches, usable_indices
from multimodalfusion_tpu.data.survival_dataset import Split, SurvivalDataset
from multimodalfusion_tpu.engine.train import (build_model,
                                               load_checkpoint,
                                               model_inputs)
from multimodalfusion_tpu.utils.experiment import read_settings


def build_parser():
    p = argparse.ArgumentParser(description="label-free risk scoring")
    p.add_argument("--model_path", type=str, required=True,
                   help="experiment dir (stage-2 or stage-4)")
    p.add_argument("--which_k", type=int, default=0,
                   help="fold checkpoint to serve")
    p.add_argument("--csv", type=str, default=None,
                   help="cohort CSV to score (labels optional); default "
                        "= the experiment's own cohort CSV")
    p.add_argument("--data_root_dir", type=str, default=None,
                   help="feature/embedding store root; default = the "
                        "experiment's")
    p.add_argument("--out", type=str, default=None,
                   help="output CSV path (default "
                        "<model_path>/risks_k{which_k}.csv)")
    p.add_argument("--batch_size", type=int, default=16)
    return p


def _with_placeholder_labels(csv_path: str, tmpdir: str) -> str:
    """The dataset layer bins labels at load time; inference cohorts may
    lack them, carry all-censored cohorts, or have tied survival values
    — any of which breaks quantile binning.  The forward pass never
    reads labels, so ALWAYS replace them with synthetic well-spread
    placeholders (distinct times, all events, all train)."""
    df = pd.read_csv(csv_path, low_memory=False)
    df["survival_months"] = np.arange(1.0, len(df) + 1.0)
    df["censorship"] = 0.0
    df["train"] = 1
    if "slide_id" not in df.columns:
        df["slide_id"] = df["subject_id"].astype(str) + ".svs"
    out = os.path.join(tmpdir, "infer_cohort.csv")
    df.to_csv(out, index=False)
    return out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    exp_code = os.path.basename(os.path.normpath(args.model_path))
    settings = read_settings(os.path.join(args.model_path,
                                          f"experiment_{exp_code}.txt"))
    mode = settings["mode"]
    pretrained = bool(settings.get("train_type"))
    data_dir = args.data_root_dir or settings["data_root_dir"]

    with tempfile.TemporaryDirectory() as td:
        csv_path = _with_placeholder_labels(
            args.csv or settings["csv_path"], td)
        ds = SurvivalDataset(
            csv_path=csv_path, mode=mode,
            modalities=settings["radio_modality"], data_dir=data_dir,
            n_bins=settings["n_classes"], label_col="survival_months",
            seed=settings["seed"], pretrained=pretrained)
        whole = Split(ds.patients, ds)

        if "omic" in mode and not pretrained:
            # training z-scored genomics with the train-fold scaler
            # (ref dataset_survival.py:461-466) — refit it from the
            # experiment's own cohort + split and apply here
            train_ds = SurvivalDataset(
                csv_path=settings["csv_path"], mode=mode,
                modalities=settings["radio_modality"], data_dir=data_dir,
                n_bins=settings["n_classes"],
                label_col="survival_months", seed=settings["seed"])
            split_csv = os.path.join(settings["split_dir"],
                                     f"splits_{args.which_k}.csv")
            tr = train_ds._split_from_ids(
                pd.read_csv(split_csv)["train"])
            if list(tr.genomic_cols) != list(whole.genomic_cols):
                diff = sorted(set(tr.genomic_cols)
                              ^ set(whole.genomic_cols))
                if diff:
                    raise ValueError(
                        f"genomic columns differ from training: {diff}")
                # same set, different order: the scaler AND the model
                # input are positional — reindex to the training order
                whole.genomic_cols = list(tr.genomic_cols)
                whole.genomic_features = whole.df[
                    whole.genomic_cols].to_numpy(dtype=np.float64,
                                                 na_value=np.nan)
            whole.apply_scaler(tr.get_scaler())

        from multimodalfusion_tpu.utils.experiment import \
            config_from_settings
        cfg = config_from_settings(settings, batch_size=args.batch_size)
        model = build_model(cfg)

        idx = usable_indices(whole)
        if not idx:
            print("no scoreable subjects (missing modalities?)",
                  file=sys.stderr)
            return 1
        first = next(iter_batches(whole, batch_size=cfg.batch_size,
                                  indices=idx))
        first.pop("subject_ids")
        variables = dict(model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, deterministic=True,
            **model_inputs(cfg, first)))
        variables = load_checkpoint(
            os.path.join(args.model_path,
                         f"s_{args.which_k}_minloss_checkpoint.msgpack"),
            variables)

        @jax.jit
        def score(variables, kwargs):
            return model.apply(variables, deterministic=True, **kwargs)

        rows = []
        for batch in iter_batches(whole, batch_size=cfg.batch_size,
                                  indices=idx):
            sids = batch.pop("subject_ids")
            out = score(variables, model_inputs(cfg, batch))
            risk = np.asarray(out["risk"]).reshape(-1)
            haz = out.get("hazards")
            S = out.get("S")
            for i, sid in enumerate(sids):
                if not sid or batch["valid"][i] == 0:
                    continue
                row = {"subject_id": sid, "risk": float(risk[i])}
                if haz is not None:
                    for k2, h in enumerate(np.asarray(haz)[i].reshape(-1)):
                        row[f"hazard_{k2}"] = float(h)
                if S is not None:
                    for k2, s_ in enumerate(np.asarray(S)[i].reshape(-1)):
                        row[f"S_{k2}"] = float(s_)
                rows.append(row)

    out_path = args.out or os.path.join(args.model_path,
                                        f"risks_k{args.which_k}.csv")
    pd.DataFrame(rows).to_csv(out_path, index=False)
    print(f"scored {len(rows)} subjects -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
