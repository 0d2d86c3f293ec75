"""Cross-validation reporting CLI — rewrite of ref utils/utils_summary.py
(:15-120 aggregation, :120-335 per-experiment KM + logrank):
walks a results tree, aggregates every experiment's k-fold summary.csv
into mean/std rows, and renders median-split risk-group KM plots with
logrank p-values from each fold's results pkl."""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np
import pandas as pd

from multimodalfusion_tpu import analysis
from multimodalfusion_tpu.data.io import ensure_dir, load_pkl


def build_parser():
    p = argparse.ArgumentParser(description="CV summary + KM reports")
    p.add_argument("--results_root", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--km", action="store_true", default=False,
                   help="render per-experiment risk-group KM plots")
    p.add_argument("--bootstrap", type=int, default=0,
                   help="bootstrap iterations for c-index CIs (0 = off)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    ensure_dir(args.save_dir)
    table = analysis.summarize_experiments(args.results_root)
    out_csv = os.path.join(args.save_dir, "cv_summary.csv")
    table.to_csv(out_csv, index=False)
    print(f"{len(table)} experiments -> {out_csv}")

    rows = []
    for dirpath, _, files in os.walk(args.results_root):
        pkls = sorted(glob.glob(os.path.join(
            dirpath, "split_train_val_*_results.pkl")))
        if not pkls:
            continue
        # relative path disambiguates same-named experiments across
        # cancer types / split dirs
        exp = os.path.relpath(dirpath, args.results_root).replace(
            os.sep, "__")
        # pool folds for the KM view (each patient validated once in
        # proper k-fold splits)
        pooled = {}
        for p in pkls:
            res = load_pkl(p)
            for k, v in res.items():
                if isinstance(v, np.ndarray):
                    pooled.setdefault(k, []).append(v)
        pooled = {k: np.concatenate(v) for k, v in pooled.items()
                  if k in ("subject_id", "risk", "survival", "censorship",
                           "disc_label")}
        if "risk" not in pooled or len(pooled["risk"]) < 4:
            continue
        try:
            groups = analysis.km_by_risk_group(pooled)
        except ValueError:
            continue
        row = {"experiment": exp, "n": len(pooled["risk"]),
               "logrank_chi2": groups["logrank_chi2"],
               "logrank_p": groups["logrank_p"]}
        if args.bootstrap:
            c, lo, hi = analysis.bootstrap_cindex_ci(
                (1 - pooled["censorship"]).astype(bool),
                pooled["survival"], pooled["risk"],
                n_boot=args.bootstrap)
            row.update({"pooled_cindex": c, "cindex_lo": lo,
                        "cindex_hi": hi})
        rows.append(row)
        if args.km:
            analysis.plot_km(groups,
                             os.path.join(args.save_dir, f"{exp}_km.png"),
                             title=exp)
    if rows:
        km_csv = os.path.join(args.save_dir, "risk_group_stats.csv")
        pd.DataFrame(rows).to_csv(km_csv, index=False)
        print(f"risk-group stats for {len(rows)} experiments -> {km_csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
