"""Cross-validation reporting CLI — rewrite of ref utils/utils_summary.py
(:15-120 aggregation, :98-313 result_plot / kmplot threshold-gated KM +
logrank) and the utils_analysis/evaluation.py report tail (:80-157
hazard2grade stratification + hazard histograms, :559-580 survival_AUC):
walks a results tree, aggregates every experiment's k-fold summary.csv
into mean/std rows, pools fold results per subject, and renders
percentile-stratified risk-group KM plots with logrank p-values."""
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
    p.add_argument("--km_thresh", type=float, default=None,
                   help="render KM only when logrank p < thresh (ref "
                        "kmplot_orig gates at 0.05)")
    p.add_argument("--topk", type=int, default=0,
                   help="render KM only for the top-k experiments by "
                        "pooled c-index (0 = all)")
    p.add_argument("--percentiles", type=str, default="50",
                   help="comma-separated risk percentiles for "
                        "stratification, e.g. 25,50,75 (ref "
                        "getPValue_25_75 compares the extreme strata)")
    p.add_argument("--overall_func", type=str, default="mean",
                   choices=["mean", "median", "max"],
                   help="per-subject risk aggregation across folds "
                        "(ref utils_summary.py result_plot)")
    p.add_argument("--hazard_hist", action="store_true", default=False,
                   help="save per-experiment hazard histograms (ref "
                        "makeHazardHistogram)")
    p.add_argument("--cohort_csv", type=str, default=None,
                   help="cohort CSV with survival_months/censorship "
                        "columns; enables time-dependent AUC + IPCW "
                        "c-index against its censoring distribution "
                        "(ref survival_AUC)")
    p.add_argument("--bootstrap", type=int, default=0,
                   help="bootstrap iterations for c-index CIs (0 = off)")
    return p


def _fold_frames(pkls):
    frames = []
    needed = ("subject_id", "risk", "survival", "censorship")
    for p in pkls:
        res = load_pkl(p)
        cols = {k: np.asarray(v) for k, v in res.items() if k in needed}
        # pool_folds_by_subject indexes every column unconditionally —
        # skip partial/old-format pkls instead of aborting the report
        if all(k in cols for k in needed) and len(cols["subject_id"]):
            frames.append(pd.DataFrame(cols))
        else:
            print(f"skipping {p}: missing "
                  f"{sorted(set(needed) - set(cols))}")
    return frames


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    ensure_dir(args.save_dir)
    percentiles = [float(x) for x in args.percentiles.split(",") if x]
    table = analysis.summarize_experiments(args.results_root)
    out_csv = os.path.join(args.save_dir, "cv_summary.csv")
    table.to_csv(out_csv, index=False)
    print(f"{len(table)} experiments -> {out_csv}")

    cohort = None
    if args.cohort_csv:
        cdf = pd.read_csv(args.cohort_csv)
        cohort = ((1 - cdf["censorship"].values).astype(bool),
                  cdf["survival_months"].values.astype(float))

    rows = []
    km_jobs = []
    for dirpath, _, files in os.walk(args.results_root):
        pkls = sorted(glob.glob(os.path.join(
            dirpath, "split_train_val_*_results.pkl")))
        if not pkls:
            continue
        # relative path disambiguates same-named experiments across
        # cancer types / split dirs
        exp = os.path.relpath(dirpath, args.results_root).replace(
            os.sep, "__")
        frames = _fold_frames(pkls)
        if not frames:
            continue
        # one row per subject: risk aggregated across the folds that
        # validated it (ref result_plot groupby-subject mean)
        pooled_df = analysis.pool_folds_by_subject(frames,
                                                   args.overall_func)
        if len(pooled_df) < 4:
            continue
        pooled = {c: pooled_df[c].values for c in pooled_df.columns}
        try:
            groups = analysis.km_by_risk_group(pooled,
                                               percentiles=percentiles)
        except ValueError:
            continue
        event = (1 - pooled["censorship"]).astype(bool)
        try:
            from multimodalfusion_tpu import metrics as metrics_mod
            pooled_c = metrics_mod.concordance_index_censored(
                event, pooled["survival"], pooled["risk"])[0]
        except ValueError:
            pooled_c = float("nan")
        row = {"experiment": exp, "n": len(pooled["risk"]),
               "pooled_cindex": pooled_c,
               "logrank_chi2": groups["logrank_chi2"],
               "logrank_p": groups["logrank_p"]}
        if cohort is not None:
            try:
                iauc, ipcw_c, harrell = analysis.survival_auc(
                    cohort[0], cohort[1], event, pooled["survival"],
                    pooled["risk"])
                row.update({"iauc": iauc, "ipcw_cindex": ipcw_c})
            except (ValueError, IndexError, ZeroDivisionError) as e:
                print(f"{exp}: survival_auc skipped ({e})")
        if args.bootstrap:
            c, lo, hi = analysis.bootstrap_cindex_ci(
                event, pooled["survival"], pooled["risk"],
                n_boot=args.bootstrap)
            row.update({"cindex_lo": lo, "cindex_hi": hi})
        rows.append(row)
        if args.hazard_hist:
            analysis.hazard_histogram(
                pooled_df,
                os.path.join(args.save_dir, f"{exp}_hist.png"))
        if args.km:
            km_jobs.append((exp, pooled_c, groups))

    # threshold/top-k gated KM rendering (ref kmplot_orig p<thresh gate;
    # result_plot best-experiment selection)
    if km_jobs:
        if args.topk:
            km_jobs.sort(key=lambda j: (np.isnan(j[1]), -j[1]))
            km_jobs = km_jobs[:args.topk]
        for exp, _, groups in km_jobs:
            if args.km_thresh is not None and \
                    not (groups["logrank_p"] < args.km_thresh):
                continue
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
