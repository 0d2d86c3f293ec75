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
    p.add_argument("--pivot", action="store_true", default=False,
                   help="write a model x cohort pivot of the summary "
                        "metric plus a grouped bar comparison plot "
                        "(ref utils_summary.py pivot_summary/plot_bar)")
    p.add_argument("--pivot_col", type=str, default="val_cindex_mean",
                   help="cv_summary column to pivot/plot")
    p.add_argument("--emit_heatmap_yamls", type=str, default=None,
                   metavar="DIR",
                   help="bridge stage 4 -> stage 5 (ref "
                        "generate_heatmap_yamls, evaluation.py:734-786): "
                        "write ready-to-run create_heatmaps config YAMLs "
                        "into DIR, one per experiment at its best fold")
    p.add_argument("--heatmap_template", type=str, default=None,
                   help="template YAML whose data/patching/heatmap/"
                        "sample sections are carried into every emitted "
                        "config (ref template_%%s.yaml)")
    p.add_argument("--heatmap_branch", type=str, default="auto",
                   choices=["auto", "path", "radio", "omic"],
                   help="heatmap branch; auto infers from the "
                        "experiment name prefix (PATH/RADIO/OMICS)")
    p.add_argument("--all_folds", action="store_true", default=False,
                   help="emit a YAML per fold instead of only the best "
                        "val-c-index fold (ref generate_best=False loop)")
    p.add_argument("--heatmap_save_root", type=str, default=None,
                   help="save_dir root written into the emitted configs "
                        "(default: DIR/heatmap_results)")
    return p


# experiment-name prefix -> heatmap branch (stage-2 exp codes are built
# as {PATH,RADIO,OMICS,MMF}_... by utils/experiment.py; MMF fusion heads
# have no attention/gene heatmap — stage 5 covers them via
# create_attributions)
_BRANCH_PREFIXES = (("PATH", "path"), ("RADIO", "radio"),
                    ("OMIC", "omic"))


def _infer_branch(exp_code: str):
    for prefix, branch in _BRANCH_PREFIXES:
        if exp_code.upper().startswith(prefix):
            return branch
    return None


def emit_heatmap_yamls(results_root: str, out_dir: str,
                       template: str | None = None,
                       branch: str = "auto", all_folds: bool = False,
                       save_root: str | None = None) -> list:
    """Write ready-to-run create_heatmaps config YAMLs for every trained
    experiment under ``results_root`` (ref generate_heatmap_yamls,
    evaluation.py:734-786: load template_%s.yaml, override exp/data/
    model keys per study and fold, dump heatmap_config_*_val_*.yaml).

    Fold selection follows the reference's ``generate_best`` path —
    the fold with the highest val c-index from summary.csv (the ref
    reads the precomputed ``val_idx`` column) — unless ``all_folds``,
    which mirrors its per-idx loop.  Folds whose minloss checkpoint is
    missing are skipped with a note (the ref hard-codes a skip list of
    known-bad study/fold pairs; checking the checkpoint generalizes
    that).  Returns the written paths.
    """
    import yaml
    ensure_dir(out_dir)
    if save_root is None:
        save_root = os.path.join(out_dir, "heatmap_results")
    tpl = {}
    if template:
        with open(template) as f:
            tpl = yaml.safe_load(f) or {}
    written = []
    for dirpath, _, files in os.walk(results_root):
        if "summary.csv" not in files:
            continue
        exp_code = os.path.basename(os.path.normpath(dirpath))
        b = branch if branch != "auto" else _infer_branch(exp_code)
        if b is None:
            print(f"{exp_code}: no heatmap branch for this model "
                  "family, skipping")
            continue
        summary = pd.read_csv(os.path.join(dirpath, "summary.csv"))
        if "val_cindex" not in summary or not len(summary):
            continue
        folds = summary["folds"].astype(int).tolist() if "folds" in \
            summary else list(range(len(summary)))
        if not all_folds:
            vals = summary["val_cindex"].values
            if np.all(np.isnan(vals)):
                print(f"{exp_code}: every fold's val_cindex is NaN, "
                      "skipping")
                continue
            folds = [folds[int(np.nanargmax(vals))]]
        exp = os.path.relpath(dirpath, results_root).replace(os.sep,
                                                             "__")
        for k in folds:
            ckpt = os.path.join(dirpath,
                                f"s_{k}_minloss_checkpoint.msgpack")
            if not os.path.isfile(ckpt):
                print(f"{exp}: fold {k} has no minloss checkpoint, "
                      "skipping")
                continue
            cfg = {
                "exp_arguments": {
                    **dict(tpl.get("exp_arguments") or {}),
                    "branch": b,
                    "save_dir": os.path.join(save_root,
                                             f"{exp}_val_{k}"),
                },
                "data_arguments": dict(tpl.get("data_arguments") or {}),
                "model_arguments": {
                    **dict(tpl.get("model_arguments") or {}),
                    "ckpt_path": os.path.abspath(dirpath),
                    "which_k": int(k),
                },
                "heatmap_arguments": dict(tpl.get("heatmap_arguments")
                                          or {}),
            }
            # optional template sections pass through untouched
            for sec in ("patching_arguments", "sample_arguments"):
                if sec in tpl:
                    cfg[sec] = tpl[sec]
            path = os.path.join(out_dir,
                                f"heatmap_config_{exp}_val_{k}.yaml")
            with open(path, "w") as f:
                yaml.dump(cfg, f, default_flow_style=False,
                          sort_keys=False)
            written.append(path)
    print(f"{len(written)} heatmap configs -> {out_dir}")
    return written


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

    if args.pivot and len(table):
        if args.pivot_col not in table.columns:
            print(f"--pivot_col {args.pivot_col!r} not in cv_summary "
                  f"columns {sorted(table.columns)}; skipping pivot")
        else:
            pv = analysis.pivot_summary(table, args.pivot_col)
            pv_csv = os.path.join(args.save_dir, "cv_pivot.csv")
            pv.to_csv(pv_csv)
            analysis.plot_compare_bar(
                pv, os.path.join(args.save_dir, "cv_compare.png"),
                value_label=args.pivot_col)
            print(f"pivot {pv.shape[0]}x{pv.shape[1]} -> {pv_csv} "
                  "(+ cv_compare.png)")

    if args.emit_heatmap_yamls:
        emit_heatmap_yamls(args.results_root, args.emit_heatmap_yamls,
                           template=args.heatmap_template,
                           branch=args.heatmap_branch,
                           all_folds=args.all_folds,
                           save_root=args.heatmap_save_root)

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
