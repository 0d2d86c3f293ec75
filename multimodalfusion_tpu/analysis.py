"""Survival analysis & reporting — native rewrite of the reference's
lifelines/sksurv-backed analyses (ref utils_analysis/evaluation.py:
KM plots :197-340, logrank :341-420, bootstrap CI :421-733,
load_risk_df :1448-1471; utils/utils_summary.py:15-120 CV aggregation).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from multimodalfusion_tpu import metrics as metrics_mod


# ---------------------------------------------------------------------------
# Kaplan-Meier curves + logrank test
# ---------------------------------------------------------------------------

def km_curve(event, time):
    """KM curve with a step at t=0: returns (times, survival) suitable for
    step plotting."""
    t, s = metrics_mod.kaplan_meier(np.asarray(event, bool),
                                    np.asarray(time, float))
    return np.concatenate([[0.0], t]), np.concatenate([[1.0], s])


def logrank_test(event_a, time_a, event_b, time_b) -> Tuple[float, float]:
    """Two-sample logrank test; returns (chi2 statistic, p value).

    Standard Mantel-Haenszel form: at each distinct event time, compare
    observed events in group A against the hypergeometric expectation.
    """
    from scipy.stats import chi2 as chi2_dist
    event_a = np.asarray(event_a, bool)
    event_b = np.asarray(event_b, bool)
    time_a = np.asarray(time_a, float)
    time_b = np.asarray(time_b, float)
    ts = np.unique(np.concatenate([time_a[event_a], time_b[event_b]]))
    # vectorized over the event-time axis (this sits inside 1000x
    # bootstrap loops): at-risk counts via searchsorted on sorted times,
    # per-time event counts via searchsorted on sorted event times
    sa, sb = np.sort(time_a), np.sort(time_b)
    n_a = len(sa) - np.searchsorted(sa, ts, side="left")
    n_b = len(sb) - np.searchsorted(sb, ts, side="left")
    ea, eb = np.sort(time_a[event_a]), np.sort(time_b[event_b])
    d_a = (np.searchsorted(ea, ts, side="right")
           - np.searchsorted(ea, ts, side="left"))
    d_b = (np.searchsorted(eb, ts, side="right")
           - np.searchsorted(eb, ts, side="left"))
    n = n_a + n_b
    d = d_a + d_b
    ok = n > 1
    n, n_a, n_b, d, d_a = n[ok], n_a[ok], n_b[ok], d[ok], d_a[ok]
    O_minus_E = float(np.sum(d_a - d * n_a / n))
    V = float(np.sum(d * (n_a / n) * (n_b / n) * (n - d) / (n - 1)))
    if V <= 0:
        return 0.0, 1.0
    chi2 = O_minus_E ** 2 / V
    p = float(chi2_dist.sf(chi2, df=1))
    return float(chi2), p


def risk_groups(risk: np.ndarray, cutoff: Optional[float] = None
                ) -> np.ndarray:
    """High/low risk stratification at the median (ref load_risk_df
    :1448-1471 uses the cohort median risk).  1 = high risk."""
    risk = np.asarray(risk, float)
    if cutoff is None:
        cutoff = float(np.median(risk))
    return (risk > cutoff).astype(int)


def hazard2grade(risk: np.ndarray, cuts: Sequence[float]) -> np.ndarray:
    """Grade each risk by its position among percentile cutpoints (ref
    evaluation.py:80-84): grade g means cuts[g-1] <= risk < cuts[g];
    below cuts[0] is 0, at/above cuts[-1] is len(cuts)."""
    return np.searchsorted(np.asarray(cuts, float),
                           np.asarray(risk, float), side="right")


def stratify_risk(risk: np.ndarray,
                  percentiles: Sequence[float] = (50,)) -> np.ndarray:
    """Multi-percentile risk stratification (ref evaluation.py:95-113,
    197-361): cutpoints at the given risk percentiles; returns the
    grade per subject (0 = lowest-risk stratum).  [50] gives the median
    split; [25, 50, 75] gives quartiles whose extremes (0 vs 3) the
    reference compares in getPValue_25_75."""
    risk = np.asarray(risk, float)
    p = np.percentile(risk, list(percentiles))
    return hazard2grade(risk, p)


# ---------------------------------------------------------------------------
# bootstrap confidence intervals
# ---------------------------------------------------------------------------

def bootstrap_cindex_ci(event, time, risk, n_boot: int = 1000,
                        alpha: float = 0.05, seed: int = 0):
    """Percentile bootstrap CI for the censored c-index (ref
    evaluation.py:421-733 style).  Returns (cindex, lo, hi)."""
    event = np.asarray(event, bool)
    time = np.asarray(time, float)
    risk = np.asarray(risk, float)
    point = metrics_mod.concordance_index_censored(event, time, risk)[0]
    rng = np.random.default_rng(seed)
    n = len(time)
    stats = []
    for _ in range(n_boot):
        idx = rng.integers(0, n, n)
        try:
            stats.append(metrics_mod.concordance_index_censored(
                event[idx], time[idx], risk[idx])[0])
        except ValueError:
            continue
    if not stats:
        return point, float("nan"), float("nan")
    lo, hi = np.percentile(stats, [100 * alpha / 2, 100 * (1 - alpha / 2)])
    return point, float(lo), float(hi)


# ---------------------------------------------------------------------------
# results-pkl + summary.csv aggregation (ref utils_summary.py:15-120)
# ---------------------------------------------------------------------------

def load_risk_df(results_pkl: dict) -> pd.DataFrame:
    """Fold results dict -> tidy per-patient dataframe with risk groups."""
    df = pd.DataFrame({
        "subject_id": results_pkl["subject_id"],
        "risk": results_pkl["risk"],
        "survival": results_pkl["survival"],
        "censorship": results_pkl["censorship"],
    })
    df["event"] = 1 - df["censorship"]
    df["risk_group"] = risk_groups(df["risk"].values)
    return df


def summarize_experiments(results_root: str,
                          pattern: str = "summary.csv") -> pd.DataFrame:
    """Aggregate per-experiment k-fold summary CSVs under a results tree
    into mean/std rows (ref utils_summary.py:80-120)."""
    rows = []
    for dirpath, _, files in os.walk(results_root):
        if pattern in files:
            df = pd.read_csv(os.path.join(dirpath, pattern))
            row = {"experiment": os.path.relpath(
                dirpath, results_root).replace(os.sep, "__")}
            for col in df.columns:
                if col.endswith("cindex") or col.endswith("ibs"):
                    vals = df[col].to_numpy(float)
                    # an all-NaN column (e.g. 1-sample val splits) is a
                    # legitimate state: report NaN without numpy's
                    # empty-slice RuntimeWarning.  ~isnan, NOT isfinite:
                    # an inf value (an ibs blow-up) must surface as inf,
                    # exactly as np.nanmean would report it
                    any_val = (~np.isnan(vals)).any()
                    # errstate: nanstd of a column containing inf hits
                    # inf-inf internally; the NaN std it returns (next
                    # to the inf mean) is the right report, not a warning
                    with np.errstate(invalid="ignore"):
                        row[f"{col}_mean"] = float(np.nanmean(vals)) \
                            if any_val else float("nan")
                        row[f"{col}_std"] = float(np.nanstd(vals)) \
                            if any_val else float("nan")
            row["n_folds"] = len(df)
            rows.append(row)
    return pd.DataFrame(rows).sort_values("experiment").reset_index(
        drop=True) if rows else pd.DataFrame()


def pivot_summary(table: pd.DataFrame,
                  value_col: str = "val_cindex_mean") -> pd.DataFrame:
    """Cross-experiment comparison pivot: model/experiment code rows ×
    cohort columns of the chosen metric (ref utils_summary.py:315-329
    pivot_summary — modalities × concat per loss family; here the
    experiment code already encodes loss/modality/fusion, so the pivot
    is code × cohort).

    ``table`` is summarize_experiments output; its ``experiment``
    column is the cohort__splits__EXPCODE relpath, split here into the
    cohort (first component) and the model code (last).  When
    results_root pointed directly AT a cohort directory the relpath
    has no cohort component (splits__EXPCODE or bare EXPCODE) — those
    rows get the "(root)" column instead of mislabeling the splits
    dir as a cohort.
    """
    if not len(table):
        return pd.DataFrame()
    parts = table["experiment"].astype(str).str.split("__")
    df = table.copy()
    df["cohort"] = np.where(parts.str.len() >= 3, parts.str[0],
                            "(root)")
    df["model"] = parts.str[-1]
    return df.pivot_table(index="model", columns="cohort",
                          values=value_col, aggfunc="mean").round(4)


def plot_compare_bar(pivot_df: pd.DataFrame, out_path: str,
                     value_label: str = "c-index",
                     title: str = "k-fold CV c-index by experiment"):
    """Grouped horizontal bar comparison of the pivot — one bar group
    per model, one hue per cohort, rows ordered by cross-cohort mean
    (ref utils_summary.py:330-335 plot_bar)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    order = pivot_df.mean(axis=1).sort_values().index
    df = pivot_df.loc[order]
    cohorts = list(df.columns)
    n_models, n_coh = len(df), max(len(cohorts), 1)
    fig, ax = plt.subplots(
        figsize=(8, max(3.0, 0.4 * n_models * n_coh)))
    y = np.arange(n_models)
    h = 0.8 / n_coh
    cmap = plt.get_cmap("tab10")
    for j, cohort in enumerate(cohorts):
        vals = df[cohort].values.astype(float)
        ax.barh(y + (j - (n_coh - 1) / 2) * h, np.nan_to_num(vals),
                height=h, color=cmap(j % 10), label=str(cohort))
    ax.set_yticks(y)
    ax.set_yticklabels(df.index)
    ax.set_xlabel(value_label)
    ax.set_title(title)
    ax.legend(title="cohort", fontsize=8)
    for side in ("right", "top"):
        ax.spines[side].set_visible(False)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def km_by_risk_group(results_pkl: dict,
                     percentiles: Sequence[float] = (50,)):
    """KM curves + logrank p for percentile-stratified risk groups (ref
    makeKaplanMeierPlot_Strat / getPValue, evaluation.py:95-113,197-280).

    The logrank compares the LOWEST vs HIGHEST stratum — for [50]
    that's the median split; for [25, 50, 75] the extreme quartiles
    (ref getPValue_25_75 compares strat 0 vs strat 3).  Returns curves
    for every stratum plus the extreme-pair test."""
    df = load_risk_df(results_pkl)
    strat = stratify_risk(df["risk"].values, percentiles)
    n_strata = len(percentiles) + 1
    out = {"strata": []}
    for g in range(n_strata):
        sel = df[strat == g]
        if len(sel) == 0:
            out["strata"].append({"n": 0, "curve": None})
            continue
        t, s = km_curve(sel["event"].values, sel["survival"].values)
        out["strata"].append({"n": len(sel), "curve": (t, s)})
    lo = df[strat == 0]
    hi = df[strat == n_strata - 1]
    chi2, p = logrank_test(hi["event"].values, hi["survival"].values,
                           lo["event"].values, lo["survival"].values)
    lo_c = out["strata"][0]["curve"]
    hi_c = out["strata"][-1]["curve"]
    out.update({"high": hi_c, "low": lo_c,
                "logrank_chi2": chi2, "logrank_p": p,
                "n_high": len(hi), "n_low": len(lo),
                "percentiles": list(percentiles)})
    return out


def pool_folds_by_subject(dfs: Sequence[pd.DataFrame],
                          overall_func: str = "mean") -> pd.DataFrame:
    """Pool per-fold result frames into one row per subject with the
    mean/median/max risk across folds (ref utils_summary.py
    result_plot/overall_cindex groupby-subject aggregation)."""
    a = pd.concat(list(dfs), axis=0)
    agg = getattr(a.groupby("subject_id")["risk"], overall_func)()
    pooled = pd.DataFrame(agg).reset_index().merge(
        a[["subject_id", "censorship", "survival"]].drop_duplicates(
            subset="subject_id"),
        on="subject_id", how="left")
    return pooled


def hazard_histogram(results_df: pd.DataFrame, out_path: str,
                     cutoff: float = 0.0, zscore: bool = True,
                     bins: int = 15, density: bool = True) -> dict:
    """Hazard histogram of z-scored risks for short- vs long-surviving
    UNCENSORED patients (ref makeHazardHistogram, evaluation.py:115-157:
    default cutoff = median uncensored survival in years, groups split
    at 12*cutoff months, censored patients excluded from both).

    Saves a PNG and returns the two groups' histogram arrays for
    testing/CSV export."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    df = results_df.copy()
    risk = np.asarray(df["risk"], float)
    if zscore:
        mu, sd = risk.mean(), risk.std()
        risk = (risk - mu) / (sd if sd > 0 else 1.0)
        df["risk"] = risk
    events = df[df["censorship"] == 0]
    if cutoff == 0.0:
        cutoff = float(np.median(events["survival"])) / 12.0
    low = events[events["survival"] <= 12 * cutoff]["risk"].values
    high = events[events["survival"] > 12 * cutoff]["risk"].values
    fig, ax = plt.subplots(figsize=(8, 8))
    h_low = h_high = (np.array([]), np.array([]))
    if len(low):
        h_low = ax.hist(low, bins=bins, density=density, histtype="stepfilled",
                        linewidth=1, alpha=0.5, color="salmon",
                        label=f"Patient Survival < {cutoff:0.1f}")[:2]
    if len(high):
        h_high = ax.hist(high, bins=bins, density=density,
                         histtype="stepfilled", linewidth=1, alpha=0.5,
                         color="mediumslateblue",
                         label=f"Patient Survival > {cutoff:0.1f}")[:2]
    ax.set_xlabel("Hazard (Z-Scored)" if zscore else "Hazard")
    ax.set_ylabel("Density (Normalized)" if density else "Count")
    ax.spines["right"].set_visible(False)
    ax.spines["top"].set_visible(False)
    ax.legend(loc="upper right")
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return {"cutoff_years": cutoff, "low": h_low, "high": h_high,
            "n_low": len(low), "n_high": len(high)}


def survival_auc(train_event, train_time, test_event, test_time, risk,
                 times=None):
    """Time-dependent AUC + IPCW c-index + Harrell c-index for a result
    set, against a training cohort's censoring distribution (ref
    survival_AUC, utils_analysis/evaluation.py:559-580: sksurv
    cumulative_dynamic_auc + concordance_index_ipcw at tau=times[-1] +
    concordance_index_censored; test subjects beyond the train
    follow-up are dropped as the reference does).

    Returns (iauc, ipcw_cindex, harrell_cindex)."""
    train_event = np.asarray(train_event, bool)
    train_time = np.asarray(train_time, float)
    test_event = np.asarray(test_event, bool)
    test_time = np.asarray(test_time, float)
    risk = np.asarray(risk, float)
    harrell = metrics_mod.concordance_index_censored(
        test_event, test_time, risk, tied_tol=1e-5)[0]
    keep = test_time <= train_time.max()
    test_event, test_time, risk = (test_event[keep], test_time[keep],
                                   risk[keep])
    if len(test_time) == 0 or not test_event.any():
        raise ValueError(
            "no (uncensored) test subjects within the train cohort's "
            "follow-up — check that the cohort CSV and results use the "
            "same time unit")
    if times is None:
        # percentile grid over the observed test follow-up, strictly
        # inside the range so cases and controls both exist
        times = np.percentile(test_time, np.linspace(5, 81, 15))
    times = np.asarray(times, float)
    _, iauc = metrics_mod.cumulative_dynamic_auc(
        train_event, train_time, test_event, test_time, risk, times)
    ipcw_c = metrics_mod.concordance_index_ipcw(
        train_event, train_time, test_event, test_time, risk,
        tau=float(times[-1]))[0]
    return float(iauc), float(ipcw_c), float(harrell)


def plot_km(groups: dict, out_path: str, title: str = ""):
    """Save a KM plot for the output of km_by_risk_group."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 5))
    strata = groups.get("strata", [])
    if len(strata) > 2:
        # multi-percentile stratification: draw every stratum on a
        # blue->red gradient (ref makeKaplanMeierPlot_Strat quartiles)
        cmap = plt.get_cmap("coolwarm")
        for g, st in enumerate(strata):
            if st["curve"] is None:
                continue
            t, s = st["curve"]
            ax.step(t, s, where="post",
                    color=cmap(g / (len(strata) - 1)),
                    label=f"stratum {g} (n={st['n']})")
    else:
        for label, color in (("high", "tab:red"), ("low", "tab:blue")):
            if groups[label] is None:
                continue
            t, s = groups[label]
            ax.step(t, s, where="post", color=color,
                    label=f"{label} risk (n={groups[f'n_{label}']})")
    ax.set_xlabel("time (months)")
    ax.set_ylabel("survival probability")
    ax.set_ylim(0, 1.05)
    ax.legend()
    ax.set_title(f"{title} logrank p={groups['logrank_p']:.2e}")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
