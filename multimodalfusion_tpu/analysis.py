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
    all_event_times = np.unique(np.concatenate(
        [time_a[event_a], time_b[event_b]]))
    O_minus_E = 0.0
    V = 0.0
    for t in all_event_times:
        n_a = np.sum(time_a >= t)
        n_b = np.sum(time_b >= t)
        d_a = np.sum((time_a == t) & event_a)
        d_b = np.sum((time_b == t) & event_b)
        n = n_a + n_b
        d = d_a + d_b
        if n <= 1:
            continue
        e_a = d * n_a / n
        v = d * (n_a / n) * (n_b / n) * (n - d) / (n - 1)
        O_minus_E += d_a - e_a
        V += v
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
                    row[f"{col}_mean"] = float(np.nanmean(df[col]))
                    row[f"{col}_std"] = float(np.nanstd(df[col]))
            row["n_folds"] = len(df)
            rows.append(row)
    return pd.DataFrame(rows).sort_values("experiment").reset_index(
        drop=True) if rows else pd.DataFrame()


def km_by_risk_group(results_pkl: dict):
    """KM curves + logrank p for median-split risk groups; returns a dict
    ready for plotting or CSV export."""
    df = load_risk_df(results_pkl)
    hi = df[df.risk_group == 1]
    lo = df[df.risk_group == 0]
    t_hi, s_hi = km_curve(hi["event"].values, hi["survival"].values)
    t_lo, s_lo = km_curve(lo["event"].values, lo["survival"].values)
    chi2, p = logrank_test(hi["event"].values, hi["survival"].values,
                           lo["event"].values, lo["survival"].values)
    return {"high": (t_hi, s_hi), "low": (t_lo, s_lo),
            "logrank_chi2": chi2, "logrank_p": p,
            "n_high": len(hi), "n_low": len(lo)}


def plot_km(groups: dict, out_path: str, title: str = ""):
    """Save a KM plot for the output of km_by_risk_group."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 5))
    for label, color in (("high", "tab:red"), ("low", "tab:blue")):
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
