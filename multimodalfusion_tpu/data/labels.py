"""Survival label discretization — parity with the reference's binning.

The reference (dataset_survival.py:36-74) computes, per cohort CSV:
  1. quantile bin edges from *uncensored, training* patients
     (``pd.qcut(..., q=n_bins, retbins=True)``),
  2. widens the outermost edges to cover the full cohort
     (min - eps, max + eps),
  3. assigns every patient a ``disc_label`` via
     ``pd.cut(..., right=False, include_lowest=True)``,
  4. builds a (disc_label, censorship) -> class id dict used for
     weighted sampling.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def compute_bins(patients_df: pd.DataFrame, label_col: str = "survival_months",
                 n_bins: int = 4, eps: float = 1e-6) -> np.ndarray:
    """Quantile bin edges from uncensored train patients, widened to cover
    the whole cohort (ref dataset_survival.py:37-40)."""
    uncensored = patients_df[patients_df["censorship"] < 1]
    train_uncensored = uncensored[uncensored["train"] == 1]
    # the reference hits raw pandas errors on these cohorts ("Bin edges
    # must be unique: [nan, nan, ...]"); refuse with the actual cause
    if len(train_uncensored) == 0:
        raise ValueError(
            f"cannot derive {n_bins} survival bins: the train split has "
            "no uncensored patients (binning quantiles come from "
            "uncensored training survival times, "
            "ref dataset_survival.py:38-42)")
    n_distinct = train_uncensored[label_col].nunique()
    if n_distinct < n_bins:
        raise ValueError(
            f"cannot derive {n_bins} survival bins: uncensored train "
            f"patients have only {n_distinct} distinct '{label_col}' "
            f"value(s); lower --n_classes or check the label column")
    _, q_bins = pd.qcut(train_uncensored[label_col], q=n_bins,
                        retbins=True, labels=False, duplicates="drop")
    if len(q_bins) != n_bins + 1:
        # qcut collapsed tied quantile edges (heavily tied times)
        raise ValueError(
            f"cannot derive {n_bins} survival bins: quantile edges "
            f"collapse to {len(q_bins) - 1} bins because '{label_col}' "
            "values are heavily tied; lower --n_classes")
    q_bins = np.asarray(q_bins, dtype=np.float64)
    q_bins[-1] = patients_df[label_col].max() + eps
    q_bins[0] = patients_df[label_col].min() - eps
    return q_bins


def assign_bins(values, q_bins) -> np.ndarray:
    """``pd.cut(values, bins=q_bins, right=False, include_lowest=True)``
    (ref dataset_survival.py:41): half-open bins [edge_k, edge_{k+1})."""
    disc = pd.cut(pd.Series(np.asarray(values, dtype=np.float64)),
                  bins=q_bins, right=False, include_lowest=True,
                  labels=False)
    return np.asarray(disc).astype(np.int64)


def label_dict(n_bins: int) -> dict:
    """(bin, censorship) -> class id (ref dataset_survival.py:65-71)."""
    d = {}
    k = 0
    for i in range(n_bins):
        for c in (0, 1):
            d[(i, c)] = k
            k += 1
    return d


def discretize(patients_df: pd.DataFrame, label_col: str = "survival_months",
               n_bins: int = 4, eps: float = 1e-6):
    """Full reference pipeline: returns (disc_label, label, q_bins, ldict).

    ``label`` is the (bin, censorship) class id used only for weighted
    sampling; the training target Y is ``disc_label``.
    """
    q_bins = compute_bins(patients_df, label_col, n_bins, eps)
    disc = assign_bins(patients_df[label_col].values, q_bins)
    ldict = label_dict(len(q_bins) - 1)
    cens = patients_df["censorship"].astype(int).values
    lab = np.array([ldict[(int(b), int(c))] for b, c in zip(disc, cens)])
    return disc, lab, q_bins, ldict
