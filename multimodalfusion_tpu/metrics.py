"""Native survival metrics (no sksurv/lifelines dependency).

The reference relies on ``sksurv.metrics.concordance_index_censored``
(ref utils/core_utils.py:258,426) and ``sksurv.metrics.integrated_brier_score``
(ref utils/core_utils_pretrained.py:537-556).  Those libraries are not in
this image, so the metrics are re-implemented here with identical
semantics, vectorized in NumPy (they run on small host-side result arrays,
not in the jit hot path).
"""
from __future__ import annotations

import numpy as np


def concordance_index_censored(event_indicator, event_time, estimate,
                               tied_tol: float = 1e-8):
    """Harrell's censoring-aware concordance index.

    Semantics match ``sksurv.metrics.concordance_index_censored``:
      * pair (i, j) is comparable iff event_i and (t_j > t_i, or
        t_j == t_i and j is censored);
      * concordant when estimate_i > estimate_j (shorter survival ⇒ higher
        risk); |estimate_i - estimate_j| <= tied_tol counts 0.5.

    Returns (cindex, concordant, discordant, tied_risk, tied_time).
    """
    event = np.asarray(event_indicator, dtype=bool)
    time = np.asarray(event_time, dtype=np.float64)
    est = np.asarray(estimate, dtype=np.float64)
    if not event.any():
        raise ValueError("All samples are censored")

    # comparable[i, j]: i experienced an event and either j outlived i or
    # j was censored at exactly i's event time.
    later = time[None, :] > time[:, None]
    tied_at = (time[None, :] == time[:, None]) & (~event)[None, :]
    comp = event[:, None] & (later | tied_at)
    np.fill_diagonal(comp, False)

    diff = est[:, None] - est[None, :]
    tied_risk_mat = np.abs(diff) <= tied_tol
    concordant_mat = (diff > 0) & ~tied_risk_mat
    discordant_mat = (diff < 0) & ~tied_risk_mat

    concordant = int(np.sum(comp & concordant_mat))
    discordant = int(np.sum(comp & discordant_mat))
    tied_risk = int(np.sum(comp & tied_risk_mat))
    tied_time = int(np.sum(event[:, None] & tied_at))

    denom = concordant + discordant + tied_risk
    if denom == 0:
        raise ValueError("No comparable pairs")
    cindex = (concordant + 0.5 * tied_risk) / denom
    return cindex, concordant, discordant, tied_risk, tied_time


def kaplan_meier(event, time):
    """Kaplan-Meier estimator of the survival function S(t) = P(T > t).

    Returns (unique_times, survival_prob), right-continuous step function.
    """
    event = np.asarray(event, dtype=bool)
    time = np.asarray(time, dtype=np.float64)
    order = np.argsort(time, kind="stable")
    time, event = time[order], event[order]
    uniq, first_idx = np.unique(time, return_index=True)
    n = len(time)
    n_at_risk = n - first_idx
    d = np.zeros(len(uniq))
    for k, t in enumerate(uniq):
        sel = time == t
        d[k] = np.sum(event[sel])
    frac = np.where(n_at_risk > 0, 1.0 - d / n_at_risk, 1.0)
    return uniq, np.cumprod(frac)


def censoring_survival(event, time):
    """Reverse Kaplan-Meier: G(t) = P(C > t), the censoring distribution.

    At tied times, deaths are assumed to happen before censorings (the
    sksurv convention): the risk set for censoring at t excludes subjects
    who died at t.
    """
    event = np.asarray(event, dtype=bool)
    time = np.asarray(time, dtype=np.float64)
    uniq = np.unique(time)
    n = len(time)
    G = np.ones(len(uniq))
    g = 1.0
    for k, t in enumerate(uniq):
        at_risk = np.sum(time >= t)
        deaths = np.sum((time == t) & event)
        cens = np.sum((time == t) & ~event)
        denom = at_risk - deaths
        if denom > 0:
            g *= 1.0 - cens / denom
        elif cens > 0:
            g = 0.0
        G[k] = g
    return uniq, G


def _step_lookup(step_times, step_vals, query, before_value=1.0):
    """Evaluate a right-continuous step function at query points."""
    idx = np.searchsorted(step_times, query, side="right") - 1
    out = np.where(idx >= 0, step_vals[np.clip(idx, 0, len(step_vals) - 1)],
                   before_value)
    return out


def brier_score(train_event, train_time, test_event, test_time,
                estimate, times):
    """IPCW Brier score at each time in ``times``.

    ``estimate``: [n_test, n_times] predicted S(t|x_i) at each query time.
    Censoring distribution G is estimated from the training data (reverse
    KM), matching sksurv's ``brier_score`` with a fitted
    CensoringDistributionEstimator.
    """
    test_event = np.asarray(test_event, dtype=bool)
    test_time = np.asarray(test_time, dtype=np.float64)
    times = np.asarray(times, dtype=np.float64)
    estimate = np.asarray(estimate, dtype=np.float64)
    if estimate.shape != (len(test_time), len(times)):
        raise ValueError(f"estimate shape {estimate.shape} != "
                         f"({len(test_time)}, {len(times)})")

    g_t, g_v = censoring_survival(train_event, train_time)
    # G evaluated just before the subject's event time (left limit ≈ value at
    # t_i itself for right-continuous steps; sksurv uses G(t_i^-) via the
    # step at t_i). We follow sksurv: G(t_i) with deaths-before-censoring.
    G_ti = _step_lookup(g_t, g_v, test_time)
    scores = np.empty(len(times))
    for k, t in enumerate(times):
        G_t = _step_lookup(g_t, g_v, np.array([t]))[0]
        s = estimate[:, k]
        died = (test_time <= t) & test_event
        alive = test_time > t
        w_died = np.where(G_ti > 0, 1.0 / np.where(G_ti > 0, G_ti, 1.0), 0.0)
        w_alive = (1.0 / G_t) if G_t > 0 else 0.0
        scores[k] = np.mean(died * (s ** 2) * w_died
                            + alive * ((1.0 - s) ** 2) * w_alive)
    return times, scores


def integrated_brier_score(train_event, train_time, test_event, test_time,
                           estimate, times):
    """Trapezoidal integral of the Brier score over [times[0], times[-1]],
    normalized by the span — matches sksurv.metrics.integrated_brier_score.
    """
    times, scores = brier_score(train_event, train_time, test_event,
                                test_time, estimate, times)
    if len(times) < 2:
        raise ValueError("need at least two time points")
    return np.trapezoid(scores, times) / (times[-1] - times[0])


def survival_probs_at_times(S_bins, bin_edges, times):
    """Interpolate per-bin survival S[B, K] (survival through bin k) onto
    arbitrary query times using the discrete model's step structure.

    The reference evaluates IBS directly at the bin edges
    (core_utils_pretrained.py:539-551: times = bins[1:]), where column k of
    S is the survival at edge k+1 — so for that use-case this is an
    identity passthrough; kept general for other grids.
    """
    S_bins = np.asarray(S_bins, dtype=np.float64)
    edges = np.asarray(bin_edges, dtype=np.float64)
    times = np.asarray(times, dtype=np.float64)
    # step function: S(t) = S_bins[:, k] for t in [edges[k+1], edges[k+2])
    # S(t) = 1 for t < edges[1]
    out = np.ones((S_bins.shape[0], len(times)))
    for j, t in enumerate(times):
        k = np.searchsorted(edges[1:], t, side="right") - 1
        if k >= S_bins.shape[1]:
            k = S_bins.shape[1] - 1
        if k >= 0:
            out[:, j] = S_bins[:, k]
    return out
