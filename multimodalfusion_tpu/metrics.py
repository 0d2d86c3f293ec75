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


def _ipcw_weights(train_event, train_time, test_event, test_time):
    """1/G(t_i) for test events (0 for censored), with the censoring
    survival G estimated from the training cohort (reverse KM) — the
    sksurv ``CensoringDistributionEstimator.predict_ipcw`` convention.
    Queries past the last training time take the last G value."""
    g_t, g_v = censoring_survival(train_event, train_time)
    test_event = np.asarray(test_event, dtype=bool)
    test_time = np.asarray(test_time, dtype=np.float64)
    G = _step_lookup(g_t, g_v, test_time)
    if np.any((G <= 0) & test_event):
        raise ValueError("censoring survival function is zero at one or "
                         "more event times")
    w = np.zeros(len(test_time))
    w[test_event] = 1.0 / G[test_event]
    return w


def concordance_index_ipcw(train_event, train_time, test_event, test_time,
                           estimate, tau=None, tied_tol: float = 1e-8):
    """Uno's IPCW concordance index — native port of
    ``sksurv.metrics.concordance_index_ipcw`` (the reference calls it in
    utils_analysis/evaluation.py:578 via ``survival_AUC``).

    Pairs are the same as Harrell's (event i, with j surviving longer or
    censored at i's time); each row i is weighted by 1/G(t_i)^2 where G
    is the train-cohort censoring survival.  ``tau`` truncates: rows
    with t_i >= tau get weight 0.

    Returns (cindex, concordant, discordant, tied_risk, tied_time) with
    the count fields unweighted, matching sksurv.
    """
    event = np.asarray(test_event, dtype=bool)
    time = np.asarray(test_time, dtype=np.float64)
    est = np.asarray(estimate, dtype=np.float64)
    if not event.any():
        raise ValueError("All samples are censored")

    # sksurv truncates BEFORE estimating the weights, so a zero G at an
    # event time >= tau must not raise — weight those rows as 0 here too
    if tau is not None:
        in_tau = time < tau
        ipcw = np.zeros(len(time))
        ipcw[in_tau] = _ipcw_weights(train_event, train_time,
                                     event[in_tau], time[in_tau])
        w = np.square(ipcw)
    else:
        ipcw = _ipcw_weights(train_event, train_time, event, time)
        w = np.square(ipcw)

    later = time[None, :] > time[:, None]
    tied_at = (time[None, :] == time[:, None]) & (~event)[None, :]
    comp = event[:, None] & (later | tied_at)
    np.fill_diagonal(comp, False)

    diff = est[:, None] - est[None, :]
    tied_risk_mat = np.abs(diff) <= tied_tol
    concordant_mat = (diff > 0) & ~tied_risk_mat

    numerator = np.sum(w[:, None] * comp * (concordant_mat
                                            + 0.5 * tied_risk_mat))
    denominator = np.sum(w[:, None] * comp)
    if denominator == 0:
        raise ValueError("No comparable pairs")

    concordant = int(np.sum(comp & concordant_mat))
    tied_risk = int(np.sum(comp & tied_risk_mat))
    discordant = int(np.sum(comp)) - concordant - tied_risk
    tied_time = int(np.sum(event[:, None] & tied_at))
    return (numerator / denominator, concordant, discordant, tied_risk,
            tied_time)


def cumulative_dynamic_auc(train_event, train_time, test_event, test_time,
                           estimate, times):
    """Time-dependent cumulative/dynamic AUC — native port of
    ``sksurv.metrics.cumulative_dynamic_auc`` (reference
    utils_analysis/evaluation.py:577).

    At each query time t, cases are subjects with an event by t
    (IPCW-weighted by 1/G(t_i), G from the train cohort) and controls
    those still at risk after t; AUC(t) is the area under the
    tie-pooled weighted ROC.  The summary ``mean_auc`` integrates
    AUC(t) against the test cohort's KM survival over the times where
    AUC is defined: sum_k AUC(t_k) * d_k / sum_k d_k with
    d_k = S(t_{k-1}) - S(t_k), k ranging over non-NaN AUCs (equal to
    sksurv's /(1 - S(t_max)) normalization when every time is valid;
    see the renormalization comment below for why).

    Returns (auc_per_time [len(times)], mean_auc).
    """
    event = np.asarray(test_event, dtype=bool)
    time = np.asarray(test_time, dtype=np.float64)
    est = np.asarray(estimate, dtype=np.float64)
    times = np.atleast_1d(np.asarray(times, dtype=np.float64))

    ipcw = _ipcw_weights(train_event, train_time, event, time)

    order = np.argsort(-est, kind="stable")
    est_ord = est[order]
    time_ord = time[order]
    event_ord = event[order]
    ipcw_ord = ipcw[order]
    # pool thresholds with tied estimates: keep the last of each run
    keep = np.concatenate([np.diff(est_ord) != 0, [True]])

    scores = np.empty(len(times))
    for k, t in enumerate(times):
        is_case = (time_ord <= t) & event_ord
        is_control = time_ord > t
        n_controls = int(is_control.sum())
        cum_tp = np.cumsum(is_case * ipcw_ord)
        cum_fp = np.cumsum(is_control)
        if cum_tp[-1] == 0 or n_controls == 0:
            scores[k] = np.nan
            continue
        tpr = cum_tp[keep] / cum_tp[-1]
        fpr = cum_fp[keep] / n_controls
        scores[k] = np.trapezoid(np.concatenate([[0.0], tpr]),
                                 np.concatenate([[0.0], fpr]))

    if len(times) == 1:
        return scores, float(scores[0])
    s_t, s_v = kaplan_meier(event, time)
    S = _step_lookup(s_t, s_v, times)
    d = -np.diff(np.concatenate([[1.0], S]))
    valid = ~np.isnan(scores)
    # undefined AUC(t) (a query time with no cases or no controls) is
    # excluded from BOTH the numerator and the KM mass it weights —
    # keeping the full 1-S(t_max) denominator would bias mean_auc low.
    # (sksurv instead refuses such times grids up front; times inside
    # the follow-up range can still have zero cases, so renormalizing
    # is the usable generalization.)
    denom = float(np.sum(d[valid]))
    mean_auc = (float(np.sum(scores[valid] * d[valid]) / denom)
                if denom > 0 else float("nan"))
    return scores, mean_auc


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
