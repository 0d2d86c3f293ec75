"""Tests for native survival metrics (c-index, KM, IBS) against
hand-computed values and known invariants."""
import numpy as np
import pytest

from multimodalfusion_tpu import metrics


def test_cindex_perfect_ranking():
    event = np.array([1, 1, 1, 1], bool)
    time = np.array([1.0, 2.0, 3.0, 4.0])
    risk = np.array([4.0, 3.0, 2.0, 1.0])  # shorter time -> higher risk
    c, conc, disc, tr, tt = metrics.concordance_index_censored(event, time, risk)
    assert c == 1.0 and conc == 6 and disc == 0


def test_cindex_reversed():
    event = np.array([1, 1, 1], bool)
    time = np.array([1.0, 2.0, 3.0])
    risk = np.array([1.0, 2.0, 3.0])
    c, *_ = metrics.concordance_index_censored(event, time, risk)
    assert c == 0.0


def test_cindex_hand_computed_censoring():
    # patients: (t, event, risk)
    # A (2, 1, 0.9), B (3, 0, 0.5), C (5, 1, 0.7), D (5, 0, 0.1)
    # comparable: A-B (conc 0.9>0.5), A-C (conc), A-D (conc),
    #             C-D (t equal, D censored: conc 0.7>0.1)
    # B censored at 3: B has no event, contributes no pairs as i.
    # C event at 5: pairs with times > 5: none; D tied censored: counted.
    event = np.array([1, 0, 1, 0], bool)
    time = np.array([2.0, 3.0, 5.0, 5.0])
    risk = np.array([0.9, 0.5, 0.7, 0.1])
    c, conc, disc, tr, tt = metrics.concordance_index_censored(event, time, risk)
    assert conc == 4 and disc == 0 and tr == 0
    assert c == 1.0


def test_cindex_tied_risk():
    event = np.array([1, 1], bool)
    time = np.array([1.0, 2.0])
    risk = np.array([0.5, 0.5])
    c, conc, disc, tr, tt = metrics.concordance_index_censored(event, time, risk)
    assert tr == 1 and c == 0.5


def test_cindex_all_censored_raises():
    with pytest.raises(ValueError):
        metrics.concordance_index_censored(
            np.zeros(3, bool), np.arange(3.0), np.arange(3.0))


def test_km_no_censoring():
    # deaths at 1,2,3,4 of n=4: S = 3/4, 1/2, 1/4, 0
    t, s = metrics.kaplan_meier(np.ones(4, bool), np.array([1.0, 2, 3, 4]))
    np.testing.assert_allclose(s, [0.75, 0.5, 0.25, 0.0])


def test_km_with_censoring():
    # classic example: t=[1,2+,3], S(1)=2/3, S(3)=2/3*(1-1/1)=0
    t, s = metrics.kaplan_meier(np.array([1, 0, 1], bool),
                                np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(s, [2 / 3, 2 / 3, 0.0])


def test_censoring_survival_reverse_km():
    # censoring events at 2 (of risk set 2 after removing the death at 2? no
    # deaths at 2): G(2) = 1 - 1/2 = 0.5
    event = np.array([1, 0, 1], bool)
    time = np.array([1.0, 2.0, 3.0])
    t, g = metrics.censoring_survival(event, time)
    np.testing.assert_allclose(g, [1.0, 0.5, 0.5])


def test_brier_score_perfect_prediction():
    """A perfect oracle on uncensored data scores ~0 at times where the
    prediction is exact 0/1."""
    event = np.ones(4, bool)
    time = np.array([1.0, 2.0, 3.0, 4.0])
    times = np.array([1.5, 2.5, 3.5])
    est = (time[:, None] > times[None, :]).astype(float)  # S(t|x)=1 if alive
    _, scores = metrics.brier_score(event, time, event, time, est, times)
    # weights are 1/G; with all events G stays 1 until last time
    assert np.all(scores <= 1e-12)


def test_ibs_constant_half():
    """S(t)=0.5 for everyone, no censoring: BS(t) = 0.25 everywhere so
    IBS = 0.25."""
    event = np.ones(8, bool)
    time = np.linspace(1, 8, 8)
    times = np.array([2.0, 4.0, 6.0])
    est = np.full((8, 3), 0.5)
    ibs = metrics.integrated_brier_score(event, time, event, time, est, times)
    np.testing.assert_allclose(ibs, 0.25, rtol=1e-10)


def test_survival_probs_at_bin_edges():
    S = np.array([[0.9, 0.7, 0.4, 0.1]])
    edges = np.array([0.0, 10.0, 20.0, 30.0, 40.0])
    # query exactly at interior edges -> column passthrough
    out = metrics.survival_probs_at_times(S, edges, np.array([10.0, 20.0, 30.0, 40.0]))
    np.testing.assert_allclose(out, S)
    # before first interior edge -> survival 1
    out = metrics.survival_probs_at_times(S, edges, np.array([5.0]))
    np.testing.assert_allclose(out, [[1.0]])


# ---------------------------------------------------------------------------
# IPCW c-index + time-dependent AUC (ref utils_analysis/evaluation.py:559-580
# uses sksurv's concordance_index_ipcw / cumulative_dynamic_auc; sksurv is
# not in this image, so the oracles are straightforward per-pair loop
# implementations of the same formulas)
# ---------------------------------------------------------------------------

def _ipcw_oracle(tr_e, tr_t, te_e, te_t):
    g_t, g_v = metrics.censoring_survival(tr_e, tr_t)
    w = np.zeros(len(te_t))
    for i in range(len(te_t)):
        if te_e[i]:
            idx = np.searchsorted(g_t, te_t[i], side="right") - 1
            G = g_v[idx] if idx >= 0 else 1.0
            w[i] = 1.0 / G
    return w


def _cindex_ipcw_oracle(tr_e, tr_t, te_e, te_t, est, tau=None,
                        tied_tol=1e-8):
    w = _ipcw_oracle(tr_e, tr_t, te_e, te_t) ** 2
    if tau is not None:
        w = np.where(te_t < tau, w, 0.0)
    num = den = 0.0
    for i in range(len(te_t)):
        if not te_e[i]:
            continue
        for j in range(len(te_t)):
            if i == j:
                continue
            comparable = te_t[j] > te_t[i] or (te_t[j] == te_t[i]
                                               and not te_e[j])
            if not comparable:
                continue
            den += w[i]
            if abs(est[i] - est[j]) <= tied_tol:
                num += 0.5 * w[i]
            elif est[i] > est[j]:
                num += w[i]
    return num / den


def _auc_oracle(tr_e, tr_t, te_e, te_t, est, t):
    """Weighted Mann-Whitney form of the cumulative/dynamic AUC at t."""
    w = _ipcw_oracle(tr_e, tr_t, te_e, te_t)
    num = den = 0.0
    for i in range(len(te_t)):
        if not (te_e[i] and te_t[i] <= t):
            continue
        for j in range(len(te_t)):
            if te_t[j] <= t:
                continue
            den += w[i]
            if est[i] > est[j]:
                num += w[i]
            elif est[i] == est[j]:
                num += 0.5 * w[i]
    return num / den


@pytest.fixture
def surv_data():
    rng = np.random.default_rng(7)
    n_tr, n_te = 60, 40
    tr_risk = rng.normal(size=n_tr)
    tr_t = np.round(np.exp(2.0 - tr_risk + 0.4 * rng.normal(size=n_tr)), 1)
    tr_e = rng.uniform(size=n_tr) > 0.3
    te_risk = np.round(rng.normal(size=n_te), 1)  # ties in estimates
    te_t = np.round(np.exp(2.0 - te_risk + 0.4 * rng.normal(size=n_te)), 1)
    te_e = rng.uniform(size=n_te) > 0.3
    # keep the test cohort inside the train follow-up so G > 0
    te_t = np.minimum(te_t, tr_t.max() - 0.1)
    return tr_e, tr_t, te_e, te_t, te_risk


def test_cindex_ipcw_matches_pair_loop(surv_data):
    tr_e, tr_t, te_e, te_t, risk = surv_data
    got = metrics.concordance_index_ipcw(tr_e, tr_t, te_e, te_t, risk)[0]
    want = _cindex_ipcw_oracle(tr_e, tr_t, te_e, te_t, risk)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_cindex_ipcw_tau_truncation(surv_data):
    tr_e, tr_t, te_e, te_t, risk = surv_data
    tau = float(np.median(te_t))
    got = metrics.concordance_index_ipcw(tr_e, tr_t, te_e, te_t, risk,
                                         tau=tau)[0]
    want = _cindex_ipcw_oracle(tr_e, tr_t, te_e, te_t, risk, tau=tau)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_cindex_ipcw_no_censoring_equals_harrell():
    """With no censoring anywhere, G == 1 so all weights are equal and
    Uno's c reduces to Harrell's."""
    rng = np.random.default_rng(3)
    n = 50
    risk = rng.normal(size=n)
    t = np.round(np.exp(1.5 - risk + 0.3 * rng.normal(size=n)), 1)
    e = np.ones(n, bool)
    uno = metrics.concordance_index_ipcw(e, t, e, t, risk)[0]
    harrell = metrics.concordance_index_censored(e, t, risk)[0]
    np.testing.assert_allclose(uno, harrell, rtol=1e-12)


def test_cumulative_dynamic_auc_matches_wmw_loop(surv_data):
    tr_e, tr_t, te_e, te_t, risk = surv_data
    times = np.percentile(te_t, [20, 40, 60, 80])
    aucs, mean_auc = metrics.cumulative_dynamic_auc(
        tr_e, tr_t, te_e, te_t, risk, times)
    for k, t in enumerate(times):
        want = _auc_oracle(tr_e, tr_t, te_e, te_t, risk, t)
        np.testing.assert_allclose(aucs[k], want, rtol=1e-12,
                                   err_msg=f"AUC at t={t}")
    # the summary integrates AUC(t) against the test KM: recompute
    s_t, s_v = metrics.kaplan_meier(te_e, te_t)
    idx = np.searchsorted(s_t, times, side="right") - 1
    S = np.where(idx >= 0, s_v[np.clip(idx, 0, len(s_v) - 1)], 1.0)
    d = -np.diff(np.concatenate([[1.0], S]))
    want_mean = np.sum(aucs * d) / (1.0 - S[-1])
    np.testing.assert_allclose(mean_auc, want_mean, rtol=1e-12)


def test_cumulative_dynamic_auc_perfect_ranking():
    e = np.ones(6, bool)
    t = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    risk = -t  # higher risk = earlier event, perfectly
    aucs, mean_auc = metrics.cumulative_dynamic_auc(
        e, t, e, t, risk, np.array([2.5, 4.5]))
    np.testing.assert_allclose(aucs, 1.0)
    np.testing.assert_allclose(mean_auc, 1.0)


def test_cumulative_dynamic_auc_tied_estimates_half_credit():
    """All-equal estimates: every case/control pair gets 0.5."""
    e = np.ones(8, bool)
    t = np.linspace(1, 8, 8)
    risk = np.zeros(8)
    aucs, _ = metrics.cumulative_dynamic_auc(e, t, e, t, risk,
                                             np.array([4.5]))
    np.testing.assert_allclose(aucs, 0.5)


def test_cumulative_dynamic_auc_nan_times_renormalize():
    """A query time with no cases yet (AUC undefined -> NaN) must drop
    its KM mass from the mean's denominator too — keeping the full
    1-S(t_max) denominator would bias mean_auc low (advisor round 3)."""
    e = np.ones(6, bool)
    t = np.array([2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    risk = -t
    times = np.array([1.0, 4.5])  # no events by t=1 -> NaN AUC there
    aucs, mean_auc = metrics.cumulative_dynamic_auc(e, t, e, t, risk,
                                                    times)
    assert np.isnan(aucs[0]) and aucs[1] == pytest.approx(1.0)
    # the one valid time carries all the surviving KM mass
    np.testing.assert_allclose(mean_auc, 1.0, rtol=1e-12)
    # all times invalid -> NaN mean, not a division error
    _, m = metrics.cumulative_dynamic_auc(e, t, e, t, risk,
                                          np.array([0.5, 1.0]))
    assert np.isnan(m)


def test_cindex_ipcw_tau_excludes_zero_G_events():
    """An event past the train follow-up (G == 0 there) must not raise
    when tau truncates it away — sksurv masks BEFORE weighting."""
    tr_t = np.array([1.0, 2.0, 3.0, 4.0])
    tr_e = np.array([1, 1, 0, 0], bool)   # censoring ends at t=4 -> G(4)=0
    te_t = np.array([1.5, 2.5, 5.0])
    te_e = np.array([1, 1, 1], bool)      # event at 5.0 has G == 0
    risk = np.array([3.0, 2.0, 1.0])
    c = metrics.concordance_index_ipcw(tr_e, tr_t, te_e, te_t, risk,
                                       tau=4.0)[0]
    assert c == 1.0
    with pytest.raises(ValueError):
        metrics.concordance_index_ipcw(tr_e, tr_t, te_e, te_t, risk)
