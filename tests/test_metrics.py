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
