"""Binning parity tests vs the pandas qcut/cut recipe of the reference
(dataset_survival.py:36-74)."""
import numpy as np
import pandas as pd

from multimodalfusion_tpu.data import labels


def make_cohort(n=200, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "subject_id": [f"S{i}" for i in range(n)],
        "survival_months": rng.uniform(0.5, 120, n).round(1),
        "censorship": rng.integers(0, 2, n).astype(float),
        "train": (rng.uniform(size=n) < 0.8).astype(int),
    })


def test_bins_match_reference_recipe():
    df = make_cohort()
    n_bins = 4
    eps = 1e-6
    q = labels.compute_bins(df, "survival_months", n_bins, eps)
    # reference recipe re-derived inline
    unc = df[df["censorship"] < 1]
    _, q_ref = pd.qcut(unc[unc.train == 1]["survival_months"], q=n_bins,
                       retbins=True, labels=False)
    q_ref = np.asarray(q_ref, float)
    q_ref[-1] = df["survival_months"].max() + eps
    q_ref[0] = df["survival_months"].min() - eps
    np.testing.assert_allclose(q, q_ref)

    disc = labels.assign_bins(df["survival_months"].values, q)
    disc_ref = pd.cut(df["survival_months"], bins=q_ref, right=False,
                      include_lowest=True, labels=False).astype(int)
    np.testing.assert_array_equal(disc, np.asarray(disc_ref))
    assert disc.min() >= 0 and disc.max() == n_bins - 1


def test_label_dict_layout():
    d = labels.label_dict(2)
    assert d == {(0, 0): 0, (0, 1): 1, (1, 0): 2, (1, 1): 3}


def test_discretize_end_to_end():
    df = make_cohort(100, seed=1)
    disc, lab, q, ld = labels.discretize(df, n_bins=3)
    assert len(disc) == len(df) == len(lab)
    assert len(q) == 4
    # class id consistency
    for i in range(len(df)):
        assert lab[i] == ld[(int(disc[i]), int(df["censorship"].iloc[i]))]


def test_degenerate_cohorts_raise_pointed_errors():
    """Cohorts the reference crashes on with raw pandas errors ("Bin
    edges must be unique: [nan, ...]") must refuse with the actual
    cause named: no uncensored train patients, or too few / too tied
    survival values for the requested bin count."""
    import pytest
    from multimodalfusion_tpu.data.labels import compute_bins

    def cohort(times, censorship):
        return pd.DataFrame({"survival_months": times,
                             "censorship": censorship,
                             "train": 1})

    with pytest.raises(ValueError, match="no uncensored"):
        compute_bins(cohort([1.0, 2.0, 3.0, 4.0], [1, 1, 1, 1]), n_bins=4)
    with pytest.raises(ValueError, match="distinct"):
        compute_bins(cohort([12.0] * 10, [0] * 10), n_bins=4)
    with pytest.raises(ValueError, match="tied"):
        # 4 distinct values but so tied the quartile edges collapse
        compute_bins(cohort([1.0] * 20 + [2.0, 3.0, 4.0], [0] * 23),
                     n_bins=4)
    # a healthy cohort still bins exactly as before
    bins = compute_bins(cohort(list(np.linspace(1, 100, 24)), [0] * 24),
                        n_bins=4)
    assert len(bins) == 5
