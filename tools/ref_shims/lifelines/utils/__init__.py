from multimodalfusion_tpu.metrics import concordance_index_censored


def concordance_index(event_times, predicted_scores, event_observed=None):
    import numpy as np
    if event_observed is None:
        event_observed = np.ones(len(event_times))
    # lifelines convention: higher predicted score = longer survival
    return concordance_index_censored(
        np.asarray(event_observed, bool), np.asarray(event_times, float),
        -np.asarray(predicted_scores, float))[0]


def k_fold_cross_validation(*a, **k):
    raise NotImplementedError("k_fold_cross_validation stub (parity shims)")
