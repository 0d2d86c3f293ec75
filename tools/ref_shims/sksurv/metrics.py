from multimodalfusion_tpu.metrics import concordance_index_censored  # noqa


def integrated_brier_score(survival_train, survival_test, estimate,
                           times):
    """sksurv structured-array API adapted onto the repo's pinned-parity
    implementation."""
    import numpy as np
    from multimodalfusion_tpu import metrics as _m
    ev_f, t_f = survival_train.dtype.names
    return _m.integrated_brier_score(
        np.asarray(survival_train[ev_f], bool),
        np.asarray(survival_train[t_f], float),
        np.asarray(survival_test[ev_f], bool),
        np.asarray(survival_test[t_f], float),
        np.asarray(estimate, float), np.asarray(times, float))


def cumulative_dynamic_auc(*a, **k):
    raise NotImplementedError("shim: not needed for this arm")


def concordance_index_ipcw(*a, **k):
    raise NotImplementedError("shim: not needed for this arm")
