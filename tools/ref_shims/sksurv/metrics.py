from multimodalfusion_tpu.metrics import concordance_index_censored  # noqa


def integrated_brier_score(*a, **k):
    raise NotImplementedError("shim: not needed for this arm")


def cumulative_dynamic_auc(*a, **k):
    raise NotImplementedError("shim: not needed for this arm")
