"""Import-only stub (ref utils_analysis/evaluation.py:14)."""


def load_regression_dataset(*a, **k):
    raise NotImplementedError("load_regression_dataset stub (parity shims)")
