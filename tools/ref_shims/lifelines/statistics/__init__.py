"""Import-only stub (ref utils_analysis/evaluation.py:16)."""


def logrank_test(*a, **k):
    raise NotImplementedError("logrank_test stub (parity shims)")
