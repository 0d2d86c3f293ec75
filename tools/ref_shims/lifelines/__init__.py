"""Mini lifelines shim: a working ``concordance_index`` (delegating to
this repo's pinned-parity implementation, see utils/__init__.py) plus
import-only stubs for the fitters the reference's
utils_analysis/evaluation.py:11-17,38 imports at module level but the
parity paths never construct."""


class CoxPHFitter:
    def __init__(self, *a, **k):
        raise NotImplementedError("CoxPHFitter stub (parity shims)")


class KaplanMeierFitter:
    def __init__(self, *a, **k):
        raise NotImplementedError("KaplanMeierFitter stub (parity shims)")
