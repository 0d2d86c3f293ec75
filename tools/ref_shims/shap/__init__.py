"""Import-time stub for ``import shap`` (ref create_heatmaps.py:22 —
shap is not installable in this image).  Only the omic branch of the
reference's heatmap CLI constructs an explainer; the path/radio parity
paths merely import the module."""


class GradientExplainer:
    def __init__(self, *a, **k):
        raise NotImplementedError("shap stub (parity shims)")


def summary_plot(*a, **k):
    raise NotImplementedError("shap stub (parity shims)")


def dependence_plot(*a, **k):
    raise NotImplementedError("shap stub (parity shims)")
