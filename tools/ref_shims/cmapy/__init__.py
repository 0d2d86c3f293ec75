"""Import-time stub for `import cmapy` (ref utils_ig.py:23); only used
when rendering colormapped overlays, not on the parity paths."""
def cmap(*a, **k):
    raise NotImplementedError("cmapy stub (parity shims)")
