"""Import-time stub for `from lungmask import mask` (ref
dataset_raw.py:10); never called on the parity paths."""
class _Mask:
    def apply(self, *a, **k):
        raise NotImplementedError("lungmask stub (parity shims)")
mask = _Mask()
