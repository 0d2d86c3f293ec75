def disk(*a, **k):
    raise NotImplementedError("skimage stub (parity shims)")
def binary_closing(*a, **k):
    raise NotImplementedError("skimage stub (parity shims)")
