def label(*a, **k):
    raise NotImplementedError("skimage stub (parity shims)")
def regionprops(*a, **k):
    raise NotImplementedError("skimage stub (parity shims)")
def marching_cubes(*a, **k):
    raise NotImplementedError("skimage stub (parity shims)")
