"""Import-time stub for `from torchsummary import summary` (ref
resnet_custom.py:5); only prints a model table when called."""
def summary(*a, **k):
    raise NotImplementedError("torchsummary stub (parity shims)")
