"""Import-time stub for `import SimpleITK as sitk` (ref
dataset_raw.py:4); never called on the parity paths."""
def ReadImage(*a, **k):
    raise NotImplementedError("SimpleITK stub (parity shims)")
def GetArrayFromImage(*a, **k):
    raise NotImplementedError("SimpleITK stub (parity shims)")
