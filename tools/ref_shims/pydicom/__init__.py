"""Import-time stub for `import pydicom as dicom` (ref
ct_preprocess_utils.py:4); never called on the parity paths."""
def dcmread(*a, **k):
    raise NotImplementedError("pydicom stub (parity shims)")
read_file = dcmread
