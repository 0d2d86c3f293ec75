"""Import-time stub for `import nibabel as nib` (ref utils_ig.py:25);
never called on the parity paths."""
def load(*a, **k):
    raise NotImplementedError("nibabel stub (parity shims)")
class Nifti1Image:
    def __init__(self, *a, **k):
        raise NotImplementedError("nibabel stub (parity shims)")
