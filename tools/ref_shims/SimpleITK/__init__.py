"""Functional mini-SimpleITK shim backed by this repo's native NIfTI
reader — the surface the reference's radio heatmap branch touches
(ref heatmap_utils.radio_img :177-197: ReadImage / GetOrigin / Flip /
GetArrayFromImage).  Array layout follows sitk convention: arrays are
[z, y, x], Origin/Spacing/Size are (x, y, z)."""
import numpy as np

from multimodalfusion_tpu.data.nifti import read_nifti


class Image:
    def __init__(self, data_zyx, origin_xyz, spacing_xyz):
        self._data = np.asarray(data_zyx)
        self._origin = tuple(float(v) for v in origin_xyz)
        self._spacing = tuple(float(v) for v in spacing_xyz)

    def GetOrigin(self):
        return self._origin

    def GetSpacing(self):
        return self._spacing

    def GetSize(self):
        return tuple(int(s) for s in self._data.shape[::-1])


def ReadImage(path, *a, **k):
    img = read_nifti(str(path))
    return Image(img.data, img.origin_lps, img.pixdim)


def Flip(image, flip_axes, flipAboutOrigin=False):
    """sitk.Flip semantics with identity direction: the image stays at
    the same physical location (flipAboutOrigin=False), so a flipped
    axis moves the origin to the former last-voxel position."""
    data = image._data
    origin = list(image._origin)
    for ax_xyz, do_flip in enumerate(flip_axes):
        if not do_flip:
            continue
        data = np.flip(data, axis=2 - ax_xyz)
        if not flipAboutOrigin:
            n = data.shape[2 - ax_xyz]
            origin[ax_xyz] += (n - 1) * image._spacing[ax_xyz]
    return Image(data, origin, image._spacing)


def GetArrayFromImage(image):
    return np.array(image._data)
