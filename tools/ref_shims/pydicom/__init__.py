"""Functional pydicom shim backed by this repo's native DICOM reader
(`import pydicom as dicom`, ref ct_preprocess_utils.py:4).  The
reference's lung pipeline touches only the Dataset surface
`data.dicom.DicomSlice` already provides (pixel_array,
ImagePositionPatient, SliceLocation, RescaleIntercept/Slope,
PixelSpacing, ImageOrientationPatient, assignable SliceThickness —
ref load_scan :14-34, get_pixels_hu :37-60, resample :63-76)."""
from multimodalfusion_tpu.data.dicom import read_file


def dcmread(path, *a, **k):
    return read_file(str(path))
