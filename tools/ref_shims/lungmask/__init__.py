"""Functional lungmask shim (`from lungmask import mask`, ref
dataset_raw.py:10).  The real package's pretrained U-Net is not
installable in this image, so ``mask.apply`` routes to the classical
HU-threshold + connected-components estimator — the SAME function this
repo's pipeline falls back to (data/ct_preprocess.lung_mask), so
reference-vs-rebuild comparisons share the mask generator and isolate
everything around it (orientation, resample, lung boxes, crop,
normalize, slice selection).  PARITY.md §6 documents the estimator's
accuracy vs the U-Net."""
import numpy as np


class _Mask:
    @staticmethod
    def apply(volume, *a, **k):
        from multimodalfusion_tpu.data.ct_preprocess import \
            segment_lung_mask
        # the real package emits uint8 labels; the reference feeds the
        # mask straight into cv2.findContours, which rejects int8
        return segment_lung_mask(np.asarray(volume)).astype(np.uint8)


mask = _Mask()
