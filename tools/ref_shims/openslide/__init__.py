"""openslide shim for running the REFERENCE's WholeSlideImage in this
image (the openslide C library is absent): backs the tiny API surface
the reference touches with this repo's PILSlide over multi-page TIFFs.
Used only by parity tooling (tools/parity_heatmap.py)."""
import numpy as np
from PIL import Image


class OpenSlide:
    def __init__(self, path):
        from multimodalfusion_tpu.data.wsi import PILSlide
        self._s = PILSlide(path)
        self.level_dimensions = tuple(tuple(int(v) for v in d)
                                      for d in self._s.level_dimensions)
        # openslide reports a single float per level
        self.level_downsamples = tuple(float(ds[0]) for ds in
                                       self._s.level_downsamples)
        self.level_count = self._s.level_count
        self.properties = {}

    def read_region(self, location, level, size):
        arr = self._s.read_region(tuple(int(v) for v in location),
                                  int(level),
                                  tuple(int(v) for v in size))
        return Image.fromarray(np.asarray(arr)).convert("RGBA")

    def get_best_level_for_downsample(self, downsample):
        best = 0
        for i, ds in enumerate(self.level_downsamples):
            if ds <= downsample + 0.01:
                best = i
        return best


def open_slide(path):
    return OpenSlide(path)
