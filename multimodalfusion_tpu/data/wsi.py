"""Whole-slide-image support: slide backends, tissue segmentation, patch
coordinate generation, patch IO — native rewrite of ref
utils/WholeSlideImage.py (C1), utils/wsi_utils.py (C2) and
utils/util_classes.py (C3).

Backends (openslide is not in this image):
  * ``OpenSlideBackend`` — gated import, full pyramidal WSI support;
  * ``PILSlide`` — plain/multi-page TIFF & PNG via PIL (pages = levels);
  * ``ArraySlide`` — in-memory numpy pyramid (tests, synthetic slides).

The patch-coordinate generator replaces the reference's
multiprocessing.Pool starmap over Python checker objects
(ref WholeSlideImage.py:515-533) with scanline row tests
(``_polygon_row_test``: crossing parity per probe row, exact to cv2
semantics — oracle/fuzz-tested in tests/test_wsi.py, ~5x the per-point
loop single-threaded; see PERF.md).
"""
from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from multimodalfusion_tpu.data.io import save_hdf5


# ---------------------------------------------------------------------------
# slide backends
# ---------------------------------------------------------------------------

class ArraySlide:
    """In-memory pyramid: list of RGB uint8 arrays, level 0 largest."""

    def __init__(self, levels: Sequence[np.ndarray], name: str = "array"):
        self.levels = [np.asarray(l) for l in levels]
        self.name = name

    @property
    def level_count(self) -> int:
        return len(self.levels)

    @property
    def level_dimensions(self) -> List[Tuple[int, int]]:
        return [(l.shape[1], l.shape[0]) for l in self.levels]  # (w, h)

    @property
    def level_downsamples(self) -> List[Tuple[float, float]]:
        w0, h0 = self.level_dimensions[0]
        return [(w0 / w, h0 / h) for (w, h) in self.level_dimensions]

    def read_region(self, location_level0, level, size) -> np.ndarray:
        """(x, y) level-0 location, level, (w, h) size -> RGB uint8."""
        ds = self.level_downsamples[level]
        x = int(location_level0[0] / ds[0])
        y = int(location_level0[1] / ds[1])
        w, h = size
        arr = self.levels[level]
        out = np.full((h, w, 3), 255, np.uint8)
        src = arr[max(y, 0):y + h, max(x, 0):x + w, :3]
        out[:src.shape[0], :src.shape[1]] = src
        return out

    def thumbnail(self, level: int = -1) -> np.ndarray:
        return self.levels[level][..., :3]


class PILSlide(ArraySlide):
    """PIL-backed slide: multi-page TIFF pages are pyramid levels.

    PIL cannot partially decode TIFF regions, so every page is decoded
    into RAM.  To keep a gigapixel slide from silently OOMing the host
    (this box has ~1 small core), the decoded size is computed from the
    page headers FIRST — past ``max_decode_bytes`` (default 1 GiB,
    overridable via the MMF_TPU_WSI_MAX_BYTES env var) the constructor
    raises with the remedy instead of dying in the allocator.
    """

    DEFAULT_MAX_BYTES = 1 << 30

    def __init__(self, path: str, max_decode_bytes: Optional[int] = None):
        from PIL import Image
        if max_decode_bytes is None:
            max_decode_bytes = int(os.environ.get(
                "MMF_TPU_WSI_MAX_BYTES", self.DEFAULT_MAX_BYTES))
        img = Image.open(path)
        # page sizes/modes come from the headers — no pixels decoded yet
        sizes = []
        native_peak = 0
        # bytes/px of PIL's in-memory storage per mode (convert("RGB")
        # first decodes the page in its NATIVE mode, so a 16-bit RGBA
        # page costs ~8 B/px transiently before the 3 B/px copy)
        mode_bpp = {"1": 1, "L": 1, "P": 1, "LA": 4, "PA": 4, "I;16": 2,
                    "I;16B": 2, "I;16L": 2, "I": 4, "F": 4, "RGB": 4,
                    "YCbCr": 4, "LAB": 4, "HSV": 4, "RGBX": 4,
                    "RGBA": 4, "CMYK": 4, "RGBa": 4, "I;16N": 2}
        try:
            i = 0
            while True:
                img.seek(i)
                sizes.append(img.size)  # (w, h)
                w, h = img.size
                native_peak = max(native_peak,
                                  mode_bpp.get(img.mode, 4) * w * h)
                i += 1
        except EOFError:
            pass
        # peak = all retained RGB levels + the largest page's native-
        # mode decode buffer (transiently alive during convert)
        total = sum(3 * w * h for (w, h) in sizes) + native_peak
        if total > max_decode_bytes:
            raise ValueError(
                f"{path}: decoding {len(sizes)} page(s) "
                f"{sizes} needs ~{total / 2**20:.0f} MiB "
                f"(> {max_decode_bytes / 2**20:.0f} MiB budget). PIL "
                "cannot stream TIFF regions; use an openslide-readable "
                "pyramidal format, or raise MMF_TPU_WSI_MAX_BYTES / "
                "max_decode_bytes if the host has the RAM.")
        levels = []
        for i in range(len(sizes)):
            img.seek(i)
            levels.append(np.asarray(img.convert("RGB")))
        order = np.argsort([-l.shape[0] for l in levels])
        super().__init__([levels[i] for i in order],
                         name=os.path.splitext(os.path.basename(path))[0])


class OpenSlideBackend:
    """Full pyramidal WSI via openslide (gated)."""

    def __init__(self, path: str):
        import openslide
        self.wsi = openslide.open_slide(path)
        self.name = os.path.splitext(os.path.basename(path))[0]

    @property
    def level_count(self):
        return self.wsi.level_count

    @property
    def level_dimensions(self):
        return list(self.wsi.level_dimensions)

    @property
    def level_downsamples(self):
        return [(d, d) for d in self.wsi.level_downsamples]

    def read_region(self, location_level0, level, size) -> np.ndarray:
        img = self.wsi.read_region(tuple(int(v) for v in location_level0),
                                   int(level), tuple(int(v) for v in size))
        return np.asarray(img.convert("RGB"))

    def thumbnail(self, level: int = -1) -> np.ndarray:
        lvl = self.level_count - 1 if level == -1 else level
        w, h = self.level_dimensions[lvl]
        return self.read_region((0, 0), lvl, (w, h))


def open_slide(path: str):
    """Factory: openslide formats when available, else PIL."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".svs", ".ndpi", ".mrxs", ".scn", ".vms", ".vmu", ".bif"):
        return OpenSlideBackend(path)
    try:
        return OpenSlideBackend(path)
    except ImportError:
        return PILSlide(path)


# ---------------------------------------------------------------------------
# tissue segmentation (ref segmentTissue, WholeSlideImage.py:112-200)
# ---------------------------------------------------------------------------

def segment_tissue(slide, seg_level: Optional[int] = None, sthresh: int = 20,
                   sthresh_up: int = 255, mthresh: int = 7, close: int = 4,
                   use_otsu: bool = False, a_t: float = 100.0,
                   a_h: float = 16.0, max_n_holes: int = 8,
                   ref_patch_size: int = 512):
    """HSV saturation -> median blur -> (otsu) threshold -> morph close ->
    contour extraction with area filtering.  Returns (tissue_contours,
    hole_contours) in LEVEL-0 coordinates."""
    if seg_level is None:
        seg_level = slide.level_count - 1
    w, h = slide.level_dimensions[seg_level]
    img = slide.read_region((0, 0), seg_level, (w, h))
    img_hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    img_med = cv2.medianBlur(img_hsv[:, :, 1], mthresh)
    if use_otsu:
        _, img_bin = cv2.threshold(img_med, 0, sthresh_up,
                                   cv2.THRESH_OTSU + cv2.THRESH_BINARY)
    else:
        _, img_bin = cv2.threshold(img_med, sthresh, sthresh_up,
                                   cv2.THRESH_BINARY)
    if close > 0:
        kernel = np.ones((close, close), np.uint8)
        img_bin = cv2.morphologyEx(img_bin, cv2.MORPH_CLOSE, kernel)

    scale = slide.level_downsamples[seg_level]
    scaled_ref_area = int(ref_patch_size ** 2 / (scale[0] * scale[1]))
    a_t_abs = a_t * scaled_ref_area
    a_h_abs = a_h * scaled_ref_area

    contours, hierarchy = cv2.findContours(img_bin, cv2.RETR_CCOMP,
                                           cv2.CHAIN_APPROX_NONE)
    if hierarchy is None:
        return [], []
    hierarchy = np.squeeze(hierarchy, axis=0)[:, 2:]  # (child, parent)

    fg, holes_per_fg = [], []
    for idx in np.flatnonzero(hierarchy[:, 1] == -1):
        cont = contours[idx]
        hole_ids = np.flatnonzero(hierarchy[:, 1] == idx)
        area = cv2.contourArea(cont) - sum(
            cv2.contourArea(contours[h]) for h in hole_ids)
        if area <= a_t_abs or area == 0:
            continue
        fg.append(idx)
        hs = sorted((contours[h] for h in hole_ids), key=cv2.contourArea,
                    reverse=True)[:max_n_holes]
        holes_per_fg.append([hh for hh in hs
                             if cv2.contourArea(hh) > a_h_abs])

    sx, sy = scale
    def _scale(cs):
        return [np.array(c * np.array([sx, sy]), dtype=np.int32)
                for c in cs]
    tissue = _scale([contours[i] for i in fg])
    holes = [_scale(hs) for hs in holes_per_fg]
    return tissue, holes


# ---------------------------------------------------------------------------
# contour checking (ref util_classes.py:48-116)
# ---------------------------------------------------------------------------

def _pt_in(cont, pt) -> bool:
    return cv2.pointPolygonTest(cont, (float(pt[0]), float(pt[1])),
                                False) >= 0


def make_contour_checker(contour, patch_size: int, mode: str = "four_pt",
                         center_shift: float = 0.5):
    """Returns pt(x, y)->bool for a patch anchored at its top-left."""
    half = patch_size // 2
    if mode == "basic":
        return lambda pt: _pt_in(contour, pt)
    if mode == "center":
        return lambda pt: _pt_in(contour, (pt[0] + half, pt[1] + half))
    if mode == "four_pt":       # easy: ANY probe inside passes
        s1, s2 = int(half * 0.25), int(half * 0.5)
        offs = [(-s1, -s1), (s1, s1), (s1, -s1), (-s1, s1),
                (-s2, -s2), (s2, s2), (s2, -s2), (-s2, s2)] or [(0, 0)]

        def check(pt):
            cx, cy = pt[0] + half, pt[1] + half
            return any(_pt_in(contour, (cx + dx, cy + dy))
                       for dx, dy in offs)
        return check
    if mode == "four_pt_hard":  # all probes must be inside
        s = int(half * center_shift)
        offs = [(-s, -s), (s, s), (s, -s), (-s, s)] if s > 0 else [(0, 0)]

        def check(pt):
            cx, cy = pt[0] + half, pt[1] + half
            return all(_pt_in(contour, (cx + dx, cy + dy))
                       for dx, dy in offs)
        return check
    raise NotImplementedError(mode)


def _in_holes(holes, pt, patch_size) -> bool:
    cx, cy = pt[0] + patch_size / 2, pt[1] + patch_size / 2
    return any(cv2.pointPolygonTest(h, (float(cx), float(cy)), False) > 0
               for h in holes)


def _polygon_row_test(contour, y: float, qx: np.ndarray) -> np.ndarray:
    """cv2.pointPolygonTest semantics for all points (qx[i], y) on one
    horizontal row in O(E + X log E): crossing parity against the
    sorted edge-intersection xs, with cv2's on-edge (0) cases
    (horizontal edges, vertex hits, exact edge crossings).

    Exactness: for integer contours the intersection xs are rationals
    with denominator <= the contour's y-extent, so distinct values
    differ by >= 1/extent while float64 rounding is ~1e-10 — the 1e-8
    equality window separates the two regimes for slides up to ~1e7 px.
    """
    v = np.asarray(contour, np.float64).reshape(-1, 2)
    v0 = np.roll(v, 1, axis=0)
    v0x, v0y = v0[:, 0], v0[:, 1]
    v1x, v1y = v[:, 0], v[:, 1]
    qx = np.asarray(qx, np.float64)

    contrib = ((v0y <= y) & (v1y > y)) | ((v0y > y) & (v1y <= y))
    xi = np.sort(v0x[contrib] + (y - v0y[contrib])
                 * (v1x[contrib] - v0x[contrib])
                 / (v1y[contrib] - v0y[contrib]))
    right = np.searchsorted(xi, qx + 1e-8)
    left = np.searchsorted(xi, qx - 1e-8)
    on_edge = right > left
    inside = ((len(xi) - right) % 2) == 1

    # cv2's skip-branch on-edge cases: a vertex exactly at (qx, y), or a
    # horizontal edge at y spanning qx
    skipped_vert = (v1y == y) & ~contrib
    if skipped_vert.any():
        vx = np.sort(v1x[skipped_vert])
        hit = np.searchsorted(vx, qx + 1e-8) > np.searchsorted(vx,
                                                               qx - 1e-8)
        on_edge |= hit
    horiz = (v0y == y) & (v1y == y)
    if horiz.any():
        for a, b in zip(np.minimum(v0x[horiz], v1x[horiz]),
                        np.maximum(v0x[horiz], v1x[horiz])):
            on_edge |= (qx >= a) & (qx <= b)
    return np.where(on_edge, np.int8(0),
                    np.where(inside, np.int8(1), np.int8(-1)))


def _probe_offsets(patch_size: int, mode: str,
                   center_shift: float = 0.5):
    """(offsets [P, 2] relative to the patch top-left, require_all) for
    each contour-check strategy (ref util_classes.py:48-116)."""
    half = patch_size // 2
    if mode == "basic":
        return np.array([[0, 0]]), False
    if mode == "center":
        return np.array([[half, half]]), False
    if mode == "four_pt":
        s1, s2 = int(half * 0.25), int(half * 0.5)
        offs = [(-s1, -s1), (s1, s1), (s1, -s1), (-s1, s1),
                (-s2, -s2), (s2, s2), (s2, -s2), (-s2, s2)]
        return np.array(offs) + half, False
    if mode == "four_pt_hard":
        s = int(half * center_shift)
        offs = ([(-s, -s), (s, s), (s, -s), (-s, s)] if s > 0
                else [(0, 0)])
        return np.array(offs) + half, True
    raise NotImplementedError(mode)


# ---------------------------------------------------------------------------
# patch coordinate generation (ref process_contour(s) :432-549)
# ---------------------------------------------------------------------------

def contour_patch_coords(slide, contour, holes, patch_level: int = 0,
                         patch_size: int = 256, step_size: int = 256,
                         contour_fn: str = "four_pt",
                         use_padding: bool = True,
                         center_shift: float = 0.5) -> np.ndarray:
    """Grid candidates over the contour's bounding box filtered by the
    in-contour check and hole exclusion.  Level-0 coords, [N, 2].

    All probe points of all candidates are tested by per-row scanline
    crossing-parity sweeps (_polygon_row_test) instead of the
    reference's per-candidate mp.Pool starmap of pointPolygonTest calls
    (WholeSlideImage.py:515-533); the per-point path survives as the
    oracle in tests/test_wsi.py, which also fuzzes the row test against
    cv2 directly."""
    if contour is not None:
        start_x, start_y, w, h = cv2.boundingRect(contour)
    else:
        w, h = slide.level_dimensions[patch_level]
        start_x = start_y = 0
    ds = slide.level_downsamples[patch_level]
    ref_patch = (int(patch_size * ds[0]), int(patch_size * ds[1]))
    img_w, img_h = slide.level_dimensions[0]
    if use_padding:
        stop_x, stop_y = start_x + w, start_y + h
    else:
        stop_x = min(start_x + w, img_w - ref_patch[0] + 1)
        stop_y = min(start_y + h, img_h - ref_patch[1] + 1)
    xs = np.arange(start_x, stop_x, step_size * int(ds[0]))
    ys = np.arange(start_y, stop_y, step_size * int(ds[1]))
    if len(xs) == 0 or len(ys) == 0:
        return np.zeros((0, 2), np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    candidates = np.stack([gx.ravel(), gy.ravel()], axis=1)

    # keep[i, j] for candidate (xs[i], ys[j]); each probe row is one
    # scanline test over all candidate xs at once
    keep = np.ones((len(xs), len(ys)), bool)
    if contour is not None:
        offs, require_all = _probe_offsets(ref_patch[0], contour_fn,
                                           center_shift)
        comb = np.all if require_all else np.any
        for j, y0 in enumerate(ys):
            rows = []
            for dy in np.unique(offs[:, 1]):
                dxs = offs[offs[:, 1] == dy, 0]
                res = [_polygon_row_test(contour, float(y0 + dy),
                                         xs + dx) >= 0 for dx in dxs]
                rows.extend(res)
            keep[:, j] = comb(np.stack(rows), axis=0)
    half = ref_patch[0] / 2.0
    for hole in holes or []:
        for j, y0 in enumerate(ys):
            if not keep[:, j].any():
                continue
            keep[:, j] &= ~(_polygon_row_test(hole, float(y0 + half),
                                              xs + half) > 0)
    gi, gj = np.nonzero(keep)
    if len(gi) == 0:
        return np.zeros((0, 2), np.int64)
    coords = np.stack([xs[gi], ys[gj]], axis=1).astype(np.int64)
    # match the oracle's x-major grid order
    order = np.lexsort((coords[:, 1], coords[:, 0]))
    return coords[order]


def process_contours(slide, tissue, holes, save_path: Optional[str] = None,
                     patch_level: int = 0, patch_size: int = 256,
                     step_size: int = 256, contour_fn: str = "four_pt",
                     use_padding: bool = True,
                     center_shift: float = 0.5):
    """All-contour coordinate generation; writes the reference's
    {name}_patches.h5 coords schema + attrs when save_path is given
    (ref WholeSlideImage.py:432-549)."""
    all_coords = []
    for cont, hs in zip(tissue, holes):
        coords = contour_patch_coords(slide, cont, hs, patch_level,
                                      patch_size, step_size, contour_fn,
                                      use_padding, center_shift)
        if len(coords):
            all_coords.append(coords)
    coords = (np.concatenate(all_coords, axis=0) if all_coords
              else np.zeros((0, 2), np.int64))
    attrs = {"coords": {
        "patch_size": patch_size,
        "patch_level": patch_level,
        "downsample": np.asarray(slide.level_downsamples[patch_level]),
        "downsampled_level_dim":
            np.asarray(slide.level_dimensions[patch_level]),
        "level_dim": np.asarray(slide.level_dimensions[patch_level]),
        "name": slide.name,
    }}
    if save_path is not None:
        h5_path = os.path.join(save_path, f"{slide.name}_patches.h5")
        save_hdf5(h5_path, {"coords": coords}, attrs, mode="w")
        return coords, h5_path
    return coords, None


def read_patches(slide, coords: np.ndarray, patch_level: int = 0,
                 patch_size: int = 256) -> np.ndarray:
    """Fetch patches [N, ps, ps, 3] uint8 for level-0 anchored coords."""
    out = np.empty((len(coords), patch_size, patch_size, 3), np.uint8)
    for i, (x, y) in enumerate(coords):
        out[i] = slide.read_region((int(x), int(y)), patch_level,
                                   (patch_size, patch_size))
    return out


# ---------------------------------------------------------------------------
# patch filters + stitching (ref wsi_utils.py:21-52, 269-336)
# ---------------------------------------------------------------------------

def is_white_patch(patch: np.ndarray, sat_thresh: int = 5) -> bool:
    sat = cv2.cvtColor(patch, cv2.COLOR_RGB2HSV)[:, :, 1]
    return bool(np.mean(sat) < sat_thresh)


def is_black_patch(patch: np.ndarray, rgb_thresh: int = 40) -> bool:
    return bool(np.all(np.mean(patch, axis=(0, 1)) < rgb_thresh))


def stitch_coords(slide, coords: np.ndarray, patch_level: int = 0,
                  patch_size: int = 256, downscale: int = 16,
                  draw_grid: bool = True) -> np.ndarray:
    """Downscaled mosaic of the selected patches over a white canvas —
    the reference's StitchCoords visual QC (ref wsi_utils.py:269-336)."""
    w0, h0 = slide.level_dimensions[0]
    W, H = max(w0 // downscale, 1), max(h0 // downscale, 1)
    canvas = np.full((H, W, 3), 245, np.uint8)
    ds = slide.level_downsamples[patch_level]
    ps_l0 = int(patch_size * ds[0])
    ps_c = max(ps_l0 // downscale, 1)
    for (x, y) in coords:
        patch = slide.read_region((int(x), int(y)), patch_level,
                                  (patch_size, patch_size))
        small = cv2.resize(patch, (ps_c, ps_c))
        cx, cy = int(x) // downscale, int(y) // downscale
        hh = min(ps_c, H - cy)
        ww = min(ps_c, W - cx)
        if hh <= 0 or ww <= 0:
            continue
        canvas[cy:cy + hh, cx:cx + ww] = small[:hh, :ww]
        if draw_grid:
            cv2.rectangle(canvas, (cx, cy), (cx + ww, cy + hh),
                          (0, 0, 0), 1)
    return canvas


def fetch_mag_patching_params(slide, mag_level: int = 40,
                              patch_size: int = 256, step_size: int = 256,
                              mpp: Optional[float] = None, dec_prec: int = 1):
    """Magnification-aware patch parameters (ref
    WholeSlideImage.fetch_mag_patching_params :813-852): infer the
    level-0 magnification from microns-per-pixel, then either find the
    pyramid level whose downsample matches the requested magnification or
    fall back to level 0 with an enlarged patch (custom downsample).

    Returns (level0_mag, patch_level, patch_size, step_size,
    custom_downsample) with custom_downsample None when a native level
    matches.
    """
    if mpp is None:
        props = getattr(getattr(slide, "wsi", None), "properties", {}) or {}
        try:
            mpp = float(props.get("openslide.mpp-x", -1))
        except (TypeError, ValueError):
            mpp = -1.0
    level0_mag = -1
    if 0 <= mpp < 0.3:
        level0_mag = 40
    elif 0 <= mpp < 0.6:
        level0_mag = 20
    if level0_mag <= 0:
        level0_mag = 40  # sensible default when properties are absent
    all_ds = [round(xy[0], dec_prec) if dec_prec >= 0 else xy[0]
              for xy in slide.level_downsamples]
    # requesting a magnification above level 0 is impossible; read level 0
    custom = max(int(level0_mag / mag_level), 1)
    if custom in all_ds:
        return (level0_mag, all_ds.index(custom), patch_size, step_size,
                None)
    return (level0_mag, 0, int(patch_size * custom),
            int(step_size * custom), custom)


def synthetic_slide(width: int = 2048, height: int = 1536, n_blobs: int = 3,
                    seed: int = 0, n_levels: int = 3) -> ArraySlide:
    """Synthetic H&E-like slide: white background + pink/purple tissue
    blobs (for tests and demos; stands in for TCGA .svs files)."""
    rng = np.random.default_rng(seed)
    img = np.full((height, width, 3), 245, np.uint8)
    for _ in range(n_blobs):
        cx = rng.integers(width // 6, 5 * width // 6)
        cy = rng.integers(height // 6, 5 * height // 6)
        ax = rng.integers(width // 10, width // 4)
        ay = rng.integers(height // 10, height // 4)
        color = (int(rng.integers(150, 220)), int(rng.integers(60, 120)),
                 int(rng.integers(140, 200)))
        cv2.ellipse(img, (int(cx), int(cy)), (int(ax), int(ay)),
                    float(rng.uniform(0, 180)), 0, 360, color, -1)
    noise = rng.integers(-12, 12, size=img.shape).astype(np.int16)
    img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    levels = [img]
    for _ in range(n_levels - 1):
        prev = levels[-1]
        levels.append(cv2.resize(prev, (prev.shape[1] // 2,
                                        prev.shape[0] // 2)))
    return ArraySlide(levels, name=f"synthetic_{seed}")
