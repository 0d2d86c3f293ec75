"""WSI attention heatmaps + ROI sampling — rewrite of the visualization
core of ref utils/WholeSlideImage.py:562-749 (visHeatmap),
utils/wsi_utils.py:171-212 (to_percentiles / sample_rois)."""
from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np


def to_percentiles(scores: np.ndarray) -> np.ndarray:
    """Rank-transform scores to [0, 100] (ref wsi_utils.py:171-176)."""
    from scipy.stats import rankdata
    return rankdata(scores, "average") / len(scores) * 100


def score_to_percentile(scores: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Percentile rank of each score against a reference distribution
    (vectorized scipy.stats.percentileofscore(kind='rank'), ref
    heatmap_utils.py:32-34 score2percentile).  Used by the
    ``use_ref_scores`` heatmap path: fine-pass scores are ranked on the
    coarse blockmap's score distribution instead of their own."""
    ref = np.sort(np.asarray(ref).reshape(-1))
    s = np.asarray(scores).reshape(-1)
    n = len(ref)
    if n == 0:
        return np.zeros_like(s, dtype=np.float64)
    left = np.searchsorted(ref, s, side="left")
    right = np.searchsorted(ref, s, side="right")
    # kind='rank': mean 1-based rank over ties when present, else the
    # weak count
    present = right > left
    rank = np.where(present, left + (right - left + 1) / 2.0,
                    right.astype(np.float64))
    return rank / n * 100.0


def screen_coords(scores: np.ndarray, coords: np.ndarray, top_left,
                  bot_right):
    """Keep (score, coord) pairs inside the level-0 bbox
    (ref wsi_utils.py:164-169)."""
    mask = np.logical_and(np.all(coords >= np.asarray(top_left), axis=1),
                          np.all(coords <= np.asarray(bot_right), axis=1))
    return scores[mask], coords[mask]


def get_seg_mask(region_size, scale, tissue, holes, use_holes: bool = True,
                 offset=(0, 0)) -> np.ndarray:
    """Rasterize level-0 tissue contours into a boolean foreground mask at
    the vis scale (ref WholeSlideImage.get_seg_mask :794-811): contours
    drawn filled, largest-first, with their holes carved out."""
    w, h = region_size
    mask = np.zeros((h, w), np.uint8)
    sx, sy = scale
    t_scaled = [np.array(c * np.array([sx, sy]), np.int32) for c in tissue]
    h_scaled = [[np.array(c * np.array([sx, sy]), np.int32) for c in hs]
                for hs in holes]
    off = (int(-offset[0] * sx), int(-offset[1] * sy))
    order = sorted(range(len(t_scaled)),
                   key=lambda i: cv2.contourArea(t_scaled[i]), reverse=True)
    for i in order:
        cv2.drawContours(mask, t_scaled, contourIdx=i, color=1,
                         offset=off, thickness=-1)
        if use_holes and i < len(h_scaled):
            cv2.drawContours(mask, h_scaled[i], contourIdx=-1, color=0,
                             offset=off, thickness=-1)
    return mask.astype(bool)


def block_blend(slide, img: np.ndarray, vis_level: int, top_left, bot_right,
                alpha: float, blank_canvas: bool = False,
                canvas_color=(255, 255, 255),
                block_size: int = 1024) -> np.ndarray:
    """Alpha-blend the heatmap-written image with the (re-read) slide in
    bounded blocks (ref WholeSlideImage.block_blending :752-791) — the
    canvas for a gigapixel slide is never materialized twice."""
    ds = slide.level_downsamples[vis_level]
    h, w = img.shape[:2]
    bx, by = min(block_size, w), min(block_size, h)
    for x0 in range(int(top_left[0]), int(bot_right[0]), bx * int(ds[0])):
        for y0 in range(int(top_left[1]), int(bot_right[1]),
                        by * int(ds[1])):
            xi = int((x0 - top_left[0]) / int(ds[0]))
            yi = int((y0 - top_left[1]) / int(ds[1]))
            xe, ye = min(w, xi + bx), min(h, yi + by)
            if xe == xi or ye == yi:
                continue
            blk = img[yi:ye, xi:xe]
            if blank_canvas:
                canvas = np.full((ye - yi, xe - xi, 3), canvas_color,
                                 np.uint8)
            else:
                canvas = slide.read_region((x0, y0), vis_level,
                                           (xe - xi, ye - yi))
            img[yi:ye, xi:xe] = cv2.addWeighted(blk, alpha, canvas,
                                                1 - alpha, 0)
    return img


def draw_heatmap(slide, scores: np.ndarray, coords: np.ndarray,
                 patch_size: int = 256, patch_level: int = 0,
                 vis_level: Optional[int] = None, alpha: float = 0.4,
                 blur: bool = False, overlap: float = 0.0,
                 use_percentiles: bool = True,
                 binarize: bool = False, threshold: float = 0.5,
                 # the colormap the reference ACTUALLY renders: visHeatmap
                 # ignores a string cmap argument and hardcodes RdYlBu_r
                 # (ref WholeSlideImage.py:679-689), and its CLI never
                 # passes one — unlike the reference, an explicit cmap
                 # here is honored
                 cmap: str = "RdYlBu_r",
                 segment: bool = False, tissue=None, holes=None,
                 use_holes: bool = True,
                 blank_canvas: bool = False,
                 canvas_color=(255, 255, 255),
                 adjust: float = 0.0,
                 custom_downsample: int = 1,
                 max_size: Optional[int] = None,
                 top_left=None, bot_right=None,
                 block_size: int = 1024) -> np.ndarray:
    """Overlap-averaged attention overlay on the downscaled slide.

    Full-fidelity rewrite of ref visHeatmap (WholeSlideImage.py:562-749),
    vectorized over patches instead of the reference's per-patch python
    loops: accumulate score + counter per pixel, average, colormap, write
    color only on tissue (``segment`` + level-0 ``tissue``/``holes``
    contours, ref get_seg_mask :794), block-blend with the slide
    (:752), then ``custom_downsample``/``max_size`` resizes (:741-748).
    """
    from matplotlib import colormaps
    if vis_level is None:
        vis_level = slide.level_count - 1
    ds = slide.level_downsamples[vis_level]
    scale = (1.0 / ds[0], 1.0 / ds[1])
    scores = np.asarray(scores, np.float64).reshape(-1)
    coords = np.asarray(coords)

    if binarize:
        thr = 1.0 / len(scores) if threshold < 0 else threshold
    else:
        thr = 0.0

    if top_left is not None and bot_right is not None:
        scores, coords = screen_coords(scores, coords, top_left, bot_right)
        coords = coords - np.asarray(top_left)
        w = int(bot_right[0] * scale[0]) - int(top_left[0] * scale[0])
        h = int(bot_right[1] * scale[1]) - int(top_left[1] * scale[1])
    else:
        w, h = slide.level_dimensions[vis_level]
        top_left = (0, 0)
        bot_right = slide.level_dimensions[0]

    if use_percentiles:
        scores = to_percentiles(scores) / 100.0
    if adjust != 0.0:
        scores = np.clip(scores + adjust, 0.0, 1.0)

    pds = slide.level_downsamples[patch_level]
    ps_vis = (max(int(np.ceil(patch_size * pds[0] * scale[0])), 1),
              max(int(np.ceil(patch_size * pds[1] * scale[1])), 1))
    overlay = np.zeros((h, w), np.float64)
    counter = np.zeros((h, w), np.uint16)
    pass_counter = np.zeros((h, w), np.uint16)  # covered by >=1 passing patch
    for s, (x, y) in zip(scores, coords):
        cx = int(np.ceil(x * scale[0]))
        cy = int(np.ceil(y * scale[1]))
        passing = s >= thr
        if binarize:
            s = 1.0 if passing else 0.0
        elif not passing:
            s = 0.0
        overlay[cy:cy + ps_vis[1], cx:cx + ps_vis[0]] += s
        counter[cy:cy + ps_vis[1], cx:cx + ps_vis[0]] += 1
        if passing:
            pass_counter[cy:cy + ps_vis[1], cx:cx + ps_vis[0]] += 1
    seen = counter > 0
    overlay[seen] /= counter[seen]
    if binarize:
        overlay[seen] = np.around(overlay[seen])

    if blank_canvas:
        img = np.full((h, w, 3), canvas_color, np.uint8)
    else:
        img = slide.read_region(tuple(top_left), vis_level, (w, h)).copy()

    colored = pass_counter > 0
    if segment and tissue is not None:
        tissue_mask = get_seg_mask((w, h), scale, tissue, holes or [],
                                   use_holes=use_holes,
                                   offset=tuple(top_left))
        colored &= tissue_mask
    cm_fn = colormaps[cmap]
    heat = (cm_fn(np.clip(overlay, 0, 1))[..., :3] * 255).astype(np.uint8)
    img[colored] = heat[colored]

    if blur:
        k = (int(ps_vis[0] * (1 - overlap)) * 2 + 1,
             int(ps_vis[1] * (1 - overlap)) * 2 + 1)
        img = cv2.GaussianBlur(img, k, 0)

    if alpha < 1.0:
        img = block_blend(slide, img, vis_level, top_left, bot_right,
                          alpha=alpha, blank_canvas=blank_canvas,
                          canvas_color=canvas_color, block_size=block_size)

    # PIL resize with its default (bicubic) filter, exactly like the
    # reference's Image.resize (WholeSlideImage.py:741-748) — cv2's
    # INTER_LINEAR differs by ~0.5/255 per pixel (pixel-exactness pinned
    # by tools/parity_heatmap.py's downsample2 variant)
    from PIL import Image
    if custom_downsample > 1:
        img = np.asarray(Image.fromarray(img).resize(
            (w // custom_downsample, h // custom_downsample)))
    if max_size is not None and (img.shape[1] > max_size
                                 or img.shape[0] > max_size):
        f = max_size / max(img.shape[1], img.shape[0])
        img = np.asarray(Image.fromarray(img).resize(
            (int(img.shape[1] * f), int(img.shape[0] * f))))
    return img


def sample_rois(scores: np.ndarray, coords: np.ndarray, k: int = 5,
                mode: str = "topk", seed: int = 1,
                score_range: Tuple[float, float] = (0.45, 0.55)):
    """Select patch coordinates by attention score (ref
    wsi_utils.py:191-212): topk / reverse_topk / range sampling.
    Returns (sampled_scores, sampled_coords)."""
    scores = np.asarray(scores).reshape(-1)
    if len(scores) == 0:
        return scores, coords
    percentiles = to_percentiles(scores) / 100.0
    if mode == "topk":
        order = np.argsort(-scores)[:k]
    elif mode == "reverse_topk":
        order = np.argsort(scores)[:k]
    elif mode == "range_sample":
        lo, hi = score_range
        pool = np.flatnonzero((percentiles >= lo) & (percentiles <= hi))
        rng = np.random.default_rng(seed)
        order = rng.permutation(pool)[:k]
    else:
        raise NotImplementedError(mode)
    return scores[order], coords[order]


def dynamic_k(bag_size: int, frac: float = 0.005, floor: int = 200) -> int:
    """Heatmap patch-sampling k = max(0.5% of bag, 200)
    (ref create_heatmaps.py:481-492)."""
    return max(int(bag_size * frac), floor)


def patch_mosaic(patches: np.ndarray, n_cols: int = 5, gap: int = 2,
                 downscale: int = 1) -> np.ndarray:
    """Assemble sampled patches into a grid canvas (the reference's
    Mosaic_Canvas, util_classes.py:6-46)."""
    if len(patches) == 0:
        return np.full((8, 8, 3), 245, np.uint8)
    ps = patches.shape[1] // downscale
    if downscale > 1:
        patches = np.stack([cv2.resize(p, (ps, ps)) for p in patches])
    n = len(patches)
    n_rows = (n + n_cols - 1) // n_cols
    H = n_rows * ps + (n_rows + 1) * gap
    W = n_cols * ps + (n_cols + 1) * gap
    canvas = np.full((H, W, 3), 245, np.uint8)
    for i, p in enumerate(patches):
        r, c = divmod(i, n_cols)
        y = gap + r * (ps + gap)
        x = gap + c * (ps + gap)
        canvas[y:y + ps, x:x + ps] = p[..., :3]
    return canvas


def fine_pass_center_shift(overlap: float,
                           use_center_shift: bool = True) -> float:
    """The reference's overlap -> four_pt_hard probe-shift table for the
    fine heatmap grid (ref wsi_dataset.py:74-88 Wsi_Region; both shipped
    configs set use_center_shift: true)."""
    if not use_center_shift:
        return 0.0
    if overlap < 0.25:
        return 0.375
    if overlap < 0.95:
        return 0.5
    return 0.625


def compute_fine_scores(slide, tissue, holes, embedder, score_fn,
                        patch_size: int = 256, overlap: float = 0.75,
                        patch_level: int = 0, chunk: int = 512,
                        use_center_shift: bool = True):
    """Fine heatmap pass: re-grid the tissue at overlapping stride
    (step = patch_size * (1 - overlap)), embed every patch, and score the
    whole overlapping bag with the model's attention
    (ref heatmap_utils.compute_from_patches:111-150 at overlap 0.75).

    The grid uses the reference fine pass's contour check: four_pt_hard
    with the overlap-dependent probe shift (ref wsi_dataset.py:51-88 —
    Wsi_Region's default, NOT the coarse pass's four_pt easy check;
    coord-set equality with the reference as-run is pinned by
    tools/parity_heatmap.py).

    ``score_fn(features [N, D]) -> scores [N]``.
    Returns (scores, coords).
    """
    from multimodalfusion_tpu.data.wsi import (process_contours,
                                               read_patches)
    step = max(int(patch_size * (1 - overlap)), 1)
    coords, _ = process_contours(
        slide, tissue, holes, patch_level=patch_level,
        patch_size=patch_size, step_size=step,
        contour_fn="four_pt_hard",
        center_shift=fine_pass_center_shift(overlap, use_center_shift))
    if len(coords) == 0:
        return np.zeros(0), coords
    from multimodalfusion_tpu.data.loaders import prefetch

    def _chunks():
        # host-side patch reads + resizes, overlapped with TPU embedding
        for start in range(0, len(coords), chunk):
            patches = read_patches(slide, coords[start:start + chunk],
                                   patch_level, patch_size)
            if patches.shape[1] != embedder.image_size:
                patches = np.stack([
                    cv2.resize(p, (embedder.image_size, embedder.image_size))
                    for p in patches])
            yield patches

    feats = [embedder.embed_images(p) for p in prefetch(_chunks(), depth=2)]
    feats = np.concatenate(feats, axis=0)
    scores = np.asarray(score_fn(feats)).reshape(-1)
    return scores, coords
