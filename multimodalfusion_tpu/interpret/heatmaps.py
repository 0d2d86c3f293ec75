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


def draw_heatmap(slide, scores: np.ndarray, coords: np.ndarray,
                 patch_size: int = 256, patch_level: int = 0,
                 vis_level: Optional[int] = None, alpha: float = 0.4,
                 blur: bool = False, use_percentiles: bool = True,
                 binarize: bool = False, threshold: float = 0.5,
                 cmap: str = "coolwarm") -> np.ndarray:
    """Overlap-averaged attention overlay on the downscaled slide.

    Mirrors ref visHeatmap: accumulate score + counter per pixel across
    (possibly overlapping) patches, average, percentile-normalize,
    colormap, alpha-blend with the tissue image.
    """
    from matplotlib import colormaps
    if vis_level is None:
        vis_level = slide.level_count - 1
    ds = slide.level_downsamples[vis_level]
    w, h = slide.level_dimensions[vis_level]
    scores = np.asarray(scores, np.float64).reshape(-1)
    if use_percentiles:
        scores = to_percentiles(scores) / 100.0

    overlay = np.zeros((h, w), np.float64)
    counter = np.zeros((h, w), np.uint16)
    pds = slide.level_downsamples[patch_level]
    ps_vis = (max(int(patch_size * pds[0] / ds[0]), 1),
              max(int(patch_size * pds[1] / ds[1]), 1))
    for s, (x, y) in zip(scores, coords):
        cx, cy = int(x / ds[0]), int(y / ds[1])
        if binarize:
            s = 1.0 if s >= threshold else 0.0
        overlay[cy:cy + ps_vis[1], cx:cx + ps_vis[0]] += s
        counter[cy:cy + ps_vis[1], cx:cx + ps_vis[0]] += 1
    seen = counter > 0
    overlay[seen] /= counter[seen]

    img = slide.read_region((0, 0), vis_level, (w, h)).copy()
    if blur:
        k = (ps_vis[0] * 2 + 1, ps_vis[1] * 2 + 1)
        overlay = cv2.GaussianBlur(overlay, k, 0)
    cm_fn = colormaps[cmap]
    heat = (cm_fn(np.clip(overlay, 0, 1))[..., :3] * 255).astype(np.uint8)
    blended = img.copy()
    blended[seen] = cv2.addWeighted(img, 1 - alpha, heat, alpha, 0)[seen]
    return blended


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


def compute_fine_scores(slide, tissue, holes, embedder, score_fn,
                        patch_size: int = 256, overlap: float = 0.75,
                        patch_level: int = 0, chunk: int = 512):
    """Fine heatmap pass: re-grid the tissue at overlapping stride
    (step = patch_size * (1 - overlap)), embed every patch, and score the
    whole overlapping bag with the model's attention
    (ref heatmap_utils.compute_from_patches:111-150 at overlap 0.75).

    ``score_fn(features [N, D]) -> scores [N]``.
    Returns (scores, coords).
    """
    from multimodalfusion_tpu.data.wsi import (process_contours,
                                               read_patches)
    step = max(int(patch_size * (1 - overlap)), 1)
    coords, _ = process_contours(slide, tissue, holes,
                                 patch_level=patch_level,
                                 patch_size=patch_size, step_size=step)
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
