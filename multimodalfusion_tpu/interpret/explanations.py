"""Per-patient local attribution plots for genomic features.

Stands in for the reference's per-case SHAP "local_bar" explanation
(ref utils_analysis/evaluation.py:1141-1405 getSHAPLocalExplanationPlot /
getIndividualSHAP, driven by create_heatmaps.py:214): a horizontal bar
chart of one patient's signed attributions over their top-|attr| genes,
each bar colored by where that patient's feature value sits within the
cohort (coolwarm over the 5th-95th percentile range).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _robust_range(values: np.ndarray):
    """Percentile color range with the reference's collapse fallbacks
    (ref evaluation.py:1277-1292)."""
    vmin = np.nanpercentile(values, 5)
    vmax = np.nanpercentile(values, 95)
    if vmin == vmax:
        vmin = np.nanpercentile(values, 1)
        vmax = np.nanpercentile(values, 99)
        if vmin == vmax:
            vmin = float(np.min(values))
            vmax = float(np.max(values))
    if vmin > vmax:
        vmin = vmax
    return float(vmin), float(vmax)


def beeswarm_offsets(shaps: np.ndarray, row_height: float = 0.4,
                     nbins: int = 100, seed: int = 0) -> np.ndarray:
    """Vertical jitter offsets for one feature row of the beeswarm —
    the reference's quantile-binned symmetric stacking
    (ref evaluation.py:1049-1060): bin the attributions into ``nbins``
    quantile slots, then fan points within a bin out alternately
    above/below the row line, scaled into ``0.9 * row_height``.

    Deterministic: the reference's 1e-6 random tiebreak uses a seeded
    generator here so plots reproduce.
    """
    shaps = np.asarray(shaps, np.float64).reshape(-1)
    N = len(shaps)
    rng = np.random.default_rng(seed)
    quant = np.round(nbins * (shaps - np.min(shaps))
                     / (np.max(shaps) - np.min(shaps) + 1e-8))
    inds = np.argsort(quant + rng.normal(size=N) * 1e-6)
    ys = np.zeros(N)
    layer = 0
    last_bin = -1
    for ind in inds:
        if quant[ind] != last_bin:
            layer = 0
        ys[ind] = np.ceil(layer / 2) * ((layer % 2) * 2 - 1)
        layer += 1
        last_bin = quant[ind]
    ys *= 0.9 * (row_height / np.max(ys + 1))
    return ys


def _symmetric_xlim(attr_abs_max: float):
    """The reference's power-of-two symmetric x-range
    (ref evaluation.py:1010-1015): ceil the max |attr|, then halve
    while half still covers it; ticks at half-range strides."""
    import math
    m = float(max(attr_abs_max, 1e-12))
    max_val = max(math.ceil(m), 1.0)
    while max_val / 2.0 > m:
        max_val /= 2.0
    return (-max_val, max_val), max_val / 2.0


def global_beeswarm_data(attr: np.ndarray, features: np.ndarray,
                         ref_features: Optional[np.ndarray] = None,
                         max_display: int = 20, row_height: float = 0.4,
                         seed: int = 0) -> dict:
    """Plot data of the global SHAP-style beeswarm
    (ref evaluation.py:1003-1141 getGlobalShap), separated from the
    rendering so tests can assert on it.

    attr [N, G] signed per-sample attributions (the dots);
    features [N, G] the same samples' feature values (dot colors);
    ref_features [M, G] the TRAIN cohort whose 5-95 percentile range
    normalizes the colors (ref values_ref; defaults to ``features``).

    Returns {"feature_order": ascending bottom-to-top row order by
    summed |attr|, "xlim", "xtick_stride", "rows": [{feature, shaps,
    ys, cvals, vmin, vmax}, ...] } with cvals clipped into [vmin, vmax]
    and NaN feature values dropped from the colored scatter.
    """
    attr = np.asarray(attr, np.float64)
    features = np.asarray(features, np.float64)
    if ref_features is None:
        ref_features = features
    ref_features = np.asarray(ref_features, np.float64)
    order = np.argsort(np.sum(np.abs(attr), axis=0))[-max_display:]
    xlim, stride = _symmetric_xlim(np.abs(attr).max() if attr.size else 0.0)
    rows = []
    for pos, i in enumerate(order):
        shaps = attr[:, i]
        values = features[:, i]
        vmin, vmax = _robust_range(ref_features[:, i])
        nan_mask = np.isnan(values)
        cvals = np.clip(values[~nan_mask], vmin, vmax)
        ys = beeswarm_offsets(shaps, row_height=row_height, seed=seed)
        rows.append({"feature": int(i), "pos": pos, "shaps": shaps,
                     "ys": ys, "nan_mask": nan_mask, "cvals": cvals,
                     "vmin": vmin, "vmax": vmax})
    return {"feature_order": order, "xlim": xlim, "xtick_stride": stride,
            "rows": rows}


def global_beeswarm_plot(attr: np.ndarray, features: np.ndarray,
                         gene_names: Sequence[str], save_path: str,
                         ref_features: Optional[np.ndarray] = None,
                         max_display: int = 20, row_height: float = 0.4,
                         alpha: float = 1.0, seed: int = 0) -> dict:
    """Render the global beeswarm (per-feature jittered dots colored by
    normalized feature value, rows ranked by total |attr|) and return
    the plot data.  Ref getGlobalShap (evaluation.py:1003-1141)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.cm as cm

    data = global_beeswarm_data(attr, features, ref_features,
                                max_display=max_display,
                                row_height=row_height, seed=seed)
    n_rows = len(data["rows"])
    fig, ax = plt.subplots(
        figsize=(8, n_rows * row_height + 1.5))
    ax.axvline(x=0, color="#999999", zorder=-1)
    for row in data["rows"]:
        pos = row["pos"]
        ax.axhline(y=pos, color="#cccccc", lw=0.5, dashes=(1, 5),
                   zorder=-1)
        keep = ~row["nan_mask"]
        n = int(keep.sum())
        ax.scatter(row["shaps"][keep], pos + row["ys"][keep],
                   cmap="coolwarm", s=30, vmin=row["vmin"],
                   vmax=row["vmax"], c=row["cvals"], alpha=alpha,
                   linewidth=0, zorder=3, rasterized=n > 500)
    ax.xaxis.set_ticks_position("bottom")
    ax.yaxis.set_ticks_position("none")
    for side in ("right", "top", "left"):
        ax.spines[side].set_visible(False)
    ax.set_yticks(range(n_rows))
    ax.set_yticklabels([str(gene_names[i])
                        for i in data["feature_order"]])
    ax.set_ylim(-1, n_rows)
    ax.set_xlabel("Attributions", fontweight="bold")
    ax.set_ylabel("Genomic Features", fontweight="bold")
    lo, hi = data["xlim"]
    ax.set_xlim(lo, hi)
    # endpoint epsilon must scale with the stride: near-zero
    # attributions shrink the stride to ~1e-12 and a fixed +0.01
    # would make arange allocate billions of ticks
    stride = data["xtick_stride"]
    ax.set_xticks(np.arange(lo, hi + stride / 2, stride))
    m = cm.ScalarMappable(cmap="coolwarm")
    m.set_array([0, 1])
    cb = fig.colorbar(m, ax=ax, ticks=[0, 1], aspect=50)
    cb.set_ticklabels(["Low", "High"])
    cb.set_label("Relative Feature Value", labelpad=0)
    cb.outline.set_visible(False)
    fig.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return data


def local_attr_plot(attr_row: np.ndarray, feat_row: np.ndarray,
                    ref_features: np.ndarray,
                    gene_names: Sequence[str], save_path: str,
                    max_display: int = 20,
                    title: Optional[str] = None) -> str:
    """Render one patient's signed attribution bars.

    attr_row [G] signed attributions; feat_row [G] the patient's feature
    values; ref_features [N, G] the cohort matrix used to normalize the
    bar colors; gene_names [G].
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import colormaps
    from matplotlib.colors import Normalize

    attr_row = np.asarray(attr_row, np.float64).reshape(-1)
    feat_row = np.asarray(feat_row, np.float64).reshape(-1)
    order = np.argsort(np.abs(attr_row))[-max_display:]

    cmap = colormaps["coolwarm"]
    fig, ax = plt.subplots(
        figsize=(6, max(2.5, 0.35 * len(order)) + 0.8))
    for pos, i in enumerate(order):
        ax.axhline(y=pos, color="#cccccc", lw=0.5, zorder=-1)
        vals = np.concatenate(
            [np.asarray(ref_features[:, i], np.float64), feat_row[i:i + 1]])
        vmin, vmax = _robust_range(vals)
        norm = Normalize(vmin=vmin, vmax=vmax)
        frac = 0.5 if vmax == vmin else norm(np.clip(feat_row[i],
                                                     vmin, vmax))
        ax.barh(pos, attr_row[i], 0.7, align="center",
                color=cmap(float(frac)))
    ax.set_yticks(range(len(order)))
    ax.set_yticklabels([str(gene_names[i]) for i in order])
    ax.axvline(x=0.0, color="#333333", lw=0.8)
    ax.set_xlabel("Attribution (risk)")
    ax.set_ylabel("Genomic features")
    ax.set_title(title or f"Total attributions: {attr_row.sum():.2f}")
    # symmetric x-limits like the reference's xlim_range
    mx = max(float(np.abs(attr_row[order]).max()), 1e-12) * 1.1
    ax.set_xlim(-mx, mx)
    fig.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return save_path


def local_attr_plots(attr: np.ndarray, features: np.ndarray,
                     subject_ids: Sequence[str],
                     gene_names: Sequence[str], save_dir: str,
                     max_display: int = 20,
                     n_patients: Optional[int] = None) -> list:
    """Write one local plot per patient (all by default; cap with
    ``n_patients`` — patients ranked by total |attribution| first, the
    reference plots hand-picked case ids)."""
    attr = np.asarray(attr)
    order = np.argsort(-np.abs(attr).sum(axis=1))
    if n_patients is not None:
        order = order[:n_patients]
    paths = []
    for i in order:
        sid = str(subject_ids[i])
        paths.append(local_attr_plot(
            attr[i], features[i], features, gene_names,
            os.path.join(save_dir, f"{sid}_local_attr.png"),
            max_display=max_display,
            title=f"{sid} — total attribution {attr[i].sum():.2f}"))
    return paths
