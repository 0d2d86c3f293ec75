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
