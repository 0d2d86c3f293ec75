"""Interpretability heatmap CLI — rewrite of ref create_heatmaps.py.

Driven by the same YAML config shape (exp/data/patching/model/heatmap/
sample sections, ref heatmaps/lung/configs/config_path.yaml:3-93,
parsed create_heatmaps.py:73-87).  Branches:

  * path:  per-slide attention heatmap — patch coords + features through
    the trained path-AMIL's attention scores, overlap-averaged overlay
    (interpret/heatmaps.draw_heatmap), plus top-k / bottom-k patch
    sampling with the reference's dynamic k (0.5% of bag, >= 200,
    ref :481-556; tests use smaller floors).
  * radio: per-subject slice attention — top/low decile slice ids +
    scores.csv (ref :557-659).
  * omic:  IG per-gene attributions standing in for the reference's
    SHAP GradientExplainer plots (shap is not in this image),
    global mean|attr| + per-patient CSVs (ref :153-220).
"""
from __future__ import annotations

import argparse
import os
import sys
from types import SimpleNamespace

import cv2
import h5py
import numpy as np
import pandas as pd
import yaml

import jax
import jax.numpy as jnp

from multimodalfusion_tpu.data.io import ensure_dir, load_features_h5
from multimodalfusion_tpu.data.loaders import iter_batches, usable_indices
from multimodalfusion_tpu.data.survival_dataset import SurvivalDataset
from multimodalfusion_tpu.data import wsi as wsi_mod
from multimodalfusion_tpu.engine.train import (build_model,
                                               load_checkpoint,
                                               model_inputs)
from multimodalfusion_tpu.interpret.heatmaps import (draw_heatmap,
                                                     dynamic_k,
                                                     sample_rois)
from multimodalfusion_tpu.interpret.ig import integrated_gradients
from multimodalfusion_tpu.utils.experiment import read_settings


def build_parser():
    p = argparse.ArgumentParser(description="attention heatmaps")
    p.add_argument("--config", "--config_file", dest="config", type=str,
                   required=True,
                   help="YAML config (--config_file is the reference "
                        "spelling, ref create_heatmaps.py:53)")
    p.add_argument("--save_exp_code", type=str, default=None,
                   help="override the experiment output dir: results go "
                        "to exp_arguments.raw_save_dir/<code> (or the "
                        "save_dir's parent when raw_save_dir is unset; "
                        "ref create_heatmaps.py:50,164)")
    p.add_argument("--overlap", type=float, default=None,
                   help="override heatmap_arguments.overlap "
                        "(ref create_heatmaps.py:52)")
    p.add_argument("--sampling", action="store_true", default=False,
                   help="run the patch-sampling phase; passing --sampling "
                        "or --heatmap runs EXACTLY the requested phases "
                        "(ref create_heatmaps.py:54-55,69-70), otherwise "
                        "the YAML decides")
    p.add_argument("--heatmap", action="store_true", default=False,
                   help="run the heatmap-rendering phase (see --sampling)")
    return p


def load_config(path: str) -> SimpleNamespace:
    with open(path) as f:
        raw = yaml.safe_load(f)
    ns = SimpleNamespace()
    for section, vals in raw.items():
        setattr(ns, section, SimpleNamespace(**(vals or {})))
    return ns


def _load_model(model_args, batch_template, which_k=0):
    exp_code = os.path.basename(os.path.normpath(model_args.ckpt_path))
    settings = read_settings(os.path.join(
        model_args.ckpt_path, f"experiment_{exp_code}.txt"))
    from multimodalfusion_tpu.utils.experiment import config_from_settings
    cfg = config_from_settings(settings, batch_size=1)
    model = build_model(cfg)
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        deterministic=True, **model_inputs(cfg, batch_template)))
    ckpt = os.path.join(model_args.ckpt_path,
                        f"s_{which_k}_minloss_checkpoint.msgpack")
    variables = load_checkpoint(ckpt, variables)
    return model, variables, cfg, settings


def _embedder_from_config(m, p):
    from multimodalfusion_tpu.extract.features import Embedder
    return Embedder(
        weights_path=getattr(m, "resnet_weights", None),
        batch_size=int(getattr(p, "batch_size", 128)),
        image_size=int(getattr(p, "target_patch_size", 224)),
        allow_random=bool(getattr(m, "allow_random_weights", False)))


def _extract_missing_features(slide, feat_h5, tissue, holes, embedder,
                              patch_size, patch_level=0, chunk=512):
    """Segment -> patch -> embed a bare slide into a features h5 when none
    exists (ref heatmap_utils.process_single_slide :288-411 falls back to
    compute_from_patches when the h5 is absent).

    Patches are read/resized in bounded host-side chunks overlapped with
    device embedding (a 40k-patch slide would otherwise need ~8 GB of
    uint8 patches resident at once)."""
    from multimodalfusion_tpu.data.io import save_hdf5
    from multimodalfusion_tpu.data.loaders import prefetch
    from multimodalfusion_tpu.data.wsi import process_contours, read_patches
    coords, _ = process_contours(slide, tissue, holes,
                                 patch_level=patch_level,
                                 patch_size=patch_size,
                                 step_size=patch_size)
    if len(coords) == 0:
        raise ValueError("no tissue patches found for on-the-fly "
                         "feature extraction")

    def _chunks():
        for start in range(0, len(coords), chunk):
            patches = read_patches(slide, coords[start:start + chunk],
                                   patch_level, patch_size)
            if patches.shape[1] != embedder.image_size:
                patches = np.stack([
                    cv2.resize(pch, (embedder.image_size,
                                     embedder.image_size))
                    for pch in patches])
            yield patches

    feats = np.concatenate(
        [embedder.embed_images(p) for p in prefetch(_chunks(), depth=2)],
        axis=0)
    ensure_dir(os.path.dirname(feat_h5))
    save_hdf5(feat_h5, {"features": feats.astype(np.float32),
                        "coords": np.asarray(coords, np.int64)}, mode="w")
    return feats, np.asarray(coords)


def run_path_branch(cfg_ns) -> int:
    d = cfg_ns.data_arguments
    m = cfg_ns.model_arguments
    h = cfg_ns.heatmap_arguments
    s = getattr(cfg_ns, "sample_arguments", SimpleNamespace())
    p = cfg_ns.patching_arguments
    save_dir = ensure_dir(cfg_ns.exp_arguments.save_dir)
    # phase gating (ref create_heatmaps.py:54-55,69-70 sampling/heatmap
    # modes; both default ON here so a bare YAML run stays complete)
    heatmap_mode = bool(getattr(cfg_ns.exp_arguments, "heatmap_mode", True))
    sampling_mode = bool(getattr(cfg_ns.exp_arguments, "sampling_mode",
                                 True))

    process_df = pd.read_csv(d.process_list)
    # model/checkpoint are bag-length independent: load ONCE with a dummy
    # template instead of re-deserializing per slide
    dummy = {"path_bags": np.zeros((1, 128, 1024), np.float32),
             "path_mask": np.ones((1, 128), np.float32),
             "Y": np.zeros(1, np.int32), "t": np.zeros(1, np.float32),
             "c": np.zeros(1, np.float32), "valid": np.ones(1, np.float32)}
    model, variables, cfg, settings = _load_model(
        m, dummy, which_k=getattr(m, "which_k", 0))
    segment = bool(getattr(h, "segment", True))  # ref always segments
    embedder = None
    for _, row in process_df.iterrows():
        slide_file = row["slide_id"]
        stem = os.path.splitext(slide_file)[0]
        slide = wsi_mod.open_slide(os.path.join(d.data_dir, slide_file))
        patch_size = int(getattr(p, "patch_size", 256))

        # tissue contours: needed for the masked colormap and for on-miss
        # extraction (lazily computed, at most once per slide)
        tissue = holes = None

        def _contours():
            nonlocal tissue, holes
            if tissue is None:
                tissue, holes = wsi_mod.segment_tissue(
                    slide, seg_level=getattr(p, "seg_level", None),
                    a_t=float(getattr(p, "a_t", 100.0)),
                    a_h=float(getattr(p, "a_h", 16.0)))
            return tissue, holes

        feat_h5 = os.path.join(d.feat_dir, "h5_files", f"{stem}.h5")
        if os.path.isfile(feat_h5):
            with h5py.File(feat_h5, "r") as f:
                feats = f["features"][:]
                coords = f["coords"][:]
        else:
            # on-miss inline segment -> patch -> embed
            # (ref heatmap_utils.py:288-411)
            print(f"{stem}: features h5 missing, extracting inline")
            if embedder is None:
                embedder = _embedder_from_config(m, p)
            feats, coords = _extract_missing_features(
                slide, feat_h5, *_contours(), embedder, patch_size)
        bag = jnp.asarray(feats)[None]
        mask = jnp.ones((1, bag.shape[1]), jnp.float32)
        scores = np.asarray(model.apply(
            variables, bags=bag, mask=mask, deterministic=True,
            attention_only=True))[0]

        # blockmap h5: coarse attention + coords for downstream tools
        # (ref create_heatmaps.py:306-309)
        from multimodalfusion_tpu.data.io import save_hdf5
        blockmap = os.path.join(save_dir, f"{stem}_blockmap.h5")
        if not os.path.isfile(blockmap):
            save_hdf5(blockmap,
                      {"attention_scores": scores.astype(np.float32),
                       "coords": np.asarray(coords, np.int64)}, mode="w")

        seg_kwargs = {}
        if segment and heatmap_mode:
            t, hl = _contours()
            seg_kwargs = dict(segment=True, tissue=t, holes=hl,
                              use_holes=bool(getattr(h, "use_holes", True)))
        vis_level = getattr(h, "vis_level", None)
        if vis_level is not None and int(vis_level) < 0:
            vis_level = None
        # optional per-slide ROI restriction (ref use_roi + x1/x2/y1/y2
        # columns of the process list)
        roi_kwargs = {}
        if bool(getattr(h, "use_roi", False)) and \
                all(c in row.index for c in ("x1", "x2", "y1", "y2")) and \
                not any(pd.isna(row[c]) for c in ("x1", "x2", "y1", "y2")):
            roi_kwargs = dict(
                top_left=(int(row["x1"]), int(row["y1"])),
                bot_right=(int(row["x2"]), int(row["y2"])))
        # use_ref_scores: scores reach draw_heatmap already in percentile
        # units (ref create_heatmaps.py:319 sets convert_to_percentiles
        # False only because compute_from_patches pre-converted them via
        # score2percentile, heatmap_utils.py:99,138 — never raw logits).
        # For the coarse blockmap draw the reference distribution is the
        # blockmap itself.
        use_ref_scores = bool(getattr(h, "use_ref_scores", False))
        draw_scores = scores
        if use_ref_scores:
            from multimodalfusion_tpu.interpret.heatmaps import \
                score_to_percentile
            draw_scores = score_to_percentile(scores, scores) / 100.0
        if heatmap_mode:
            heat = draw_heatmap(slide, draw_scores, coords,
                                patch_size=patch_size,
                                vis_level=vis_level, **roi_kwargs,
                                alpha=float(getattr(h, "alpha", 0.4)),
                                blur=bool(getattr(h, "blur", False)),
                                use_percentiles=not use_ref_scores,
                                binarize=bool(getattr(h, "binarize",
                                                      False)),
                                threshold=float(getattr(h, "binary_thresh",
                                                        -1.0)),
                                blank_canvas=bool(getattr(h, "blank_canvas",
                                                          False)),
                                custom_downsample=int(getattr(
                                    h, "custom_downsample", 1)),
                                cmap=getattr(h, "cmap", "RdYlBu_r"),
                                **seg_kwargs)
            ext = getattr(h, "save_ext", "jpg")
            out = os.path.join(save_dir, f"{stem}_heatmap.{ext}")
            cv2.imwrite(out, cv2.cvtColor(heat, cv2.COLOR_RGB2BGR))
            print(f"{stem}: heatmap -> {out}")
            if bool(getattr(h, "save_orig", False)):
                vl = vis_level if vis_level is not None \
                    else slide.level_count - 1
                orig = slide.read_region((0, 0), vl,
                                         slide.level_dimensions[vl])
                cv2.imwrite(os.path.join(save_dir, f"{stem}_orig.{ext}"),
                            cv2.cvtColor(orig, cv2.COLOR_RGB2BGR))

        # optional fine heatmap at overlapping stride (ref
        # heatmap_utils.compute_from_patches at overlap 0.75)
        overlap = float(getattr(h, "overlap", 0.0) or 0.0)
        if overlap > 0 and heatmap_mode:
            from multimodalfusion_tpu.interpret.heatmaps import \
                compute_fine_scores
            if embedder is None:
                embedder = _embedder_from_config(m, p)

            def score_fn(feats):
                import jax.numpy as _jnp
                bag = _jnp.asarray(feats)[None]
                msk = _jnp.ones((1, bag.shape[1]), _jnp.float32)
                return model.apply(variables, bags=bag, mask=msk,
                                   deterministic=True,
                                   attention_only=True)[0]

            fscores, fcoords = compute_fine_scores(
                slide, *_contours(), embedder, score_fn,
                patch_size=patch_size, overlap=overlap,
                use_center_shift=bool(getattr(h, "use_center_shift",
                                              True)))
            if len(fcoords):
                # use_ref_scores ranks the fine scores on the COARSE
                # blockmap distribution (ref compute_from_patches
                # ref_scores arg, heatmap_utils.py:99,138)
                fdraw = fscores
                if use_ref_scores:
                    from multimodalfusion_tpu.interpret.heatmaps import \
                        score_to_percentile
                    fdraw = score_to_percentile(fscores, scores) / 100.0
                fine = draw_heatmap(slide, fdraw, fcoords,
                                    patch_size=patch_size,
                                    alpha=float(getattr(h, "alpha", 0.4)),
                                    blur=True, overlap=overlap,
                                    use_percentiles=not use_ref_scores,
                                    cmap=getattr(h, "cmap", "RdYlBu_r"),
                                    **seg_kwargs)
                out_f = os.path.join(save_dir, f"{stem}_fine_heatmap.jpg")
                cv2.imwrite(out_f, cv2.cvtColor(fine, cv2.COLOR_RGB2BGR))
                print(f"{stem}: fine heatmap ({len(fcoords)} patches at "
                      f"overlap {overlap}) -> {out_f}")

        # patch sampling (ref :481-556).  Two YAML forms:
        #   sample_arguments.samples: [{name, sample, seed, k, mode,
        #     score_start/score_end}, ...]  — reference list form
        #   sample_arguments.{floor, save_n}  — shorthand (topk + reverse)
        specs = getattr(s, "samples", None) if sampling_mode else []
        if specs is None:
            k = dynamic_k(len(scores), floor=int(getattr(s, "floor", 200)))
            save_n = int(getattr(s, "save_n", 8))
            specs = [{"name": "topk", "mode": "topk", "k": k,
                      "save_n": save_n},
                     {"name": "reverse_topk", "mode": "reverse_topk",
                      "k": k, "save_n": save_n}]
        for spec in specs:
            if not spec.get("sample", True):
                continue
            mode_name = spec.get("mode", "topk")
            k = min(int(spec.get("k", 8)), len(scores))
            sc, cc = sample_rois(
                scores, coords, k=k, mode=mode_name,
                seed=int(spec.get("seed", 1)),
                score_range=(float(spec.get("score_start", 0.45)),
                             float(spec.get("score_end", 0.55))))
            name = spec.get("name", mode_name)
            sample_dir = ensure_dir(os.path.join(save_dir,
                                                 f"{stem}_{name}"))
            save_n = int(spec.get("save_n", spec.get("k", 8)))
            sampled = []
            for rank, (sc_i, (x, y)) in enumerate(
                    zip(sc[:save_n], cc[:save_n])):
                patch = slide.read_region((int(x), int(y)), 0,
                                          (patch_size, patch_size))
                sampled.append(patch)
                cv2.imwrite(os.path.join(
                    sample_dir, f"{rank}_x{x}_y{y}_a{sc_i:.3f}.png"),
                    cv2.cvtColor(patch, cv2.COLOR_RGB2BGR))
            if sampled:
                # sampled-patch grid canvas (ref Mosaic_Canvas,
                # util_classes.py:6-46, assembled in create_heatmaps)
                from multimodalfusion_tpu.interpret.heatmaps import \
                    patch_mosaic
                mosaic = patch_mosaic(
                    np.stack(sampled),
                    n_cols=int(spec.get("mosaic_cols", 5)),
                    downscale=int(spec.get("mosaic_downscale", 2)))
                cv2.imwrite(os.path.join(save_dir,
                                         f"{stem}_{name}_mosaic.png"),
                            cv2.cvtColor(mosaic, cv2.COLOR_RGB2BGR))
    return 0


def slice_group_size(n: int) -> int:
    """Top/low slice group size for the radio branch.

    The reference floors its dynamic k at 20
    (ref create_heatmaps.py:626-628: max(ceil(n*0.1), 20)) — which
    CRASHES for n < 20 and silently makes the top/low groups overlap
    for n < 40.  Deliberate deviation: the 20-floor is kept but capped
    at n // 2 so the two groups are always disjoint (and short scans
    still get a meaningful split instead of an error/everything-"top");
    n == 1 keeps its one slice as "top" (k floored at 1) rather than
    silently dropping the subject from rendering.
    """
    if n <= 1:
        return n
    return min(max(int(np.ceil(n * 0.1)), 20), n // 2)


def run_radio_branch(cfg_ns) -> int:
    d = cfg_ns.data_arguments
    m = cfg_ns.model_arguments
    save_dir = ensure_dir(cfg_ns.exp_arguments.save_dir)
    subjects = pd.read_csv(d.process_list)["subject_id"].tolist()
    modalities = list(getattr(d, "modalities",
                              ["FLAIR", "T1", "T1Gd", "T2"]))
    # model/checkpoint are bag-length independent: load ONCE (as in the
    # path branch) instead of re-deserializing per subject
    dummy = {"radio_bags": np.zeros((1, 16, len(modalities) * 1024),
                                    np.float32),
             "radio_mask": np.ones((1, 16), np.float32),
             "Y": np.zeros(1, np.int32), "t": np.zeros(1, np.float32),
             "c": np.zeros(1, np.float32), "valid": np.ones(1, np.float32)}
    model, variables, cfg, settings = _load_model(
        m, dummy, which_k=getattr(m, "which_k", 0))
    rows = []
    for subject in subjects:
        feats, sids = [], []
        try:
            for mod in modalities:
                f, si = load_features_h5(os.path.join(
                    d.feat_dir, "radio_h5_files", mod, f"{subject}.h5"))
                feats.append(f)
                sids.append(np.asarray(si))
        except OSError:
            print(f"missing features for {subject}")
            continue
        from multimodalfusion_tpu.data.bags import intersect_slices
        try:
            bag, common = intersect_slices(feats, sids, return_ids=True)
        except ValueError as e:
            print(f"skipping {subject}: corrupt slice ids ({e})")
            continue
        bag = bag[None]
        mask = np.ones((1, bag.shape[1]), np.float32)
        scores = np.asarray(model.apply(
            variables, bags=jnp.asarray(bag), mask=jnp.asarray(mask),
            deterministic=True, attention_only=True))[0]
        # intersect_slices guarantees score i belongs to common[i]
        assert len(scores) == len(common)
        n = len(scores)
        k = slice_group_size(n)
        order = np.argsort(-scores)
        for rank, idx in enumerate(order):
            rows.append({"subject_id": subject,
                         "slice_index": int(common[idx]),
                         "attention": float(scores[idx]),
                         "group": ("top" if rank < k else
                                   "low" if rank >= n - k else "mid")})
    scores_df = pd.DataFrame(rows)
    scores_df.to_csv(os.path.join(save_dir, "scores.csv"), index=False)
    print(f"wrote slice attention scores -> {save_dir}/scores.csv")

    # optional: re-preprocess raw scans and save top/low slice PNGs
    # (ref create_heatmaps.py:604-659, heatmap_utils.radio_img :177-226)
    scan_csv = getattr(d, "scan_list", None)
    if scan_csv:
        scans = pd.read_csv(scan_csv).set_index("subject_id")
        # a single modality (str) keeps the flat subject/{top,low}
        # layout; a list renders every named modality under
        # subject/{mod}/{top,low} (the reference renders ALL modalities,
        # ref create_heatmaps.py:636-659)
        display_cfg = getattr(d, "display_modality", modalities[0])
        display_mods = ([display_cfg] if isinstance(display_cfg, str)
                        else list(display_cfg))
        nest_by_mod = not isinstance(display_cfg, str)
        for display_mod in display_mods:
            _render_radio_slices(d, scores_df, scans, display_mod,
                                 save_dir, nest_by_mod)
    return 0


def _render_radio_slices(d, scores_df, scans, display_mod, save_dir,
                         nest_by_mod):
    from multimodalfusion_tpu.data.radiology import (
        preprocess_glioma_scan, preprocess_lung_scan)
    # lung CT re-preprocessing for display mirrors the feature path
    # (ref heatmap_utils.radio_img :177-226: MRI flip-to-standard vs
    # CT HU->resample->lungmask->crop->normalize)
    is_ct = (getattr(d, "cancer_type", "glioma") == "lung"
             or display_mod == "CT")
    for subject, grp in scores_df.groupby("subject_id"):
        if subject not in scans.index or \
                display_mod not in scans.columns:
            continue
        path = os.path.join(getattr(d, "scan_dir", "."),
                            str(scans.loc[subject, display_mod]))
        # cheap pre-check: the display modality's feature h5 carries
        # the slice-id map the preprocessed volume will reproduce —
        # skip the (expensive) full-volume re-preprocess when none
        # of the selected top/low slices can be rendered from it
        sel_ids = set(int(s) for s in
                      grp[grp.group.isin(("top", "low"))].slice_index)
        try:
            _, disp_ids = load_features_h5(os.path.join(
                d.feat_dir, "radio_h5_files", display_mod,
                f"{subject}.h5"))
            if disp_ids is not None and not sel_ids & set(
                    int(s) for s in np.asarray(disp_ids).reshape(-1)):
                print(f"skipping {subject}: no selected slice exists "
                      f"in {display_mod}")
                continue
        except (OSError, KeyError, TypeError, ValueError):
            pass  # no usable h5 to pre-check; preprocess and see
        try:
            if is_ct:
                slices, slice_ids = preprocess_lung_scan(path)
            else:
                slices, slice_ids = preprocess_glioma_scan(path)
        except (OSError, ValueError) as e:
            print(f"cannot render {subject}: {e}")
            continue
        id_to_slice = {int(s): i for i, s in enumerate(slice_ids)}
        for group_name in ("top", "low"):
            parts = ([subject, display_mod, group_name] if nest_by_mod
                     else [subject, group_name])
            out_dir = ensure_dir(os.path.join(save_dir, *parts))
            sel = grp[grp.group == group_name]
            for _, r in sel.iterrows():
                i = id_to_slice.get(int(r.slice_index))
                if i is None:
                    continue
                img = (np.clip(slices[i], 0, 1) * 255).astype(np.uint8)
                cv2.imwrite(os.path.join(
                    out_dir,
                    f"slice{int(r.slice_index)}_"
                    f"a{r.attention:.3f}.png"), img)


def run_omic_branch(cfg_ns) -> int:
    d = cfg_ns.data_arguments
    m = cfg_ns.model_arguments
    save_dir = ensure_dir(cfg_ns.exp_arguments.save_dir)
    exp_code = os.path.basename(os.path.normpath(m.ckpt_path))
    settings = read_settings(os.path.join(m.ckpt_path,
                                          f"experiment_{exp_code}.txt"))
    dataset = SurvivalDataset(
        csv_path=settings["csv_path"], mode="omic",
        modalities=settings["radio_modality"],
        data_dir=settings["data_root_dir"], n_bins=settings["n_classes"],
        seed=settings["seed"])
    split = dataset.whole_split(csv_file=os.path.join(
        settings["split_dir"], f"splits_{getattr(m, 'which_k', 0)}.csv"))
    idx = usable_indices(split)
    batch = next(iter_batches(split, batch_size=len(idx), indices=idx))
    subject_ids = batch.pop("subject_ids")
    from multimodalfusion_tpu.utils.experiment import \
        config_from_settings
    cfg = config_from_settings(settings, model_type="max_net",
                               mode="omic", batch_size=len(idx),
                               pretrained=False)
    model = build_model(cfg)
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        deterministic=True, genomic_features=jnp.asarray(batch["genomic"])))
    variables = load_checkpoint(
        os.path.join(m.ckpt_path,
                     f"s_{getattr(m, 'which_k', 0)}_minloss_"
                     "checkpoint.msgpack"), variables)

    def risk_fn(g):
        return model.apply(variables, genomic_features=g,
                           deterministic=True)["risk"]

    # method: 'ig' (zero-baseline integrated gradients, default) or
    # 'expected_gradients' — the reference's SHAP GradientExplainer
    # semantics with the TRAIN rows as the background distribution
    # (ref create_heatmaps.py:173-175)
    h_args = getattr(cfg_ns, "heatmap_arguments", SimpleNamespace())
    method = getattr(h_args, "method", "ig")
    valid = np.asarray(batch["valid"]) > 0
    # shared by expected-gradients backgrounds, the beeswarm's color
    # normalization and the local plots: valid-row features/ids and
    # this fold's train-cohort membership
    genomics = np.asarray(batch["genomic"])[valid]
    ids_valid = np.asarray(subject_ids)[valid]
    # the split csv is guaranteed readable here: whole_split above
    # already loaded the cohort from this same file
    split_df = pd.read_csv(os.path.join(
        settings["split_dir"],
        f"splits_{getattr(m, 'which_k', 0)}.csv"))
    train_rows = np.isin(ids_valid,
                         list(set(split_df["train"].dropna())))
    if method == "expected_gradients":
        from multimodalfusion_tpu.interpret.ig import expected_gradients
        background = genomics[train_rows]
        if len(background) == 0:       # no train rows loaded: use all
            background = genomics
        attr = expected_gradients(
            risk_fn, jnp.asarray(batch["genomic"]),
            jnp.asarray(background),
            n_samples=int(getattr(h_args, "shap_samples", 200)),
            seed=settings["seed"])
    elif method == "ig":
        (attr,) = integrated_gradients(risk_fn,
                                       (jnp.asarray(batch["genomic"]),))
    else:
        raise NotImplementedError(method)
    attr = np.asarray(attr)[valid]  # drop padded rows before pairing ids
    genes = split.genomic_cols
    per_patient = pd.DataFrame(attr, columns=genes)
    per_patient.insert(0, "subject_id", ids_valid)
    per_patient.to_csv(os.path.join(save_dir, "omic_attr_per_patient.csv"),
                       index=False)
    global_df = pd.DataFrame({
        "gene": genes,
        "mean_abs_attr": np.mean(np.abs(attr), axis=0),
        "mean_attr": np.mean(attr, axis=0),
    }).sort_values("mean_abs_attr", ascending=False)
    global_df.to_csv(os.path.join(save_dir, "omic_attr_global.csv"),
                     index=False)
    # global importance bar plot (mean-|attr| summary)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    top = global_df.head(20)[::-1]
    fig, ax = plt.subplots(figsize=(6, max(3, 0.3 * len(top))))
    ax.barh(top["gene"], top["mean_abs_attr"], color="tab:blue")
    ax.set_xlabel("mean |IG attribution| (risk)")
    fig.tight_layout()
    fig.savefig(os.path.join(save_dir, "omic_attr_global.png"), dpi=150)
    plt.close(fig)

    # global SHAP-style beeswarm (ref getGlobalShap,
    # evaluation.py:1003-1141): per-sample jittered dots per feature
    # row, colored by the feature's value normalized on the TRAIN
    # cohort's 5-95 percentile range, rows ranked by total |attr|
    from multimodalfusion_tpu.interpret.explanations import \
        global_beeswarm_plot
    ref_feats = genomics[train_rows] if train_rows.any() else genomics
    global_beeswarm_plot(
        attr, genomics, genes,
        os.path.join(save_dir, "omic_attr_beeswarm.png"),
        ref_features=ref_feats,
        max_display=int(getattr(h_args, "max_display", 20)),
        seed=int(settings.get("seed", 1)))

    # per-patient local explanation plots (ref getIndividualSHAP,
    # evaluation.py:1374-1405, driven by create_heatmaps.py:214)
    n_local = getattr(h_args, "local_n", None)
    from multimodalfusion_tpu.interpret.explanations import local_attr_plots
    local_dir = ensure_dir(os.path.join(save_dir, "local"))
    paths = local_attr_plots(
        attr, genomics, ids_valid, genes, local_dir,
        max_display=int(getattr(h_args, "max_display", 20)),
        n_patients=int(n_local) if n_local is not None else None)
    print(f"wrote omic attributions ({len(paths)} local plots) "
          f"-> {save_dir}")
    return 0


def apply_cli_overrides(cfg_ns, args) -> None:
    """Reference-parity CLI overrides on top of the YAML
    (ref create_heatmaps.py:50-55 — users' scripts pass these)."""
    exp = cfg_ns.exp_arguments
    if args.save_exp_code:
        base = getattr(exp, "raw_save_dir", None) or os.path.dirname(
            os.path.normpath(getattr(exp, "save_dir", ".")))
        exp.save_dir = os.path.join(base, args.save_exp_code)
    if args.overlap is not None:
        if not hasattr(cfg_ns, "heatmap_arguments"):
            cfg_ns.heatmap_arguments = SimpleNamespace()
        cfg_ns.heatmap_arguments.overlap = args.overlap
    if args.sampling or args.heatmap:
        exp.heatmap_mode = bool(args.heatmap)
        exp.sampling_mode = bool(args.sampling)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg_ns = load_config(args.config)
    apply_cli_overrides(cfg_ns, args)
    branch = getattr(cfg_ns.exp_arguments, "branch", "path")
    if branch == "path":
        return run_path_branch(cfg_ns)
    if branch == "radio":
        return run_radio_branch(cfg_ns)
    if branch == "omic":
        return run_omic_branch(cfg_ns)
    raise NotImplementedError(branch)


if __name__ == "__main__":
    sys.exit(main())
