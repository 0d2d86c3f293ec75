"""WSI segmentation + patch-coordinate generation CLI.

The reference defers this stage to CLAM's external create_patches_fp.py
(ref README.md:42-50) while shipping the support code in-repo
(utils/WholeSlideImage.py, utils/batch_process_utils.py) — here patching
is first-class (SURVEY.md §7 step 7).  Outputs per slide:
patches/{slide}_patches.h5 (coords + attrs), masks/{slide}_mask.jpg,
stitches/{slide}_stitch.jpg, and a process_list_autogen.csv with the
per-slide seg/patch params (ref batch_process_utils.py:17-92).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import cv2
import numpy as np
import pandas as pd

from multimodalfusion_tpu.data.io import ensure_dir
from multimodalfusion_tpu.data import wsi as wsi_mod

DEFAULT_SEG_PARAMS = {"seg_level": -1, "sthresh": 8, "mthresh": 7,
                      "close": 4, "use_otsu": False}
DEFAULT_FILTER_PARAMS = {"a_t": 100.0, "a_h": 16.0, "max_n_holes": 8}
DEFAULT_PATCH_PARAMS = {"use_padding": True, "contour_fn": "four_pt"}


def build_parser():
    p = argparse.ArgumentParser(description="WSI patching")
    p.add_argument("--source", type=str, required=True,
                   help="directory of slides")
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--step_size", type=int, default=256)
    p.add_argument("--patch_level", type=int, default=0)
    p.add_argument("--seg", action="store_true", default=True)
    p.add_argument("--patch", action="store_true", default=True)
    p.add_argument("--stitch", action="store_true", default=False)
    p.add_argument("--no_auto_skip", action="store_true", default=False)
    p.add_argument("--preset", type=str, default=None,
                   help="CSV with one row of segmentation/filter defaults "
                        "applied to every slide (ref presets/tcga.csv); "
                        "per-slide process_list values still win")
    p.add_argument("--process_list", type=str, default=None,
                   help="CSV of slides + per-slide params")
    p.add_argument("--seg_level", type=int, default=-1)
    p.add_argument("--sthresh", type=int, default=8)
    p.add_argument("--mthresh", type=int, default=7)
    p.add_argument("--close", type=int, default=4)
    p.add_argument("--use_otsu", action="store_true", default=False)
    p.add_argument("--a_t", type=float, default=100.0)
    p.add_argument("--a_h", type=float, default=16.0)
    p.add_argument("--max_n_holes", type=int, default=8)
    p.add_argument("--contour_fn", type=str, default="four_pt")
    return p


def draw_mask(slide, tissue, holes, seg_level: int) -> np.ndarray:
    ds = slide.level_downsamples[seg_level]
    w, h = slide.level_dimensions[seg_level]
    img = slide.read_region((0, 0), seg_level, (w, h)).copy()
    scale = np.array([1.0 / ds[0], 1.0 / ds[1]])
    tissue_s = [np.array(c * scale, np.int32) for c in tissue]
    cv2.drawContours(img, tissue_s, -1, (0, 255, 0), 2)
    for hs in holes:
        hs_s = [np.array(c * scale, np.int32) for c in hs]
        cv2.drawContours(img, hs_s, -1, (255, 0, 0), 2)
    return img


def process_one(slide, args, patch_dir, mask_dir, stitch_dir,
                params=None):
    params = params or {}
    seg_kwargs = {**DEFAULT_SEG_PARAMS, **DEFAULT_FILTER_PARAMS}
    # CLI-level overrides, then per-slide process-list overrides
    for k in seg_kwargs:
        if hasattr(args, k):
            seg_kwargs[k] = getattr(args, k)
    seg_kwargs.update({k: params[k] for k in params
                       if k in seg_kwargs and not pd.isna(params[k])})
    used_params = dict(seg_kwargs)
    used_params["contour_fn"] = params.get(
        "contour_fn", getattr(args, "contour_fn",
                              DEFAULT_PATCH_PARAMS["contour_fn"]))
    seg_kwargs = dict(seg_kwargs)
    seg_level = seg_kwargs.pop("seg_level")
    if seg_level in (-1, None):
        seg_level = slide.level_count - 1
    tissue, holes = wsi_mod.segment_tissue(slide, seg_level=seg_level,
                                           **seg_kwargs)
    mask = draw_mask(slide, tissue, holes, seg_level)
    cv2.imwrite(os.path.join(mask_dir, f"{slide.name}_mask.jpg"),
                cv2.cvtColor(mask, cv2.COLOR_RGB2BGR))
    coords, h5_path = wsi_mod.process_contours(
        slide, tissue, holes, save_path=patch_dir,
        patch_level=args.patch_level, patch_size=args.patch_size,
        step_size=args.step_size,
        contour_fn=used_params["contour_fn"])
    if args.stitch and len(coords):
        canvas = wsi_mod.stitch_coords(slide, coords, args.patch_level,
                                       args.patch_size)
        cv2.imwrite(os.path.join(stitch_dir, f"{slide.name}_stitch.jpg"),
                    cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
    return len(coords), used_params


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    patch_dir = ensure_dir(os.path.join(args.save_dir, "patches"))
    mask_dir = ensure_dir(os.path.join(args.save_dir, "masks"))
    stitch_dir = ensure_dir(os.path.join(args.save_dir, "stitches"))

    preset = {}
    if args.preset:
        preset = pd.read_csv(args.preset).iloc[0].to_dict()
    if args.process_list:
        df = pd.read_csv(args.process_list)
        slide_names = df["slide_id"].tolist()
        param_rows = [{**preset, **r} for r in df.to_dict("records")]
    else:
        slide_names = sorted(os.listdir(args.source))
        param_rows = [dict(preset) for _ in slide_names]

    rows = []
    for name, params in zip(slide_names, param_rows):
        path = os.path.join(args.source, name)
        if not os.path.isfile(path):
            continue
        stem = os.path.splitext(name)[0]
        h5_out = os.path.join(patch_dir, f"{stem}_patches.h5")
        if os.path.exists(h5_out) and not args.no_auto_skip:
            print(f"skip {name} (exists)")
            continue
        t0 = time.time()
        try:
            slide = wsi_mod.open_slide(path)
            n, used = process_one(slide, args, patch_dir, mask_dir,
                                  stitch_dir, params)
            status = "processed"
            print(f"{name}: {n} patches in {time.time() - t0:.1f}s")
        except Exception as e:
            n, status, used = 0, f"failed: {e}", {}
            print(f"FAILED {name}: {e}")
        # record the parameters that were ACTUALLY used for this slide so
        # a rerun from the autogen list reproduces the same segmentation
        rows.append({"slide_id": name, "status": status, "n_patches": n,
                     **{**DEFAULT_SEG_PARAMS, **DEFAULT_FILTER_PARAMS,
                        **DEFAULT_PATCH_PARAMS, **used}})
    pd.DataFrame(rows).to_csv(
        os.path.join(args.save_dir, "process_list_autogen.csv"), index=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
