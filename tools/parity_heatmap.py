"""Stage-5 WSI heatmap parity against the reference AS RUN.

The last interpretability surface without as-run evidence: the
reference's own ``WholeSlideImage`` (segmentTissue -> process_contours
-> visHeatmap) is executed in this image via the openslide shim
(tools/ref_shims/openslide backs it with this repo's PILSlide over a
synthetic pyramidal TIFF), and compared against this repo's
``segment_tissue`` / ``process_contours`` / ``draw_heatmap`` on the
same slide with the same parameters and the same attention scores:

  1. patch COORDS must match exactly (set equality) — same contours,
     same in-contour checks, same grid;
  2. the rendered heatmaps must agree pixel-for-pixel across a sweep of
     visHeatmap configurations (percentiles/raw, blur, binarize, blank
     canvas, no-segment, custom_downsample, no-blend alpha).

Measured 2026-08-19 (recorded in PARITY.md §4.5): contours 2v2, coords
set-identical (79), and EVERY sweep variant pixel-identical.

Run:  python tools/parity_heatmap.py [workdir]
Needs /root/reference mounted.  ~2-3 min, CPU.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SHIMS = os.path.join(REPO, "tools", "ref_shims")

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_slide(workdir):
    from PIL import Image

    from multimodalfusion_tpu.data import wsi
    slide = wsi.synthetic_slide(4096, 3072, n_blobs=4, seed=7)
    path = os.path.join(workdir, "PARITY1.tiff")
    imgs = [Image.fromarray(l) for l in slide.levels]
    imgs[0].save(path, save_all=True, append_images=imgs[1:])
    return path


SEG = dict(seg_level=2, sthresh=20, mthresh=7, use_otsu=False,
           close=4, ref_patch_size=256)
FILTER = {"a_t": 1.0, "a_h": 0.1, "max_n_holes": 8}
PATCH = dict(patch_level=0, patch_size=256, step_size=256)

# NOTE: the reference IGNORES a string cmap and hardcodes RdYlBu_r
# (WholeSlideImage.py:679-689 reassigns cmap = plt.get_cmap('RdYlBu_r')
# whenever isinstance(cmap, str)) — this repo honors the argument (and
# now defaults to RdYlBu_r), so the sweep pins the colormap the
# reference actually renders.
BASE = dict(vis_level=1, alpha=0.4, blur=False, segment=True,
            use_holes=True, binarize=False, cmap="RdYlBu_r",
            percentiles=True)

# (name, overrides) — each runs through BOTH implementations
VARIANTS = [
    ("base", {}),
    ("raw_scores", {"percentiles": False}),
    ("blurred", {"blur": True}),
    ("binarized", {"binarize": True, "thresh": 0.35}),
    ("blank_canvas", {"blank_canvas": True}),
    ("no_segment", {"segment": False, "use_holes": False}),
    ("downsample2", {"custom_downsample": 2}),
    ("no_blend", {"alpha": 1.0}),
]


def _split_vis(cfg):
    """Common dict -> (ref visHeatmap kwargs, our draw_heatmap kwargs)."""
    ref_kw = dict(vis_level=cfg["vis_level"], alpha=cfg["alpha"],
                  blur=cfg["blur"], segment=cfg["segment"],
                  use_holes=cfg["use_holes"], binarize=cfg["binarize"],
                  cmap=cfg["cmap"],
                  convert_to_percentiles=cfg["percentiles"],
                  blank_canvas=cfg.get("blank_canvas", False),
                  custom_downsample=cfg.get("custom_downsample", 1))
    if cfg["binarize"]:
        ref_kw["thresh"] = cfg["thresh"]
    our_kw = dict(vis_level=cfg["vis_level"], alpha=cfg["alpha"],
                  blur=cfg["blur"], segment=cfg["segment"],
                  use_holes=cfg["use_holes"], binarize=cfg["binarize"],
                  cmap=cfg["cmap"], use_percentiles=cfg["percentiles"],
                  blank_canvas=cfg.get("blank_canvas", False),
                  custom_downsample=cfg.get("custom_downsample", 1))
    if cfg["binarize"]:
        our_kw["threshold"] = cfg["thresh"]
    return ref_kw, our_kw


def run_reference(slide_path, workdir):
    sys.path.insert(0, SHIMS)
    sys.path.insert(0, REF)
    # cv2 5.0 rejects numpy ints in pointPolygonTest's pt (the 2021-era
    # reference passes coord arrays straight through); cast like
    # tools/run_reference.py's numpy-2 alias patch.  Applied before the
    # reference creates its mp.Pool so fork propagates it to workers.
    import cv2
    _orig_ppt = cv2.pointPolygonTest
    if not getattr(cv2, "_mmf_ppt_patched", False):
        def _ppt(contour, pt, measureDist):
            return _orig_ppt(contour, (float(pt[0]), float(pt[1])),
                             measureDist)
        cv2.pointPolygonTest = _ppt
        cv2._mmf_ppt_patched = True
    cwd = os.getcwd()
    os.chdir(REF)  # the reference imports `utils.*` relative to its root
    try:
        from utils.WholeSlideImage import WholeSlideImage
        obj = WholeSlideImage(slide_path)
        obj.segmentTissue(seg_level=SEG["seg_level"], sthresh=SEG["sthresh"],
                          mthresh=SEG["mthresh"], close=SEG["close"],
                          use_otsu=SEG["use_otsu"], filter_params=dict(FILTER),
                          ref_patch_size=SEG["ref_patch_size"])
        n_tissue = len(obj.contours_tissue)
        # the reference calls pbar.update(1) unconditionally (its CLIs
        # always pass a tqdm); it also returns self.hdf5_file, which
        # this path never sets — use the documented output name
        from types import SimpleNamespace
        obj.process_contours(save_path=workdir,
                             pbar=SimpleNamespace(update=lambda n: None),
                             **PATCH)
        h5 = os.path.join(workdir, f"{obj.name}_patches.h5")
        import h5py
        with h5py.File(h5, "r") as f:
            coords = f["coords"][:]
        # fine-pass grid at overlap 0.75 exactly as the reference's CLI
        # builds it (create_heatmaps.py:375-384 -> Wsi_Region defaults:
        # four_pt_hard + use_center_shift from config, shipped true)
        import datasets.wsi_dataset as wsi_dataset_mod
        # only the coord generation is compared; the torch transform
        # pipeline (shimmed torchvision) is irrelevant here
        wsi_dataset_mod.default_transforms = lambda *a, **k: None
        Wsi_Region = wsi_dataset_mod.Wsi_Region
        ps = PATCH["patch_size"]
        step = int(ps * (1 - 0.75))
        region = Wsi_Region(obj, top_left=None, bot_right=None, level=0,
                            patch_size=(ps, ps), step_size=(step, step),
                            custom_downsample=1, use_center_shift=True)
        fine_coords = np.asarray(region.coords)

        rng = np.random.default_rng(0)
        scores = rng.uniform(size=len(coords)).astype(np.float64)
        heats = {}
        for name, over in VARIANTS:
            cfg = {**BASE, **over}
            ref_kw, _ = _split_vis(cfg)
            # the reference divides scores by 100 UNCONDITIONALLY
            # (WholeSlideImage.py:619): without percentile conversion
            # its raw-score unit is [0, 100] (what its own
            # compute_from_patches feeds it); this repo documents raw
            # scores in [0, 1] — feed each side its own unit
            s = scores * 100.0 if not cfg["percentiles"] else scores
            heat = obj.visHeatmap(s.copy(), coords.copy(),
                                  patch_size=(PATCH["patch_size"],) * 2,
                                  **ref_kw)
            heats[name] = np.asarray(heat.convert("RGB"))
        return n_tissue, coords, scores, heats, fine_coords
    finally:
        os.chdir(cwd)


def run_ours(slide_path, ref_coords=None, ref_scores=None):
    from multimodalfusion_tpu.data import wsi as wsi_mod
    from multimodalfusion_tpu.interpret.heatmaps import draw_heatmap
    slide = wsi_mod.open_slide(slide_path)
    tissue, holes = wsi_mod.segment_tissue(
        slide, seg_level=SEG["seg_level"], sthresh=SEG["sthresh"],
        mthresh=SEG["mthresh"], close=SEG["close"], use_otsu=SEG["use_otsu"],
        a_t=FILTER["a_t"], a_h=FILTER["a_h"],
        max_n_holes=FILTER["max_n_holes"],
        ref_patch_size=SEG["ref_patch_size"])
    coords, _ = wsi_mod.process_contours(slide, tissue, holes, **PATCH)
    heats = {}
    if ref_coords is not None:
        # render with the REFERENCE's (coords, scores) pairing so images
        # are comparable 1:1 (the two pipelines enumerate patches in
        # different orders)
        for name, over in VARIANTS:
            cfg = {**BASE, **over}
            _, our_kw = _split_vis(cfg)
            heats[name] = np.asarray(draw_heatmap(
                slide, ref_scores, ref_coords,
                patch_size=PATCH["patch_size"], tissue=tissue,
                holes=holes, **our_kw))
    return len(tissue), coords, heats


def main(workdir) -> int:
    os.makedirs(workdir, exist_ok=True)
    slide_path = build_slide(workdir)
    (ref_nt, ref_coords, ref_scores, ref_heats,
     ref_fine) = run_reference(slide_path, workdir)
    our_nt, our_coords, _ = run_ours(slide_path)

    ok = True
    print(f"[contours] ref {ref_nt} ours {our_nt} "
          f"{'MATCH' if ref_nt == our_nt else 'MISMATCH'}")
    ok &= ref_nt == our_nt

    ref_set = set(map(tuple, np.asarray(ref_coords, np.int64)))
    our_set = set(map(tuple, np.asarray(our_coords, np.int64)))
    print(f"[coords] ref {len(ref_set)} ours {len(our_set)} "
          f"common {len(ref_set & our_set)} "
          f"{'MATCH' if ref_set == our_set else 'MISMATCH'}")
    ok &= ref_set == our_set

    # fine (overlap 0.75, four_pt_hard + center-shift table) grid vs
    # the reference's Wsi_Region
    from multimodalfusion_tpu.data import wsi as wsi_mod
    from multimodalfusion_tpu.interpret.heatmaps import \
        fine_pass_center_shift
    slide = wsi_mod.open_slide(slide_path)
    tissue, holes = wsi_mod.segment_tissue(
        slide, seg_level=SEG["seg_level"], sthresh=SEG["sthresh"],
        mthresh=SEG["mthresh"], close=SEG["close"],
        use_otsu=SEG["use_otsu"], a_t=FILTER["a_t"], a_h=FILTER["a_h"],
        max_n_holes=FILTER["max_n_holes"],
        ref_patch_size=SEG["ref_patch_size"])
    ps = PATCH["patch_size"]
    our_fine, _ = wsi_mod.process_contours(
        slide, tissue, holes, patch_level=0, patch_size=ps,
        step_size=int(ps * 0.25), contour_fn="four_pt_hard",
        center_shift=fine_pass_center_shift(0.75))
    rf = set(map(tuple, np.asarray(ref_fine, np.int64)))
    of = set(map(tuple, np.asarray(our_fine, np.int64)))
    print(f"[fine coords @0.75] ref {len(rf)} ours {len(of)} "
          f"common {len(rf & of)} "
          f"{'MATCH' if rf == of else 'MISMATCH'}")
    ok &= rf == of

    if ok:
        _, _, our_heats = run_ours(slide_path, ref_coords, ref_scores)
        from PIL import Image
        for name, _ in VARIANTS:
            a = ref_heats[name].astype(np.float64)
            b = our_heats[name].astype(np.float64)
            if a.shape != b.shape:
                print(f"[{name}] shape MISMATCH {a.shape} vs {b.shape}")
                ok = False
                continue
            corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
            mad = float(np.mean(np.abs(a - b)))
            frac_exact = float(np.mean(a == b))
            good = corr > 0.9999 and mad < 0.05
            print(f"[{name}] corr {corr:.6f} mean|d| {mad:.4f}/255 "
                  f"exact-px {frac_exact:.4f} "
                  f"{'MATCH' if good else 'MISMATCH'}")
            ok &= good
            Image.fromarray(ref_heats[name]).save(
                os.path.join(workdir, f"heat_ref_{name}.png"))
            Image.fromarray(our_heats[name]).save(
                os.path.join(workdir, f"heat_ours_{name}.png"))
    print("HEATMAP PARITY:", "MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_heatmap"
    sys.exit(main(os.path.abspath(base)))
