"""Stage-5 RADIO heatmap branch parity against the reference AS RUN.

Counterpart of tools/parity_heatmap.py for the radiology branch of the
heatmap CLI (ref create_heatmaps.py:557-659): the reference script is
EXECUTED UNMODIFIED (via tools/run_reference.py + ref_shims — a
functional SimpleITK mini-shim backed by this repo's native NIfTI
reader, and import-only stubs for shap/captum/lifelines) with
``--sampling`` on a synthetic 4-modality MRI cohort, sharing with this
repo's ``cli/create_heatmaps.py`` radio branch:

  * the SAME slice-feature h5 store (features + slice_index, ref
    utils/heatmap_utils.process_mri :228-246),
  * the SAME radio-AMIL checkpoint (trained here, side-exported to the
    reference's ``s_0_minloss_checkpoint.pt`` by engine/train.py), and
  * the SAME raw NIfTI volumes (one modality stored y-flipped with the
    matching off-standard origin, exercising the flip-to-standard
    logic on both sides, ref heatmap_utils.radio_img :177-197).

Compared:
  1. scores.csv — the reference's per-subject (ind, scores,
     scores_softmax) table vs this repo's (slice_index, attention)
     table: identical descending slice order, matching raw attention
     and softmax values;
  2. top/low slice SELECTION — the slice ids and rank order encoded in
     the reference's top_{i}_axial_{id}.png / tail_{i}_axial_{id}.png
     file names vs this repo's group=top/low rows, per modality;
  3. rendered slice PIXELS — the reference renders the raw flipped
     volume per-slice-normalized through matplotlib's gray colormap
     (plt.imsave, create_heatmaps.py:645-659); this repo renders its
     preprocessed stack (stack-normalized, bbox-cropped) through
     cv2.  The synthetic volumes are built so the two are
     commensurable (every kept slice spans the full bounding box and
     contains the stack min 0 and max 255), so the gray values must
     agree to <= 1 level (float32-vs-float64 normalization
     quantization); the reference's bytes are additionally pinned to
     the raw voxel values within the same 1-level LUT quantization.
  4. the n < 20 regime — the reference floors its dynamic k at 20
     (create_heatmaps.py:626-628) and CRASHES (KeyError off the end of
     temp_s) when a subject has fewer than 20 common slices; this
     repo's slice_group_size caps k at n//2 (documented deviation,
     cli/create_heatmaps.py:368-382).  The crash is demonstrated as
     run, and the scores this repo computes for that short-bag subject
     still match the scores.csv the reference managed to write before
     dying.

Run:  python tools/parity_heatmap_radio.py [workdir]
Needs /root/reference mounted.  ~4-6 min, CPU.
"""
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SUBJECT = "TCGA-60-2723"  # the reference HARDCODES its subject list
                          # (create_heatmaps.py:227 selected_samples)
MODALITIES = ["T1", "T2", "T1Gd", "FLAIR"]
NZ, NY, NX = 48, 32, 32

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _ref_env(torch_home):
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        [os.path.join(REPO, "tools", "ref_shims"), REPO, REF]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env["JAX_PLATFORMS"] = "cpu"
    env["MPLBACKEND"] = "Agg"
    # the script builds resnet50_baseline(pretrained=True) at startup
    # (create_heatmaps.py:136) though the radio branch never uses it;
    # pre-seed the torch-hub cache with an empty state dict (zero
    # egress; load_state_dict(strict=False) accepts it) instead of
    # patching the reference
    env["TORCH_HOME"] = torch_home
    return env


def _seed_torch_cache(torch_home):
    import torch
    ckpt_dir = os.path.join(torch_home, "hub", "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    torch.save({}, os.path.join(ckpt_dir, "resnet50-19c8e357.pth"))


def make_std_volume(keep_ids, rng):
    """[NZ, NY, NX] float volume of integer gray values, zero outside
    ``keep_ids``.  Every kept slice contains 0 and 255 and spans the
    full frame, so per-slice matplotlib normalization (reference) and
    stack normalization + bbox crop (this repo) render identically."""
    vol = np.zeros((NZ, NY, NX), np.float32)
    for z in keep_ids:
        sl = rng.integers(1, 255, size=(NY, NX)).astype(np.float32)
        sl[0, :] = 7.0
        sl[-1, :] = 7.0
        sl[:, 0] = 7.0
        sl[:, -1] = 7.0
        sl[0, 0] = 0.0
        sl[0, 1] = 255.0
        vol[z] = sl
    return vol


def build_display_cohort(scan_dir, h5_root, keep, seed):
    """NIfTI volumes + slice-feature h5s for SUBJECT.

    Returns {modality: standard-orientation volume} for pixel checks.
    FLAIR is written y-flipped with origin (0, -270, 0): the reference
    flips any axis whose origin differs from (0, -239, 0) and asserts
    the flipped origin lands exactly on the standard
    (heatmap_utils.radio_img :183-187), so -270 + (NY-1)*1.0 == -239.
    """
    from multimodalfusion_tpu.data.io import ensure_dir, save_hdf5
    from multimodalfusion_tpu.data.nifti import write_nifti
    rng = np.random.default_rng(seed)
    std = {}
    sub_dir = ensure_dir(os.path.join(scan_dir, SUBJECT))
    for m in MODALITIES:
        vol = make_std_volume(keep[m], rng)
        std[m] = vol
        if m == "FLAIR":
            write_nifti(os.path.join(sub_dir, f"{m}.nii.gz"),
                        np.flip(vol, axis=1).copy(),
                        origin_lps=(0.0, -239.0 - (NY - 1) * 1.0, 0.0))
        else:
            write_nifti(os.path.join(sub_dir, f"{m}.nii.gz"), vol,
                        origin_lps=(0.0, -239.0, 0.0))
        ensure_dir(os.path.join(h5_root, m))
        feats = rng.normal(size=(len(keep[m]), 1024)).astype(np.float32)
        save_hdf5(os.path.join(h5_root, m, f"{SUBJECT}.h5"),
                  {"features": feats,
                   "slice_index": np.asarray(keep[m], np.int64)},
                  mode="w")
    return std


def train_checkpoint(base):
    """Train a radio AMIL here; engine/train.py side-exports the
    reference-format s_0_minloss_checkpoint.pt next to the msgpack."""
    from fixtures import make_cohort_csv, make_feature_store, make_splits
    from multimodalfusion_tpu.cli.main import main as s2_main
    csv_path, df, latent = make_cohort_csv(
        os.path.join(base, "dataset_csv", "brain"), n=40, seed=31)
    make_feature_store(os.path.join(base, "feat", "brain"), df, latent,
                       seed=31, bag_range=(8, 30))
    make_splits(os.path.join(base, "splits", "brain", "2foldcv"), df,
                k=2, seed=31)
    rc = s2_main(["--cancer_type", "brain", "--which_splits", "2foldcv",
                  "--k", "1", "--data_root_dir",
                  os.path.join(base, "feat"),
                  "--dataset_root", os.path.join(base, "dataset_csv"),
                  "--splits_root", os.path.join(base, "splits"),
                  "--results_dir", os.path.join(base, "s2r"),
                  "--model_type", "radio_attention_mil", "--mode", "radio",
                  "--radio_fusion", "concat", "--gate_radio", "--drop_out",
                  "--bag_loss", "nll_surv", "--batch_size", "4",
                  "--max_epochs", "2", "--lr", "1e-3", "--overwrite"])
    assert rc == 0
    folds = os.path.join(base, "s2r", "brain", "2foldcv")
    exp = os.path.join(folds, os.listdir(folds)[0])
    pt = os.path.join(exp, "s_0_minloss_checkpoint.pt")
    assert os.path.isfile(pt), pt
    return exp


def run_reference(cwd, exp, scan_dir, h5_root, torch_home):
    import pandas as pd
    import yaml
    hm = os.path.join(cwd, "heatmaps", "brain")
    os.makedirs(os.path.join(hm, "presets"), exist_ok=True)
    os.makedirs(os.path.join(hm, "process_lists"), exist_ok=True)
    pd.DataFrame([{
        "slide_id": f"{SUBJECT}-01", "seg_level": -1, "sthresh": 15,
        "mthresh": 11, "close": 2, "use_otsu": False, "a_t": 50.0,
        "a_h": 8.0, "max_n_holes": 10, "vis_level": -1,
        "line_thickness": 250, "use_padding": True,
        "contour_fn": "four_pt",
    }]).to_csv(os.path.join(hm, "presets", "preset.csv"), index=False)
    row = {"subject_id": SUBJECT, "slide_id": f"{SUBJECT}-01"}
    row.update({m: f"{m}.nii.gz" for m in MODALITIES})
    pd.DataFrame([row]).to_csv(
        os.path.join(hm, "process_lists", "plist.csv"), index=False)
    config = {
        "patching_arguments": {"patch_size": 256, "overlap": 0.5,
                               "patch_level": 0, "custom_downsample": 1},
        "data_arguments": {"cancer_type": "brain",
                           "preset": "preset.csv",
                           "process_list": "plist.csv",
                           "data_dir": scan_dir,
                           "data_h5_dir": h5_root,
                           "slide_ext": ".tiff"},
        "model_arguments": {"mode": "radio",
                            "initiate_fn": "initiate_model",
                            "model_type": "radio_attention_mil",
                            "drop_out": True, "n_classes": 4,
                            "modalities": MODALITIES,
                            "model_path": exp, "cv": 0,
                            "pkl_path": None},
        "exp_arguments": {"save_exp_code": "RADIO_PARITY",
                          "raw_save_dir": os.path.join(cwd, "raw"),
                          "production_save_dir": os.path.join(cwd, "prod"),
                          "batch_size": 64, "bins": None},
        "heatmap_arguments": {"vis_level": 1, "alpha": 0.4, "blur": False,
                              "use_ref_scores": False,
                              "blank_canvas": False, "binarize": False,
                              "binary_thresh": 0.5,
                              "custom_downsample": 1, "save_ext": "jpg",
                              "save_orig": False, "use_roi": False,
                              "calc_heatmap": False,
                              "use_center_shift": False},
        "sample_arguments": {"samples": [
            {"name": "topk_high_attention", "sample": True}]},
    }
    cfg_path = os.path.join(cwd, "config_radio.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    # the subject loop's logging.basicConfig writes into
    # raw_save_dir/save_exp_code, which only the omic branch creates
    os.makedirs(os.path.join(cwd, "raw", "RADIO_PARITY"), exist_ok=True)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_reference.py"),
         os.path.join(REF, "create_heatmaps.py"), "--sampling",
         "--config_file", cfg_path],
        cwd=cwd, env=_ref_env(torch_home), input=b"",
        capture_output=True, timeout=1800)


def run_ours(out_dir, exp, scan_dir, h5_root):
    import pandas as pd
    import yaml
    from multimodalfusion_tpu.cli.create_heatmaps import main as hm_main
    plist = os.path.join(out_dir, "subjects.csv")
    pd.DataFrame({"subject_id": [SUBJECT]}).to_csv(plist, index=False)
    scan_list = os.path.join(out_dir, "scan_list.csv")
    row = {"subject_id": SUBJECT}
    row.update({m: f"{SUBJECT}/{m}.nii.gz" for m in MODALITIES})
    pd.DataFrame([row]).to_csv(scan_list, index=False)
    save_dir = os.path.join(out_dir, "hm_radio")
    config = {
        "exp_arguments": {"branch": "radio", "save_dir": save_dir},
        "data_arguments": {"process_list": plist,
                           # our layout roots feat_dir one level above
                           # radio_h5_files (data/io layout)
                           "feat_dir": os.path.dirname(h5_root),
                           "modalities": MODALITIES,
                           "scan_list": scan_list,
                           "scan_dir": scan_dir,
                           "display_modality": MODALITIES},
        "model_arguments": {"ckpt_path": exp, "which_k": 0},
    }
    cfg_path = os.path.join(out_dir, "radio.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    rc = hm_main(["--config", cfg_path])
    assert rc == 0
    return save_dir


def _ref_gray(path):
    """Decode a reference plt.imsave PNG -> uint8 gray array."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert img is not None, path
    if img.ndim == 3:  # BGRA/BGR from matplotlib's RGBA write
        b, g, r = img[..., 0], img[..., 1], img[..., 2]
        assert np.array_equal(b, g) and np.array_equal(g, r), \
            f"non-gray reference PNG {path}"
        return r
    return img


def compare(ref_cwd, save_dir, std, common_ids):
    import cv2
    import pandas as pd
    ok = True
    ref_sub = os.path.join(ref_cwd, "patches", "raw_patches",
                           "RADIO_PARITY", "unknown", SUBJECT)
    ref_scores = pd.read_csv(os.path.join(ref_sub, "scores.csv"))
    ours = pd.read_csv(os.path.join(save_dir, "scores.csv"))
    ours = ours[ours.subject_id == SUBJECT].reset_index(drop=True)

    # 1. scores.csv: same slice universe, same descending order, same
    #    raw attention + softmax values
    same_order = (ref_scores["ind"].tolist()
                  == ours["slice_index"].tolist())
    d_raw = float(np.abs(ref_scores["scores"].to_numpy()
                         - ours["attention"].to_numpy()).max())
    e = np.exp(ours["attention"].to_numpy())
    d_soft = float(np.abs(ref_scores["scores_softmax"].to_numpy()
                          - e / e.sum()).max())
    n = len(ours)
    scores_ok = same_order and d_raw < 1e-4 and d_soft < 1e-6 \
        and n == len(common_ids)
    ok &= scores_ok
    print(f"[scores.csv] {n} common slices, order "
          f"{'identical' if same_order else 'DIFFERS'}, max |d| raw "
          f"{d_raw:.2e} softmax {d_soft:.2e} "
          f"{'MATCH' if scores_ok else 'MISMATCH'}")

    # 2 + 3. per-modality top/low selection and pixels
    k = 20  # both sides: max(round/ceil(0.1*n), 20) for 40 <= n <= 200
    desc = ours.sort_values("attention", ascending=False)
    want_top = desc["slice_index"].head(k).tolist()
    want_low = desc["slice_index"].tail(k).tolist()[::-1]
    for m in MODALITIES:
        for group, ref_sdir, prefix, want in (
                ("top", "high_attention", "top", want_top),
                ("low", "low_attention", "tail", want_low)):
            ref_dir = os.path.join(ref_sub, ref_sdir, m)
            names = os.listdir(ref_dir)
            got = [None] * len(names)
            for f in names:
                # {top|tail}_{rank}_axial_{slice_id}.png
                parts = f[:-4].split("_")
                assert parts[0] == prefix, f
                got[int(parts[1])] = int(parts[3])
            sel_ok = got == want
            ok &= sel_ok
            maxd = maxd_raw = -1
            our_grp = ours[ours.slice_index.isin(want)]
            our_dir = os.path.join(save_dir, SUBJECT, m, group)
            for rank, sid in enumerate(got):
                ref_px = _ref_gray(os.path.join(
                    ref_dir, f"{prefix}_{rank}_axial_{sid}.png"))
                # the reference renders the raw flipped voxel values
                # through matplotlib's 256-entry gray LUT, whose
                # int(v * 256/255) index quantizes some voxels down by
                # one level — pin its bytes to raw-voxel +/- 1
                d_raw = int(np.abs(ref_px.astype(int)
                                   - std[m][sid].astype(int)).max())
                maxd_raw = max(maxd_raw, d_raw)
                our_rows = our_grp[our_grp.slice_index == sid]
                if our_rows.empty:
                    # reference selected a slice we never rendered —
                    # report the MISMATCH instead of IndexError-ing
                    ok = False
                    maxd = 255
                    continue
                attn = float(our_rows.attention.iloc[0])
                our_px = cv2.imread(
                    os.path.join(our_dir, f"slice{sid}_a{attn:.3f}.png"),
                    cv2.IMREAD_GRAYSCALE)
                same_shape = (our_px is not None
                              and our_px.shape == ref_px.shape)
                d = int(np.abs(ref_px.astype(int)
                               - our_px.astype(int)).max()) \
                    if same_shape else 255
                maxd = max(maxd, d)
                ok &= d_raw <= 1 and same_shape and d <= 1
            print(f"[slices {m}/{group}] selection "
                  f"{'identical' if sel_ok else 'DIFFERS'} "
                  f"({len(got)} ids, rank order), pixels max |d| {maxd} "
                  f"(ref vs raw voxels {maxd_raw}) "
                  f"{'MATCH' if sel_ok and 0 <= maxd <= 1 else 'MISMATCH'}")
    return ok


def run_crash_arm(base, exp, scan_dir, torch_home):
    """n < 20 common slices: the reference crashes off the end of its
    score table (create_heatmaps.py:626-628 floors k at 20); this repo
    degrades to disjoint k = n//2 groups.  Scores written before the
    crash must still match."""
    import pandas as pd
    from multimodalfusion_tpu.data.io import save_hdf5
    rng = np.random.default_rng(7)
    keep = list(range(5, 15))  # 10 slices, all modalities
    h5_root = os.path.join(base, "short_h5", "radio_h5_files")
    for m in MODALITIES:
        os.makedirs(os.path.join(h5_root, m), exist_ok=True)
        save_hdf5(os.path.join(h5_root, m, f"{SUBJECT}.h5"),
                  {"features": rng.normal(
                      size=(len(keep), 1024)).astype(np.float32),
                   "slice_index": np.asarray(keep, np.int64)}, mode="w")
    cwd = os.path.join(base, "ref_cwd_short")
    os.makedirs(cwd, exist_ok=True)
    proc = run_reference(cwd, exp, scan_dir, h5_root, torch_home)
    crashed = proc.returncode != 0 and b"KeyError" in proc.stderr
    ref_csv = os.path.join(cwd, "patches", "raw_patches", "RADIO_PARITY",
                           "unknown", SUBJECT, "scores.csv")
    print(f"[n<20 reference] exit {proc.returncode} "
          f"(KeyError {'yes' if b'KeyError' in proc.stderr else 'no'}) "
          f"-> {'CRASHES AS DOCUMENTED' if crashed else 'UNEXPECTED'}")
    out_dir = os.path.join(base, "ours_short")
    os.makedirs(out_dir, exist_ok=True)
    save_dir = run_ours(out_dir, exp, scan_dir, h5_root)
    ours = pd.read_csv(os.path.join(save_dir, "scores.csv"))
    top = set(ours[ours.group == "top"].slice_index)
    low = set(ours[ours.group == "low"].slice_index)
    groups_ok = len(top) == 5 and len(low) == 5 and not (top & low)
    d_raw = None
    scores_ok = False
    if os.path.isfile(ref_csv):
        ref_scores = pd.read_csv(ref_csv)
        scores_ok = (ref_scores["ind"].tolist()
                     == ours["slice_index"].tolist())
        d_raw = float(np.abs(ref_scores["scores"].to_numpy()
                             - ours["attention"].to_numpy()).max())
        scores_ok &= d_raw < 1e-4
    print(f"[n<20 ours] disjoint top/low k=5 "
          f"{'yes' if groups_ok else 'NO'}; pre-crash reference scores "
          f"max |d| {d_raw if d_raw is not None else 'n/a'} "
          f"{'MATCH' if scores_ok else 'MISMATCH'}")
    return crashed and groups_ok and scores_ok


def main(base):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    os.makedirs(base, exist_ok=True)
    torch_home = os.path.join(base, "torch_home")
    _seed_torch_cache(torch_home)

    keep = {"T1": list(range(2, 48)),
            "T2": list(range(0, 46)),
            "T1Gd": list(range(1, 47)),
            "FLAIR": [z for z in range(2, 47) if z != 20]}
    common = sorted(set(keep["T1"]) & set(keep["T2"])
                    & set(keep["T1Gd"]) & set(keep["FLAIR"]))
    assert 40 <= len(common) <= 200, len(common)  # k == 20 on BOTH sides

    scan_dir = os.path.join(base, "scans")
    h5_root = os.path.join(base, "feat_display", "radio_h5_files")
    std = build_display_cohort(scan_dir, h5_root, keep, seed=11)
    print(f"display cohort: {len(common)} common slices "
          f"across {len(MODALITIES)} modalities")

    exp = train_checkpoint(base)
    print(f"checkpoint: {exp}")

    ref_cwd = os.path.join(base, "ref_cwd")
    os.makedirs(ref_cwd, exist_ok=True)
    proc = run_reference(ref_cwd, exp, scan_dir, h5_root, torch_home)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout.decode(errors="replace")[-3000:])
        sys.stderr.write(proc.stderr.decode(errors="replace")[-6000:])
        print("reference run FAILED")
        return 1
    out_dir = os.path.join(base, "ours")
    os.makedirs(out_dir, exist_ok=True)
    save_dir = run_ours(out_dir, exp, scan_dir, h5_root)

    ok = compare(ref_cwd, save_dir, std, common)
    ok &= run_crash_arm(base, exp, scan_dir, torch_home)
    print("RADIO HEATMAP PARITY:", "ALL MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/radio_heatmap_parity"
    # always start from an empty workdir (default included) — a stale
    # dir mixes old reference PNGs/scores into the verdict
    shutil.rmtree(base, ignore_errors=True)
    sys.exit(main(base))
