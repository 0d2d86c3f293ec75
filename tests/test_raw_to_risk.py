"""Raw-images-to-risk: the ENTIRE 6-stage pipeline through the CLIs on
one synthetic cohort starting from pixels — TIFF slides, DICOM CT
series (native reader), and a genomic CSV:

  stage 0  create_patches        slides/*.tiff -> patches/*.h5 coords
  stage 1a extract_features_fp   coords + slides -> path_pt_files bags
  stage 1b feature_extraction    DICOM series -> radio_h5_files/CT
  stage 2  main                  path AMIL / radio AMIL / omic MaxNet
  stage 3  pre_trained_feature   256-d {path,radio,omic}_pt_files
  stage 4  main_pretrained       trimodal mm head + eval_pretrained IBS
  stage 5  create_attributions   per-modality IG attr.csv

Imaging features come from a RANDOM ResNet (no ImageNet weights in the
image), so the assertions are plumbing and format contracts, not
accuracy; the genomic arm carries real signal."""
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from multimodalfusion_tpu.data import dicom, wsi
from multimodalfusion_tpu.data.io import ensure_dir

N_SUBJ = 12


@pytest.fixture(scope="module")
def raw_base(tmp_path_factory):
    b = tmp_path_factory.mktemp("raw")
    rng = np.random.default_rng(17)
    slides_dir = ensure_dir(str(b / "slides"))
    scans_dir = ensure_dir(str(b / "scans"))

    risk_latent = rng.normal(size=N_SUBJ)
    t = np.exp(2.5 - risk_latent + 0.3 * rng.normal(size=N_SUBJ))
    rows = {
        "subject_id": [f"R{i:03d}" for i in range(N_SUBJ)],
        "slide_id": [f"R{i:03d}.tiff" for i in range(N_SUBJ)],
        "CT": [f"R{i:03d}/ct" for i in range(N_SUBJ)],
        "oncotree_code": ["LUAD"] * N_SUBJ,
        "is_female": rng.integers(0, 2, N_SUBJ).astype(float),
        "age": rng.uniform(40, 80, N_SUBJ).round(1),
        "survival_months": np.round(t, 1),
        "censorship": (rng.uniform(size=N_SUBJ) < 0.25).astype(float),
        "train": np.ones(N_SUBJ, int),
    }
    for g in range(8):
        rows[f"G{g}_mut"] = np.round(
            risk_latent * 0.6 + rng.normal(size=N_SUBJ), 3)
    df = pd.DataFrame(rows)
    ensure_dir(str(b / "dataset_csv" / "lung"))
    csv_path = str(b / "dataset_csv" / "lung" / "survival.csv")
    df.to_csv(csv_path, index=False)

    # raw pixels: one small pyramidal-ish TIFF slide + one DICOM CT
    # series per subject
    for i, subj in enumerate(df["subject_id"]):
        slide = wsi.synthetic_slide(1024, 768, n_blobs=2, seed=100 + i)
        img = slide.read_region((0, 0), 0, slide.level_dimensions[0])
        Image.fromarray(img).save(os.path.join(slides_dir,
                                               f"{subj}.tiff"))
        d = ensure_dir(os.path.join(scans_dir, subj, "ct"))
        vol = np.full((6, 64, 64), -1000, np.int16)
        vol[:, 10:54, 10:54] = 40
        vol[:, 18:46, 14:30] = -850
        vol[:, 18:46, 34:50] = -850
        vol += rng.integers(-5, 5, vol.shape).astype(np.int16)
        # mixed transfer syntaxes across subjects: the native reader
        # must ingest uncompressed, RLE and deflated series alike
        compression = [None, "rle", "deflated"][i % 3]
        for z in range(vol.shape[0]):
            dicom.write_ct_slice(os.path.join(d, f"s{z}.dcm"),
                                 vol[z] + 1024, z=z * 2.0,
                                 spacing=(1.5, 1.5), thickness=2.0,
                                 intercept=-1024.0,
                                 compression=compression)

    # fold splits over all subjects
    from fixtures import make_splits
    make_splits(str(b / "splits" / "lung" / "2foldcv"), df, k=2,
                val_frac=0.3, seed=17)
    return b, df


def _stage_args(b, extra):
    return ["--cancer_type", "lung", "--which_splits", "2foldcv",
            "--k", "2", "--n_classes", "4", "--max_epochs", "3",
            "--modality", "CT",
            "--data_root_dir", str(b / "features"),
            "--dataset_root", str(b / "dataset_csv"),
            "--splits_root", str(b / "splits"),
            "--overwrite"] + extra


def test_raw_to_risk_full_pipeline(raw_base):
    b, df = raw_base

    # ---- stage 0: WSI patching --------------------------------------
    from multimodalfusion_tpu.cli.create_patches import main as s0
    pl = str(b / "pl.csv")
    pd.DataFrame({"slide_id": df["slide_id"],
                  "a_t": 0.5, "a_h": 0.05}).to_csv(pl, index=False)
    assert s0(["--source", str(b / "slides"),
               "--save_dir", str(b / "wsi_out"),
               "--patch_size", "224", "--step_size", "224",
               "--seg", "--patch", "--process_list", pl]) == 0
    h5s = os.listdir(str(b / "wsi_out" / "patches"))
    assert len(h5s) == N_SUBJ

    # ---- stage 1a: histology features -------------------------------
    from multimodalfusion_tpu.cli.extract_features_fp import main as s1a
    assert s1a(["--data_h5_dir", str(b / "wsi_out"),
                "--data_slide_dir", str(b / "slides"),
                "--feat_dir", str(b / "features" / "lung"),
                "--slide_ext", ".tiff", "--batch_size", "32",
                "--allow_random_weights"]) == 0
    pt_dir = str(b / "features" / "lung" / "path_pt_files")
    assert len(os.listdir(pt_dir)) == N_SUBJ

    # ---- stage 1b: radiology features (native DICOM) ----------------
    from multimodalfusion_tpu.cli.feature_extraction import main as s1b
    assert s1b(["--radio_dir", str(b / "scans"),
                "--csv_path", str(b / "dataset_csv" / "lung" /
                                  "survival.csv"),
                "--output_dir", str(b / "radio_out"),
                "--cancer_type", "lung", "--batch_size", "16",
                "--allow_random_weights"]) == 0
    import shutil
    shutil.copytree(str(b / "radio_out" / "lung" / "radio_h5_files"),
                    str(b / "features" / "lung" / "radio_h5_files"))

    # ---- stage 2: unimodal training ---------------------------------
    from multimodalfusion_tpu.cli.main import main as s2
    arms = {
        "path": ["--mode", "path", "--model_type", "path_attention_mil",
                 "--bag_loss", "nll_surv", "--batch_size", "4",
                 "--gate_path"],
        "radio": ["--mode", "radio", "--model_type",
                  "radio_attention_mil", "--bag_loss", "nll_surv",
                  "--batch_size", "4", "--gate_radio",
                  "--radio_fusion", "concat"],
        "omic": ["--mode", "omic", "--model_type", "max_net",
                 "--bag_loss", "cox_surv", "--batch_size", "8"],
    }
    exps = {}
    for arm, flags in arms.items():
        assert s2(_stage_args(
            b, flags + ["--results_dir", str(b / "s2")])) == 0
        root = b / "s2" / "lung" / "2foldcv"
        exps[arm] = [d for d in root.iterdir()
                     if d.name.startswith(
                         {"path": "PATH", "radio": "RADIO",
                          "omic": "OMICS"}[arm])][0]

    # ---- stage 4.5 -> 5 bridge: summarize emits a heatmap YAML and
    # create_heatmaps consumes it unmodified (ref generate_heatmap_yamls,
    # evaluation.py:734-786) --------------------------------------------
    from multimodalfusion_tpu.cli.create_heatmaps import main as hm
    from multimodalfusion_tpu.cli.summarize import main as sm
    cfg_dir = b / "hm_cfgs"
    assert sm(["--results_root", str(b / "s2"),
               "--save_dir", str(b / "s2_report"),
               "--emit_heatmap_yamls", str(cfg_dir)]) == 0
    omic_cfgs = sorted(cfg_dir.glob("heatmap_config_*OMICS*.yaml"))
    assert len(omic_cfgs) == 1  # best fold only
    assert hm(["--config", str(omic_cfgs[0])]) == 0
    import yaml
    hm_save = yaml.safe_load(open(omic_cfgs[0]))["exp_arguments"][
        "save_dir"]
    assert os.path.getsize(
        os.path.join(hm_save, "omic_attr_beeswarm.png")) > 1000
    attr_glob = pd.read_csv(os.path.join(hm_save,
                                         "omic_attr_global.csv"))
    assert len(attr_glob) == 8  # one row per gene

    # ---- stage 3: 256-d embeddings ----------------------------------
    from multimodalfusion_tpu.cli.pre_trained_feature import main as s3
    for arm, exp in exps.items():
        assert s3(["--checkpoint_path", str(exp),
                   "--output_dir", str(b / "embed"),
                   "--which_k", "0"]) == 0
        sub = str(b / "embed" / "lung" / f"{arm}_pt_files")
        assert len(os.listdir(sub)) == N_SUBJ

    # ---- stage 4: trimodal fusion head + eval -----------------------
    from multimodalfusion_tpu.cli.eval_pretrained import main as s4e
    from multimodalfusion_tpu.cli.main_pretrained import main as s4
    assert s4(_stage_args(b, [
        "--mode", "radio_path_omic", "--model_type", "mm_attention_mil",
        "--train_type", "early-fcnn", "--bag_loss", "nll_surv",
        "--batch_size", "4",
        "--data_root_dir", str(b / "embed"),
        "--results_dir", str(b / "s4")])) == 0
    exp4 = [d for d in (b / "s4" / "lung" / "2foldcv").iterdir()
            if d.name.startswith("MMF")][0]
    summary = pd.read_csv(exp4 / "summary.csv")
    assert len(summary) == 2
    assert np.isfinite(summary["val_cindex"]).all()
    cwd = os.getcwd()
    os.chdir(str(b))  # experiment txt stores cwd-relative paths
    try:
        assert s4e(["--model_path", str(exp4),
                    "--results_dir", str(b / "s4eval")]) == 0
    finally:
        os.chdir(cwd)

    # ---- stage 5: modality attributions -----------------------------
    from multimodalfusion_tpu.cli.create_attributions import main as s5
    cwd = os.getcwd()
    os.chdir(str(b))  # experiment txt stores cwd-relative paths
    try:
        assert s5(["--model_path", str(exp4),
                   "--save_dir", str(b / "attr")]) == 0
    finally:
        os.chdir(cwd)
    attr = pd.read_csv(next((b / "attr").rglob("attr.csv")))
    assert {"radio_attr", "path_attr", "omic_attr"} <= set(attr.columns)
    assert len(attr) >= N_SUBJ // 2  # every val subject, folds pooled

    # ---- serving: label-free scoring of the stage-4 fusion head -----
    from multimodalfusion_tpu.cli.infer import main as s_infer
    out_csv = b / "risks_s4.csv"
    assert s_infer(["--model_path", str(exp4), "--which_k", "0",
                    "--out", str(out_csv)]) == 0
    risks = pd.read_csv(out_csv)
    assert len(risks) == N_SUBJ
    assert np.isfinite(risks["risk"]).all()
    assert "hazard_0" in risks.columns  # nll family exports hazards/S
