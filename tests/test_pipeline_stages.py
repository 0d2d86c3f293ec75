"""Full multi-stage pipeline integration: stage-2 unimodal training ->
stage-3 embedding extraction -> stage-4 fusion-head training -> eval
with IBS, all through the CLIs on one synthetic cohort."""
import os

import numpy as np
import pandas as pd
import pytest

from fixtures import make_cohort_csv, make_feature_store, make_splits

from multimodalfusion_tpu.cli.eval_pretrained import main as eval_main
from multimodalfusion_tpu.cli.main import main as s2_main
from multimodalfusion_tpu.cli.main_pretrained import main as s4_main
from multimodalfusion_tpu.cli.pre_trained_feature import main as extract_main
from multimodalfusion_tpu.data.io import load_pt


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    b = tmp_path_factory.mktemp("pipeline")
    csv_path, df, latent = make_cohort_csv(
        str(b / "dataset_csv" / "brain"), n=50, seed=11)
    make_feature_store(str(b / "features" / "brain"), df, latent, seed=11,
                       bag_range=(5, 20))
    make_splits(str(b / "splits" / "brain" / "2foldcv"), df, k=2,
                val_frac=0.3, seed=11)
    return b, df


def _common(b, results_sub):
    return ["--cancer_type", "brain", "--which_splits", "2foldcv",
            "--k", "2", "--data_root_dir", str(b / "features"),
            "--dataset_root", str(b / "dataset_csv"),
            "--splits_root", str(b / "splits"),
            "--results_dir", str(b / results_sub), "--overwrite"]


def test_full_pipeline(base):
    b, df = base

    # ---- stage 2: train unimodal models -------------------------------
    for model_type, mode, extra in [
            ("max_net", "omic", ["--bag_loss", "nll_surv",
                                 "--batch_size", "16"]),
            ("path_attention_mil", "path", ["--bag_loss", "nll_surv",
                                            "--batch_size", "4"]),
            ("radio_attention_mil", "radio", ["--bag_loss", "nll_surv",
                                              "--radio_fusion", "concat",
                                              "--batch_size", "4"])]:
        rc = s2_main(_common(b, f"s2_{mode}") + [
            "--model_type", model_type, "--mode", mode, "--max_epochs", "4",
            "--lr", "1e-3"] + extra)
        assert rc == 0

    # ---- stage 3: extract pretrained embeddings into a separate root
    # (ref pre_trained_feature.py default output_dir='pretrained_feature')
    pre_root = b / "pretrained_feature"
    for mode in ("omic", "path", "radio"):
        exp_dir = next((b / f"s2_{mode}" / "brain" / "2foldcv").iterdir())
        rc = extract_main(["--checkpoint_path", str(exp_dir),
                           "--which_k", "0",
                           "--output_dir", str(pre_root),
                           "--batch_size", "8"])
        assert rc == 0
        out_dir = pre_root / "brain" / f"{mode}_pt_files"
        files = list(out_dir.glob("*.pt"))
        assert len(files) == len(df), (mode, len(files))
        emb = load_pt(str(files[0]))
        assert emb.reshape(-1).shape == (256,)

    # ---- stage 4: train fusion head on embeddings ---------------------
    rc = s4_main(_common(b, "s4") + [
        "--model_type", "mm_attention_mil", "--mode", "radio_path_omic",
        "--train_type", "early-fcnn", "--bag_loss", "nll_surv",
        "--batch_size", "16", "--max_epochs", "8", "--lr", "1e-3",
        "--data_root_dir", str(pre_root)])
    assert rc == 0
    exp = next((b / "s4" / "brain" / "2foldcv").iterdir())
    summary = pd.read_csv(exp / "summary.csv")
    assert summary["val_cindex"].mean() > 0.6, summary

    # reference-shaped .pt side-export for the stage-4 head (ref checkpoint
    # names s_{k}_checkpoint.pt, core_utils_pretrained.py): early-fcnn nll =
    # Sequential(Linear, BN, ReLU, Dropout, Linear) incl. BN running stats
    import torch
    sd = torch.load(exp / "s_0_checkpoint.pt", map_location="cpu",
                    weights_only=True)
    assert "classifier.0.weight" in sd and "classifier.4.weight" in sd
    assert "classifier.1.running_mean" in sd, sorted(sd)

    # ---- eval with IBS ------------------------------------------------
    rc = eval_main(["--model_path", str(exp)])
    assert rc == 0
    ev = pd.read_csv(exp / "eval_summary.csv")
    assert {"val_cindex", "val_ibs"} <= set(ev.columns)
    assert np.isfinite(ev["val_ibs"]).all()
    assert 0.0 < ev["val_ibs"].mean() < 0.5, ev  # sane Brier range
    assert (exp / "eval_val_0_results.pkl").exists()

    # re-running refuses unless --overwrite (ref eval_pretrained.py:101,
    # 160-162): the existing summary must survive a guarded rerun
    sig = (exp / "eval_summary.csv").read_bytes()
    (exp / "eval_summary.csv").write_bytes(b"sentinel")
    rc = eval_main(["--model_path", str(exp)])
    assert rc == 0
    assert (exp / "eval_summary.csv").read_bytes() == b"sentinel"
    rc = eval_main(["--model_path", str(exp), "--overwrite"])
    assert rc == 0
    assert pd.read_csv(exp / "eval_summary.csv").equals(ev)
    del sig


def test_unimodal_pretrained_head(base):
    b, df = base
    # unimodal head on the omic embeddings written by test_full_pipeline
    rc = s4_main(_common(b, "s4_uni") + [
        "--model_type", "max_net", "--mode", "omic",
        "--train_type", "fcnn", "--bag_loss", "cox_surv",
        "--batch_size", "16", "--max_epochs", "6", "--lr", "1e-3",
        "--data_root_dir", str(b / "pretrained_feature")])
    assert rc == 0
    exp = next((b / "s4_uni" / "brain" / "2foldcv").iterdir())
    summary = pd.read_csv(exp / "summary.csv")
    assert np.isfinite(summary["val_cindex"]).all()

    # coxranking fcnn head .pt export (ref coxranking_models_pretrained.py:23)
    import torch
    sd = torch.load(exp / "s_0_checkpoint.pt", map_location="cpu",
                    weights_only=True)
    assert {"classifier.0.weight", "classifier.1.running_var",
            "classifier.4.weight"} <= set(sd)
import importlib

import pytest


CLI_MODULES = [
    "create_attributions", "create_heatmaps", "create_patches",
    "doctor", "eval_pretrained", "export_model", "extract_features_fp",
    "feature_extraction", "gradcam", "infer", "main", "main_pretrained",
    "pre_trained_feature", "summarize",
]


@pytest.mark.parametrize("name", CLI_MODULES)
def test_cli_module_imports_and_helps(name, capsys):
    """Every reference-parity entry point imports and prints --help
    with exit code 0: a broken import or a duplicate/invalid argparse
    flag in ANY CLI fails here in milliseconds instead of surfacing
    only when that stage is next exercised."""
    mod = importlib.import_module(f"multimodalfusion_tpu.cli.{name}")
    assert hasattr(mod, "main"), name
    with pytest.raises(SystemExit) as exc:
        mod.main(["--help"])
    assert exc.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()
