"""Gated integration test against the REAL reference cohort CSVs and
split files (read-only mount at /root/reference).  Skipped when the
mount is absent."""
import os

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference"
BRAIN_CSV = os.path.join(REF, "dataset_csv/brain",
                         "gbmlgg_survival_german_omics.csv")
BRAIN_SPLITS = os.path.join(REF, "splits/brain",
                            "5foldcv_gbmlgg_german_omics_omic")

pytestmark = pytest.mark.skipif(not os.path.exists(BRAIN_CSV),
                                reason="reference mount not available")


def test_real_brain_cohort_loads():
    from multimodalfusion_tpu.data.survival_dataset import SurvivalDataset
    ds = SurvivalDataset(BRAIN_CSV, mode="omic", data_dir=None, n_bins=4)
    assert len(ds.patients) == 1261
    assert len(ds.omics_columns()) == 36
    assert ds.n_bins == 4 and len(ds.bins) == 5
    tr, va = ds.load_splits(os.path.join(BRAIN_SPLITS, "splits_0.csv"))
    assert len(tr) == 666 and len(va) == 74
    # train-fit z-scoring
    assert abs(tr.genomic_features.mean()) < 1e-8


def test_real_brain_omics_training_beats_chance(tmp_path):
    """One fold, few epochs on the real cohort: c-index must already be
    far above chance (IDH1 & co. are strongly prognostic)."""
    from multimodalfusion_tpu.cli.main import main as s2
    rc = s2(["--cancer_type", "brain",
             "--which_splits", "5foldcv_gbmlgg_german_omics_omic",
             "--k", "5", "--k_end", "1", "--max_epochs", "5",
             "--model_type", "max_net", "--mode", "omic",
             "--bag_loss", "cox_surv", "--batch_size", "64",
             "--lr", "1e-3", "--task", "gbmlgg_survival_german_omics",
             "--dataset_root", os.path.join(REF, "dataset_csv"),
             "--splits_root", os.path.join(REF, "splits"),
             "--data_root_dir", str(tmp_path / "features"),
             "--results_dir", str(tmp_path / "results"), "--overwrite"])
    assert rc == 0
    exp = next((tmp_path / "results" / "brain" /
                "5foldcv_gbmlgg_german_omics_omic").iterdir())
    df = pd.read_csv(exp / "summary_partial_0_1.csv")
    assert df["val_cindex"].iloc[0] > 0.65, df


def test_do_split_on_real_cohort(tmp_path):
    """Split generation against the real brain cohort: threemod uses the
    held-out (train==0) German subjects as the test column; pre_trained
    excludes three-modality subjects (ref do_split :173-243)."""
    from multimodalfusion_tpu.data.survival_dataset import SurvivalDataset
    ds = SurvivalDataset(BRAIN_CSV, mode="omic", data_dir=None, n_bins=4)
    splits = ds.do_split("threemod", str(tmp_path / "threemod"), k=5)
    assert len(splits) == 5
    f0 = pd.read_csv(tmp_path / "threemod" / "splits_0.csv")
    assert {"train", "val", "test"} <= set(f0.columns)
    # test column holds the held-out German three-modality subjects
    assert f0["test"].dropna().str.startswith("sfb").all()
    assert not set(f0.train.dropna()) & set(f0.val.dropna())

    ds.do_split("pre_trained", str(tmp_path / "pre"), k=5)
    p0 = pd.read_csv(tmp_path / "pre" / "splits_0.csv")
    threemod_subjects = set(f0.train.dropna()) | set(f0.val.dropna())
    pre_subjects = set(p0.train.dropna()) | set(p0.val.dropna())
    assert not pre_subjects & threemod_subjects  # disjoint by design
