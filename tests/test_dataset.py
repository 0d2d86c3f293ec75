"""Data layer: CSV parsing, splits, bag loading, batching."""
import os

import numpy as np
import pandas as pd
import pytest

from multimodalfusion_tpu.data.bags import bucket_len, intersect_slices, \
    pad_bags
from multimodalfusion_tpu.data.loaders import iter_batches, usable_indices
from multimodalfusion_tpu.data.survival_dataset import SurvivalDataset

from fixtures import make_cohort_csv, make_feature_store, \
    make_pretrained_store, make_splits


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cohort"))
    csv_path, df, latent = make_cohort_csv(root, n=30)
    make_feature_store(root, df, latent, bag_range=(5, 20))
    make_pretrained_store(root, df, latent)
    make_splits(os.path.join(root, "splits"), df, k=2)
    return root, csv_path, df


def test_bucket_len():
    assert bucket_len(1) == 128
    assert bucket_len(128) == 128
    assert bucket_len(129) == 256
    assert bucket_len(70000) == 131072


def test_pad_bags():
    bags = [np.ones((5, 4)), None, np.ones((200, 4))]
    out, mask = pad_bags(bags, 4)
    assert out.shape == (3, 256, 4)
    assert mask.sum() == 205
    assert mask[1].sum() == 0


def test_intersect_slices():
    f1 = np.arange(12).reshape(4, 3).astype(float)
    f2 = np.arange(9).reshape(3, 3).astype(float) + 100
    out = intersect_slices([f1, f2],
                           [np.array([0, 1, 2, 3]), np.array([1, 2, 3])])
    assert out.shape == (3, 6)
    np.testing.assert_array_equal(out[:, :3], f1[1:])


def test_intersect_slices_id_exact_alignment():
    """Modalities storing slices in different orders must still pair rows
    by slice id, not by position (the reference's mask recipe misaligns)."""
    ids1 = np.array([3, 1, 2])
    ids2 = np.array([1, 2, 3, 9])
    f1 = np.array([[30.0], [10.0], [20.0]])   # value = 10 * id
    f2 = np.array([[1.0], [2.0], [3.0], [9.0]])  # value = id
    out, common = intersect_slices([f1, f2], [ids1, ids2], return_ids=True)
    np.testing.assert_array_equal(common, [1, 2, 3])
    np.testing.assert_array_equal(out,
                                  [[10.0, 1.0], [20.0, 2.0], [30.0, 3.0]])


def test_intersect_slices_rejects_duplicates():
    f = np.zeros((3, 2))
    with pytest.raises(ValueError, match="duplicate"):
        intersect_slices([f, f], [np.array([1, 1, 2]), np.array([1, 2, 3])])


def test_dataset_binning_and_dicts(store):
    root, csv_path, df = store
    ds = SurvivalDataset(csv_path, mode="omic", data_dir=root, n_bins=4)
    assert ds.n_bins == 4
    assert ds.num_classes == 8  # (bin, censorship) pairs
    assert len(ds.bins) == 5
    assert len(ds.slides_dict) == len(df)


def test_split_loading_and_scaler(store):
    root, csv_path, df = store
    ds = SurvivalDataset(csv_path, mode="omic", data_dir=root, n_bins=4)
    train, val = ds.load_splits(os.path.join(root, "splits", "splits_0.csv"))
    assert len(train) + len(val) == len(df)
    # train genomics are z-scored with the train-fit scaler
    assert abs(train.genomic_features.mean()) < 1e-8
    # val uses the SAME scaler (not its own)
    assert abs(val.genomic_features.mean()) > 1e-8 or len(val) == 0


def test_raw_sample_loading(store):
    root, csv_path, df = store
    ds = SurvivalDataset(csv_path, mode="radio_path_omic", data_dir=root,
                         n_bins=4)
    split = ds.whole_split()
    s = split.get_sample(0)
    assert s.radio is not None and s.radio.shape[1] == 4 * 1024
    assert s.path is not None and s.path.shape[1] == 1024
    assert s.omic is not None and s.omic.shape == (12,)
    assert s.present == {"radio": True, "path": True, "omic": True}


def test_pretrained_sample_loading(store):
    root, csv_path, df = store
    ds = SurvivalDataset(csv_path, mode="radio_path_omic", data_dir=root,
                         n_bins=4, pretrained=True)
    split = ds.whole_split()
    s = split.get_sample(3)
    assert s.h_radio.shape == (256,)
    # omic embedding min-max normalized into [0, 1] (ref :416)
    assert 0.0 <= s.h_omic.min() and s.h_omic.max() <= 1.0


def test_iter_batches_shapes(store):
    root, csv_path, df = store
    ds = SurvivalDataset(csv_path, mode="radio_path_omic", data_dir=root,
                         n_bins=4)
    split = ds.whole_split()
    batches = list(iter_batches(split, batch_size=8))
    assert sum(int(b["valid"].sum()) for b in batches) == len(df)
    b = batches[0]
    assert b["radio_bags"].shape[0] == 8
    assert b["radio_bags"].shape[2] == 4096
    assert b["path_bags"].shape[2] == 1024
    assert b["genomic"].shape == (8, 12)
    assert set(np.unique(b["radio_mask"])) <= {0.0, 1.0}


def test_missing_modality_filtering(store, tmp_path):
    root, csv_path, df = store
    # remove one subject's path bag
    victim = df["subject_id"].iloc[5]
    os.rename(os.path.join(root, "path_pt_files", f"{victim}-SLIDE.pt"),
              os.path.join(root, "path_pt_files", f"{victim}-SLIDE.pt.bak"))
    try:
        ds = SurvivalDataset(csv_path, mode="path", data_dir=root, n_bins=4)
        split = ds.whole_split()
        idx = usable_indices(split)
        assert len(idx) == len(df) - 1
    finally:
        os.rename(os.path.join(root, "path_pt_files", f"{victim}-SLIDE.pt.bak"),
                  os.path.join(root, "path_pt_files", f"{victim}-SLIDE.pt"))


def test_do_split_writes_csvs(store, tmp_path):
    root, csv_path, df = store
    ds = SurvivalDataset(csv_path, mode="omic", data_dir=root, n_bins=2)
    out = ds.do_split("threemod", str(tmp_path / "sp"), k=2)
    assert len(out) == 2
    f = pd.read_csv(tmp_path / "sp" / "splits_0.csv")
    assert {"train", "val"} <= set(f.columns)
    # no overlap between train and val
    assert not set(f["train"].dropna()) & set(f["val"].dropna())


def test_weighted_sampling_balances(store):
    root, csv_path, df = store
    ds = SurvivalDataset(csv_path, mode="omic", data_dir=root, n_bins=4)
    split = ds.whole_split()
    w = split.class_weights()
    assert w.shape == (len(df),)
    assert np.all(w > 0)


def test_prefetch_iterator(store):
    from multimodalfusion_tpu.data.loaders import iter_batches, prefetch
    root, csv_path, df = store
    ds = SurvivalDataset(csv_path, mode="omic", data_dir=root, n_bins=4)
    split = ds.whole_split()
    direct = list(iter_batches(split, batch_size=8))
    fetched = list(prefetch(
        iter_batches(split, batch_size=8, reuse_collation_buffers=False),
        depth=2))
    assert len(fetched) == len(direct)
    np.testing.assert_array_equal(fetched[0]["genomic"],
                                  direct[0]["genomic"])


def test_prefetch_propagates_errors():
    from multimodalfusion_tpu.data.loaders import prefetch

    def boom():
        yield 1
        raise RuntimeError("loader died")

    it = prefetch(boom(), depth=1)
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="loader died"):
        next(it)


def test_prefetch_releases_worker_on_abandonment():
    """Closing the consumer mid-stream must unblock the worker thread
    (previously it sat forever on q.put with the queue full, pinning
    collated batches)."""
    import threading
    import time
    from multimodalfusion_tpu.data.loaders import prefetch

    n_before = threading.active_count()

    def src():
        for i in range(1000):
            yield np.zeros(1000, np.float32)

    it = prefetch(src(), depth=1)
    assert next(it) is not None
    it.close()  # triggers GeneratorExit -> finally -> stop event
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before, "worker thread leaked"


def test_probe_present_matches_full_load(store):
    """usable_indices now filters via probe_present (file existence only);
    it must agree with the presence flags the full loader computes."""
    root, csv_path, df = store
    victim = df["subject_id"].iloc[2]
    os.rename(os.path.join(root, "radio_h5_files", "T2", f"{victim}.h5"),
              os.path.join(root, "radio_h5_files", "T2", f"{victim}.h5.bak"))
    try:
        ds = SurvivalDataset(csv_path, mode="radio_path_omic",
                             data_dir=root, n_bins=4)
        split = ds.whole_split()
        for i in range(len(split)):
            probed = split.probe_present(i)
            loaded = split.get_sample(i).present
            assert probed == loaded, f"mismatch at {i}"
        assert not split.probe_present(2)["radio"]
        assert 2 not in usable_indices(split)
    finally:
        os.rename(
            os.path.join(root, "radio_h5_files", "T2", f"{victim}.h5.bak"),
            os.path.join(root, "radio_h5_files", "T2", f"{victim}.h5"))


def test_duplicate_slice_ids_degrade_to_missing(store, tmp_path):
    """A corrupt radio h5 (duplicate slice ids) must not crash training:
    the loader warns and treats the modality as missing (the probe still
    admits the sample -- it checks existence only)."""
    from multimodalfusion_tpu.data.io import save_hdf5
    root, csv_path, df = store
    victim = df["subject_id"].iloc[4]
    h5 = os.path.join(root, "radio_h5_files", "T1", f"{victim}.h5")
    bak = h5 + ".bak"
    os.rename(h5, bak)
    try:
        save_hdf5(h5, {"features": np.zeros((3, 1024), np.float32),
                       "slice_index": np.array([1, 1, 2])}, mode="w")
        ds = SurvivalDataset(csv_path, mode="radio", data_dir=root,
                             n_bins=4)
        split = ds.whole_split()
        assert split.probe_present(4)["radio"]      # files exist
        s = split.get_sample(4)                     # must not raise
        assert s.radio is None and not s.present["radio"]
    finally:
        os.replace(bak, h5)


def test_probe_present_reads_no_bytes(store, monkeypatch):
    """The probe must be pure metadata: no h5/pt payload reads."""
    from multimodalfusion_tpu.data import io as io_mod
    root, csv_path, df = store

    def _boom(*a, **k):
        raise AssertionError("probe_present must not load arrays")

    monkeypatch.setattr(io_mod, "load_features_h5", _boom)
    monkeypatch.setattr(io_mod, "load_pt", _boom)
    ds = SurvivalDataset(csv_path, mode="radio_path_omic", data_dir=root,
                         n_bins=4)
    split = ds.whole_split()
    idx = usable_indices(split)
    assert len(idx) == len(df)


def test_make_splits_disjoint_folds(tmp_path):
    """Fixture splits: every subject validated exactly once across folds;
    small-train configurations must not crash or drop subjects."""
    from fixtures import make_cohort_csv, make_splits
    _, df, _ = make_cohort_csv(str(tmp_path), n=20, seed=5)
    make_splits(str(tmp_path / "sp"), df, k=3, val_frac=0.3, seed=5)
    vals = []
    for i in range(3):
        f = pd.read_csv(tmp_path / "sp" / f"splits_{i}.csv")
        assert not set(f.train.dropna()) & set(f.val.dropna())
        vals.append(set(f.val.dropna()))
    # disjoint val sets across folds
    assert not (vals[0] & vals[1]) and not (vals[1] & vals[2])
    # val larger than train must not crash (previously ValueError)
    make_splits(str(tmp_path / "sp2"), df, k=1, val_frac=0.6, seed=5)
    f = pd.read_csv(tmp_path / "sp2" / "splits_0.csv")
    assert len(set(f.val.dropna())) == 12


def test_all_nan_genomic_column_raises(tmp_path):
    """A scan-path column not excluded via `modalities` (e.g. lung CT
    without --modality CT) is all-NaN for omics cohorts and marks every
    subject omic-absent — the split warns and records the columns, and
    the engine raises a pointed error when the train split is empty."""
    import pandas as pd
    import pytest as _pytest
    from multimodalfusion_tpu.data.survival_dataset import SurvivalDataset
    n = 12
    df = pd.DataFrame({
        "subject_id": [f"S{i}" for i in range(n)],
        "slide_id": [f"S{i}.svs" for i in range(n)],
        "CT": [np.nan] * n,                      # scan-path column
        "oncotree_code": ["LUAD"] * n,
        "is_female": np.zeros(n),
        "age": np.full(n, 60.0),
        "survival_months": np.linspace(5, 90, n),
        "censorship": np.zeros(n),
        "train": np.ones(n, int),
        "G0_mut": np.linspace(-1, 1, n),
    })
    csv = tmp_path / "lung.csv"
    df.to_csv(csv, index=False)
    sp = pd.DataFrame({"train": [f"S{i}" for i in range(8)],
                       "val": [f"S{i}" for i in range(8, 12)] + [None] * 4})
    sp_csv = tmp_path / "splits_0.csv"
    sp.to_csv(sp_csv, index=False)

    ds = SurvivalDataset(str(csv), mode="omic", data_dir=str(tmp_path),
                         n_bins=2, modalities=["T1"])
    tr, va = ds.load_splits(str(sp_csv))
    assert tr.all_nan_genomic_cols == ["CT"]
    from multimodalfusion_tpu.data.loaders import usable_indices
    assert usable_indices(tr) == []
    from multimodalfusion_tpu.engine.train import TrainConfig, train_fold
    with _pytest.raises(ValueError, match="CT"):
        train_fold((tr, va), 0, TrainConfig(
            model_type="max_net", mode="omic", bag_loss="cox_surv",
            batch_size=4, results_dir=str(tmp_path / "res")))
    # excluding the column via modalities makes the same cohort load
    ds2 = SurvivalDataset(str(csv), mode="omic", data_dir=str(tmp_path),
                          n_bins=2, modalities=["CT"])
    tr, va = ds2.load_splits(str(sp_csv))
    assert len(tr) == 8 and len(va) == 4
    assert tr.all_nan_genomic_cols == []


def test_custom_label_col_not_leaked_into_genomics(store, tmp_path):
    """With a non-default label_col, the survival-time column must be
    treated as metadata — otherwise the label leaks into the genomic
    features (the model would train on a z-scored copy of its target)."""
    root, csv_path, df = store
    df2 = pd.read_csv(csv_path)
    df2["os_days"] = df2["survival_months"] * 30.4
    p2 = str(tmp_path / "cohort_days.csv")
    df2.to_csv(p2, index=False)
    ds = SurvivalDataset(p2, mode="omic", data_dir=root, n_bins=4,
                         label_col="os_days")
    split = ds.whole_split()
    assert "os_days" not in split.genomic_cols
    # the default-name column keeps its metadata status too
    assert "survival_months" not in split.genomic_cols
    base = SurvivalDataset(csv_path, mode="omic", data_dir=root, n_bins=4)
    assert split.genomic_cols == base.whole_split().genomic_cols
