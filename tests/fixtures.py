"""Synthetic cohort + feature-store generator mirroring the reference's
on-disk layout (dataset_csv CSV schema, radio_h5_files/{mod}/{subj}.h5,
path_pt_files/{slide}.pt, {radio,path,omic}_pt_files/{subj}.pt,
splits/splits_{i}.csv)."""
import os

import numpy as np
import pandas as pd

from multimodalfusion_tpu.data.io import ensure_dir, save_hdf5, save_pt

MODALITIES = ["T1", "T2", "T1Gd", "FLAIR"]


def make_cohort_csv(root, n=40, seed=0, modalities=MODALITIES,
                    n_genes=12, signal=True):
    """Cohort CSV with the reference column layout
    (ref dataset_csv/brain/gbmlgg_survival_german_omics.csv header)."""
    rng = np.random.default_rng(seed)
    risk_latent = rng.normal(size=n)
    if signal:
        t = np.exp(2.5 - 1.0 * risk_latent + 0.3 * rng.normal(size=n))
    else:
        t = rng.uniform(1, 100, size=n)
    rows = {
        "subject_id": [f"SUBJ{i:03d}" for i in range(n)],
        "slide_id": [f"SUBJ{i:03d}-SLIDE.svs" for i in range(n)],
        **{m: [f"{m}_file"] * n for m in modalities},
        "oncotree_code": ["GBM"] * n,
        "is_female": rng.integers(0, 2, n).astype(float),
        "age": rng.uniform(30, 80, n).round(1),
        "survival_months": np.round(t, 1),
        "censorship": (rng.uniform(size=n) < 0.3).astype(float),
        "train": np.ones(n, int),
    }
    genes = {}
    for g in range(n_genes):
        col = f"G{g}_mut" if g % 2 else f"G{g}_cnv"
        noise = rng.normal(size=n)
        genes[col] = np.round(risk_latent * (0.5 if signal else 0) + noise, 3)
    df = pd.DataFrame({**rows, **genes})
    ensure_dir(root)
    path = os.path.join(root, "survival.csv")
    df.to_csv(path, index=False)
    return path, df, risk_latent


def make_feature_store(root, df, risk_latent, seed=0, modalities=MODALITIES,
                       bag_range=(8, 40), d=1024):
    """Write radiology h5 and pathology pt bags whose mean encodes the
    latent risk (so models can learn)."""
    rng = np.random.default_rng(seed)
    for m in modalities:
        ensure_dir(os.path.join(root, "radio_h5_files", m))
    ensure_dir(os.path.join(root, "path_pt_files"))
    for i, row in df.iterrows():
        subj = row["subject_id"]
        n_slices = int(rng.integers(*bag_range))
        base = np.zeros(d, np.float32)
        base[:8] = risk_latent[i]
        for m in modalities:
            feats = (rng.normal(size=(n_slices, d)).astype(np.float32) * 0.5
                     + base)
            save_hdf5(os.path.join(root, "radio_h5_files", m, f"{subj}.h5"),
                      {"features": feats,
                       "slice_index": np.arange(n_slices)}, mode="w")
        n_patches = int(rng.integers(*bag_range))
        feats = (rng.normal(size=(n_patches, d)).astype(np.float32) * 0.5
                 + base)
        slide = str(row["slide_id"]).replace(".svs", ".pt")
        save_pt(os.path.join(root, "path_pt_files", slide), feats)


def make_pretrained_store(root, df, risk_latent, seed=0):
    rng = np.random.default_rng(seed)
    for mod in ("radio", "path", "omic"):
        ensure_dir(os.path.join(root, f"{mod}_pt_files"))
    for i, row in df.iterrows():
        subj = row["subject_id"]
        for mod in ("radio", "path", "omic"):
            e = rng.normal(size=256).astype(np.float32) * 0.3
            e[:8] += risk_latent[i]
            save_pt(os.path.join(root, f"{mod}_pt_files", f"{subj}.pt"), e)


def make_splits(root, df, k=2, val_frac=0.3, seed=0, test_frac=0.0):
    """Disjoint rotating folds from one permutation (every subject is
    validated exactly once across folds, like real k-fold split files);
    columns are padded to a common length, never truncated."""
    rng = np.random.default_rng(seed)
    ensure_dir(root)
    perm = rng.permutation(df["subject_id"].values)
    n = len(perm)
    n_val = max(int(n * val_frac), 1)
    n_test = int(n * test_frac)
    test = perm[:n_test]          # fixed held-out test set
    pool = perm[n_test:]
    for i in range(k):
        lo = (i * n_val) % max(len(pool) - n_val + 1, 1)
        val = pool[lo:lo + n_val]
        train = np.array([s for s in pool if s not in set(val)])
        width = max(len(train), len(val), len(test))

        def pad(ids):
            return np.append(ids.astype(object),
                             [np.nan] * (width - len(ids)))
        cols = {"train": pad(train), "val": pad(val)}
        if test_frac:
            cols["test"] = pad(test)
        pd.DataFrame(cols).to_csv(os.path.join(root, f"splits_{i}.csv"),
                                  index=False)
