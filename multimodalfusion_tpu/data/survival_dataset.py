"""Cohort CSV parsing, splits, and per-sample feature loading.

Functional rewrite of ref datasets/dataset_survival.py: one
``SurvivalDataset`` handles both the raw-bag stage (stage 2,
``Generic_MIL_Survival_Dataset``) and the pretrained-embedding stage
(stage 4, ``Generic_MIL_Survival_Dataset_Pretrained``) via
``pretrained=True``.

Missing modalities are represented as ``None`` (raw bags) or zero
embeddings with a presence flag (pretrained), replacing the reference's
``torch.zeros((1,1))`` sentinel (ref dataset_survival.py:337-378).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from multimodalfusion_tpu.data import labels as labels_mod
from multimodalfusion_tpu.data import io

METADATA_BASE = ["subject_id", "label", "disc_label", "slide_id"]
METADATA_TAIL = ["oncotree_code", "is_female", "age", "survival_months",
                 "censorship", "train"]


@dataclass
class Sample:
    subject_id: str
    disc_label: int
    event_time: float
    censorship: float
    radio: Optional[np.ndarray] = None     # [N, n_mod * D] aligned bag
    path: Optional[np.ndarray] = None      # [N, D] bag
    omic: Optional[np.ndarray] = None      # [G]
    # pretrained embeddings (stage 4)
    h_radio: Optional[np.ndarray] = None   # [256]
    h_path: Optional[np.ndarray] = None
    h_omic: Optional[np.ndarray] = None
    present: Dict[str, bool] = field(default_factory=dict)


def _slide_pt_name(slide_id) -> str:
    """slide_id -> its per-slide bag filename.  The reference stores
    '{slide_stem}.pt' for .svs slides (dataset_survival.py:355-367); any
    known slide extension maps the same way so non-.svs sources (tiff,
    ndpi, png test slides) resolve their bags too."""
    sid = str(slide_id)
    stem, ext = os.path.splitext(sid)
    if ext.lower() in (".svs", ".tiff", ".tif", ".ndpi", ".png", ".jpg",
                       ".mrxs", ".pt"):
        return stem + ".pt"
    return sid + ".pt"


class Split:
    """A view over a subset of patients with lazy feature loading."""

    def __init__(self, df: pd.DataFrame, dataset: "SurvivalDataset"):
        self.df = df.reset_index(drop=True)
        self.ds = dataset
        genomic_cols = [c for c in df.columns
                        if c not in dataset.metadata]
        self.genomic_cols = genomic_cols
        self.genomic_features = self.df[genomic_cols].to_numpy(
            dtype=np.float64, na_value=np.nan)
        # a column that is ALL-NaN across the split is usually a
        # scan-path column not excluded by `modalities` (e.g. running the
        # lung cohort without --modality CT); it marks EVERY subject
        # omic-absent, so warn loudly (the engine raises a pointed error
        # if a train split ends up with no usable samples)
        self.all_nan_genomic_cols: List[str] = []
        if len(self.df) and "omic" in dataset.mode \
                and not dataset.pretrained:
            all_nan = np.isnan(self.genomic_features).all(axis=0)
            if all_nan.any():
                self.all_nan_genomic_cols = [
                    c for c, b in zip(genomic_cols, all_nan) if b]
                print(f"WARNING: genomic columns "
                      f"{self.all_nan_genomic_cols} are entirely NaN in "
                      f"this split — every subject will be treated as "
                      f"omic-absent; if they are scan-path columns, "
                      f"exclude them via --modality (dataset modalities="
                      f"{dataset.modalities})")
        self._scaler_mean = None
        self._scaler_std = None

    def __len__(self):
        return len(self.df)

    # -- genomic z-scoring (ref Split.get_scaler/apply_scaler :461-466) --
    def get_scaler(self):
        from sklearn.preprocessing import StandardScaler
        return StandardScaler().fit(self.genomic_features)

    def apply_scaler(self, scaler):
        self.genomic_features = scaler.transform(self.genomic_features)

    @property
    def labels(self) -> np.ndarray:
        return self.df["label"].to_numpy()

    def class_weights(self) -> np.ndarray:
        """Per-sample weights for balanced sampling (ref
        utils_original.py:164-172)."""
        N = float(len(self.df))
        lab = self.labels
        counts = np.bincount(lab, minlength=self.ds.num_classes).astype(float)
        return N / counts[lab]

    @staticmethod
    def _radio_cells_present(row, modalities) -> bool:
        """Do the CSV's per-modality filename cells all carry a value?
        (shared by the cheap probe and the full loader so the presence
        predicates cannot drift apart)"""
        return all(
            isinstance(row.get(m), str) or
            (row.get(m) is not None and not pd.isna(row.get(m)))
            for m in modalities)

    def probe_present(self, idx: int) -> Dict[str, bool]:
        """Cheap modality-presence probe: file-existence + CSV checks only,
        no array loads.  Mirrors the presence semantics of ``_load_raw``
        (short of corrupt-file cases) so ``usable_indices`` can pre-filter a
        fold without reading gigabytes of bags (ref core_utils.py:185-192
        skips in-loop; we skip up-front)."""
        ds = self.ds
        row = self.df.iloc[idx]
        subject_id = row["subject_id"]
        present: Dict[str, bool] = {}

        if "radio" in ds.mode:
            ok = bool(ds.data_dir) and self._radio_cells_present(
                row, ds.modalities)
            if ok:
                ok = all(os.path.exists(os.path.join(
                    ds.data_dir, "radio_h5_files", m, f"{subject_id}.h5"))
                    for m in ds.modalities)
            present["radio"] = ok

        if "path" in ds.mode:
            slide_ids = ds.slides_dict.get(subject_id, []) if ds.data_dir \
                else []
            present["path"] = any(
                os.path.exists(os.path.join(
                    ds.data_dir, "path_pt_files",
                    _slide_pt_name(sid)))
                for sid in slide_ids)

        if "omic" in ds.mode:
            present["omic"] = not bool(
                np.any(np.isnan(self.genomic_features[idx])))
        return present

    def get_sample(self, idx: int) -> Sample:
        row = self.df.iloc[idx]
        subject_id = row["subject_id"]
        s = Sample(subject_id=subject_id,
                   disc_label=int(row["disc_label"]),
                   event_time=float(row[self.ds.label_col]),
                   censorship=float(row["censorship"]))
        ds = self.ds
        if ds.pretrained:
            self._load_pretrained(s)
        else:
            self._load_raw(s, idx)
        return s

    def _load_raw(self, s: Sample, idx: int):
        ds = self.ds
        row = self.df.iloc[idx]
        # radiology: per-modality h5 + slice intersection
        # (ref dataset_survival.py:334-348)
        if "radio" in ds.mode and ds.data_dir:
            if self._radio_cells_present(row, ds.modalities):
                feats, sids = [], []
                try:
                    for m in ds.modalities:
                        p = os.path.join(ds.data_dir, "radio_h5_files", m,
                                         f"{s.subject_id}.h5")
                        f, si = io.load_features_h5(p)
                        feats.append(f)
                        sids.append(np.asarray(si))
                    from multimodalfusion_tpu.data.bags import \
                        intersect_slices
                    s.radio = intersect_slices(feats, sids).astype(np.float32)
                except (OSError, KeyError):
                    s.radio = None
                except ValueError as e:
                    # corrupt h5 (e.g. duplicate slice ids): treat as a
                    # missing modality like the IO errors above, but say so
                    print(f"WARNING: skipping radio bag for "
                          f"{s.subject_id}: {e}")
                    s.radio = None
        s.present["radio"] = s.radio is not None

        # pathology: concat per-slide .pt bags (ref :355-367)
        if "path" in ds.mode and ds.data_dir:
            slide_ids = ds.slides_dict.get(s.subject_id, [])
            parts = []
            for sid in slide_ids:
                p = os.path.join(ds.data_dir, "path_pt_files",
                                 _slide_pt_name(sid))
                try:
                    parts.append(io.load_pt(p))
                except (OSError, ValueError):
                    pass
            if parts:
                s.path = np.concatenate(parts, axis=0).astype(np.float32)
        s.present["path"] = s.path is not None

        # genomics (ref :371-378)
        if "omic" in ds.mode:
            g = self.genomic_features[idx]
            if not np.any(np.isnan(g)):
                s.omic = g.astype(np.float32)
        s.present["omic"] = s.omic is not None

    def _load_pretrained(self, s: Sample):
        """Stage-4: 256-d unimodal embeddings; missing -> zeros
        (ref dataset_survival.py:400-418)."""
        ds = self.ds

        def _load(dirname):
            p = os.path.join(ds.data_dir, dirname, f"{s.subject_id}.pt")
            try:
                return io.load_pt(p).reshape(256).astype(np.float32), True
            except (OSError, ValueError):
                return np.zeros(256, np.float32), False

        s.h_radio, s.present["radio"] = _load("radio_pt_files")
        s.h_path, s.present["path"] = _load("path_pt_files")
        h_omic, s.present["omic"] = _load("omic_pt_files")
        if s.present["omic"]:
            lo, hi = h_omic.min(), h_omic.max()
            if hi > lo:
                h_omic = (h_omic - lo) / (hi - lo)  # ref :416
        s.h_omic = h_omic


class SurvivalDataset:
    """Cohort CSV -> patient table with discrete labels + split machinery
    (ref Generic_Survival_Dataset.__init__ :14-93)."""

    def __init__(self, csv_path: str, mode: str = "radio",
                 modalities: Sequence[str] = ("T1", "T2", "T1Gd", "FLAIR"),
                 data_dir: Optional[str] = None, n_bins: int = 4,
                 label_col: str = "survival_months", eps: float = 1e-6,
                 seed: int = 7, pretrained: bool = False,
                 print_info: bool = False):
        self.csv_path = csv_path
        self.mode = mode
        self.modalities = list(modalities)
        self.data_dir = data_dir
        self.label_col = label_col
        self.seed = seed
        self.pretrained = pretrained

        raw = pd.read_csv(csv_path, low_memory=False)
        patients = raw.drop_duplicates(["subject_id"]).copy()
        disc, lab, q_bins, ldict = labels_mod.discretize(
            patients, label_col, n_bins, eps)
        patients.insert(1, "disc_label", disc)
        patients.insert(1, "label", lab)

        # patient -> slide list (ref :45-58)
        slides_dict: Dict[str, List[str]] = {}
        by_subject = raw.set_index("subject_id")
        for patient in patients["subject_id"]:
            slide_ids = by_subject.loc[patient, "slide_id"]
            if isinstance(slide_ids, str):
                slides_dict[patient] = [slide_ids]
            elif isinstance(slide_ids, float):
                slides_dict[patient] = []
            else:
                slides_dict[patient] = [x for x in slide_ids.values
                                        if isinstance(x, str)]
        self.slides_dict = slides_dict

        self.patients = patients.reset_index(drop=True)
        self.bins = q_bins
        self.label_dict = ldict
        self.num_classes = len(ldict)
        self.n_bins = len(q_bins) - 1
        # the label column must always be metadata: with a non-default
        # label_col the survival time would otherwise survive the
        # genomic-column filter and leak into the features
        self.metadata = (METADATA_BASE + self.modalities + METADATA_TAIL
                         + ([label_col] if label_col not in METADATA_TAIL
                            else []))
        if print_info:
            print(f"label column: {label_col}")
            print(f"label dictionary: {ldict}")
            print(f"number of classes: {self.num_classes}")

    # ------------------------------------------------------------------
    # splits
    # ------------------------------------------------------------------

    def _split_from_ids(self, ids) -> Optional[Split]:
        ids = pd.Series(ids).dropna().tolist()
        if not ids:
            return None
        mask = self.patients["subject_id"].isin(ids)
        return Split(self.patients[mask], self)

    def load_splits(self, csv_path: str, keys=("train", "val")):
        """Read a splits_{i}.csv (columns train/val[/test]) and z-score
        genomics with the train-fit scaler (ref
        return_train_val(_test)_splits :141-171)."""
        all_splits = pd.read_csv(csv_path)
        out = []
        train_split = None
        for key in keys:
            sp = (self._split_from_ids(all_splits[key])
                  if key in all_splits.columns else None)
            if key == "train":
                train_split = sp
            out.append(sp)
        if train_split is not None and train_split.genomic_features.size:
            scaler = train_split.get_scaler()
            for sp in out:
                if sp is not None:
                    sp.apply_scaler(scaler)
        return tuple(out)

    def whole_split(self, csv_file: Optional[str] = None) -> Split:
        """All patients; if a split csv is given, z-score genomics with its
        train scaler (ref return_whole_splits :123-138)."""
        split = Split(self.patients, self)
        if csv_file is not None:
            all_splits = pd.read_csv(csv_file)
            train_split = self._split_from_ids(all_splits["train"])
            if train_split is not None and train_split.genomic_features.size:
                split.apply_scaler(train_split.get_scaler())
        return split

    def omics_columns(self) -> List[str]:
        return [c for c in self.patients.columns
                if "_cnv" in c or "_mut" in c]

    def do_split(self, split: str, split_dir: str, k: int = 5,
                 overwrite: bool = True):
        """Generate split CSVs (ref do_split :173-243).

        split='threemod': patients with all three modalities; k-fold if
        >=120 else stratified shuffle (test_size=.2); test column from
        held-out (train==0) three-modality subjects.
        split='pre_trained': per-mode single-modality patients excluding
        three-modality subjects; stratified shuffle, test_size=.1.
        """
        from sklearn.model_selection import (StratifiedKFold,
                                             StratifiedShuffleSplit)
        df = self.patients.reset_index(drop=True)
        df_train = df[df.train == 1]
        omics = self.omics_columns()
        threemod = df_train.dropna(
            subset=["slide_id"] + self.modalities + omics)
        threemod_subjects = np.unique(threemod.subject_id.values)
        os.makedirs(split_dir, exist_ok=True)
        if os.listdir(split_dir) and not overwrite:
            raise FileExistsError(f"splits already exist in {split_dir}")

        def _strat_splits(sub_df, how, test_size):
            """Stratified splits with the reference's singleton-class
            fallback (ref :268-293)."""
            from collections import Counter
            sub_df = sub_df.reset_index(drop=True)
            y = sub_df["label"].values
            singles = [cls for cls, cnt in Counter(y).items() if cnt == 1]
            single_ids = sub_df[sub_df["label"].isin(singles)][
                "subject_id"].values
            work = sub_df[~sub_df["label"].isin(singles)].reset_index(
                drop=True)
            if how == "k_fold":
                sss = StratifiedKFold(n_splits=k, shuffle=True,
                                      random_state=self.seed)
            else:
                sss = StratifiedShuffleSplit(n_splits=k, test_size=test_size,
                                             random_state=self.seed)
            outs = []
            for i, (tr, va) in enumerate(
                    sss.split(work.subject_id.values, work["label"].values)):
                train_ids = work.subject_id.values[tr]
                val_ids = work.subject_id.values[va]
                if len(single_ids):
                    if i == 0:
                        val_ids = np.append(val_ids, single_ids)
                    else:
                        train_ids = np.append(train_ids, single_ids)
                # pad BOTH columns to a common length — never drop subjects
                n = max(len(train_ids), len(val_ids))

                def _pad(ids):
                    return np.append(ids.astype(object),
                                     np.repeat(np.nan, n - len(ids)))
                outs.append(pd.DataFrame({"train": _pad(train_ids),
                                          "val": _pad(val_ids)}))
            return outs

        if split == "threemod":
            how = "k_fold" if len(threemod) >= 120 else "shuffle_split"
            test_size = None if how == "k_fold" else 0.2
            splits = _strat_splits(threemod, how, test_size)
            if (df.train == 0).sum() != 0:
                df_test = df[df.train == 0]
                test_threemod = df_test.dropna(
                    subset=["slide_id"] + self.modalities + omics)
                test_subjects = list(np.unique(
                    test_threemod.subject_id.values))
                for i, sp in enumerate(splits):
                    if len(test_subjects) > len(sp):
                        # grow the frame rather than dropping test subjects
                        extra = len(test_subjects) - len(sp)
                        pad_df = pd.DataFrame(
                            {c: [np.nan] * extra for c in sp.columns})
                        sp = pd.concat([sp, pad_df], ignore_index=True)
                        splits[i] = sp
                    sp["test"] = (test_subjects
                                  + [np.nan] * (len(sp) - len(test_subjects)))
        elif split == "pre_trained":
            if self.mode == "radio":
                sub = df.dropna(subset=self.modalities)
            elif self.mode == "omic":
                sub = df.dropna(subset=omics)
            elif self.mode == "path":
                sub = df.dropna(subset=["slide_id"])
            else:
                raise ValueError(self.mode)
            sub = sub[~sub.subject_id.isin(threemod_subjects)]
            splits = _strat_splits(sub, "shuffle_split", 0.1)
        else:
            raise ValueError(split)

        for i, sp in enumerate(splits):
            sp.to_csv(os.path.join(split_dir, f"splits_{i}.csv"), index=False)
        return splits
