"""Radiology feature-extraction CLI — rewrite of ref
feature_extraction.py: per subject x modality, preprocess the scan,
embed every axial slice with the truncated ResNet50 on TPU, and write
``radio_h5_files/{modality}/{subject}.h5`` ({features, slice_index}) plus
a ``.pt`` copy — the exact artifact schema stage-2 training reads
(ref feature_extraction.py:57-61, 149-156).

Glioma: NIfTI MRI sequences (FLAIR/T1/T1Gd/T2), native reader.
Lung: DICOM CT series (pydicom if installed, else the native reader in data/dicom.py) with lung segmentation;
failures are accumulated into not_processed.pkl (ref :175-214).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import pandas as pd

from multimodalfusion_tpu.data.io import ensure_dir, save_hdf5, save_pkl, \
    save_pt
from multimodalfusion_tpu.data.loaders import prefetch
from multimodalfusion_tpu.data.radiology import (preprocess_glioma_scan,
                                                 preprocess_lung_scan)
from multimodalfusion_tpu.extract.features import Embedder

GLIOMA_MODALITIES = ["FLAIR", "T1", "T1Gd", "T2"]


def build_parser():
    p = argparse.ArgumentParser(description="Feature Extraction")
    p.add_argument("--radio_dir", type=str, required=True)
    p.add_argument("--csv_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--data_parallel", action="store_true", default=False,
                   help="shard embedding batches over all visible devices "
                        "(1-D data mesh; params replicated)")
    p.add_argument("--planes", type=str, default="axial")
    p.add_argument("--cancer_type", type=str, default="glioma",
                   choices=["glioma", "lung"])
    p.add_argument("--segment", action="store_true", default=False)
    p.add_argument("--weights", type=str, default=None,
                   help="torch-format ResNet50 state_dict for ImageNet "
                        "parity")
    p.add_argument("--allow_random_weights", action="store_true",
                   default=False,
                   help="proceed with a randomly initialized ResNet50 "
                        "(test/debug only — embeddings are meaningless)")
    p.add_argument("--no_s2d_stem", action="store_true",
                   default=False,
                   help="run the canonical 7x7/s2 stem conv "
                        "instead of the (fp-equal, faster) "
                        "space-to-depth form")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="conv compute dtype: bfloat16 (the TPU-native "
                        "default, ~5e-3 rel feature deviation) or "
                        "float32 for exact reference parity "
                        "(tools/parity_extraction_radio.py)")
    return p


def _maybe_mesh(data_parallel: bool):
    """1-D data mesh over all visible devices when requested (the
    reference's DataParallel analogue, ref feature_extraction.py:99-100)."""
    if not data_parallel:
        return None
    import jax
    from multimodalfusion_tpu.parallel.mesh import make_mesh
    if jax.device_count() < 2:
        print("--data_parallel: only one device visible, running unsharded")
        return None
    return make_mesh()


def _resolve_scan(radio_dir: str, subject: str, fname: str) -> str:
    """Reference layout is radio_dir/<subject>/<filename>
    (ref feature_extraction.py:135,187); fall back to radio_dir/<filename>
    for flat layouts."""
    nested = os.path.join(radio_dir, str(subject), str(fname))
    if os.path.exists(nested):
        return nested
    return os.path.join(radio_dir, str(fname))


def _write_outputs(h5_path: str, pt_path: str, features: np.ndarray,
                   slice_index: np.ndarray):
    save_hdf5(h5_path, {"features": features.astype(np.float32),
                        "slice_index": slice_index.astype(np.int64)},
              mode="w")
    save_pt(pt_path, features.astype(np.float32))


def _iter_jobs(args, df, out_root):
    """Yield (label, h5_path, pt_path, preprocess_thunk) per pending scan."""
    if args.cancer_type == "glioma":
        subj_mods = (df[["subject_id"] + GLIOMA_MODALITIES].dropna()
                     .set_index("subject_id").T.to_dict())
        for m in GLIOMA_MODALITIES:
            ensure_dir(os.path.join(out_root, "radio_h5_files", m))
            ensure_dir(os.path.join(out_root, "radio_pt_files", m))
        for subject, mods in subj_mods.items():
            for modality, fname in mods.items():
                if pd.isna(fname):
                    continue
                h5_path = os.path.join(out_root, "radio_h5_files", modality,
                                       f"{subject}.h5")
                pt_path = os.path.join(out_root, "radio_pt_files", modality,
                                       f"{subject}.pt")
                if os.path.exists(h5_path):  # idempotent (ref :184-186)
                    continue
                scan = _resolve_scan(args.radio_dir, subject, fname)
                yield ((subject, modality), h5_path, pt_path,
                       lambda p=scan: preprocess_glioma_scan(p))
    else:  # lung CT
        ensure_dir(os.path.join(out_root, "radio_h5_files", "CT"))
        ensure_dir(os.path.join(out_root, "radio_pt_files", "CT"))
        for subject, scan_dir in (df[["subject_id", "CT"]].dropna()
                                  .itertuples(index=False)):
            h5_path = os.path.join(out_root, "radio_h5_files", "CT",
                                   f"{subject}.h5")
            pt_path = os.path.join(out_root, "radio_pt_files", "CT",
                                   f"{subject}.pt")
            if os.path.exists(h5_path):
                continue
            scan = _resolve_scan(args.radio_dir, subject, scan_dir)
            yield ((subject,), h5_path, pt_path,
                   lambda p=scan: preprocess_lung_scan(
                       p, segment_each_slice=args.segment))


def _preprocessed(jobs):
    """Run each job's CPU preprocessing, trapping per-scan failures so a
    bad scan can't kill the prefetch pipeline."""
    for label, h5_path, pt_path, thunk in jobs:
        t0 = time.time()
        try:
            slices, slice_ids = thunk()
            yield (label, h5_path, pt_path, slices, slice_ids, None,
                   time.time() - t0)
        except Exception as e:
            yield label, h5_path, pt_path, None, None, e, time.time() - t0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    df = pd.read_csv(args.csv_path)
    import jax.numpy as jnp
    embedder = Embedder(weights_path=args.weights,
                        batch_size=args.batch_size,
                        mesh=_maybe_mesh(args.data_parallel),
                        allow_random=args.allow_random_weights,
                        s2d_stem=not args.no_s2d_stem,
                        dtype=jnp.dtype(args.dtype))
    out_root = ensure_dir(os.path.join(args.output_dir, args.cancer_type))
    not_processed = []

    # CPU preprocessing of scan k+1 overlaps TPU embedding of scan k
    # (the reference gets this from DataLoader workers, :97-101).
    jobs = _preprocessed(_iter_jobs(args, df, out_root))
    for label, h5_path, pt_path, slices, slice_ids, err, prep_dt in \
            prefetch(jobs, depth=2):
        name = "/".join(str(p) for p in label)
        if err is None:
            t0 = time.time()
            try:
                feats = embedder.embed_slices(slices)
                _write_outputs(h5_path, pt_path, feats, slice_ids)
                print(f"{name}: {feats.shape[0]} slices in "
                      f"{prep_dt + time.time() - t0:.1f}s "
                      f"(prep {prep_dt:.1f}s)")
                continue
            except Exception as e:  # per-scan fault isolation
                err = e
        print(f"FAILED {name}: {err}")
        not_processed.append(label + (str(err),))

    if not_processed:
        save_pkl(os.path.join(out_root, "not_processed.pkl"), not_processed)
        print(f"{len(not_processed)} scans failed -> not_processed.pkl")
    return 0


if __name__ == "__main__":
    sys.exit(main())
