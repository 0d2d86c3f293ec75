"""WSI patch feature extraction CLI — the in-repo equivalent of CLAM's
extract_features_fp.py that the reference instructs users to run
externally (ref README.md:52-54; in-repo support:
datasets/dataset_h5.py Whole_Slide_Bag_FP:95).

Reads {slide}_patches.h5 coords, streams patches from the slide through
the TPU ResNet50 embedder, and writes path_pt_files/{slide}.pt bags plus
h5_files/{slide}.h5 ({features, coords}) — the bag artifacts stage-2
training consumes.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import h5py
import numpy as np
import pandas as pd

from multimodalfusion_tpu.data.io import ensure_dir, save_hdf5, save_pt
from multimodalfusion_tpu.data import wsi as wsi_mod
from multimodalfusion_tpu.extract.features import Embedder


def build_parser():
    p = argparse.ArgumentParser(description="WSI patch feature extraction")
    p.add_argument("--data_h5_dir", type=str, required=True,
                   help="dir containing patches/{slide}_patches.h5")
    p.add_argument("--data_slide_dir", type=str, required=True)
    p.add_argument("--csv_path", type=str, default=None,
                   help="optional process list (slide_id column)")
    p.add_argument("--feat_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--data_parallel", action="store_true", default=False,
                   help="shard embedding batches over all visible devices "
                        "(1-D data mesh; params replicated)")
    p.add_argument("--slide_ext", type=str, default=".svs")
    p.add_argument("--target_patch_size", type=int, default=224)
    p.add_argument("--weights", type=str, default=None)
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


def extract_slide(slide, coords_h5: str, embedder: Embedder,
                  target_patch_size: int):
    """Stream patches through the embedder, overlapping host-side patch
    reads/decodes with device compute via the prefetching iterator (the
    reference relies on torch DataLoader workers for the same overlap,
    ref dataset_h5.py:95 + extract_features_fp)."""
    from multimodalfusion_tpu.data.loaders import prefetch
    with h5py.File(coords_h5, "r") as f:
        coords = f["coords"][:]
        patch_level = int(f["coords"].attrs.get("patch_level", 0))
        patch_size = int(f["coords"].attrs.get("patch_size", 256))
    feats = np.zeros((len(coords), 1024), np.float32)
    B = embedder.batch_size

    def chunks():
        for start in range(0, len(coords), B):
            chunk = coords[start:start + B]
            patches = wsi_mod.read_patches(slide, chunk, patch_level,
                                           patch_size)
            if patch_size != target_patch_size:
                import cv2
                patches = np.stack([
                    cv2.resize(p, (target_patch_size, target_patch_size))
                    for p in patches])
            yield start, len(chunk), patches

    for start, n, patches in prefetch(chunks(), depth=2):
        feats[start:start + n] = embedder.embed_images(patches)
    return feats, coords


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    pt_dir = ensure_dir(os.path.join(args.feat_dir, "path_pt_files"))
    h5_dir = ensure_dir(os.path.join(args.feat_dir, "h5_files"))
    import jax.numpy as jnp
    embedder = Embedder(weights_path=args.weights,
                        mesh=_maybe_mesh(args.data_parallel),
                        batch_size=args.batch_size,
                        image_size=args.target_patch_size,
                        allow_random=args.allow_random_weights,
                        s2d_stem=not args.no_s2d_stem,
                        dtype=jnp.dtype(args.dtype))

    patches_dir = os.path.join(args.data_h5_dir, "patches")
    if args.csv_path:
        slide_ids = pd.read_csv(args.csv_path)["slide_id"].tolist()
    else:
        slide_ids = [n.replace("_patches.h5", args.slide_ext)
                     for n in sorted(os.listdir(patches_dir))
                     if n.endswith("_patches.h5")]

    for slide_file in slide_ids:
        stem = os.path.splitext(os.path.basename(slide_file))[0]
        coords_h5 = os.path.join(patches_dir, f"{stem}_patches.h5")
        pt_out = os.path.join(pt_dir, f"{stem}.pt")
        if os.path.exists(pt_out):
            print(f"skip {stem} (exists)")
            continue
        if not os.path.exists(coords_h5):
            print(f"no coords for {stem}")
            continue
        t0 = time.time()
        slide = wsi_mod.open_slide(
            os.path.join(args.data_slide_dir, slide_file))
        feats, coords = extract_slide(slide, coords_h5, embedder,
                                      args.target_patch_size)
        save_pt(pt_out, feats)
        save_hdf5(os.path.join(h5_dir, f"{stem}.h5"),
                  {"features": feats, "coords": coords}, mode="w")
        dt = time.time() - t0
        print(f"{stem}: {len(coords)} patches in {dt:.1f}s "
              f"({len(coords) / max(dt, 1e-9):.0f} patches/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
