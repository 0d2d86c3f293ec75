"""Stage-1 feature-extraction throughput, END TO END, on the real chip.

The BASELINE north star (>=5k patches/s/chip) was previously proven
only with device-resident synthetic inputs (bench.py); this harness
measures the full pipeline the reference runs with DataLoader workers
(ref feature_extraction.py:25-62, datasets/dataset_h5.py:148-156):

  disk slide -> segment/coords (cli/create_patches.py)
             -> patch read + resize (host)
             -> H2D transfer
             -> ResNet50 embed (TPU)
             -> {slide}.pt + h5 (cli/extract_features_fp.py)

plus the radiology extractor (cli/feature_extraction.py: NIfTI ->
preprocess -> embed slices -> radio_h5_files).

Each CLI runs ONCE per process (its Embedder jit-compiles once); the
first item in each run absorbs the relay compile and is excluded from
the steady-state rate, which is parsed from the CLI's own per-item
timing lines.  Each pipeline share is ALSO measured in isolation (host
read/decode only, H2D only, device embed only) so the bottleneck is
attributable.  On this dev box the attribution matters more than the
headline: the host has ONE core and feeds the chip through the axon
relay (tens of MB/s, session-dependent), so the end-to-end rate is a
host measurement.  A real TPU host feeds chips over PCIe (>= 8 GB/s)
with dozens of cores, so the end-to-end ceiling there is
min(host decode/core x cores, device rate); PERF_EXTRACT.json records
every share so that projection is arithmetic.

Run (real chip):  python tools/bench_extract.py [workdir]
Writes PERF_EXTRACT.json to the repo root.  ~10 min, dominated by the
one-time ResNet compile through the relay.
"""
import contextlib
import io
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SLIDES = 3
SLIDE_W, SLIDE_H = 8192, 6144
PATCH = 256
TARGET = 224
BATCH = 128


def build_cohort(workdir):
    """Disk-resident synthetic cohort: pyramidal TIFF slides + glioma
    NIfTI volumes.  Cached across runs (building is not the benchmark)."""
    from PIL import Image

    from multimodalfusion_tpu.data import wsi
    from multimodalfusion_tpu.data.nifti import write_nifti
    slide_dir = os.path.join(workdir, "slides")
    radio_dir = os.path.join(workdir, "radio")
    os.makedirs(slide_dir, exist_ok=True)
    done = os.path.join(workdir, ".cohort_done")
    if os.path.exists(done):
        return slide_dir, radio_dir
    # WARMUP slide (compile trigger; must segment to >=1 patch so the
    # Embedder compiles OUTSIDE the timed slides) + N timed slides
    specs = [("WARMUP", 3072, 2304, 6, 96)] + [
        (f"SLIDE{i}", SLIDE_W, SLIDE_H, 8, i) for i in range(N_SLIDES)]
    for name, w, h, blobs, seed in specs:
        # fixed per-slide seeds: str hash() is randomized per process
        # (PYTHONHASHSEED), which made rebuilt cohorts non-comparable
        s = wsi.synthetic_slide(w, h, n_blobs=blobs, seed=seed)
        imgs = [Image.fromarray(l) for l in s.levels]
        imgs[0].save(os.path.join(slide_dir, f"{name}.tiff"),
                     save_all=True, append_images=imgs[1:])
        del s, imgs
    rng = np.random.default_rng(0)
    mods = ["FLAIR", "T1", "T1Gd", "T2"]
    rows = ["subject_id," + ",".join(mods)]
    for i in range(3):
        sub = f"SUBJ{i}"
        cells = [sub]
        for m in mods:
            d = os.path.join(radio_dir, sub, m)
            os.makedirs(d, exist_ok=True)
            vol = np.zeros((40, 240, 240), np.float32)
            vol[2:38, 40:200, 40:200] = rng.uniform(
                5, 90, size=(36, 160, 160))
            fname = f"{sub}_{m.lower()}.nii.gz"
            write_nifti(os.path.join(d, fname), vol,
                        origin_lps=(0.0, -239.0, 0.0))
            cells.append(f"{sub}/{m}/{fname}")
        rows.append(",".join(cells))
    with open(os.path.join(workdir, "radio.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    open(done, "w").close()
    return slide_dir, radio_dir


def run_create_patches(workdir, slide_dir):
    """disk -> coords h5, host-only (segmentation + grid + contour
    checks), timed over the whole cohort."""
    from multimodalfusion_tpu.cli.create_patches import main as cp_main
    coords_dir = os.path.join(workdir, "coords")
    t0 = time.perf_counter()
    rc = cp_main(["--source", slide_dir, "--save_dir", coords_dir,
                  "--patch_size", str(PATCH), "--step_size", str(PATCH),
                  "--sthresh", "20", "--a_t", "1.0", "--a_h", "0.1",
                  "--no_auto_skip"])
    dt = time.perf_counter() - t0
    assert rc == 0
    import h5py
    counts = {}
    for n in sorted(os.listdir(os.path.join(coords_dir, "patches"))):
        with h5py.File(os.path.join(coords_dir, "patches", n), "r") as f:
            counts[n.replace("_patches.h5", "")] = len(f["coords"])
    return coords_dir, counts, dt


def run_extract(workdir, slide_dir, coords_dir, counts):
    """coords -> embed -> h5/pt through the CLI in ONE call (one
    Embedder, one compile); steady state = the slides after WARMUP,
    parsed from the CLI's own per-slide timing lines."""
    import pandas as pd

    from multimodalfusion_tpu.cli import extract_features_fp as ex
    feat_dir = os.path.join(workdir, "features")
    csv = os.path.join(workdir, "slides.csv")
    order = ["WARMUP"] + sorted(s for s in counts if s != "WARMUP")
    pd.DataFrame({"slide_id": [f"{s}.tiff" for s in order]}).to_csv(
        csv, index=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = ex.main(["--data_h5_dir", coords_dir,
                      "--data_slide_dir", slide_dir,
                      "--feat_dir", feat_dir,
                      "--batch_size", str(BATCH),
                      "--slide_ext", ".tiff", "--allow_random_weights",
                      "--target_patch_size", str(TARGET),
                      "--csv_path", csv])
    print(buf.getvalue(), file=sys.stderr)
    assert rc == 0
    per_slide = dict(
        (m.group(1), (int(m.group(2)), float(m.group(3))))
        for m in re.finditer(
            r"^(\S+): (\d+) patches in ([\d.]+)s", buf.getvalue(), re.M))
    warm_s = per_slide["WARMUP"][1]
    n_patches = sum(n for s, (n, _) in per_slide.items() if s != "WARMUP")
    steady_s = sum(t for s, (_, t) in per_slide.items() if s != "WARMUP")
    for s in order[1:]:
        assert os.path.exists(os.path.join(feat_dir, "path_pt_files",
                                           f"{s}.pt"))
        assert os.path.exists(os.path.join(feat_dir, "h5_files",
                                           f"{s}.h5"))
    return n_patches, steady_s, warm_s


def measure_shares(workdir, slide_dir, coords_dir, counts):
    """Each pipeline stage alone, same shapes, same process."""
    import cv2
    import h5py
    import jax
    import jax.numpy as jnp

    from multimodalfusion_tpu.data import wsi as wsi_mod
    shares = {}
    slide_name = next(s for s in sorted(counts) if s != "WARMUP")
    slide = wsi_mod.open_slide(os.path.join(slide_dir,
                                            f"{slide_name}.tiff"))
    with h5py.File(os.path.join(coords_dir, "patches",
                                f"{slide_name}_patches.h5"), "r") as f:
        coords = f["coords"][:]
    n = len(coords)

    # host: patch read (RAM slice) + resize to 224, single core
    t0 = time.perf_counter()
    patches = wsi_mod.read_patches(slide, coords, 0, PATCH)
    patches = np.stack([cv2.resize(p, (TARGET, TARGET)) for p in patches])
    shares["host_read_resize_patches_per_s"] = round(
        n / (time.perf_counter() - t0), 1)

    # host: slide open/decode (PIL whole-page) amortized over its patches
    t0 = time.perf_counter()
    wsi_mod.open_slide(os.path.join(slide_dir, f"{slide_name}.tiff"))
    shares["slide_decode_s"] = round(time.perf_counter() - t0, 2)
    shares["slide_decode_patches_per_s_equiv"] = round(
        n / max(shares["slide_decode_s"], 1e-9), 1)

    # H2D: uint8 batch through the relay (the dev-box bottleneck)
    batch = patches[:BATCH]
    if batch.shape[0] < BATCH:
        batch = np.resize(batch, (BATCH, TARGET, TARGET, 3))
    x = jax.device_put(batch)
    float(jnp.sum(x[0, 0].astype(jnp.float32)))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        x = jax.device_put(batch)
        float(jnp.sum(x[0, 0].astype(jnp.float32)))  # relay-safe sync
    dt = time.perf_counter() - t0
    shares["h2d_patches_per_s"] = round(reps * BATCH / dt, 1)
    shares["h2d_mb_per_s"] = round(reps * batch.nbytes / 2**20 / dt, 1)

    # device: embed on device-resident input, chained (the bench.py
    # methodology, same session)
    from multimodalfusion_tpu.extract.features import Embedder
    emb = Embedder(batch_size=BATCH, image_size=TARGET, allow_random=True)
    xb = jax.device_put(batch)

    def chained(k):
        out = None
        for _ in range(k):
            out = emb._embed(emb.variables, xb)
        return out
    float(jnp.sum(chained(1)))
    iters = 20
    t0 = time.perf_counter()
    float(jnp.sum(chained(iters)))
    shares["device_embed_patches_per_s"] = round(
        iters * BATCH / (time.perf_counter() - t0), 1)
    return shares


def run_radiology(workdir, radio_dir):
    """NIfTI -> preprocess -> embed -> radio_h5_files via the CLI in
    ONE call; the first scan absorbs compile, steady state = the rest
    (parsed from the CLI's per-scan lines, which also carry the host
    preprocess share)."""
    from multimodalfusion_tpu.cli.feature_extraction import main as fe_main
    out = os.path.join(workdir, "radio_features")
    csv = os.path.join(workdir, "radio.csv")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = fe_main(["--radio_dir", radio_dir, "--csv_path", csv,
                      "--output_dir", out, "--allow_random_weights"])
    print(buf.getvalue(), file=sys.stderr)
    assert rc == 0
    scans = [(m.group(1), int(m.group(2)), float(m.group(3)),
              float(m.group(4)))
             for m in re.finditer(
                 r"^(\S+): (\d+) slices in ([\d.]+)s \(prep ([\d.]+)s\)",
                 buf.getvalue(), re.M)]
    assert len(scans) >= 2, buf.getvalue()
    steady = scans[1:]  # scan 0 absorbed the bucket compile
    n_slices = sum(s[1] for s in steady)
    total_s = sum(s[2] for s in steady)
    prep_s = sum(s[3] for s in steady)
    return n_slices, total_s, prep_s, len(scans)


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/extract_bench"
    os.makedirs(workdir, exist_ok=True)
    import jax
    platform = jax.devices()[0].platform
    print(f"devices: {jax.devices()}", file=sys.stderr)

    slide_dir, radio_dir = build_cohort(workdir)
    coords_dir, counts, seg_s = run_create_patches(workdir, slide_dir)
    n_coords = sum(v for k, v in counts.items() if k != "WARMUP")
    print(f"coords: {counts} in {seg_s:.1f}s", file=sys.stderr)

    n_patches, ex_s, warm_s = run_extract(workdir, slide_dir, coords_dir,
                                          counts)
    e2e = n_patches / ex_s
    print(f"end-to-end: {n_patches} patches in {ex_s:.1f}s = "
          f"{e2e:.1f} patches/s (warmup slide: {warm_s:.1f}s)",
          file=sys.stderr)

    shares = measure_shares(workdir, slide_dir, coords_dir, counts)
    print(f"shares: {shares}", file=sys.stderr)

    n_slices, rad_s, rad_prep_s, n_scans = run_radiology(workdir,
                                                         radio_dir)
    print(f"radiology: {n_slices} slices in {rad_s:.1f}s "
          f"(prep {rad_prep_s:.1f}s) = {n_slices / rad_s:.1f} slices/s",
          file=sys.stderr)

    # projection: on a PCIe host the ceiling is min(host/core x cores,
    # device); host share here is measured on this box's single core
    host_rate = shares["host_read_resize_patches_per_s"]
    dev_rate = shares["device_embed_patches_per_s"]
    out = {
        "platform": platform,
        "wsi": {
            "slides": {k: int(v) for k, v in counts.items()},
            "create_patches_s": round(seg_s, 1),
            "end_to_end_patches_per_s": round(e2e, 1),
            "end_to_end_patches": int(n_patches),
            "warmup_slide_s": round(warm_s, 1),
            "shares": shares,
            "cores_to_saturate_device": int(np.ceil(dev_rate /
                                                    host_rate)),
            "note": ("end-to-end on this dev box is capped by the 1-core "
                     "host + axon-relay H2D (see shares); a PCIe host "
                     "needs ceil(device/host_per_core) decode cores "
                     "to saturate the chip"),
        },
        "radiology": {
            "end_to_end_slices_per_s": round(n_slices / rad_s, 1),
            "host_preprocess_share": round(rad_prep_s / rad_s, 2),
            "n_slices": int(n_slices),
            "n_scans_timed": n_scans - 1,
        },
    }
    with open(os.path.join(REPO, "PERF_EXTRACT.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
