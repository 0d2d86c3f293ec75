"""Stage-1 radiology feature extraction parity against the reference
AS RUN (glioma MRI arm).

The reference's `feature_extraction.py` is EXECUTED UNMODIFIED (via
tools/run_reference.py; the functional SimpleITK shim backs
sitk.ReadImage/Flip with this repo's native NIfTI reader, and the
functional torchvision.transforms shim reproduces
ToPILImage -> CenterCrop(224) -> ToTensor -> Normalize exactly, incl.
ToPILImage's mul(255).byte() quantization and CenterCrop's zero-pad
branch) and compared h5-for-h5 / pt-for-pt against this repo's
`cli/feature_extraction.py` on:

  * the SAME raw NIfTI volumes (2 subjects x 4 modalities, one
    modality stored y-flipped with the matching off-standard origin so
    the flip-to-standard path runs on both sides, all-zero slices so
    the slice_index selection is non-trivial), and
  * the SAME ResNet50 weights (a seeded random truncated-resnet50
    state dict in torchvision format, fed to the reference through a
    pre-seeded TORCH_HOME hub cache — resnet50_baseline(pretrained=True)
    model-zoo load — and to this repo through --weights).

Volumes are binary {0, 255} so the reference's ToPILImage byte
quantization is exact and both sides feed BIT-IDENTICAL inputs to
their conv stacks; the comparison then isolates the embedders
(torch CPU f32 vs jax CPU f32 with the space-to-depth stem).

Compared per subject x modality:
  1. slice_index: exact match (nonzero-slice selection + flip);
  2. features: max relative |d| (target < 1e-4);
  3. the .pt side-car equals the h5 features on both sides.

A second arm runs the LUNG CT pipeline the same way (native-DICOM
series through the pydicom shim; HU -> orientation -> scipy resample
-> lung mask -> largest_lung_box -> crop -> window-normalize; the
lungmask U-Net is not installable, so mask.apply routes to the
classical estimator both pipelines share — see run_lung_arm).

Run:  python tools/parity_extraction_radio.py [workdir]
Needs /root/reference mounted.  ~3-5 min, CPU.
"""
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
MODALITIES = ["FLAIR", "T1", "T1Gd", "T2"]  # the ref's glioma order
NZ, NY, NX = 40, 32, 32

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _ref_env(torch_home):
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        [os.path.join(REPO, "tools", "ref_shims"), REPO, REF]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env["JAX_PLATFORMS"] = "cpu"
    env["TORCH_HOME"] = torch_home
    return env


def make_weights(torch_home, weights_path):
    """One seeded truncated-resnet50 state dict, torchvision key names,
    served to the reference via the hub cache and to this repo via
    --weights."""
    import torch
    from test_resnet import TorchResNet50Trunc
    torch.manual_seed(3)
    m = TorchResNet50Trunc()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)
    sd = m.state_dict()
    ckpt_dir = os.path.join(torch_home, "hub", "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    torch.save(sd, os.path.join(ckpt_dir, "resnet50-19c8e357.pth"))
    torch.save(sd, weights_path)


def build_cohort(scan_dir, seed=23):
    """Binary {0,255} volumes: ToPILImage's mul(255).byte() is exact on
    them, so both extractors see bit-identical inputs."""
    import pandas as pd
    from multimodalfusion_tpu.data.io import ensure_dir
    from multimodalfusion_tpu.data.nifti import write_nifti
    rng = np.random.default_rng(seed)
    rows = []
    for s in ("P000", "P001"):
        sub = ensure_dir(os.path.join(scan_dir, s))
        row = {"subject_id": s}
        for mi, m in enumerate(MODALITIES):
            keep = sorted(rng.choice(
                np.arange(NZ), size=NZ - 6, replace=False).tolist())
            vol = np.zeros((NZ, NY, NX), np.float32)
            for z in keep:
                sl = (rng.uniform(size=(NY, NX)) < 0.5).astype(
                    np.float32) * 255.0
                sl[0, :] = sl[-1, :] = sl[:, 0] = sl[:, -1] = 255.0
                vol[z] = sl
            if m == "FLAIR":  # exercise the flip-to-standard path
                write_nifti(os.path.join(sub, f"{m}.nii.gz"),
                            np.flip(vol, axis=1).copy(),
                            origin_lps=(0.0, -239.0 - (NY - 1), 0.0))
            else:
                write_nifti(os.path.join(sub, f"{m}.nii.gz"), vol,
                            origin_lps=(0.0, -239.0, 0.0))
            row[m] = f"{m}.nii.gz"
        rows.append(row)
    return pd.DataFrame(rows)


def _safe_hu(candidates):
    """HU values whose window-normalized byte ((v+1000)/1400*255) sits
    >0.01 away from an integer: the f32-vs-f64 normalize difference
    between the two pipelines (ours casts to float32, the reference
    stays float64) can then never flip the ToPILImage byte."""
    out = []
    for v in candidates:
        b = (v + 1000.0) / 1400.0 * 255.0
        if abs(b - round(b)) > 0.01:
            out.append(int(v))
    return out


def build_lung_cohort(scan_dir, seed=29):
    """Two DICOM CT series phantoms (body + two lung fields with safe-
    palette texture).  L000 is written at spacing [1, 1.5, 1.5] so the
    reference's scipy zoom is an identity (exact parity); L001 at
    2 mm slices so the z-axis genuinely resamples x2 (both pipelines
    share scipy.ndimage.zoom; only the f32 normalize cast differs)."""
    import pandas as pd
    from multimodalfusion_tpu.data import dicom
    from multimodalfusion_tpu.data.io import ensure_dir
    rng = np.random.default_rng(seed)
    lung_vals = _safe_hu(range(-900, -801))
    body_vals = _safe_hu(range(20, 70))
    rows = []
    for s, dz in (("L000", 1.0), ("L001", 2.0)):
        d = ensure_dir(os.path.join(scan_dir, s, "ct"))
        nz = 10
        vol = np.full((nz, 64, 64), -1000, np.int16)
        vol[:, 4:60, 4:60] = rng.choice(body_vals, size=(nz, 56, 56))
        vol[2:9, 20:52, 12:30] = rng.choice(lung_vals, size=(7, 32, 18))
        vol[2:9, 20:52, 34:52] = rng.choice(lung_vals, size=(7, 32, 18))
        for z in range(nz):
            dicom.write_ct_slice(os.path.join(d, f"s{z}.dcm"),
                                 vol[z] + 1024, z=z * dz,
                                 spacing=(1.5, 1.5), thickness=dz,
                                 intercept=-1024.0)
        rows.append({"subject_id": s, "CT": "ct"})
    return pd.DataFrame(rows)


def compare_stores(ref_out, our_out, subjects, modalities, cancer, tol):
    import h5py

    from multimodalfusion_tpu.data.io import load_pt
    ok = True
    worst = 0.0
    for s in subjects:
        for m in modalities:
            rf = os.path.join(ref_out, cancer, "radio_h5_files", m,
                              f"{s}.h5")
            of = os.path.join(our_out, cancer, "radio_h5_files", m,
                              f"{s}.h5")
            with h5py.File(rf) as f:
                r_feat = f["features"][:]
                r_ids = f["slice_index"][:]
            with h5py.File(of) as f:
                o_feat = f["features"][:]
                o_ids = f["slice_index"][:]
            ids_ok = np.array_equal(np.asarray(r_ids).reshape(-1),
                                    np.asarray(o_ids).reshape(-1))
            shape_ok = r_feat.shape == o_feat.shape
            d = (float(np.max(np.abs(r_feat - o_feat))
                       / max(np.max(np.abs(r_feat)), 1e-8))
                 if shape_ok else np.inf)
            worst = max(worst, d)
            # the .pt side-cars must equal the h5 features on both sides
            r_pt = load_pt(os.path.join(ref_out, cancer,
                                        "radio_pt_files", m, f"{s}.pt"))
            o_pt = load_pt(os.path.join(our_out, cancer,
                                        "radio_pt_files", m, f"{s}.pt"))
            pt_ok = (np.array_equal(r_pt, r_feat)
                     and np.array_equal(o_pt, o_feat))
            ok &= ids_ok and shape_ok and d < tol and pt_ok
            print(f"[{s}/{m}] slice_index "
                  f"{'identical' if ids_ok else 'DIFFERS'} "
                  f"({len(np.asarray(r_ids).reshape(-1))} slices), "
                  f"features rel |d| {d:.2e}, pt==h5 "
                  f"{'yes' if pt_ok else 'NO'} "
                  f"{'MATCH' if ids_ok and d < tol and pt_ok else 'MISMATCH'}")
    return ok, worst


def run_lung_arm(base, torch_home, weights):
    """Lung CT arm: the reference's dataset_raw lung pipeline as run
    (load_scan -> HU -> orientation -> clip -> scipy resample ->
    mask.apply -> largest_lung_box -> crop -> window-normalize ->
    slice select -> ResNet).  The lungmask U-Net is not installable, so
    the shim routes mask.apply to the classical estimator BOTH
    pipelines share (PARITY.md §6); pydicom is shimmed onto this repo's
    native Part-10 reader in the reference process."""
    scan_dir = os.path.join(base, "lung_scans")
    df = build_lung_cohort(scan_dir)
    csv_path = os.path.join(base, "lung_cohort.csv")
    df.to_csv(csv_path, index=False)
    ref_out = os.path.join(base, "lung_ref_out")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_reference.py"),
         os.path.join(REF, "feature_extraction.py"),
         "--radio_dir", scan_dir, "--csv_path", csv_path,
         "--output_dir", ref_out, "--batch_size", "8",
         "--planes", "axial", "--cancer_type", "lung"],
        cwd=base, env=_ref_env(torch_home), input=b"",
        capture_output=True, timeout=1200)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr.decode(errors="replace")[-4000:])
        print("reference lung run FAILED")
        return False
    # the reference swallows per-subject errors into not_processed.pkl
    # — an empty store must fail the comparison, not pass it silently
    import pickle
    np_path = os.path.join(ref_out, "not_processed.pkl")
    if os.path.exists(np_path):
        with open(np_path, "rb") as f:
            skipped = pickle.load(f)
        if skipped:
            sys.stderr.write(proc.stdout.decode(errors="replace")[-3000:])
            print(f"reference skipped subjects: {skipped}")
            return False
    from multimodalfusion_tpu.cli.feature_extraction import main as ours
    our_out = os.path.join(base, "lung_our_out")
    rc = ours(["--radio_dir", scan_dir, "--csv_path", csv_path,
               "--output_dir", our_out, "--batch_size", "32",
               "--planes", "axial", "--cancer_type", "lung",
               "--weights", weights, "--dtype", "float32"])
    assert rc == 0
    # L000 resamples at factor 1 (exact); L001 z-resamples x2 — the
    # interpolated values can land on ToPILImage byte boundaries where
    # the f32-vs-f64 normalize cast flips single pixels by one level
    ok0, w0 = compare_stores(ref_out, our_out, ["L000"], ["CT"],
                             "lung", 1e-4)
    ok1, w1 = compare_stores(ref_out, our_out, ["L001"], ["CT"],
                             "lung", 5e-3)
    return ok0 and ok1


def main(base):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    os.makedirs(base, exist_ok=True)
    torch_home = os.path.join(base, "torch_home")
    weights = os.path.join(base, "resnet50_trunc_random.pt")
    make_weights(torch_home, weights)
    scan_dir = os.path.join(base, "scans")
    df = build_cohort(scan_dir)
    csv_path = os.path.join(base, "cohort.csv")
    df.to_csv(csv_path, index=False)

    # ---- reference, as run -------------------------------------------
    ref_out = os.path.join(base, "ref_out")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_reference.py"),
         os.path.join(REF, "feature_extraction.py"),
         "--radio_dir", scan_dir, "--csv_path", csv_path,
         "--output_dir", ref_out, "--batch_size", "8",
         "--planes", "axial", "--cancer_type", "glioma"],
        cwd=base, env=_ref_env(torch_home), input=b"",
        capture_output=True, timeout=1200)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout.decode(errors="replace")[-2000:])
        sys.stderr.write(proc.stderr.decode(errors="replace")[-4000:])
        print("reference run FAILED")
        return 1

    # ---- this repo ----------------------------------------------------
    from multimodalfusion_tpu.cli.feature_extraction import main as ours
    our_out = os.path.join(base, "our_out")
    rc = ours(["--radio_dir", scan_dir, "--csv_path", csv_path,
               "--output_dir", our_out, "--batch_size", "32",
               "--planes", "axial", "--cancer_type", "glioma",
               "--weights", weights, "--dtype", "float32"])
    assert rc == 0

    # ---- compare -------------------------------------------------------
    ok, worst = compare_stores(ref_out, our_out,
                               list(df["subject_id"]), MODALITIES,
                               "glioma", 1e-4)
    print(f"glioma worst rel |d| {worst:.2e}")

    # ---- lung CT arm ----------------------------------------------------
    ok &= run_lung_arm(base, torch_home, weights)
    print("STAGE-1 RADIO EXTRACTION PARITY:",
          "ALL MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/extract_radio_parity"
    shutil.rmtree(base, ignore_errors=True)
    sys.exit(main(base))
