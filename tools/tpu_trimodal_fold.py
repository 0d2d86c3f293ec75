"""One trimodal fold on the REAL TPU, stages 2 -> 3 -> 4 -> 5.

The reference's own trimodal model crashes at build as shipped
(ref models/model_mm_attention_mil.py:83 `size_path` undefined /
:117 forward unreachable — PARITY.md §5), so this framework's version
is the only runnable one and the hardware evidence must be its own.
The CPU suite trains it end to end on the virtual mesh
(tests/test_train_e2e.py::test_mm_attention_end_to_end,
tests/test_raw_to_risk.py); this tool runs the same toy-scale recipe
on the chip and records wall-clock per stage:

  stage 2   the FLAGSHIP raw trimodal mm_attention_mil
            (radio_path_omic, tensor fusion, --drop_out) trained on
            1024-d bags, plus the three unimodal arms (path AMIL,
            radio AMIL, omic MaxNet) stage 3 needs
  stage 3   cli.pre_trained_feature: 256-d {path,radio,omic}_pt_files
            from the unimodal checkpoints
  stage 4   cli.main_pretrained: trimodal mm head (early-fcnn) on the
            embeddings + cli.eval_pretrained (c-index/IBS)
  stage 5   cli.create_attributions: per-modality IG attr.csv

Everything runs in ONE process (one jax process per chip through the
relay).  Writes PERF_TRIMODAL.json; PERF.md references its fields.

Run on the TPU host:  python tools/tpu_trimodal_fold.py [workdir]
(~10-20 min: remote compiles through the relay dominate, the compute
is toy-scale.  Refuses to record on CPU.)
"""
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _common(base, extra):
    return ["--cancer_type", "brain", "--which_splits", "2foldcv",
            "--k", "1", "--n_classes", "4",
            "--data_root_dir", os.path.join(base, "features"),
            "--dataset_root", os.path.join(base, "dataset_csv"),
            "--splits_root", os.path.join(base, "splits"),
            "--overwrite"] + extra


def main(base, allow_cpu=False):
    import jax
    if jax.default_backend() != "tpu" and not allow_cpu:
        print(json.dumps({"error": "not on TPU backend; this fold "
                          "only means something on the real chip "
                          "(--allow_cpu validates the plumbing only, "
                          "without writing PERF_TRIMODAL.json)"}))
        return 2
    report = {"device": str(jax.devices()[0]),
              "backend": jax.default_backend(),
              "n_subjects": 24, "max_epochs": 5, "stages": {}}

    from fixtures import make_cohort_csv, make_feature_store, make_splits
    from multimodalfusion_tpu.cli.main import main as s2_main

    t0 = time.perf_counter()
    csv_path, df, latent = make_cohort_csv(
        os.path.join(base, "dataset_csv", "brain"), n=24, seed=5)
    make_feature_store(os.path.join(base, "features", "brain"), df,
                       latent, seed=5, bag_range=(8, 24))
    make_splits(os.path.join(base, "splits", "brain", "2foldcv"), df,
                k=2, val_frac=0.3, seed=5)
    report["stages"]["setup_s"] = round(time.perf_counter() - t0, 2)

    # ---- stage 2: flagship raw trimodal + the three unimodal arms ----
    arms = {
        "mm_flagship": ["--model_type", "mm_attention_mil",
                        "--mode", "radio_path_omic",
                        "--bag_loss", "nll_surv", "--fusion", "tensor",
                        "--radio_fusion", "concat", "--gate_path",
                        "--gate_radio", "--gate_omic", "--drop_out",
                        "--batch_size", "4", "--max_epochs", "5",
                        "--lr", "1e-3"],
        "path": ["--model_type", "path_attention_mil", "--mode", "path",
                 "--bag_loss", "nll_surv", "--gate_path", "--drop_out",
                 "--batch_size", "4", "--max_epochs", "5",
                 "--lr", "1e-3"],
        "radio": ["--model_type", "radio_attention_mil", "--mode",
                  "radio", "--radio_fusion", "concat", "--gate_radio",
                  "--drop_out", "--bag_loss", "nll_surv",
                  "--batch_size", "4", "--max_epochs", "5",
                  "--lr", "1e-3"],
        "omic": ["--model_type", "max_net", "--mode", "omic",
                 "--bag_loss", "cox_surv", "--batch_size", "8",
                 "--max_epochs", "5", "--lr", "1e-3"],
    }
    import pandas as pd
    exps = {}
    for arm, flags in arms.items():
        t0 = time.perf_counter()
        rc = s2_main(_common(base, flags + [
            "--results_dir", os.path.join(base, "s2", arm)]))
        assert rc == 0, arm
        dt = round(time.perf_counter() - t0, 2)
        root = os.path.join(base, "s2", arm, "brain", "2foldcv")
        exp = os.path.join(root, os.listdir(root)[0])
        summary = pd.read_csv(os.path.join(exp, "summary.csv"))
        cindex = float(summary["val_cindex"].iloc[0])
        report["stages"][f"stage2_{arm}"] = {
            "wall_s": dt, "val_cindex": round(cindex, 4),
            "finite": bool(np.isfinite(cindex))}
        exps[arm] = exp
        print(f"[stage2 {arm}] {dt}s val c-index {cindex:.4f}",
              file=sys.stderr, flush=True)

    # ---- stage 3: 256-d embeddings from the unimodal checkpoints ----
    from multimodalfusion_tpu.cli.pre_trained_feature import main as s3
    t0 = time.perf_counter()
    cwd = os.getcwd()
    os.chdir(base)  # experiment txt stores cwd-relative paths
    try:
        for arm in ("path", "radio", "omic"):
            assert s3(["--checkpoint_path", exps[arm],
                       "--output_dir", os.path.join(base, "embed"),
                       "--which_k", "0"]) == 0
            sub = os.path.join(base, "embed", "brain", f"{arm}_pt_files")
            assert len(os.listdir(sub)) == 24, arm
    finally:
        os.chdir(cwd)
    report["stages"]["stage3_wall_s"] = round(time.perf_counter() - t0, 2)
    print(f"[stage3] {report['stages']['stage3_wall_s']}s",
          file=sys.stderr, flush=True)

    # ---- stage 4: trimodal fusion head on the embeddings + eval -----
    from multimodalfusion_tpu.cli.eval_pretrained import main as s4e
    from multimodalfusion_tpu.cli.main_pretrained import main as s4
    t0 = time.perf_counter()
    assert s4(_common(base, [
        "--mode", "radio_path_omic", "--model_type", "mm_attention_mil",
        "--train_type", "early-fcnn", "--bag_loss", "nll_surv",
        "--batch_size", "4", "--max_epochs", "5", "--lr", "1e-3",
        "--data_root_dir", os.path.join(base, "embed"),
        "--results_dir", os.path.join(base, "s4")])) == 0
    root4 = os.path.join(base, "s4", "brain", "2foldcv")
    exp4 = os.path.join(root4, os.listdir(root4)[0])
    summary4 = pd.read_csv(os.path.join(exp4, "summary.csv"))
    c4 = float(summary4["val_cindex"].iloc[0])
    os.chdir(base)
    try:
        assert s4e(["--model_path", exp4,
                    "--results_dir", os.path.join(base, "s4eval")]) == 0
    finally:
        os.chdir(cwd)
    report["stages"]["stage4"] = {
        "wall_s": round(time.perf_counter() - t0, 2),
        "val_cindex": round(c4, 4), "finite": bool(np.isfinite(c4))}
    print(f"[stage4] {report['stages']['stage4']}", file=sys.stderr,
          flush=True)

    # ---- stage 5: per-modality IG attributions ----------------------
    from multimodalfusion_tpu.cli.create_attributions import main as s5
    t0 = time.perf_counter()
    os.chdir(base)
    try:
        assert s5(["--model_path", exp4,
                   "--save_dir", os.path.join(base, "attr")]) == 0
    finally:
        os.chdir(cwd)
    attr_csv = None
    for root, _, files in os.walk(os.path.join(base, "attr")):
        if "attr.csv" in files:
            attr_csv = os.path.join(root, "attr.csv")
    attr = pd.read_csv(attr_csv)
    assert {"radio_attr", "path_attr", "omic_attr"} <= set(attr.columns)
    report["stages"]["stage5"] = {
        "wall_s": round(time.perf_counter() - t0, 2),
        "n_attr_rows": int(len(attr))}
    print(f"[stage5] {report['stages']['stage5']}", file=sys.stderr,
          flush=True)

    report["ok"] = all(
        s.get("finite", True) for s in report["stages"].values()
        if isinstance(s, dict))
    if allow_cpu and report["backend"] != "tpu":
        print(json.dumps({"ok": report["ok"],
                          "note": "CPU plumbing run, not recorded"}))
        return 0 if report["ok"] else 1
    out = os.path.join(REPO, "PERF_TRIMODAL.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps({"ok": report["ok"], "written": out}))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--allow_cpu"]
    base = args[0] if args else "/tmp/tpu_trimodal_fold"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    sys.exit(main(base, allow_cpu="--allow_cpu" in sys.argv))
