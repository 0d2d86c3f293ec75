"""Stage 2 -> 3 -> 4 pipeline parity against the reference AS RUN.

Extends tools/parity_amil.py (stage-2 checkpoint parity) through the
whole fusion pipeline, path arm:

  stage 2: train the shipped reference's path AMIL (CPU torch) on a
           reference-layout synthetic cohort; import its checkpoints
           here; val c-index must match its summary.csv exactly.
  stage 3: run the reference's pre_trained_feature.py to extract 256-d
           embeddings from its own checkpoint; run THIS repo's
           cli.pre_trained_feature on the same (imported) checkpoint;
           per-subject embeddings must agree to ~1e-6 relative.
  stage 4: train the reference's main_pretrained.py fcnn head on the
           reference-extracted embeddings; import the head checkpoints
           here; val c-index must again match exactly.

Measured 2026-08-17 (recorded in PARITY.md §3): every stage MATCHES —
stage 2 c-index identical to all printed digits, stage 3 worst relative
embedding delta 1.1e-6 over 80 subjects, stage 4 c-index identical with
per-patient risk deltas < 4e-7.

Run:  python tools/parity_pipeline.py [workdir]
Needs /root/reference mounted. ~6-10 min (reference trains on CPU).
"""
import os
import pickle
import shutil
import subprocess
import sys

import numpy as np
import pandas as pd

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ref_env():
    env = dict(os.environ)
    # APPEND to the inherited PYTHONPATH (repo CLAUDE.md: the default
    # /root/.axon_site entry bootstraps the TPU plugin; never replace)
    env["PYTHONPATH"] = ":".join(
        [os.path.join(REPO, "tools", "ref_shims"), REPO, REF]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run_ref(base, script, args):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_reference.py"),
         os.path.join(REF, script)] + args,
        cwd=base, env=_ref_env(), input=b"n\n", check=True)


def _import_and_eval(cfg, ds, exp, fold, batch_size):
    import jax
    from multimodalfusion_tpu.engine import train as train_mod
    from multimodalfusion_tpu.utils.torch_interop import (import_pt,
                                                          spec_from_config)
    model = train_mod.build_model(cfg)
    tx = train_mod.make_optimizer(cfg)
    _, eval_step = train_mod.make_steps(cfg, model, tx)
    _, va = ds.load_splits(os.path.join(
        os.path.dirname(os.path.dirname(exp)), "..", "..",
        "splits", "brain", "2foldcv", f"splits_{fold}.csv"))
    idx = train_mod.usable_indices(va)
    init_batch = next(train_mod.iter_batches(va, batch_size=batch_size,
                                             indices=idx))
    init_batch.pop("subject_ids")
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        deterministic=True, **train_mod.model_inputs(cfg, init_batch)))
    variables = import_pt(os.path.join(exp, f"s_{fold}_checkpoint.pt"),
                          spec_from_config(cfg), variables)
    results, cindex = train_mod.summary_survival(cfg, va, variables,
                                                 eval_step, idx)
    return results, cindex, variables


def _check_fold(tag, exp, fold, results, cindex, tol_risk=5e-3):
    ref_summary = pd.read_csv(os.path.join(exp, "summary.csv"))
    ref_c = float(ref_summary["val_cindex"].iloc[fold])
    with open(os.path.join(exp, f"split_train_val_{fold}_results.pkl"),
              "rb") as f:
        ref_res = pickle.load(f)
    ref_risks = dict(zip(ref_res["subject_id"],
                         np.asarray(ref_res["risk"], float)))
    max_d = max(abs(ref_risks[s] - float(r)) for s, r in
                zip(results["subject_id"], results["risk"]))
    match = abs(cindex - ref_c) < 1e-9 and max_d < tol_risk
    print(f"[{tag}] fold {fold}: ref {ref_c:.10f} ours {cindex:.10f} "
          f"max risk |d| {max_d:.2e} {'MATCH' if match else 'MISMATCH'}")
    return match


def main(base: str) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from flax import serialization
    from fixtures import make_cohort_csv, make_feature_store, make_splits
    from multimodalfusion_tpu.data.io import load_pt
    from multimodalfusion_tpu.data.survival_dataset import SurvivalDataset
    from multimodalfusion_tpu.engine import train as train_mod

    csv_path, df, latent = make_cohort_csv(
        os.path.join(base, "dataset_csv", "brain"), n=80, seed=13)
    make_feature_store(os.path.join(base, "feat", "brain"), df, latent,
                       seed=13, bag_range=(20, 60))
    make_splits(os.path.join(base, "splits", "brain", "2foldcv"), df,
                k=2, val_frac=0.3, seed=13)
    ok = True

    # stage-2/3 arm configurations: one per extractor branch (path AMIL,
    # radio AMIL, omic MaxNet; max_net must use cox — the reference's
    # nll+max_net combination crashes as shipped, see PARITY.md §5)
    ARMS = {
        "path": dict(
            flags=["--mode", "path", "--model_type", "path_attention_mil",
                   "--bag_loss", "nll_surv", "--batch_size", "1",
                   "--gate_path"],
            exp="PATH_a0.6_s0", batch=1,
            cfg=dict(model_type="path_attention_mil", mode="path",
                     bag_loss="nll_surv", gate_path=True)),
        "radio": dict(
            flags=["--mode", "radio", "--model_type",
                   "radio_attention_mil", "--bag_loss", "nll_surv",
                   "--batch_size", "1", "--gate_radio",
                   "--radio_fusion", "concat",
                   "--radio_mil_type", "attention"],
            exp="RADIO_a0.6_s0", batch=1,
            cfg=dict(model_type="radio_attention_mil", mode="radio",
                     bag_loss="nll_surv", gate_radio=True,
                     radio_fusion="concat")),
        "omic": dict(
            flags=["--mode", "omic", "--model_type", "max_net",
                   "--bag_loss", "cox_surv", "--batch_size", "32"],
            exp="OMICS_a0.6_s0", batch=32,
            cfg=dict(model_type="max_net", mode="omic",
                     bag_loss="cox_surv")),
    }

    exp_path = None
    os.makedirs(os.path.join(base, "ref_results"), exist_ok=True)
    from multimodalfusion_tpu.cli.pre_trained_feature import \
        main as extract_main
    for arm, spec in ARMS.items():
        # ---- stage 2: reference training + checkpoint import ----
        _run_ref(base, "main.py", [
            "--k", "2", "--which_splits", "2foldcv", "--split_mode",
            "train_val", "--task", "survival",
            "--data_root_dir", os.path.join(base, "feat"),
            "--max_epochs", "30", "--seed", "0", "--n_classes", "4",
            "--drop_out", "--alpha_surv", "0.6", "--cancer_type", "brain",
            "--results_dir", os.path.join(base, "ref_results"),
            "--overwrite"] + spec["flags"])
        exp2 = os.path.join(base, "ref_results", "brain", "2foldcv",
                            spec["exp"])
        cfg2 = train_mod.TrainConfig(n_classes=4, drop_out=True,
                                     batch_size=spec["batch"], seed=0,
                                     **spec["cfg"])
        ds2 = SurvivalDataset(csv_path, mode=spec["cfg"]["mode"],
                              data_dir=os.path.join(base, "feat",
                                                    "brain"),
                              n_bins=4)
        for fold in (0, 1):
            results, cindex, variables = _import_and_eval(
                cfg2, ds2, exp2, fold, spec["batch"])
            ok &= _check_fold(f"stage2 {arm}", exp2, fold, results,
                              cindex)
            if fold == 0:
                # the reference extractor wants a minloss checkpoint;
                # ours wants msgpack — provide both from the fold-0 ckpt
                shutil.copy(os.path.join(exp2, "s_0_checkpoint.pt"),
                            os.path.join(exp2,
                                         "s_0_minloss_checkpoint.pt"))
                with open(os.path.join(exp2,
                                       "s_0_minloss_checkpoint.msgpack"),
                          "wb") as f:
                    f.write(serialization.to_bytes(variables))
        if arm == "path":
            exp_path = exp2

        # ---- stage 3: embedding extraction, reference vs ours ----
        _run_ref(base, "pre_trained_feature.py", [
            "--checkpoint_path", exp2,
            "--output_dir", os.path.join(base, "ref_embed"),
            "--which_k", "0", "--extraction_csv_path", csv_path])
        cwd = os.getcwd()
        os.chdir(base)  # experiment txt stores cwd-relative paths
        try:
            rc = extract_main(
                ["--checkpoint_path", exp2,
                 "--output_dir", os.path.join(base, "our_embed"),
                 "--which_k", "0", "--extraction_csv_path", csv_path])
        finally:
            os.chdir(cwd)
        assert rc == 0
        sub = f"{arm}_pt_files"
        ref_dir = os.path.join(base, "ref_embed", "brain", sub)
        our_dir = os.path.join(base, "our_embed", "brain", sub)
        ref_files = sorted(os.listdir(ref_dir))
        assert ref_files == sorted(os.listdir(our_dir)), arm
        worst = 0.0
        for f in ref_files:
            a = load_pt(os.path.join(ref_dir, f)).reshape(-1)
            b = load_pt(os.path.join(our_dir, f)).reshape(-1)
            worst = max(worst, float(np.abs(a - b).max() /
                                     max(np.abs(a).max(), 1e-8)))
        stage3_ok = worst < 1e-4
        ok &= stage3_ok
        print(f"[stage3 {arm} embeddings] {len(ref_files)} subjects, "
              f"worst rel |d| {worst:.2e} "
              f"{'MATCH' if stage3_ok else 'MISMATCH'}")
    exp2 = exp_path  # stage 4 consumes the path embeddings

    # ---- stage 4: reference head training + checkpoint import ----
    os.makedirs(os.path.join(base, "ref_results4"), exist_ok=True)
    _run_ref(base, "main_pretrained.py", [
        "--k", "2", "--which_splits", "2foldcv", "--split_mode",
        "train_val", "--task", "survival",
        "--data_root_dir", os.path.join(base, "ref_embed"),
        "--mode", "path", "--model_type", "path_attention_mil",
        "--train_type", "fcnn", "--max_epochs", "20",
        "--bag_loss", "nll_surv", "--batch_size", "16", "--seed", "0",
        "--n_classes", "4", "--cancer_type", "brain",
        "--results_dir", os.path.join(base, "ref_results4"),
        "--overwrite"])
    exp4 = os.path.join(base, "ref_results4", "brain", "2foldcv",
                        "PATH_nll_surv_a0.0_fcnn_s0")
    cfg4 = train_mod.TrainConfig(model_type="path_attention_mil",
                                 mode="path", bag_loss="nll_surv",
                                 n_classes=4, train_type="fcnn",
                                 n_layers=1, pretrained=True,
                                 batch_size=16, seed=0)
    ds4 = SurvivalDataset(csv_path, mode="path",
                          data_dir=os.path.join(base, "ref_embed",
                                                "brain"),
                          n_bins=4, pretrained=True)
    for fold in (0, 1):
        results, cindex, _ = _import_and_eval(cfg4, ds4, exp4, fold, 16)
        ok &= _check_fold("stage4 path-fcnn", exp4, fold, results, cindex)

    # ---- stage 4, coxranking family (scalar-risk heads): the other
    # pretrained model family as-run (ref coxranking_models_pretrained,
    # dispatched when bag_loss lacks 'nll_surv',
    # core_utils_pretrained.py:77-85) ----
    _run_ref(base, "main_pretrained.py", [
        "--k", "2", "--which_splits", "2foldcv", "--split_mode",
        "train_val", "--task", "survival",
        "--data_root_dir", os.path.join(base, "ref_embed"),
        "--mode", "path", "--model_type", "path_attention_mil",
        "--train_type", "fcnn", "--max_epochs", "20",
        "--bag_loss", "cox_surv", "--batch_size", "16", "--seed", "0",
        "--n_classes", "4", "--cancer_type", "brain",
        "--results_dir", os.path.join(base, "ref_results4"),
        "--overwrite"])
    root4 = os.path.join(base, "ref_results4", "brain", "2foldcv")
    exp4c = os.path.join(root4, next(
        d for d in os.listdir(root4) if d.startswith("PATH_cox_surv")))
    cfg4c = train_mod.TrainConfig(model_type="path_attention_mil",
                                  mode="path", bag_loss="cox_surv",
                                  n_classes=4, train_type="fcnn",
                                  n_layers=1, pretrained=True,
                                  batch_size=16, seed=0)
    for fold in (0, 1):
        results, cindex, _ = _import_and_eval(cfg4c, ds4, exp4c, fold, 16)
        ok &= _check_fold("stage4 path-fcnn-cox", exp4c, fold, results,
                          cindex)

    print("PIPELINE PARITY:", "ALL MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_pipeline"
    sys.exit(main(os.path.abspath(base)))
