"""Checkpoint-level parity for the attention-MIL stacks, end to end:

1. generate a reference-layout synthetic cohort (tests/fixtures.py),
2. TRAIN THE ACTUAL REFERENCE on it (tools/run_reference.py, CPU torch),
3. import the reference's trained `.pt` checkpoints into this framework
   (utils/torch_interop) and evaluate the same validation folds,
4. assert the val c-index matches the reference's own summary.csv to
   1e-9 and per-patient risks agree to <5e-3.

Measured 2026-08-16/17 (recorded in PARITY.md §3):
  path arm:  fold 0 both 0.8647058824, fold 1 both 0.8620689655
  radio arm: see PARITY.md table
Max per-patient risk |Δ| ~2.5e-3 (f32 vs f64 accumulation), identical
rankings.

Run:  python tools/parity_amil.py [path|radio] [workdir]
Needs /root/reference mounted. ~2-4 min (reference trains on CPU).
"""
import os
import pickle
import subprocess
import sys

import numpy as np
import pandas as pd

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS = {
    "path": {
        "mode": "path", "model_type": "path_attention_mil",
        "exp": "PATH_a0.6_s0",
        "ref_flags": ["--gate_path"],
        "cfg": dict(model_type="path_attention_mil", mode="path",
                    gate_path=True),
    },
    "radio": {
        "mode": "radio", "model_type": "radio_attention_mil",
        "exp": "RADIO_a0.6_s0",
        "ref_flags": ["--gate_radio", "--radio_fusion", "concat",
                      "--radio_mil_type", "attention"],
        "cfg": dict(model_type="radio_attention_mil", mode="radio",
                    gate_radio=True, radio_fusion="concat"),
    },
}


def main(arm: str, base: str) -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")  # tiny eval; never grab the TPU
    spec = ARMS[arm]
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from fixtures import make_cohort_csv, make_feature_store, make_splits

    csv_path, df, latent = make_cohort_csv(
        os.path.join(base, "dataset_csv", "brain"), n=80, seed=13)
    make_feature_store(os.path.join(base, "feat", "brain"), df, latent,
                       seed=13, bag_range=(20, 60))
    make_splits(os.path.join(base, "splits", "brain", "2foldcv"), df,
                k=2, val_frac=0.3, seed=13)
    os.makedirs(os.path.join(base, "ref_results"), exist_ok=True)

    env = dict(os.environ)
    # APPEND to the inherited PYTHONPATH (repo CLAUDE.md: the default
    # /root/.axon_site entry bootstraps the TPU plugin; never replace)
    env["PYTHONPATH"] = ":".join(
        [os.path.join(REPO, "tools", "ref_shims"), REPO, REF]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env["JAX_PLATFORMS"] = "cpu"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_reference.py"),
         os.path.join(REF, "main.py"),
         "--k", "2", "--which_splits", "2foldcv",
         "--split_mode", "train_val", "--task", "survival",
         "--data_root_dir", os.path.join(base, "feat"),
         "--mode", spec["mode"], "--model_type", spec["model_type"],
         "--max_epochs", "30", "--bag_loss", "nll_surv",
         "--batch_size", "1", "--seed", "0", "--n_classes", "4",
         "--drop_out", "--alpha_surv", "0.6", "--cancer_type", "brain",
         "--results_dir", os.path.join(base, "ref_results"),
         "--overwrite"] + spec["ref_flags"],
        cwd=base, env=env, input=b"n\n", check=True)

    exp = os.path.join(base, "ref_results", "brain", "2foldcv",
                       spec["exp"])
    ref_summary = pd.read_csv(os.path.join(exp, "summary.csv"))

    import jax
    from multimodalfusion_tpu.data.survival_dataset import SurvivalDataset
    from multimodalfusion_tpu.engine import train as train_mod
    from multimodalfusion_tpu.utils.torch_interop import (import_pt,
                                                          spec_from_config)

    cfg = train_mod.TrainConfig(bag_loss="nll_surv", n_classes=4,
                                drop_out=True, batch_size=1, seed=0,
                                **spec["cfg"])
    ds = SurvivalDataset(csv_path, mode=spec["mode"],
                         data_dir=os.path.join(base, "feat", "brain"),
                         n_bins=4)
    model = train_mod.build_model(cfg)
    tx = train_mod.make_optimizer(cfg)
    _, eval_step = train_mod.make_steps(cfg, model, tx)

    ok = True
    for fold in (0, 1):
        _, va = ds.load_splits(os.path.join(
            base, "splits", "brain", "2foldcv", f"splits_{fold}.csv"))
        idx = train_mod.usable_indices(va)
        init_batch = next(train_mod.iter_batches(va, batch_size=1,
                                                 indices=idx))
        init_batch.pop("subject_ids")
        variables = dict(model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            deterministic=True, **train_mod.model_inputs(cfg, init_batch)))
        variables = import_pt(
            os.path.join(exp, f"s_{fold}_checkpoint.pt"),
            spec_from_config(cfg), variables)
        results, cindex = train_mod.summary_survival(cfg, va, variables,
                                                     eval_step, idx)
        ref_c = float(ref_summary["val_cindex"].iloc[fold])
        with open(os.path.join(
                exp, f"split_train_val_{fold}_results.pkl"), "rb") as f:
            ref_res = pickle.load(f)
        ref_risks = dict(zip(ref_res["subject_id"],
                             np.asarray(ref_res["risk"], float)))
        max_d = max(abs(ref_risks[s] - float(r)) for s, r in
                    zip(results["subject_id"], results["risk"]))
        match = abs(cindex - ref_c) < 1e-9 and max_d < 5e-3
        ok &= match
        print(f"[{arm}] fold {fold}: ref c-index {ref_c:.10f}  "
              f"ours {cindex:.10f}  max risk |d| {max_d:.2e}  "
              f"{'MATCH' if match else 'MISMATCH'}")
    return 0 if ok else 1


if __name__ == "__main__":
    arm = sys.argv[1] if len(sys.argv) > 1 else "path"
    base = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/parity_{arm}_amil"
    sys.exit(main(arm, os.path.abspath(base)))
