"""Evaluation with integrated Brier score (stage 4) — native rewrite of
ref utils/core_utils_pretrained.py:393-559 (eval_model /
summary_survival_ibs) without the sksurv dependency."""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from multimodalfusion_tpu import metrics as metrics_mod
from multimodalfusion_tpu.engine import train as train_mod
from multimodalfusion_tpu.engine.train import (TrainConfig, build_model,
                                               load_checkpoint,
                                               make_optimizer, make_steps,
                                               summary_survival)


def compute_ibs(train_event, train_time, test_event, test_time, S_bins,
                bins) -> float:
    """IBS at the discrete bin edges with the reference's clamping
    (ref core_utils_pretrained.py:539-556): test times above the train
    max are clamped; the evaluation grid is bins[1:] squeezed just inside
    the observed test range."""
    train_time = np.asarray(train_time, float)
    test_time = np.asarray(test_time, float).copy()
    tmax = train_time.max()
    test_time[test_time > tmax] = tmax
    times = np.asarray(bins[1:], float).copy()
    if times[0] <= test_time.min():
        times[0] = test_time.min() + 0.001
    if times[-1] >= test_time.max():
        times[-1] = test_time.max() - 0.001
    # survival columns pair with the grid POSITIONALLY, exactly as the
    # reference passes all_surv to sksurv (column k <-> times[k]) — the
    # edge clamps above must not shift which column is used.
    est = np.asarray(S_bins, np.float64)
    return float(metrics_mod.integrated_brier_score(
        train_event, train_time, test_event, test_time, est, times))


def summary_survival_ibs(cfg: TrainConfig, split, variables, eval_step, bins,
                         survival_train: Optional[Tuple] = None,
                         indices=None):
    """patient_results + c-index + IBS.  ``survival_train`` is
    (event, time) arrays from the training cohort; when None and the loss
    is an nll family, returns them instead (two-phase protocol identical
    to ref :477-556)."""
    patient_results, cindex = summary_survival(cfg, split, variables,
                                               eval_step, indices)
    nll_family = "nll" in cfg.bag_loss
    if not nll_family:
        return patient_results, cindex, float("nan")
    event = (1 - patient_results["censorship"]).astype(bool)
    time = patient_results["survival"]
    if survival_train is None:
        return (event, time)
    ibs = compute_ibs(survival_train[0], survival_train[1], event, time,
                      patient_results["prob"], bins)
    patient_results["times"] = np.asarray(bins[1:])
    return patient_results, cindex, ibs


def eval_model(datasets, cur: int, cfg: TrainConfig, bins,
               model_path: Optional[str] = None):
    """Load the fold's minloss checkpoint and evaluate val (and test)
    with c-index + IBS (ref eval_model :393-474)."""
    if cfg.split_mode == "train_val_test":
        train_split, val_split, test_split = datasets
    else:
        train_split, val_split = datasets
        test_split = None

    model = build_model(cfg)
    tx = make_optimizer(cfg)
    _, eval_step = make_steps(cfg, model, tx)

    from multimodalfusion_tpu.data.loaders import iter_batches, \
        usable_indices
    init_batch = next(iter_batches(val_split, batch_size=cfg.batch_size))
    init_batch.pop("subject_ids")
    import jax
    variables = dict(model.init({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                                deterministic=True,
                                **train_mod.model_inputs(cfg, init_batch)))
    ckpt = os.path.join(model_path or cfg.results_dir,
                        f"s_{cur}_minloss_checkpoint.msgpack")
    variables = load_checkpoint(ckpt, variables)

    if "nll" in cfg.bag_loss:
        # (event, time) for the censoring distribution are dataset labels;
        # no forward pass over the training cohort is needed (the
        # reference runs full inference here, core_utils_pretrained:455)
        tr_idx = usable_indices(train_split)
        tr_df = train_split.df.iloc[tr_idx]
        survival_train = (
            (1 - tr_df["censorship"].to_numpy(float)).astype(bool),
            tr_df[train_split.ds.label_col].to_numpy(float))
    else:
        survival_train = None

    # for non-nll losses summary_survival_ibs never touches survival_train
    st = survival_train if survival_train is not None else (
        np.zeros(0, bool), np.zeros(0))
    results_val, val_c, val_ibs = summary_survival_ibs(
        cfg, val_split, variables, eval_step, bins, st)
    if cfg.split_mode == "train_val_test":
        results_test, test_c, test_ibs = summary_survival_ibs(
            cfg, test_split, variables, eval_step, bins, st)
        return (results_val, val_c, val_ibs, results_test, test_c, test_ibs)
    return results_val, val_c, val_ibs
