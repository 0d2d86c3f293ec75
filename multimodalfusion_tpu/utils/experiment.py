"""Experiment naming + settings round-trip.

The reference encodes hyperparameters into an experiment code string
(ref main.py:156-192, main_pretrained.py:138-186) and dumps a python-dict
text file that downstream CLIs re-hydrate with ``eval()``
(ref main.py:275-277, eval_pretrained.py:104-105).  The same artifact is
written here, but read back with ``ast.literal_eval`` (no code
execution).
"""
from __future__ import annotations

import ast
import os
from typing import Optional


def experiment_code(args, pretrained: bool = False) -> str:
    """Reproduce the reference's param_code naming."""
    code = ""
    if args.model_type == "path_attention_mil":
        code += "PATH"
    elif args.model_type == "radio_attention_mil":
        code += "RADIO"
    elif args.model_type == "max_net":
        code += "OMICS"
    elif args.model_type == "mm_attention_mil":
        code += "MMF"
        if "radio" in args.mode:
            code += "_RADIO"
        if "path" in args.mode:
            code += "_PATH"
        if "omic" in args.mode:
            code += "_OMICS"
    else:
        raise NotImplementedError(
            f"model_type {args.model_type!r}; note pretrained head names "
            "(fcnn/highway/early-*/late-*/kronecker) belong in --train_type")

    code += "_a%s" % str(args.alpha_surv)
    if pretrained and getattr(args, "bag_loss", "") == "ranking_nll_surv":
        code += "_n%s" % str(args.nll_ratio)
    if args.lr != 2e-4:
        code += "_lr%s" % format(args.lr, ".0e")
    if args.reg_type != "None":
        code += "_reg%s" % format(args.lambda_reg, ".0e")
    if args.gc != 1:
        code += "_gc%s" % str(args.gc)
    code += "_s%s" % str(args.seed)
    if pretrained:
        code += "_%s" % str(args.train_type)
        if "highway" in (args.train_type or "") or \
                "residual" in (args.train_type or ""):
            code += "_nl%s" % str(args.n_layers)
    if getattr(args, "test", ""):
        code += f"_{args.test}"
    return code


def write_settings(results_dir: str, exp_code: str, settings: dict) -> str:
    path = os.path.join(results_dir, f"experiment_{exp_code}.txt")
    with open(path, "w") as f:
        print(settings, file=f)
    return path


def read_settings(path: str) -> dict:
    """Safe replacement for the reference's ``eval(f.read())``."""
    with open(path) as f:
        return ast.literal_eval(f.read())


def config_from_settings(settings: dict, **overrides):
    """Hydrate a TrainConfig from an experiment settings dict — the
    SINGLE source for the settings-txt -> config mapping (several CLIs
    previously hand-rolled partial copies, each silently dropping a
    different key subset).  ``pretrained`` is inferred from train_type
    unless overridden; pass overrides for CLI-level knobs
    (batch_size, results_dir, ...)."""
    from multimodalfusion_tpu.engine.train import TrainConfig
    pretrained = bool(settings.get("train_type"))
    kwargs = dict(
        # the reference records model_type (ref main.py:232) but guard
        # with .get so an override can supply it for partial txts
        model_type=settings.get("model_type"), mode=settings["mode"],
        modalities=tuple(settings["radio_modality"]),
        n_classes=settings["n_classes"],
        bag_loss=settings["bag_loss"],
        alpha_surv=settings.get("alpha_surv", 0.0),
        nll_ratio=settings.get("nll_ratio", 0.2),
        model_size_wsi=settings.get("model_size_wsi", "small"),
        model_size_radio=settings.get("model_size_radio", "small"),
        model_size_omic=settings.get("model_size_omic", "small"),
        fusion=settings.get("fusion"),
        radio_fusion=settings.get("radio_fusion") or "concat",
        gate=settings.get("gate_omic", False),
        gate_path=settings.get("gate_path", True),
        gate_radio=settings.get("gate_radio", True),
        drop_out=settings.get("use_drop_out", False),
        train_type=settings.get("train_type"),
        n_layers=settings.get("n_layers", 1),
        pretrained=pretrained,
        batch_size=settings.get("batch_size", 1),
        seed=settings["seed"],
        split_mode=settings.get("split_mode", "train_val"),
    )
    kwargs.update(overrides)
    return TrainConfig(**kwargs)


def find_settings(results_dir: str) -> Optional[str]:
    for name in sorted(os.listdir(results_dir)):
        if name.startswith("experiment_") and name.endswith(".txt"):
            return os.path.join(results_dir, name)
    return None
