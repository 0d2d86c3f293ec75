"""Torch checkpoint interop: map reference state_dicts onto flax
variables and export flax variables back to reference-shaped state_dicts.

Enables (a) loading checkpoints trained with the reference PyTorch code
into this framework (c-index parity checks) and (b) exporting .pt files
the reference's downstream tooling can read (ref checkpoint names
s_{k}_checkpoint.pt etc., core_utils.py:152-159).

Coverage (reference modules -> flax params; torch Linear weights are
[out, in], flax kernels are [in, out]; BatchNorm running stats live in
the flax ``batch_stats`` collection):

  max_net (model_genomic.py:13-46)
  path/radio attention MIL (model_attention_mil_{path,radio}.py)
  mm_attention_mil (model_mm_attention_mil.py:34-200): SNN blocks,
    both AMIL branches, reduce_dim / radio_xfusion, mm XlinearFusion,
    tensor- and concat-fusion classifiers
  stage-4 pretrained heads (nll_models_pretrained.py:14-197,
    coxranking_models_pretrained.py:14-183): fcnn / highway / residual
    unimodal heads and early/late-fcnn, early/late-highway, kronecker
    multimodal heads, including BatchNorm weights *and* running stats.

The mapping is driven by a *spec*: a flat list of entries
  ("linear", torch_prefix, flax_path)
  ("bn",     torch_prefix, flax_path)         # BatchNorm1d
  ("attn",   torch_prefix, flax_path, gated, dropout)
built by :func:`build_spec` / :func:`spec_from_config`.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

Entry = Tuple  # ("linear"|"bn"|"attn", torch_prefix, flax_path, ...)


def _t2f(w):
    return np.asarray(w).T.copy()


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set(tree, path, val):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = val


# ---------------------------------------------------------------------------
# spec builders for composite reference modules
# ---------------------------------------------------------------------------

def _xfusion_entries(tp: str, fp: List[str], n_mod: int,
                     gate: bool = True) -> List[Entry]:
    """XlinearFusion (ref model_modules.py:113-178): per-modality reduce
    triples (Sequential nests the Linear at .0) + two encoders."""
    es: List[Entry] = []
    for i in range(n_mod):
        es.append(("linear", f"{tp}.reduce.{i}.0.0", fp + [f"reduce_{i}_h"]))
        if gate:
            es.append(("linear", f"{tp}.reduce.{i}.1.0",
                       fp + [f"reduce_{i}_z"]))
            es.append(("linear", f"{tp}.reduce.{i}.2.0",
                       fp + [f"reduce_{i}_o"]))
        else:
            es.append(("linear", f"{tp}.reduce.{i}.1.0",
                       fp + [f"reduce_{i}_o"]))
    es.append(("linear", f"{tp}.encoder1.0", fp + ["encoder1"]))
    es.append(("linear", f"{tp}.encoder2.0", fp + ["encoder2"]))
    return es


def _radio_xfusion_entries(n_modalities: int) -> List[Entry]:
    """The reference constructs the radiology XlinearFusion with the
    DEFAULT num_modalities=4 regardless of the actual sequence count
    (model_mm_attention_mil.py:57, model_attention_mil_radio.py:29), so
    its checkpoints always carry 4 reduce blocks, a 4096-wide linear_z
    and a 17**4-wide encoder1 (its forward crashes for any other count,
    so !=4 configs are never runnable reference-side).  Export real
    params only when our model's block count matches (n_modalities==4);
    otherwise emit reference-shaped placeholders so strict
    load_state_dict succeeds."""
    if n_modalities == 4:
        return _xfusion_entries("radio_xfusion", ["radio_xfusion"], 4)
    return [("fill_xfusion", "radio_xfusion",
             (1024, 64, 1024, 1024, 4, True, False))]


def _highway_entries(tp: str, fp: List[str], n_layers: int) -> List[Entry]:
    """Highway (ref model_modules.py:5-26)."""
    es: List[Entry] = [("bn", f"{tp}.bn1", fp + ["bn1"]),
                       ("bn", f"{tp}.bn2", fp + ["bn2"])]
    for i in range(n_layers):
        es.append(("linear", f"{tp}.nonlinear.{i}", fp + [f"nonlinear_{i}"]))
        es.append(("linear", f"{tp}.linear.{i}", fp + [f"linear_{i}"]))
        es.append(("linear", f"{tp}.gate.{i}", fp + [f"gate_{i}"]))
    return es


def _residual_entries(tp: str, fp: List[str], n_layers: int) -> List[Entry]:
    """Residual stack (ref model_modules.py:28-59)."""
    es: List[Entry] = []
    for i in range(n_layers):
        base, fpb = f"{tp}.blocks.{i}", fp + [f"ResidualBlock_{i}"]
        es += [("linear", f"{base}.fc1", fpb + ["Dense_0"]),
               ("bn", f"{base}.bn1", fpb + ["BatchNorm_0"]),
               ("linear", f"{base}.fc2", fpb + ["Dense_1"]),
               ("bn", f"{base}.bn2", fpb + ["BatchNorm_1"])]
    return es


def _snn_entries(tp: str, n_blocks: int = 2) -> List[Entry]:
    """MaxNet-style SNN stack (ref model_genomic.py:21-25); the SNN_Block
    Sequential nests the Linear at .0."""
    return [("linear", f"{tp}.{i}.0", [f"fc_omic_{i}", "Dense_0"])
            for i in range(n_blocks)]


def _present(mode: str) -> List[str]:
    return [m for m in ("radio", "path", "omic") if m in (mode or "")]


def _is_nll(bag_loss: str) -> bool:
    bl = bag_loss or ""
    return "nll_surv" in bl or "ce" in bl


def build_spec(model_type: str, *, pretrained: bool = False,
               mode: str = "omic", train_type: str = "fcnn",
               bag_loss: str = "nll_surv", n_layers: int = 1,
               fusion: str = "tensor", radio_fusion: str = "concat",
               gate: bool = True, gate_path: bool = True,
               gate_radio: bool = True, gated: bool = True,
               attn_dropout: bool = False,
               n_modalities: int = 4,
               omic_input_dim: int = 0) -> List[Entry]:
    """Build the torch<->flax mapping spec for any model the framework's
    ``build_model`` can construct (engine/train.py)."""
    if pretrained:
        if model_type == "mm_attention_mil":
            return _multimodal_pretrained_spec(mode, train_type, bag_loss,
                                               n_layers)
        return _unimodal_pretrained_spec(train_type, bag_loss, n_layers)

    if model_type == "max_net":
        return _snn_entries("fc_omic") + [("linear", "classifier",
                                           ["classifier"])]

    if model_type in ("path_attention_mil", "radio_attention_mil"):
        net = ("attention_net_WSI" if model_type == "path_attention_mil"
               else "attention_net_radio")
        es: List[Entry] = [("linear", f"{net}.0", ["fc"]),
                           ("attn", f"{net}.3", ["attention_net"], gated,
                            attn_dropout),
                           ("linear", "classifier", ["classifier"])]
        if model_type == "radio_attention_mil":
            if radio_fusion == "tensor":
                es += _radio_xfusion_entries(n_modalities)
            else:
                es.append(("linear", "reduce_dim", ["reduce_dim"]))
        return es

    if model_type == "mm_attention_mil":
        return _mm_attention_mil_spec(mode, fusion, radio_fusion, gate,
                                      gate_path, gate_radio, attn_dropout,
                                      n_modalities, omic_input_dim)
    raise NotImplementedError(model_type)


def _mm_attention_mil_spec(mode, fusion, radio_fusion, gate, gate_path,
                           gate_radio, attn_dropout,
                           n_modalities, omic_input_dim=0) -> List[Entry]:
    """MM_MIL_Attention_fc_surv (ref model_mm_attention_mil.py:34-200).

    The reference instantiates fc_omic, attention_net_radio,
    attention_net_WSI and the radio_fusion module UNCONDITIONALLY
    (:36-75), so its checkpoints carry never-trained params for inactive
    branches and its strict load_state_dict expects those keys.  Our
    flax model is mode-gated; for branches we do not build, export
    emits deterministic xavier-initialized placeholders ("fill_*"
    entries) so the exported .pt loads reference-side with strict=True.
    'small' model sizes assumed (1024/256, ref :28-30)."""
    es: List[Entry] = []
    have_radio = "radio" in mode
    if have_radio:
        es.append(("linear", "attention_net_radio.0", ["fc_radio"]))
        es.append(("attn", "attention_net_radio.3", ["attention_net_radio"],
                   gate_radio, attn_dropout))
    else:
        es.append(("fill_linear", "attention_net_radio.0", (1024, 256)))
        es.append(("fill_attn", "attention_net_radio.3", (256, 256),
                   gate_radio, attn_dropout))
    # the reference builds the radio_fusion module from radio_fusion
    # ALONE, regardless of mode/modality count (ref :56-61), and always
    # with the default num_modalities=4 (see _radio_xfusion_entries):
    # radio in mode with exactly 4 modalities maps to real params,
    # everything else fills with the reference's 4-block shapes
    if radio_fusion == "tensor":
        if have_radio and n_modalities > 1:
            es += _radio_xfusion_entries(n_modalities)
        else:
            # XlinearFusion(dim=1024, scale_dim=64, mmhid1/2=1024,
            # skip=0, gate default, num_modalities default 4) (ref :57)
            es.append(("fill_xfusion", "radio_xfusion",
                       (1024, 64, 1024, 1024, 4, True, False)))
    else:
        if have_radio and n_modalities > 1:
            es.append(("linear", "reduce_dim", ["reduce_dim"]))
        else:
            # reduce_dim exists for concat even with one modality or no
            # radio branch (Linear(1024*n, 1024), ref :61)
            es.append(("fill_linear", "reduce_dim",
                       (1024 * n_modalities, 1024)))
    if "path" in mode:
        es.append(("linear", "attention_net_WSI.0", ["fc_WSI"]))
        es.append(("attn", "attention_net_WSI.3", ["attention_net_WSI"],
                   gate_path, attn_dropout))
    else:
        es.append(("fill_linear", "attention_net_WSI.0", (1024, 256)))
        es.append(("fill_attn", "attention_net_WSI.3", (256, 256),
                   gate_path, attn_dropout))
    if "omic" in mode:
        es += _snn_entries("fc_omic")
    elif omic_input_dim > 0:
        # SNN_Block Sequential nests the Linear at .0 (ref :36-40);
        # input width is the cohort's genomic dim — unknown when the
        # config has none, in which case the filler is skipped
        es.append(("fill_linear", "fc_omic.0.0", (omic_input_dim, 256)))
        es.append(("fill_linear", "fc_omic.1.0", (256, 256)))
    if fusion == "tensor":
        es += _xfusion_entries("mm", ["mm"], len(_present(mode)), gate=gate)
        # classifier Sequential(Linear(512,256), ReLU, Dropout, Linear)
        # (ref :91)
        es += [("linear", "classifier.0", ["classifier_0"]),
               ("linear", "classifier.3", ["classifier_1"])]
    else:
        es.append(("linear", "classifier", ["classifier"]))
    return es


def _unimodal_pretrained_spec(train_type, bag_loss, n_layers) -> List[Entry]:
    """unimonal_pretrained (ref nll_models_pretrained.py:14-62,
    coxranking_models_pretrained.py:14-58)."""
    nll = _is_nll(bag_loss)
    if train_type == "fcnn":
        if nll:
            # Sequential(Linear, Dropout) (ref nll :23)
            return [("linear", "classifier.0", ["classifier"])]
        # Sequential(Linear, BN, ReLU, Dropout, Linear) (ref coxranking :23)
        return [("linear", "classifier.0", ["classifier_0"]),
                ("bn", "classifier.1", ["classifier_bn"]),
                ("linear", "classifier.4", ["classifier_1"])]
    if train_type == "highway":
        return (_highway_entries("highway", ["highway"], n_layers)
                + [("linear", "classifier", ["classifier"])])
    if train_type == "residual":
        return (_residual_entries("residual", ["residual"], n_layers)
                + [("linear", "classifier", ["classifier"])])
    raise NotImplementedError(train_type)


def _multimodal_pretrained_spec(mode, train_type, bag_loss,
                                n_layers) -> List[Entry]:
    """multimodal_pretrained (ref nll_models_pretrained.py:66-197,
    coxranking_models_pretrained.py:62-183)."""
    if train_type == "multimodal-dropout":
        train_type = "late-fcnn"   # the head the freeze markers target
    nll = _is_nll(bag_loss)
    present = _present(mode)
    tname = {"radio": "MRI", "path": "WSI", "omic": "omic"}
    es: List[Entry] = []
    if train_type == "late-fcnn":
        for m in present:
            t = f"layer_{tname[m]}"
            es += [("linear", f"{t}.0", [f"{t}_0"]),
                   ("bn", f"{t}.1", [f"{t}_bn"])]
            if not nll:
                # coxranking adds a per-modality Linear(128,1) (ref :81-83)
                es.append(("linear", f"{t}.4", [f"{t}_1"]))
        es.append(("linear", "classifier.0", ["classifier"]))
    elif train_type == "early-fcnn":
        es += [("linear", "classifier.0", ["classifier_0"]),
               ("bn", "classifier.1", ["classifier_bn"]),
               ("linear", "classifier.4", ["classifier_1"])]
    elif train_type == "early-highway":
        es += _highway_entries("highway", ["highway"], n_layers)
        es.append(("linear", "classifier", ["classifier"]))
    elif train_type == "late-highway":
        for m in present:
            es += _highway_entries(f"highway_{m}", [f"highway_{m}"],
                                   n_layers)
        es.append(("linear", "classifier", ["classifier"]))
    elif train_type == "kronecker":
        es += _xfusion_entries("xfusion", ["xfusion"], len(present))
        es.append(("linear", "classifier", ["classifier"]))
    else:
        raise NotImplementedError(train_type)
    return es


def spec_from_config(cfg) -> List[Entry]:
    """Build the interop spec for a TrainConfig (mirrors build_model's
    dispatch, engine/train.py)."""
    gated = (cfg.gate_path if cfg.model_type == "path_attention_mil"
             else cfg.gate_radio)
    return build_spec(
        cfg.model_type, pretrained=cfg.pretrained, mode=cfg.mode,
        train_type=cfg.train_type, bag_loss=cfg.bag_loss,
        n_layers=cfg.n_layers, fusion=cfg.fusion or "tensor",
        radio_fusion=cfg.radio_fusion or "concat", gate=cfg.gate,
        gate_path=cfg.gate_path, gate_radio=cfg.gate_radio, gated=gated,
        attn_dropout=cfg.drop_out, n_modalities=len(cfg.modalities),
        omic_input_dim=cfg.omic_input_dim)


# ---------------------------------------------------------------------------
# spec-driven conversion on full variables {"params", "batch_stats"}
# ---------------------------------------------------------------------------

def _attn_import(sd, params, tp, fp, gated, dropout):
    if gated:
        mapping = [(f"{tp}.attention_a.0", "Wa", "ba"),
                   (f"{tp}.attention_b.0", "Wb", "bb"),
                   (f"{tp}.attention_c", "wc", "cc")]
    else:
        # Attn_Net: module.0 = Linear, last Linear at .2 (.3 with dropout)
        last = (f"{tp}.module.3" if f"{tp}.module.3.weight" in sd
                else f"{tp}.module.2")
        mapping = [(f"{tp}.module.0", "Wa", "ba"), (last, "wc", "cc")]
    for prefix, wname, bname in mapping:
        if f"{prefix}.weight" in sd:
            _set(params, fp + [wname], _t2f(sd[f"{prefix}.weight"]))
            _set(params, fp + [bname], np.asarray(sd[f"{prefix}.bias"]))


def _attn_export(sd, params, tp, fp, gated, dropout, torch):
    attn = _get(params, fp)
    if gated:
        pairs = [(f"{tp}.attention_a.0", "Wa", "ba"),
                 (f"{tp}.attention_b.0", "Wb", "bb"),
                 (f"{tp}.attention_c", "wc", "cc")]
    else:
        last = f"{tp}.module.3" if dropout else f"{tp}.module.2"
        pairs = [(f"{tp}.module.0", "Wa", "ba"), (last, "wc", "cc")]
    for prefix, wname, bname in pairs:
        sd[f"{prefix}.weight"] = torch.tensor(
            np.asarray(attn[wname]).T.copy())
        sd[f"{prefix}.bias"] = torch.tensor(np.asarray(attn[bname]).copy())


def _fill_rng(key: str):
    import zlib
    return np.random.default_rng(zlib.crc32(key.encode()))


def _fill_linear(sd, tp, in_dim, out_dim, torch):
    """Deterministic xavier-normal weights + zero bias for a reference
    module our mode-gated flax model never instantiates (the reference
    builds every branch unconditionally and its checkpoints carry the
    never-trained params; strict load_state_dict needs the keys).
    Very large fills (the Kronecker encoder1 reaches (dim+1)^n inputs)
    are zero-filled — generating 10^8 random values per checkpoint save
    would dominate export time, and the branch is unused either way."""
    if in_dim * out_dim > 4_000_000:
        w = np.zeros((out_dim, in_dim), np.float32)
    else:
        std = float(np.sqrt(2.0 / (in_dim + out_dim)))
        w = _fill_rng(tp).normal(0.0, std,
                                 size=(out_dim, in_dim)).astype(np.float32)
    sd[f"{tp}.weight"] = torch.tensor(w)
    sd[f"{tp}.bias"] = torch.zeros(out_dim)


def _fill_xfusion(sd, tp, dim_og, scale_dim, mmhid1, mmhid2, n_mod, gate,
                  skip, torch):
    """Reference XlinearFusion layout (model_modules.py:113-155):
    reduce.{i} = [Sequential(Linear(dim_og, d)), Sequential(Linear(
    dim_og*n, d)) if gate, Sequential(Linear(d, d))], encoder1.0 =
    Linear((d+1)^n, mmhid1), encoder2.0 = Linear(mmhid1+skip_dim,
    mmhid2)."""
    d = dim_og // scale_dim
    for i in range(n_mod):
        _fill_linear(sd, f"{tp}.reduce.{i}.0.0", dim_og, d, torch)
        if gate:
            _fill_linear(sd, f"{tp}.reduce.{i}.1.0", dim_og * n_mod, d,
                         torch)
            _fill_linear(sd, f"{tp}.reduce.{i}.2.0", d, d, torch)
        else:
            _fill_linear(sd, f"{tp}.reduce.{i}.1.0", d, d, torch)
    _fill_linear(sd, f"{tp}.encoder1.0", (d + 1) ** n_mod, mmhid1, torch)
    skip_dim = dim_og * n_mod if skip else 0
    _fill_linear(sd, f"{tp}.encoder2.0", mmhid1 + skip_dim, mmhid2, torch)


def _fill_attn(sd, tp, L, D, gated, dropout, torch):
    if gated:
        _fill_linear(sd, f"{tp}.attention_a.0", L, D, torch)
        _fill_linear(sd, f"{tp}.attention_b.0", L, D, torch)
        _fill_linear(sd, f"{tp}.attention_c", D, 1, torch)
    else:
        last = f"{tp}.module.3" if dropout else f"{tp}.module.2"
        _fill_linear(sd, f"{tp}.module.0", L, D, torch)
        _fill_linear(sd, last, D, 1, torch)


def torch_to_variables(spec: Sequence[Entry], state_dict: Dict,
                       variables_template: Dict) -> Dict:
    """Fill a copy of variables_template ({"params": ..., optionally
    "batch_stats": ...}) from a reference state_dict.  Missing keys keep
    template values (strict=False semantics, ref core_utils.py:110-111)."""
    import jax
    import jax.numpy as jnp
    sd = {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    variables = jax.tree.map(np.asarray, dict(variables_template))
    params = variables.get("params", variables)
    stats = variables.get("batch_stats")

    for entry in spec:
        kind, tp, fp = entry[0], entry[1], list(entry[2])
        if kind == "linear":
            if f"{tp}.weight" in sd:
                _set(params, fp + ["kernel"], _t2f(sd[f"{tp}.weight"]))
                _set(params, fp + ["bias"], np.asarray(sd[f"{tp}.bias"]))
        elif kind == "bn":
            if f"{tp}.weight" in sd:
                _set(params, fp + ["scale"], np.asarray(sd[f"{tp}.weight"]))
                _set(params, fp + ["bias"], np.asarray(sd[f"{tp}.bias"]))
            if stats is not None and f"{tp}.running_mean" in sd:
                _set(stats, fp + ["mean"],
                     np.asarray(sd[f"{tp}.running_mean"]))
                _set(stats, fp + ["var"],
                     np.asarray(sd[f"{tp}.running_var"]))
        elif kind == "attn":
            _attn_import(sd, params, tp, fp, entry[3], entry[4])
        elif kind in ("fill_linear", "fill_attn", "fill_xfusion"):
            pass  # export-only placeholders; nothing to import
        else:
            raise ValueError(kind)
    return jax.tree.map(jnp.asarray, variables)


def variables_to_torch(spec: Sequence[Entry], variables: Dict) -> Dict:
    """Export flax variables to a reference-shaped torch state_dict
    (including BatchNorm running stats)."""
    import torch
    variables = dict(variables)
    params = variables.get("params", variables)
    stats = variables.get("batch_stats", {})
    sd: Dict = {}

    for entry in spec:
        kind, tp, fp = entry[0], entry[1], list(entry[2])
        if kind == "linear":
            k = np.asarray(_get(params, fp + ["kernel"]))
            b = np.asarray(_get(params, fp + ["bias"]))
            sd[f"{tp}.weight"] = torch.tensor(k.T.copy())
            sd[f"{tp}.bias"] = torch.tensor(b.copy())
        elif kind == "bn":
            sd[f"{tp}.weight"] = torch.tensor(
                np.asarray(_get(params, fp + ["scale"])).copy())
            sd[f"{tp}.bias"] = torch.tensor(
                np.asarray(_get(params, fp + ["bias"])).copy())
            try:
                mean = np.asarray(_get(stats, fp + ["mean"]))
                var = np.asarray(_get(stats, fp + ["var"]))
            except (KeyError, TypeError):
                mean, var = (np.zeros_like(sd[f"{tp}.weight"].numpy()),
                             np.ones_like(sd[f"{tp}.weight"].numpy()))
            sd[f"{tp}.running_mean"] = torch.tensor(mean.copy())
            sd[f"{tp}.running_var"] = torch.tensor(var.copy())
            sd[f"{tp}.num_batches_tracked"] = torch.tensor(0,
                                                           dtype=torch.long)
        elif kind == "attn":
            _attn_export(sd, params, tp, fp, entry[3], entry[4], torch)
        elif kind == "fill_linear":
            in_dim, out_dim = entry[2]
            _fill_linear(sd, tp, in_dim, out_dim, torch)
        elif kind == "fill_attn":
            L, D = entry[2]
            _fill_attn(sd, tp, L, D, entry[3], entry[4], torch)
        elif kind == "fill_xfusion":
            _fill_xfusion(sd, tp, *entry[2], torch)
        else:
            raise ValueError(kind)
    return sd


# ---------------------------------------------------------------------------
# legacy model_type API (stage-2 models, params-only) + file helpers
# ---------------------------------------------------------------------------

def torch_to_flax(model_type: str, state_dict: Dict, params_template: Dict,
                  gated: bool = True) -> Dict:
    spec = build_spec(model_type, gated=gated)
    return torch_to_variables(spec, state_dict,
                              {"params": params_template})["params"]


def flax_to_torch(model_type: str, params: Dict, gated: bool = True) -> Dict:
    spec = build_spec(model_type, gated=gated)
    return variables_to_torch(spec, {"params": params})


def export_pt(path: str, spec_or_model_type, variables: Dict,
              gated: bool = True) -> str:
    """Write a reference-shaped .pt.  Accepts either a legacy model_type
    string with bare params, or a spec list with full variables."""
    import torch
    if isinstance(spec_or_model_type, str):
        sd = flax_to_torch(spec_or_model_type, variables, gated)
    else:
        sd = variables_to_torch(spec_or_model_type, variables)
    torch.save(sd, path)
    return path


def import_pt(path: str, spec_or_model_type, variables_template: Dict,
              gated: bool = True) -> Dict:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(spec_or_model_type, str):
        return torch_to_flax(spec_or_model_type, sd, variables_template,
                             gated)
    return torch_to_variables(spec_or_model_type, sd, variables_template)
