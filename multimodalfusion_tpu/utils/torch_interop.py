"""Torch checkpoint interop: map reference state_dicts onto flax params
and export flax params back to reference-shaped state_dicts.

Enables (a) loading checkpoints trained with the reference PyTorch code
into this framework (c-index parity checks) and (b) exporting .pt files
the reference's downstream tooling can read (ref checkpoints:
s_{k}_checkpoint.pt etc., core_utils.py:152-159).

Key layouts (reference modules -> flax params):
  max_net (model_genomic.py:13-46):
    fc_omic.{i}.0.{weight,bias}       -> fc_omic_{i}/Dense_0/{kernel,bias}
    classifier.{weight,bias}          -> classifier/{kernel,bias}
  path_attention_mil (model_attention_mil_path.py:12-39):
    attention_net_WSI.0               -> fc
    attention_net_WSI.3.attention_a.0 -> attention_net/Wa,ba
    attention_net_WSI.3.attention_b.0 -> attention_net/Wb,bb
    attention_net_WSI.3.attention_c   -> attention_net/wc,cc
    classifier                        -> classifier
  radio_attention_mil (model_attention_mil_radio.py:13-61): same with
    attention_net_radio + reduce_dim.
Torch Linear weights are [out, in]; flax kernels are [in, out].
"""
from __future__ import annotations

from typing import Dict

import numpy as np


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


def _linear_pairs(model_type: str, gated: bool = True):
    """(torch_prefix, flax_path, transpose) triples for each Linear."""
    if model_type == "max_net":
        return [
            ("fc_omic.0.0", ["fc_omic_0", "Dense_0"]),
            ("fc_omic.1.0", ["fc_omic_1", "Dense_0"]),
            ("classifier", ["classifier"]),
        ]
    if model_type in ("path_attention_mil", "radio_attention_mil"):
        net = ("attention_net_WSI" if model_type == "path_attention_mil"
               else "attention_net_radio")
        pairs = [(f"{net}.0", ["fc"]), ("classifier", ["classifier"])]
        if model_type == "radio_attention_mil":
            pairs.append(("reduce_dim", ["reduce_dim"]))
        return pairs
    raise NotImplementedError(model_type)


def _attn_net_prefix(model_type: str) -> str:
    return ("attention_net_WSI.3" if model_type == "path_attention_mil"
            else "attention_net_radio.3")


def torch_to_flax(model_type: str, state_dict: Dict, params_template: Dict,
                  gated: bool = True) -> Dict:
    """Fill a copy of params_template with weights from a reference
    state_dict (tensors or ndarrays).  Missing keys keep template values
    (strict=False semantics, ref core_utils.py:110-111)."""
    import jax
    import jax.numpy as jnp
    sd = {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    params = jax.tree.map(np.asarray, params_template)

    for torch_prefix, flax_path in _linear_pairs(model_type):
        wk, bk = f"{torch_prefix}.weight", f"{torch_prefix}.bias"
        if wk in sd:
            _set(params, flax_path + ["kernel"], _t2f(sd[wk]))
            _set(params, flax_path + ["bias"], np.asarray(sd[bk]))

    if model_type in ("path_attention_mil", "radio_attention_mil"):
        ap = _attn_net_prefix(model_type)
        if gated:
            mapping = [(f"{ap}.attention_a.0", "Wa", "ba"),
                       (f"{ap}.attention_b.0", "Wb", "bb"),
                       (f"{ap}.attention_c", "wc", "cc")]
        else:
            # Attn_Net: module.0 = Linear, last Linear index 2 or 3
            last = (f"{ap}.module.3" if f"{ap}.module.3.weight" in sd
                    else f"{ap}.module.2")
            mapping = [(f"{ap}.module.0", "Wa", "ba"),
                       (last, "wc", "cc")]
        for prefix, wname, bname in mapping:
            if f"{prefix}.weight" in sd:
                _set(params, ["attention_net", wname],
                     _t2f(sd[f"{prefix}.weight"]))
                _set(params, ["attention_net", bname],
                     np.asarray(sd[f"{prefix}.bias"]))
    return jax.tree.map(jnp.asarray, params)


def flax_to_torch(model_type: str, params: Dict,
                  gated: bool = True) -> Dict:
    """Export flax params to a reference-shaped torch state_dict."""
    import torch
    sd = {}

    def put(prefix, flax_path):
        k = np.asarray(_get(params, flax_path + ["kernel"]))
        b = np.asarray(_get(params, flax_path + ["bias"]))
        sd[f"{prefix}.weight"] = torch.tensor(k.T.copy())
        sd[f"{prefix}.bias"] = torch.tensor(b.copy())

    for torch_prefix, flax_path in _linear_pairs(model_type):
        put(torch_prefix, flax_path)

    if model_type in ("path_attention_mil", "radio_attention_mil"):
        ap = _attn_net_prefix(model_type)
        attn = _get(params, ["attention_net"])
        pairs = ([(f"{ap}.attention_a.0", "Wa", "ba"),
                  (f"{ap}.attention_b.0", "Wb", "bb"),
                  (f"{ap}.attention_c", "wc", "cc")] if gated else
                 [(f"{ap}.module.0", "Wa", "ba"),
                  (f"{ap}.module.2", "wc", "cc")])
        import torch
        for prefix, wname, bname in pairs:
            sd[f"{prefix}.weight"] = torch.tensor(
                np.asarray(attn[wname]).T.copy())
            sd[f"{prefix}.bias"] = torch.tensor(
                np.asarray(attn[bname]).copy())
    return sd


def export_pt(path: str, model_type: str, params: Dict,
              gated: bool = True) -> str:
    import torch
    torch.save(flax_to_torch(model_type, params, gated), path)
    return path


def import_pt(path: str, model_type: str, params_template: Dict,
              gated: bool = True) -> Dict:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_to_flax(model_type, sd, params_template, gated)
