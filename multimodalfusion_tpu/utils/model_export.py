"""Single-file model export for serving (jax.export / StableHLO).

No reference equivalent: the reference deploys by torch.load-ing a
checkpoint into the full model codebase.  Here the jitted scoring
function is exported WITH its weights into one portable StableHLO
artifact that any JAX runtime for the listed platforms can execute —
no multimodalfusion_tpu (or flax) needed at serving time:

    blob = export_scorer(model, variables, cfg)       # train side
    scorer = load_scorer(blob)                        # serving side
    out = scorer(batch)    # {"risk": ..., "hazards": ..., "S": ...}

Shapes are fixed at export time (batch_size / bag_len); the serving
side pads exactly like training did (masks make padding exact, see
ops/mil_attention.py).  Weights are baked into the artifact as
constants — one file is the whole deployment.

Platform note: the MIL models pick the fused Pallas pooling at TRACE
time (ops/mil_attention._use_pallas), and mosaic custom calls only
lower for the tpu platform.  Exporting for exactly ("tpu",) keeps the
fused kernels; any other platform list traces under
``mil_attention.force_unfused()`` so the artifact lowers everywhere
(serving is forward-only, where XLA's fusion is within ~15% of the
fused kernel — PERF.md).
"""
from __future__ import annotations

import json
from typing import Optional, Sequence

import numpy as np

from multimodalfusion_tpu.data.loaders import \
    FEAT_DIM as PATH_FEAT_DIM  # single point of truth for bag shapes
PRETRAINED_DIM = 256      # stage-3 embedding width (ref 256-d,
#                           models/pretrained_heads.py / SIZE tables)


def example_batch(cfg, batch_size: int = 8, bag_len: int = 512):
    """Loader-style batch of ZEROS with the right shapes/dtypes for
    ``engine.train.model_inputs(cfg, ...)`` — shapes are all that
    tracing needs."""
    B, N = batch_size, bag_len
    batch = {}
    if cfg.pretrained:
        for k in ("h_radio", "h_path", "h_omic"):
            batch[k] = np.zeros((B, PRETRAINED_DIM), np.float32)
        batch["valid"] = np.ones((B,), np.float32)
        return batch
    if "radio" in cfg.mode:
        n_mod = max(len(cfg.modalities), 1)
        batch["radio_bags"] = np.zeros((B, N, n_mod * PATH_FEAT_DIM),
                                       np.float32)
        batch["radio_mask"] = np.ones((B, N), np.float32)
    if "path" in cfg.mode:
        batch["path_bags"] = np.zeros((B, N, PATH_FEAT_DIM), np.float32)
        batch["path_mask"] = np.ones((B, N), np.float32)
    if "omic" in cfg.mode:
        if cfg.omic_input_dim <= 0:
            raise ValueError("cfg.omic_input_dim must be set to export "
                             "an omic model")
        batch["genomic"] = np.zeros((B, cfg.omic_input_dim), np.float32)
    if not batch:
        raise NotImplementedError(cfg.mode)
    return batch


def traces_fused(platforms: Optional[Sequence[str]] = None) -> bool:
    """Whether an export for ``platforms`` keeps the fused Pallas
    pooling: only when the artifact targets exactly the tpu platform
    AND the exporting process runs on TPU (the trace-time kernel choice
    follows the current backend; an off-device export for tpu gets the
    portable unfused form — warned about in export_scorer)."""
    import jax
    plist = list(platforms) if platforms else None
    on_tpu = jax.default_backend() == "tpu"
    return on_tpu and (plist is None or plist == ["tpu"])


def _export(model, variables, cfg, batch_size: int = 8,
            bag_len: int = 512,
            platforms: Optional[Sequence[str]] = None):
    """Trace + lower; returns the jax.export.Exported object."""
    import contextlib

    import jax
    from jax import export as jexport

    from multimodalfusion_tpu.engine.train import model_inputs
    from multimodalfusion_tpu.ops import mil_attention as mil

    kwargs = {k: np.asarray(v) for k, v in model_inputs(
        cfg, example_batch(cfg, batch_size, bag_len)).items()}

    def score(kw):
        out = model.apply(variables, deterministic=True, **kw)
        # keep only the serving outputs: A_raw/features carry
        # interpretability escapes with model-internal structure
        return {k: out[k] for k in ("risk", "hazards", "S")
                if out.get(k) is not None}

    # fused Pallas pooling only lowers for the tpu platform: keep it
    # for on-TPU tpu-only artifacts, trace the portable form otherwise
    plist = list(platforms) if platforms else None
    fused = traces_fused(platforms)
    if plist == ["tpu"] and not fused:
        import warnings
        warnings.warn(
            "exporting for platforms=['tpu'] from a non-TPU process: "
            "the artifact gets the portable unfused pooling, not the "
            "fused Pallas kernels (the kernel choice is made at trace "
            "time from the current backend) — export on a TPU host to "
            "keep them", stacklevel=3)
    ctx = contextlib.nullcontext() if fused else mil.force_unfused()
    with ctx:
        return jexport.export(jax.jit(score), platforms=plist)(kwargs)


def export_scorer(model, variables, cfg, batch_size: int = 8,
                  bag_len: int = 512,
                  platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``model.apply(variables, deterministic=True, **inputs)``
    (weights closed over as constants) for the given platforms
    (default: the current backend).  Returns the artifact bytes."""
    return _export(model, variables, cfg, batch_size, bag_len,
                   platforms).serialize()


def load_scorer(blob: bytes):
    """Deserialize an exported artifact -> ``scorer(batch_dict)``.

    The callable takes the model-input dict (the exact keys/shapes
    baked at export; see the sidecar signature) and returns the output
    dict.  Needs only jax — no model code."""
    from jax import export as jexport
    exp = jexport.deserialize(bytearray(blob))

    def scorer(kwargs):
        return exp.call({k: np.asarray(v) for k, v in kwargs.items()})

    scorer.exported = exp
    return scorer


def save_scorer(path: str, model, variables, cfg, batch_size: int = 8,
                bag_len: int = 512,
                platforms: Optional[Sequence[str]] = None) -> dict:
    """export_scorer + write the artifact and a ``<path>.json`` sidecar
    documenting the input/output signatures.  Returns the sidecar."""
    import jax

    from multimodalfusion_tpu.engine.train import model_inputs
    exp = _export(model, variables, cfg, batch_size, bag_len, platforms)
    with open(path, "wb") as f:
        f.write(exp.serialize())
    kwargs = model_inputs(cfg, example_batch(cfg, batch_size, bag_len))
    # the artifact's own avals are the authoritative output signature
    # (a cox head exports only `risk`; nll families add hazards/S)
    out_tree = exp.out_tree.unflatten(exp.out_avals)
    sidecar = {
        "format": "jax.export StableHLO",
        "model_type": cfg.model_type,
        "mode": cfg.mode,
        "batch_size": batch_size,
        "bag_len": bag_len,
        "platforms": (list(platforms) if platforms
                      else [jax.default_backend()]),
        "inputs": {k: {"shape": list(np.asarray(v).shape),
                       "dtype": str(np.asarray(v).dtype)}
                   for k, v in kwargs.items()},
        "outputs": {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                    for k, v in out_tree.items()},
    }
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)
        f.write("\n")
    return sidecar
