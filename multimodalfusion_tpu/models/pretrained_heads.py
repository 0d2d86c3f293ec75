"""Stage-4 heads over frozen 256-d unimodal embeddings.

Covers both reference families in one pair of modules:
  * models/nll_models_pretrained.py (n_classes logits -> hazards/S/risk)
  * models/coxranking_models_pretrained.py (scalar risk)
selected by ``bag_loss`` exactly as the reference dispatches
(core_utils_pretrained.py:77-85: 'nll_surv' in bag_loss -> nll family).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodalfusion_tpu.models.heads import scalar_risk_outputs, \
    survival_outputs
from multimodalfusion_tpu.models.modules import Dense, Highway, \
    MaskedBatchNorm, Residual, XlinearFusion


def _is_nll(bag_loss: str) -> bool:
    """Hazard-family losses (nll/ce) need per-bin logits.  The reference
    keys on 'nll_surv' only, leaving ce_surv with a scalar head its own
    loss cannot consume — fixed deliberately (same fix as MaxNet)."""
    bl = bag_loss or ""
    return "nll_surv" in bl or "ce" in bl


class UnimodalPretrained(nn.Module):
    """fcnn/highway/residual head on one 256-d embedding
    (ref nll_models_pretrained.py:14-62,
    coxranking_models_pretrained.py:14-58)."""
    mode: str = "omic"          # which embedding to read: radio|path|omic
    train_type: str = "fcnn"
    bag_loss: str = "nll_surv"
    n_classes: int = 4
    n_layers: int = 1

    @nn.compact
    def __call__(self, h_radio=None, h_path=None, h_omic=None,
                 deterministic: bool = True, valid=None):
        if self.mode == "path":
            h = h_path
        elif self.mode == "radio":
            h = h_radio
        elif self.mode == "omic":
            h = h_omic
        else:
            raise ValueError(self.mode)

        nll = _is_nll(self.bag_loss)
        if self.train_type == "fcnn":
            if nll:
                # ref: Linear(256, n_classes) then Dropout(0.7) (:23)
                logits = Dense(self.n_classes, name="classifier")(h)
                logits = nn.Dropout(0.7, deterministic=deterministic)(logits)
                return survival_outputs(logits)
            # ref coxranking: 256->128 BN ReLU Drop -> 1 (:24)
            z = Dense(128, name="classifier_0")(h)
            z = MaskedBatchNorm(name="classifier_bn")(z, valid,
                                                      deterministic)
            z = jax.nn.relu(z)
            z = nn.Dropout(0.7, deterministic=deterministic)(z)
            risk = Dense(1, name="classifier_1")(z)
            return scalar_risk_outputs(risk)
        elif self.train_type == "highway":
            h = Highway(256, self.n_layers, name="highway")(h, deterministic,
                                                            valid)
        elif self.train_type == "residual":
            h = Residual(256, self.n_layers, name="residual")(h,
                                                              deterministic,
                                                              valid)
        else:
            raise ValueError(self.train_type)

        if nll:
            logits = Dense(self.n_classes, name="classifier")(h)
            return survival_outputs(logits)
        risk = Dense(1, name="classifier")(h)
        return scalar_risk_outputs(risk)


class MultimodalPretrained(nn.Module):
    """early/late fcnn/highway or Kronecker fusion head over 2-3 frozen
    embeddings (ref nll_models_pretrained.py:66-197,
    coxranking_models_pretrained.py:62-183)."""
    mode: str = "radio_path_omic"
    train_type: str = "early-fcnn"
    bag_loss: str = "nll_surv"
    n_classes: int = 4
    n_layers: int = 1

    def _present(self):
        return [m for m in ("radio", "path", "omic") if m in self.mode]

    @nn.compact
    def __call__(self, h_radio=None, h_path=None, h_omic=None,
                 deterministic: bool = True, valid=None):
        nll = _is_nll(self.bag_loss)
        present = self._present()
        embeds = {"radio": h_radio, "path": h_path, "omic": h_omic}
        n_mod = len(present)
        tt = self.train_type

        def _late_layer(name, h):
            z = Dense(128, name=f"layer_{name}_0")(h)
            z = MaskedBatchNorm(name=f"layer_{name}_bn")(z, valid,
                                                         deterministic)
            z = jax.nn.relu(z)
            z = nn.Dropout(0.7, deterministic=deterministic)(z)
            if not nll:
                z = Dense(1, name=f"layer_{name}_1")(z)  # coxranking :81-83
            return z

        if tt == "late-fcnn":
            parts = [_late_layer({"radio": "MRI", "path": "WSI",
                                  "omic": "omic"}[m], embeds[m])
                     for m in present]
            MM = jnp.concatenate(parts, axis=1)
            width = self.n_classes if nll else 1
            logits = Dense(width, name="classifier")(MM)
        elif tt == "late-highway":
            parts = [Highway(256, self.n_layers, name=f"highway_{m}")(
                embeds[m], deterministic, valid) for m in present]
            MM = jnp.concatenate(parts, axis=1)
            logits = Dense(self.n_classes if nll else 1,
                           name="classifier")(MM)
        elif tt == "early-fcnn":
            MM = jnp.concatenate([embeds[m] for m in present], axis=1)
            z = Dense(128, name="classifier_0")(MM)
            z = MaskedBatchNorm(name="classifier_bn")(z, valid,
                                                      deterministic)
            z = jax.nn.relu(z)
            z = nn.Dropout(0.7, deterministic=deterministic)(z)
            logits = Dense(self.n_classes if nll else 1,
                           name="classifier_1")(z)
        elif tt == "early-highway":
            MM = jnp.concatenate([embeds[m] for m in present], axis=1)
            MM = Highway(n_mod * 256, self.n_layers, name="highway")(
                MM, deterministic, valid)
            logits = Dense(self.n_classes if nll else 1,
                           name="classifier")(MM)
        elif tt == "kronecker":
            MM = XlinearFusion(dim=256, scale_dim=16, num_modalities=n_mod,
                               mmhid1=256, mmhid2=256, dropout_rate=0.7,
                               skip=True, name="xfusion")(
                [embeds[m] for m in present], deterministic)
            logits = Dense(self.n_classes if nll else 1,
                           name="classifier")(MM)
        else:
            raise ValueError(tt)

        if nll:
            return survival_outputs(logits)
        return scalar_risk_outputs(logits)
