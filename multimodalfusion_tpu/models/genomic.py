"""Genomic SNN (ref MaxNet, models/model_genomic.py:13-72)."""
from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from multimodalfusion_tpu.models.heads import scalar_risk_outputs, \
    survival_outputs
from multimodalfusion_tpu.models.modules import Dense, SNNBlock

SIZE_DICT_OMIC = {"small": (256, 256), "big": (1024, 256)}


class MaxNet(nn.Module):
    """SELU SNN over the genomic feature vector.

    input [B, G] -> SNNBlock(hidden[0]) -> SNNBlock(hidden[1], p=.25)
    -> classifier (n_classes logits for nll losses, scalar risk otherwise,
    ref model_genomic.py:33-36).
    """
    model_size: str = "small"
    bag_loss: str = "nll_surv"
    n_classes: int = 4

    @property
    def hidden(self) -> Sequence[int]:
        return SIZE_DICT_OMIC[self.model_size]

    @nn.compact
    def __call__(self, genomic_features, deterministic: bool = True,
                 return_features: bool = False):
        x = genomic_features
        hidden = self.hidden
        x = SNNBlock(hidden[0], dropout=0.25, name="fc_omic_0")(
            x, deterministic)
        for i, f in enumerate(hidden[1:]):
            x = SNNBlock(f, dropout=0.25, name=f"fc_omic_{i + 1}")(
                x, deterministic)
        if return_features:
            return x
        # hazard-family losses (nll/ce) need per-bin logits; cox/ranking a
        # scalar.  The reference keys on 'nll' only (model_genomic.py:33),
        # which leaves ce_surv with a scalar head and crashes its own
        # training loop — fixed deliberately here.
        if "nll" in self.bag_loss or "ce" in self.bag_loss:
            logits = Dense(self.n_classes, name="classifier")(x)
            out = survival_outputs(logits)
        else:
            risk = Dense(1, name="classifier")(x)
            out = scalar_risk_outputs(risk)
        out["features"] = x
        return out
