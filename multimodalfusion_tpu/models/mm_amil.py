"""Trimodal co-attention fusion model (ref MM_MIL_Attention_fc_surv,
models/model_mm_attention_mil.py:117-200), batched.

Fixes two latent reference bugs deliberately (flagged in SURVEY.md §7):
  * ``size_path`` undefined for concat fusion with 'path' in mode
    (ref :83) — the WSI branch width (256) is used;
  * ``self.xfusion`` vs ``radio_xfusion`` naming (ref :141).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodalfusion_tpu.models.heads import survival_outputs
from multimodalfusion_tpu.models.modules import Dense, SNNBlock, \
    XlinearFusion
from multimodalfusion_tpu.models.pooling import AttentionPool

SIZE_RADIO = {"small": (1024, 256, 256), "big": (1024, 256, 384)}
SIZE_WSI = {"small": (1024, 256, 256), "big": (1024, 256, 384)}
SIZE_OMIC = {"small": (256, 256), "big": (1024, 256)}


class MMAttentionMIL(nn.Module):
    """Radiology AMIL + pathology AMIL + genomic SNN branches fused by
    Kronecker ('tensor') or concatenation ('concat').

    Inputs (present branches depend on ``mode``):
      radio_bags [B, Nr, n_mod*1024], radio_mask [B, Nr]
      path_bags  [B, Np, 1024],       path_mask  [B, Np]
      genomic    [B, G]
    """
    mode: str = "radio_path_omic"
    n_modalities: int = 4            # radiology sequences
    omic_input_dim: int = 80
    fusion: str = "tensor"
    radio_fusion: str = "concat"
    gate: bool = True                # fusion-level gating (XlinearFusion)
    gate_path: bool = True
    gate_radio: bool = True
    attn_dropout: bool = False
    model_size_radio: str = "small"
    model_size_wsi: str = "small"
    model_size_omic: str = "small"
    n_classes: int = 4

    @nn.compact
    def __call__(self, radio_bags=None, radio_mask=None, path_bags=None,
                 path_mask=None, genomic=None, deterministic: bool = True,
                 return_attention: bool = False):
        A_raw = {}
        branches = []

        if "radio" in self.mode:
            size_r = SIZE_RADIO[self.model_size_radio]
            h = radio_bags
            if self.n_modalities > 1:
                if self.radio_fusion == "concat":
                    h = Dense(size_r[0], name="reduce_dim")(h)
                elif self.radio_fusion == "tensor":
                    B, N = h.shape[0], h.shape[1]
                    per_mod = h.reshape(B * N, self.n_modalities, size_r[0])
                    v_list = [per_mod[:, m, :]
                              for m in range(self.n_modalities)]
                    h = XlinearFusion(dim=size_r[0], scale_dim=64,
                                      num_modalities=self.n_modalities,
                                      mmhid1=size_r[0], mmhid2=size_r[0],
                                      skip=False, name="radio_xfusion")(
                        v_list, deterministic).reshape(B, N, size_r[0])
            h = jax.nn.relu(Dense(size_r[1], name="fc_radio")(h))
            h = nn.Dropout(0.25, deterministic=deterministic)(h)
            pool_r = AttentionPool(D=size_r[2], gated=self.gate_radio,
                                   attn_dropout=self.attn_dropout,
                                   name="attention_net_radio")
            if return_attention:
                M_radio, attn_r, s_r = pool_r(h, radio_mask, deterministic,
                                              return_attn=True)
                A_raw["radiology"] = s_r
            else:
                M_radio = pool_r(h, radio_mask, deterministic)
            branches.append(M_radio)

        if "path" in self.mode:
            size_w = SIZE_WSI[self.model_size_wsi]
            h = jax.nn.relu(Dense(size_w[1], name="fc_WSI")(path_bags))
            h = nn.Dropout(0.25, deterministic=deterministic)(h)
            pool_p = AttentionPool(D=size_w[2], gated=self.gate_path,
                                   attn_dropout=self.attn_dropout,
                                   name="attention_net_WSI")
            if return_attention:
                M_path, attn_p, s_p = pool_p(h, path_mask, deterministic,
                                             return_attn=True)
                A_raw["pathology"] = s_p
            else:
                M_path = pool_p(h, path_mask, deterministic)
            branches.append(M_path)

        if "omic" in self.mode:
            size_o = SIZE_OMIC[self.model_size_omic]
            x = genomic
            x = SNNBlock(size_o[0], dropout=0.25, name="fc_omic_0")(
                x, deterministic)
            for i, f in enumerate(size_o[1:]):
                x = SNNBlock(f, dropout=0.25, name=f"fc_omic_{i + 1}")(
                    x, deterministic)
            branches.append(x)

        if not branches:
            raise ValueError(f"mode {self.mode!r} selects no branch")

        if self.fusion == "tensor":
            MM = XlinearFusion(dim=256, scale_dim=16, mmhid1=512, mmhid2=512,
                               num_modalities=len(branches), skip=True,
                               gate=self.gate, name="mm")(
                branches, deterministic)
            z = jax.nn.relu(Dense(256, name="classifier_0")(MM))
            z = nn.Dropout(0.25, deterministic=deterministic)(z)
            logits = Dense(self.n_classes, name="classifier_1")(z)
        elif self.fusion == "concat":
            MM = jnp.concatenate(branches, axis=1)
            logits = Dense(self.n_classes, name="classifier")(MM)
        else:
            raise ValueError(self.fusion)

        out = survival_outputs(logits)
        out["A_raw"] = A_raw
        out["features"] = branches
        return out
