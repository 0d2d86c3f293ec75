"""Attention-MIL survival models over padded, batched bags.

Batched rewrites of ref models/model_attention_mil_path.py (PathAMIL) and
models/model_attention_mil_radio.py (RadioAMIL).  Input bags are
[B, N, F] with a float mask [B, N]; the reference forces batch_size=1
ragged bags (README.md:95).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodalfusion_tpu.models.heads import survival_outputs
from multimodalfusion_tpu.models.modules import Dense, XlinearFusion
from multimodalfusion_tpu.models.pooling import AttentionPool

SIZE_DICT = {"small": (1024, 256, 256), "big": (1024, 512, 384)}


class PathAMIL(nn.Module):
    """WSI bag -> FC(1024->256)+ReLU+Drop(.25) -> gated attention pool
    -> Linear classifier (ref MIL_Attention_fc_surv_path:45-72).

    ``compute_dtype``: dtype for the bag-sized matmuls (fc + attention
    scoring); bfloat16 runs them on the MXU at full rate while params
    stay float32 (pooled features and the classifier stay f32).
    """
    model_size: str = "small"
    gate: bool = True
    attn_dropout: bool = False  # ref `dropout` arg
    n_classes: int = 4
    compute_dtype: str = "float32"
    bag_mesh: object = None        # ("bag",) mesh -> sharded pooling
    bag_batch_axis: object = None  # mesh batch axis for DP x SP

    @nn.compact
    def __call__(self, bags, mask, deterministic: bool = True,
                 return_features: bool = False, attention_only: bool = False):
        size = SIZE_DICT[self.model_size]
        cdt = jnp.dtype(self.compute_dtype)
        h = jax.nn.relu(Dense(size[1], name="fc", dtype=cdt)(bags))
        h = nn.Dropout(0.25, deterministic=deterministic)(h)
        pool = AttentionPool(D=size[2], gated=self.gate,
                             attn_dropout=self.attn_dropout,
                             bag_mesh=self.bag_mesh,
                             bag_batch_axis=self.bag_batch_axis,
                             name="attention_net")
        if attention_only:
            _, attn, scores = pool(h, mask, deterministic, return_attn=True)
            return scores
        M = pool(h, mask, deterministic).astype(jnp.float32)
        if return_features:
            return M
        logits = Dense(self.n_classes, name="classifier")(M)
        out = survival_outputs(logits)
        out["features"] = M
        return out


class RadioAMIL(nn.Module):
    """Radiology bag(s) -> modality fusion -> FC -> attention pool ->
    classifier (ref MIL_Attention_fc_surv_radio:66-115).

    ``bags``: [B, N, n_modalities * 1024] — per-slice features of each MRI
    sequence concatenated in `modalities` order (slice-aligned by the data
    layer's intersection, ref dataset_survival.py:346-348), or
    [B, N, 1024] when n_modalities == 1 (lung CT).

    radio_fusion:
      'concat': Linear(n_mod*1024 -> 1024) (ref :31-32)
      'tensor': per-instance XlinearFusion across modalities.  NOTE the
        reference's tensor path is broken as shipped (undefined
        ``self.xfusion``, and it fuses only the first instance of each bag,
        model_attention_mil_radio.py:57,84); here it is implemented as a
        per-instance Kronecker fusion over the whole bag.
    """
    n_modalities: int = 4
    radio_fusion: str = "concat"
    model_size: str = "small"
    gate: bool = True
    attn_dropout: bool = False
    n_classes: int = 4
    compute_dtype: str = "float32"
    bag_mesh: object = None        # ("bag",) mesh -> sharded pooling
    bag_batch_axis: object = None  # mesh batch axis for DP x SP

    @nn.compact
    def __call__(self, bags, mask, deterministic: bool = True,
                 return_features: bool = False, attention_only: bool = False):
        size = SIZE_DICT[self.model_size]
        cdt = jnp.dtype(self.compute_dtype)
        B, N = bags.shape[0], bags.shape[1]
        if self.n_modalities > 1:
            if self.radio_fusion == "concat":
                h = Dense(size[0], name="reduce_dim", dtype=cdt)(bags)
            elif self.radio_fusion == "tensor":
                per_mod = bags.reshape(B * N, self.n_modalities, size[0])
                v_list = [per_mod[:, m, :] for m in range(self.n_modalities)]
                fused = XlinearFusion(dim=size[0], scale_dim=64,
                                      num_modalities=self.n_modalities,
                                      mmhid1=size[0], mmhid2=size[0],
                                      skip=False, name="radio_xfusion")(
                    v_list, deterministic)
                h = fused.reshape(B, N, size[0])
            else:
                raise ValueError(self.radio_fusion)
        else:
            h = bags
        h = jax.nn.relu(Dense(size[1], name="fc", dtype=cdt)(h))
        h = nn.Dropout(0.25, deterministic=deterministic)(h)
        pool = AttentionPool(D=size[2], gated=self.gate,
                             attn_dropout=self.attn_dropout,
                             bag_mesh=self.bag_mesh,
                             bag_batch_axis=self.bag_batch_axis,
                             name="attention_net")
        if attention_only:
            _, attn, scores = pool(h, mask, deterministic, return_attn=True)
            return scores
        M = pool(h, mask, deterministic).astype(jnp.float32)
        if return_features:
            return M
        logits = Dense(self.n_classes, name="classifier")(M)
        out = survival_outputs(logits)
        out["features"] = M
        return out
