"""AttentionPool linen module: declares attention-net parameters and
dispatches between the fused Pallas kernel and the unfused jnp path
(needed for attention-branch dropout and attention read-out)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodalfusion_tpu.models.modules import xavier_normal
from multimodalfusion_tpu.ops import mil_attention as mil


class AttentionPool(nn.Module):
    """Masked attention-MIL pooling over padded bags.

    h [B, N, L], mask [B, N] -> pooled [B, L] (and optionally attn [B, N],
    raw scores [B, N]).

    Parameters mirror ref Attn_Net(_Gated) (model_modules.py:70-110):
    attention_a (tanh branch), attention_b (sigmoid gate), attention_c
    (projection to a scalar logit per instance).
    """
    D: int = 256
    gated: bool = True
    attn_dropout: bool = False  # ref's `dropout` flag on the branches
    # when a ("bag",)-axis Mesh is given, the fused pooling runs as
    # per-shard Pallas partials combined with collectives over the bag
    # (instance) axis (ops/sharded_pool.py) — cfg.bag_shard plumbs it
    bag_mesh: object = None
    bag_axis: str = "bag"
    # set to the mesh's batch axis name (e.g. "data") for the DP x SP
    # composition: batch sharded over one mesh axis, instances the other
    bag_batch_axis: object = None

    @nn.compact
    def __call__(self, h, mask, deterministic: bool = True,
                 return_attn: bool = False):
        L = h.shape[-1]
        zeros = jax.nn.initializers.zeros
        Wa = self.param("Wa", xavier_normal, (L, self.D))
        ba = self.param("ba", zeros, (self.D,))
        if self.gated:
            Wb = self.param("Wb", xavier_normal, (L, self.D))
            bb = self.param("bb", zeros, (self.D,))
        else:
            Wb, bb = jnp.zeros((L, self.D), h.dtype), jnp.zeros((self.D,),
                                                                h.dtype)
        wc = self.param("wc", xavier_normal, (self.D, 1))
        cc = self.param("cc", zeros, (1,))
        params = mil.AttnParams(Wa=Wa, ba=ba, Wb=Wb, bb=bb, wc=wc, cc=cc)

        use_dropout = self.attn_dropout and not deterministic
        da = db = None
        if use_dropout:
            # explicit per-branch keep masks from the step RNG: the fused
            # fwd+bwd kernels, the sharded pool and the unfused read-out
            # path all apply the identical bits (ops/mil_attention.py)
            da, db = mil.make_dropout_masks(
                self.make_rng("dropout"),
                (h.shape[0], h.shape[1], self.D), gated=self.gated)

        if not return_attn:
            if self.bag_mesh is not None:
                from multimodalfusion_tpu.ops.sharded_pool import \
                    sharded_attention_pool
                return sharded_attention_pool(h, mask, params, self.gated,
                                              self.bag_mesh, self.bag_axis,
                                              self.bag_batch_axis,
                                              da=da, db=db)
            if use_dropout:
                return mil.attention_pool_dropout(h, mask, da, db, params,
                                                  self.gated)
            return mil.attention_pool(h, mask, params, self.gated)

        # Unfused read-out path (attention distribution + raw scores for
        # interpretability escapes) with optional attention-branch
        # dropout (ref model_modules.py:97-99).
        inv_keep = 1.0 / (1.0 - mil.ATTN_DROPOUT_RATE)
        a = jnp.tanh(h @ Wa + ba)
        if use_dropout:
            a = a * (da.astype(jnp.float32) * inv_keep)
        if self.gated:
            b = jax.nn.sigmoid(h @ Wb + bb)
            if use_dropout:
                b = b * (db.astype(jnp.float32) * inv_keep)
            a = a * b
        s = (a @ wc + cc)[..., 0]
        pooled, attn = mil.masked_softmax_pool(s, h, mask)
        return pooled, attn, s
