"""Cross-chip bag-sharded attention pooling (sequence parallelism for
MIL bags).

The reference computes each bag's softmax on one GPU (batch_size=1,
bags up to ~30k instances after multi-slide concat,
ref dataset_survival.py:362-367).  For bags beyond single-chip HBM, the
bag (instance) axis is sharded over the mesh and the softmax-weighted
pooling is computed from per-shard partials combined with XLA
collectives — the flash/ring-style decomposition of softmax pooling
(SURVEY.md §5 long-context note):

    m   = pmax_i max(s_i)                    (global max)
    l   = psum_i sum(exp(s_i - m))           (global normalizer)
    acc = psum_i exp(s_i - m) @ h_i          (global weighted sum)
    out = acc / l

Collectives ride ICI inside a slice; one pmax + two psums per layer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalfusion_tpu.ops.mil_attention import (AttnParams, NEG_INF,
                                                    attention_scores)


def sharded_attention_pool(h, mask, params: AttnParams, gated: bool,
                           mesh: Mesh, axis: str = "bag"):
    """h [B, N, D] / mask [B, N] with N sharded over ``axis``;
    params replicated.  Returns pooled [B, D] (replicated)."""

    def local_fn(h_l, mask_l, params_l):
        s = attention_scores(h_l, params_l, gated)
        s = jnp.where(mask_l > 0, s, NEG_INF)
        m_local = jnp.max(s, axis=1)
        # the max shift cancels mathematically; no gradient needed (and
        # pmax has no differentiation rule)
        m = jax.lax.pmax(jax.lax.stop_gradient(m_local), axis)
        p = jnp.exp(s - m[:, None]) * (mask_l > 0)
        l = jax.lax.psum(jnp.sum(p, axis=1), axis)
        acc = jax.lax.psum(jnp.einsum("bn,bnd->bd", p, h_l), axis)
        return acc / jnp.maximum(l, 1e-30)[:, None]

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(h, mask, params)


def bag_sharded_put(mesh: Mesh, axis: str = "bag"):
    """device_put helper placing (h, mask) with the bag axis sharded."""
    def put(h, mask):
        h = jax.device_put(h, NamedSharding(mesh, P(None, axis, None)))
        mask = jax.device_put(mask, NamedSharding(mesh, P(None, axis)))
        return h, mask
    return put
