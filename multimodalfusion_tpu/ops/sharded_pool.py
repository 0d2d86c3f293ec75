"""Cross-chip bag-sharded attention pooling (sequence parallelism for
MIL bags) — a REAL training path, not a demonstrator.

The reference computes each bag's softmax on one GPU (batch_size=1,
bags up to ~30k instances after multi-slide concat,
ref dataset_survival.py:362-367).  For bags beyond single-chip HBM, the
bag (instance) axis is sharded over the mesh and the softmax-weighted
pooling is computed from per-shard partials combined with XLA
collectives — the flash/ring-style decomposition of softmax pooling
(SURVEY.md §5 long-context note):

    m   = pmax_i m_i                        (global max)
    W   = psum_i l_i exp(m_i - m)           (global normalizer)
    out = psum_i w_i out_i / W,  w_i = l_i exp(m_i - m)

Each shard's (out_i, m_i, l_i) come from the SAME fused Pallas forward
kernel the unsharded path uses (ops/mil_attention._fused_pool_pallas
already emits the (max, normalizer) residuals), and the backward reuses
the fused backward kernel verbatim per shard: with the GLOBAL (m, W)
and GLOBAL pooled output as residuals, the per-instance gradient
formula a_i (alpha_i - g.out) is exactly the local restriction of the
unsharded backward, so dh stays shard-local and parameter gradients are
one psum.  Collectives ride ICI inside a slice; one pmax + two psums
forward, one psum backward.

Enable in training with ``TrainConfig.bag_shard`` (CLI ``--bag_shard``):
PathAMIL/RadioAMIL route their AttentionPool through this op on a
("bag",)-axis mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalfusion_tpu.ops import mil_attention as mil
from multimodalfusion_tpu.ops.mil_attention import (ATTN_DROPOUT_RATE,
                                                    AttnParams, NEG_INF,
                                                    attention_scores,
                                                    attention_scores_dropout)


def _local_partials(h_l, mask_l, params, gated, da_l=None, db_l=None,
                    rate=ATTN_DROPOUT_RATE):
    """(out_local [B, D] f32, m_local [B], l_local [B]) on one shard —
    fused Pallas kernel on TPU, unfused XLA elsewhere (tests run on the
    virtual CPU mesh; the kernel branch is exercised on CPU via Pallas
    interpret mode in tests/test_sharding.py).  ``da_l``/``db_l``:
    shard-local attention-branch dropout keep masks (optional)."""
    if mil._use_pallas():
        # the fused kernel's residual ml is [B, 1, 2] = (max, normalizer)
        out, ml = mil._fused_pool_pallas(
            h_l, mask_l, params, gated, da=da_l,
            db=db_l if gated else None, rate=rate)
        return out, ml[:, 0, 0], ml[:, 0, 1]
    if da_l is not None:
        s = attention_scores_dropout(h_l, da_l, db_l, params, gated, rate)
    else:
        s = attention_scores(h_l, params, gated)
    s = jnp.where(mask_l > 0, s, NEG_INF)
    m = jnp.max(s, axis=1)
    p = jnp.exp(s - m[:, None]) * (mask_l > 0)
    l = jnp.sum(p, axis=1)
    acc = jnp.einsum("bn,bnd->bd", p,
                     h_l.astype(jnp.float32))
    return acc / jnp.maximum(l, 1e-30)[:, None], m, l


def _combine_local(h_l, mask_l, params, da_l=None, db_l=None, *,
                   gated: bool, axis: str, rate=ATTN_DROPOUT_RATE):
    """Runs INSIDE shard_map (forward only): local fused partials +
    collective combine over the bag axis.  Returns (pooled [B_l, D],
    global (m, W) [B_l, 2]), replicated across ``axis`` (B_l is the
    local batch shard when a batch mesh axis is in play)."""
    out_l, m_l, l_l = _local_partials(h_l, mask_l, params, gated,
                                      da_l, db_l, rate)
    # the max shift cancels mathematically (constants in the combine)
    m = jax.lax.pmax(m_l, axis)
    w = l_l * jnp.exp(m_l - m)
    W = jnp.maximum(jax.lax.psum(w, axis), 1e-30)
    out = jax.lax.psum(out_l * w[:, None], axis) / W[:, None]
    return out, jnp.stack([m, W], axis=1)


def _bwd_local(h_l, mask_l, params, out, ml, g, da_l=None, db_l=None, *,
               gated: bool, axes, rate=ATTN_DROPOUT_RATE):
    """Runs INSIDE shard_map (forward only, during the outer custom
    VJP's backward): with the GLOBAL residuals (out, m, W), the fused
    backward kernel per shard IS the exact local restriction of the
    unsharded backward — dh stays local, parameter grads psum over
    every mesh axis in play (bag shards AND batch shards)."""
    if mil._use_pallas():
        # the backward kernel's ml BlockSpec expects [B, 1, 2]
        dh, dparams = mil._fused_pool_bwd_pallas(
            h_l, mask_l, params, out, ml[:, None, :], g, gated,
            da=da_l, db=db_l if gated else None, rate=rate)
    else:
        dh, dparams = mil._pool_bwd_reference(h_l, mask_l, params, out,
                                              ml, g, gated, da=da_l,
                                              db=db_l, rate=rate)
    dparams = jax.tree.map(lambda x: jax.lax.psum(x, axes), dparams)
    return dh, dparams


# The custom VJP sits OUTSIDE shard_map: both passes only ever run
# shard_map forward, so no transpose-of-replicated-output semantics are
# involved (differentiating through an out_specs=P() shard_map scales
# cotangents by 1/mesh_size).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _sharded_pool(h, mask, params, gated: bool, mesh: Mesh, axis: str,
                  batch_axis):
    out, _ = _sharded_pool_fwd(h, mask, params, gated, mesh, axis,
                               batch_axis)
    return out


def _sharded_pool_fwd(h, mask, params, gated: bool, mesh: Mesh, axis: str,
                      batch_axis):
    bax = batch_axis  # None -> batch replicated (pure bag sharding)
    fn = jax.shard_map(
        functools.partial(_combine_local, gated=gated, axis=axis),
        mesh=mesh,
        in_specs=(P(bax, axis, None), P(bax, axis), P()),
        out_specs=(P(bax, None), P(bax, None)),
        check_vma=False,
    )
    out, ml = fn(h, mask, params)
    return out, (h, mask, params, out, ml)


def _sharded_pool_bwd(gated: bool, mesh: Mesh, axis: str, batch_axis,
                      res, g):
    h, mask, params, out, ml = res
    bax = batch_axis
    axes = (bax, axis) if bax is not None else axis
    fn = jax.shard_map(
        functools.partial(_bwd_local, gated=gated, axes=axes),
        mesh=mesh,
        in_specs=(P(bax, axis, None), P(bax, axis), P(), P(bax, None),
                  P(bax, None), P(bax, None)),
        out_specs=(P(bax, axis, None), P()),
        check_vma=False,
    )
    dh, dparams = fn(h, mask, params, out, ml, g)
    return dh, None, dparams


_sharded_pool.defvjp(_sharded_pool_fwd, _sharded_pool_bwd)


# Dropout variant: the per-branch keep masks (da, db) are sharded along
# the bag axis exactly like h, so each shard's fused kernel applies its
# local restriction of the global dropout pattern — forward and
# backward see identical bits because the masks are tensor inputs.
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _sharded_pool_dropout(h, mask, da, db, params, gated: bool,
                          rate: float, mesh: Mesh, axis: str, batch_axis):
    out, _ = _sharded_pool_dropout_fwd(h, mask, da, db, params, gated,
                                       rate, mesh, axis, batch_axis)
    return out


def _sharded_pool_dropout_fwd(h, mask, da, db, params, gated: bool,
                              rate: float, mesh: Mesh, axis: str,
                              batch_axis):
    bax = batch_axis
    fn = jax.shard_map(
        functools.partial(_combine_local, gated=gated, axis=axis,
                          rate=rate),
        mesh=mesh,
        in_specs=(P(bax, axis, None), P(bax, axis), P(),
                  P(bax, axis, None), P(bax, axis, None)),
        out_specs=(P(bax, None), P(bax, None)),
        check_vma=False,
    )
    out, ml = fn(h, mask, params, da, db)
    return out, (h, mask, da, db, params, out, ml)


def _sharded_pool_dropout_bwd(gated: bool, rate: float, mesh: Mesh,
                              axis: str, batch_axis, res, g):
    h, mask, da, db, params, out, ml = res
    bax = batch_axis
    axes = (bax, axis) if bax is not None else axis
    fn = jax.shard_map(
        functools.partial(_bwd_local, gated=gated, axes=axes, rate=rate),
        mesh=mesh,
        in_specs=(P(bax, axis, None), P(bax, axis), P(), P(bax, None),
                  P(bax, None), P(bax, None), P(bax, axis, None),
                  P(bax, axis, None)),
        out_specs=(P(bax, axis, None), P()),
        check_vma=False,
    )
    dh, dparams = fn(h, mask, params, out, ml, g, da, db)
    return dh, None, None, None, dparams


_sharded_pool_dropout.defvjp(_sharded_pool_dropout_fwd,
                             _sharded_pool_dropout_bwd)


def sharded_attention_pool(h, mask, params: AttnParams, gated: bool,
                           mesh: Mesh, axis: str = "bag",
                           batch_axis=None, da=None, db=None,
                           rate: float = ATTN_DROPOUT_RATE):
    """h [B, N, D] / mask [B, N] with N sharded over ``axis`` (and
    optionally B over ``batch_axis`` — DP x SP composition on a 2-D
    mesh); params replicated.  Returns pooled [B, D] f32, sharded like
    the batch.  Differentiable: dh comes back sharded like h, dparams
    replicated (psum over bag AND batch shards).

    ``da``/``db``: optional attention-branch dropout keep masks
    [B, N, Da] — the reference's --drop_out training recipes run on
    this path too (no unfused bypass, no bag_shard refusal).

    N is padded to a mesh-size multiple with masked rows (neutral:
    mask==0 logits go to NEG_INF); jnp.pad's transpose slices dh back.
    """
    n = mesh.shape[axis]
    pad = (-h.shape[1]) % n
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        if da is not None:
            da = jnp.pad(da, ((0, 0), (0, pad), (0, 0)))
            db = jnp.pad(db, ((0, 0), (0, pad), (0, 0)))
    if da is not None:
        return _sharded_pool_dropout(h, mask, da, db, params, gated,
                                     rate, mesh, axis, batch_axis)
    return _sharded_pool(h, mask, params, gated, mesh, axis, batch_axis)


def bag_sharded_put(mesh: Mesh, axis: str = "bag"):
    """device_put helper placing (h, mask) with the bag axis sharded."""
    def put(h, mask):
        h = jax.device_put(h, NamedSharding(mesh, P(None, axis, None)))
        mask = jax.device_put(mask, NamedSharding(mesh, P(None, axis)))
        return h, mask
    return put
