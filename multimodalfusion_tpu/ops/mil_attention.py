"""Fused masked attention-MIL pooling for TPU (Pallas) with a jnp fallback.

The reference computes gated-attention MIL pooling as four separate torch
ops over a single ragged bag (ref models/model_attention_mil_path.py:50-72,
models/model_modules.py:87-110):

    a = tanh(h @ Wa + ba); b = sigmoid(h @ Wb + bb)
    s = (a * b) @ wc + cc            # [N, 1] attention logits
    A = softmax(s.T)                 # over the bag
    M = A @ h                        # [1, D] pooled bag embedding

which forces batch_size=1 (ref README.md:95) and reads the [N, D] bag
from HBM twice (scoring + pooling).

Here bags are batched and padded to [B, N, D] with a float mask [B, N],
and the whole chain runs as ONE Pallas kernel per bag with an online
(flash-style) masked softmax: each [TN, D] tile of the bag is read from
HBM exactly once, scored on the MXU, and accumulated into running
(max, sum, weighted-sum) registers. HBM traffic on the dominant tensor
is halved vs. the unfused form, and B bags are processed in a single
launch (grid = (B, N_tiles); TPU grid steps are sequential per core, so
VMEM/SMEM scratch carries across the N_tiles axis).

Gradients: ``attention_pool`` is a ``jax.custom_vjp`` whose backward pass
is the XLA autodiff of the pure-jnp reference implementation
(rematerialization — the bag is re-read, no [B, N] softmax is stored).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# the reference hardcodes 0.25 on both attention branches
# (model_modules.py:97-99 nn.Dropout(0.25))
ATTN_DROPOUT_RATE = 0.25


class AttnParams(NamedTuple):
    """Attention-net parameters (gated: all fields; ungated: Wb/bb unused).

    Matches ref Attn_Net_Gated (model_modules.py:87-110): Wa/ba is the
    tanh branch, Wb/bb the sigmoid gate, wc/cc the final projection.
    """
    Wa: jax.Array  # [D, Da]
    ba: jax.Array  # [Da]
    Wb: jax.Array  # [D, Da]
    bb: jax.Array  # [Da]
    wc: jax.Array  # [Da, 1]
    cc: jax.Array  # [1]


# ---------------------------------------------------------------------------
# Pure-jnp reference implementation (also the backward-pass recipe).
# ---------------------------------------------------------------------------

def attention_scores(h, params: AttnParams, gated: bool = True):
    """Raw attention logits s [B, N] (pre-softmax, unmasked)."""
    a = jnp.tanh(h @ params.Wa + params.ba)
    if gated:
        b = jax.nn.sigmoid(h @ params.Wb + params.bb)
        a = a * b
    s = a @ params.wc + params.cc  # [B, N, 1]
    return s[..., 0]


def make_dropout_masks(rng, shape, gated: bool = True,
                       rate: float = ATTN_DROPOUT_RATE):
    """Per-branch keep masks for attention-branch dropout
    (ref model_modules.py:97-99): (da, db) uint8 [B, N, Da], 1 = keep.

    Generated OUTSIDE the fused kernel from the step RNG so the forward
    and backward kernels (and the unfused jnp path in tests) see the
    identical bits.  For ungated attention db is never read; da is
    aliased to avoid a second draw.

    Generation cost matters: the original 2x threefry f32 bernoulli
    cost more than the entire dropout overhead inside the kernels
    (1.76 ms/step at B=32xN=4096xDa=256 vs a 6.3 ms step, measured
    on-chip).  Both masks therefore come from ONE uint8 bit draw — the
    two nibbles are independent Bernoulli sources, exact whenever
    16*(1-rate) is an integer (the reference's rate 0.25 is) — under
    the hardware 'rbg' generator (XLA RngBitGenerator; deterministic
    per backend, which is all mask reproducibility needs).  Non-1/16
    rates fall back to 16-bit thresholds (bias < 2^-16).
    """
    keep = 1.0 - rate
    k16 = keep * 16.0
    # accept both typed keys (flax make_rng) and raw uint32[2] keys
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(rng).reshape(-1)[:2]
    else:
        data = rng.reshape(-1)[:2]
    rbg = jax.random.wrap_key_data(jnp.tile(data, 2), impl="rbg")
    if k16 == int(k16):
        r = jax.random.bits(rbg, shape, jnp.uint8)
        da = ((r & 0x0F) < int(k16)).astype(jnp.uint8)
        if not gated:
            return da, da
        db = ((r >> 4) < int(k16)).astype(jnp.uint8)
        return da, db
    thresh = jnp.uint16(min(round(keep * 65536.0), 65535))
    ka, kb = jax.random.split(rbg)
    da = (jax.random.bits(ka, shape, jnp.uint16) < thresh).astype(
        jnp.uint8)
    if not gated:
        return da, da
    db = (jax.random.bits(kb, shape, jnp.uint16) < thresh).astype(
        jnp.uint8)
    return da, db


def attention_scores_dropout(h, da, db, params: AttnParams,
                             gated: bool = True,
                             rate: float = ATTN_DROPOUT_RATE):
    """Raw attention logits with inverted dropout on the tanh branch
    (mask da) and the sigmoid gate (mask db), each scaled by
    1/(1-rate) — the jnp mirror of the fused dropout kernels."""
    inv = 1.0 / (1.0 - rate)
    a = jnp.tanh(h @ params.Wa + params.ba) * (
        da.astype(jnp.float32) * inv)
    if gated:
        b = jax.nn.sigmoid(h @ params.Wb + params.bb) * (
            db.astype(jnp.float32) * inv)
        a = a * b
    s = a @ params.wc + params.cc
    return s[..., 0]


def masked_softmax_pool(s, h, mask):
    """Masked softmax of s [B, N] over N, then pooled = A @ h.

    Returns (pooled [B, D], attn [B, N]).  Fully-masked bags pool to 0.
    """
    s = jnp.where(mask > 0, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m) * (mask > 0)
    l = jnp.sum(p, axis=1, keepdims=True)
    attn = p / jnp.maximum(l, 1e-30)
    pooled = jnp.einsum("bn,bnd->bd", attn, h)
    return pooled, attn


def _pool_reference(h, mask, params: AttnParams, gated: bool):
    s = attention_scores(h, params, gated)
    pooled, _ = masked_softmax_pool(s, h, mask)
    return pooled


def _pool_reference_dropout(h, mask, da, db, params: AttnParams,
                            gated: bool, rate: float = ATTN_DROPOUT_RATE):
    s = attention_scores_dropout(h, da, db, params, gated, rate)
    pooled, _ = masked_softmax_pool(s, h, mask)
    return pooled


# ---------------------------------------------------------------------------
# Pallas fused kernel.
# ---------------------------------------------------------------------------

def _u8_to_f32(v):
    """mosaic has no direct uint8->f32 convert; go through int32."""
    return v.astype(jnp.int32).astype(jnp.float32)

def _fused_pool_kernel(h_ref, mask_ref, *rest, gated: bool,
                       dropout: bool = False,
                       inv_keep: float = 1.0):
    """One (bag-block, tile) grid step of the online masked softmax pool.

    A whole BLOCK of bags advances together each step — the scoring
    matmul is [BB*TN, D] @ [D, Da], so per-grid-step launch overhead is
    amortized over BB bags (the dominant cost at TN=1024 single-bag
    steps was fixed overhead, ~3.5x the MXU time; see PERF.md).

    h_ref:   [BB, TN, D] VMEM tile (BB bags advance in lockstep)
    mask_ref:[BB, 1, TN] VMEM tile of the validity mask
    da/db:   (dropout only) [BB, TN, Da] uint8 keep masks for the tanh /
             sigmoid branches (ref model_modules.py:97-99); kept
             activations are scaled by inv_keep = 1/(1-rate)
    wa/wb:   [D, Da] in the bag dtype, ba/bb: [1, Da] f32, wc: [1, Da] f32
    out_ref: [BB, 1, D] output block (same block for every tile step)
    ml_ref:  [BB, 1, 2] f32 (max, normalizer) residuals for the backward
    acc_ref: [BB, D] f32 VMEM scratch — running weighted sums
    m_ref/l_ref: [BB, 1] f32 VMEM scratch — running max / normalizer
    """
    idx = 0
    da_ref = db_ref = None
    if dropout:
        da_ref = rest[idx]
        idx += 1
        if gated:
            db_ref = rest[idx]
            idx += 1
    (wa_ref, ba_ref, wb_ref, bb_ref, wc_ref, cc_ref, out_ref, ml_ref,
     acc_ref, m_ref, l_ref) = rest[idx:]

    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    h = h_ref[...]                              # [BB, TN, D], bag dtype
    BB, TN, D = h.shape
    cdt = h.dtype                               # matmuls run in bag dtype
    mask = mask_ref[...].reshape(BB, TN).astype(jnp.float32)

    h2 = h.reshape(BB * TN, D)
    a = jnp.tanh(jnp.dot(h2, wa_ref[...],
                         preferred_element_type=jnp.float32) + ba_ref[...])
    if dropout:
        Da = a.shape[-1]
        a = a * (_u8_to_f32(da_ref[...].reshape(BB * TN, Da)) * inv_keep)
    if gated:
        b = jax.nn.sigmoid(
            jnp.dot(h2, wb_ref[...],
                    preferred_element_type=jnp.float32) + bb_ref[...])
        if dropout:
            b = b * (_u8_to_f32(db_ref[...].reshape(BB * TN, Da))
                     * inv_keep)
        a = a * b
    # final [.., Da] @ [Da] projection as a VPU multiply-reduce (a matvec
    # would waste an MXU pass; wc is a single row)
    s = jnp.sum(a * wc_ref[...], axis=1).reshape(BB, TN) + cc_ref[0, 0]
    s = jnp.where(mask > 0, s, NEG_INF)

    m_prev = m_ref[...]                          # [BB, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)               # [BB, 1]
    p = jnp.exp(s - m_new) * (mask > 0)          # [BB, TN]
    l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=1, keepdims=True)
    # per-bag [1, TN] @ [TN, D] pooling on the MXU (static unrolled loop;
    # mosaic has no batched dot_general)
    pc = p.astype(cdt)
    pooled = jnp.concatenate(
        [jnp.dot(pc[i:i + 1], h[i], preferred_element_type=jnp.float32)
         for i in range(BB)], axis=0)            # [BB, D]
    acc_ref[...] = acc_ref[...] * corr + pooled
    m_ref[...] = m_new

    @pl.when(j == n_tiles - 1)
    def _finalize():
        out_ref[...] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
                        )[:, None, :].astype(out_ref.dtype)
        ml_ref[...] = jnp.concatenate([m_ref[...], l_ref[...]],
                                      axis=1)[:, None, :]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_pool_pallas(h, mask, params: AttnParams, gated: bool,
                       tile_n: Optional[int] = None, bag_block: int = 1,
                       interpret: bool = False, da=None, db=None,
                       rate: float = ATTN_DROPOUT_RATE):
    """bag_block > 1 advances several bags per grid step.  Measured on the
    v5e: no gain (the kernel is at the chip's matmul rate, not per-step
    overhead — see PERF.md), and bag_block=8 crashes the mosaic compiler
    on the unrolled per-bag pooling dots, so the default stays 1.

    ``da``/``db``: optional uint8 [B, N, Da] keep masks — attention-branch
    dropout runs INSIDE the fused kernel (ref --drop_out recipes,
    commands.sh:7,12,19, previously forced the unfused path)."""
    B, N, D = h.shape
    Da = params.Wa.shape[1]
    dropout = da is not None
    bb = min(bag_block, B)
    if tile_n is None:
        # keep the h block <=4 MB so block + double-buffer + f32
        # intermediates fit the 16 MB VMEM budget; with dropout the two
        # u8 mask blocks and their i32 cast intermediates push tile 2048
        # ~2 MB over the limit, so the cap halves.  The budget is BYTES,
        # not rows: an f32 [2048, 1024] block compiles 2 MB over the
        # scoped-vmem limit — a dtype/D-blind tile OOMs off the tuned
        # bf16 D=256 production shape (caught on-chip by
        # tools/tpu_kernel_selftest.py, which compiles these paths for
        # real; interpret-mode tests cannot see VMEM limits)
        cap = (1024 if dropout else 2048) // bb
        budget = 4 * 1024 * 1024
        tile_n = max(min(cap, budget // (bb * D * h.dtype.itemsize)), 256)
    tn = min(tile_n, _round_up(N, 128))
    n_pad = _round_up(N, tn)
    b_pad = _round_up(B, bb)
    if n_pad != N or b_pad != B:
        h = jnp.pad(h, ((0, b_pad - B), (0, n_pad - N), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - B), (0, n_pad - N)))
        if dropout:
            da = jnp.pad(da, ((0, b_pad - B), (0, n_pad - N), (0, 0)))
            if gated:
                db = jnp.pad(db, ((0, b_pad - B), (0, n_pad - N), (0, 0)))
    n_tiles = n_pad // tn

    kernel = functools.partial(_fused_pool_kernel, gated=gated,
                               dropout=dropout,
                               inv_keep=1.0 / (1.0 - rate))
    grid = (b_pad // bb, n_tiles)
    cdt = h.dtype
    in_specs = [
        pl.BlockSpec((bb, tn, D), lambda b, j: (b, j, 0)),
        pl.BlockSpec((bb, 1, tn), lambda b, j: (b, 0, j)),
    ]
    inputs = [h, mask[:, None, :]]
    if dropout:
        in_specs.append(pl.BlockSpec((bb, tn, Da), lambda b, j: (b, j, 0)))
        inputs.append(da)
        if gated:
            in_specs.append(pl.BlockSpec((bb, tn, Da),
                                         lambda b, j: (b, j, 0)))
            inputs.append(db)
    in_specs += [
        pl.BlockSpec((D, Da), lambda b, j: (0, 0)),
        pl.BlockSpec((1, Da), lambda b, j: (0, 0)),
        pl.BlockSpec((D, Da), lambda b, j: (0, 0)),
        pl.BlockSpec((1, Da), lambda b, j: (0, 0)),
        pl.BlockSpec((1, Da), lambda b, j: (0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    inputs += [params.Wa.astype(cdt),
               params.ba.reshape(1, -1).astype(jnp.float32),
               params.Wb.astype(cdt),
               params.bb.reshape(1, -1).astype(jnp.float32),
               params.wc.reshape(1, -1).astype(jnp.float32),
               params.cc.reshape(1, 1).astype(jnp.float32)]
    out, ml = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bb, 1, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((bb, 1, 2), lambda b, j: (b, 0, 0)),
        ),
        # f32 accumulate/output regardless of bag dtype (the unfused
        # reference path also promotes to f32, keeping the custom VJP's
        # primal/cotangent dtypes consistent).  ml carries the softmax
        # (max, normalizer) residuals for the fused backward.
        out_shape=(jax.ShapeDtypeStruct((b_pad, 1, D), jnp.float32),
                   jax.ShapeDtypeStruct((b_pad, 1, 2), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((bb, D), jnp.float32),
            pltpu.VMEM((bb, 1), jnp.float32),
            pltpu.VMEM((bb, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pad * D * (2 * Da if gated else Da),
            bytes_accessed=B * n_pad * D * h.dtype.itemsize,
            transcendentals=B * n_pad * (2 * Da if gated else Da),
        ),
    )(*inputs)
    return out[:B, 0, :], ml[:B]


# ---------------------------------------------------------------------------
# Fused Pallas backward: one pass over the bag computes dh and accumulates
# every parameter gradient (the XLA rematerialized fallback reads the bag
# three times and materializes [B, N, Da] intermediates).
#
# Math (per instance i, cotangent g in R^D):
#   alpha_i = g . h_i ;  ds_i = a_i (alpha_i - g . out)
#   dz_i = ds_i * wc ;  dpa_i = dz_i * u_i * (1 - t_i^2) (gated)
#   dpb_i = dz_i * t_i * u_i (1 - u_i)
#   dh_i = a_i g + dpa_i Wa^T + dpb_i Wb^T
#   dWa += h_i^T dpa_i ;  dba += dpa_i ;  dwc += ds_i z_i ;  dcc += ds_i
# ---------------------------------------------------------------------------

def _fused_pool_bwd_kernel(h_ref, mask_ref, *rest, gated: bool,
                           dropout: bool = False, inv_keep: float = 1.0):
    idx = 0
    da_ref = db_ref = None
    if dropout:
        da_ref = rest[idx]
        idx += 1
        if gated:
            db_ref = rest[idx]
            idx += 1
    (g_ref, out_ref, ml_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_row_ref,
     wat_ref, wbt_ref, cc_ref, dh_ref, dwa_ref, dba_ref, dwb_ref,
     dbb_ref, dwc_ref, dcc_ref) = rest[idx:]

    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, j == 0))
    def _init():
        dwa_ref[...] = jnp.zeros_like(dwa_ref)
        dba_ref[...] = jnp.zeros_like(dba_ref)
        dwb_ref[...] = jnp.zeros_like(dwb_ref)
        dbb_ref[...] = jnp.zeros_like(dbb_ref)
        dwc_ref[...] = jnp.zeros_like(dwc_ref)
        dcc_ref[...] = jnp.zeros_like(dcc_ref)

    h = h_ref[0]                                # [TN, D], bag dtype
    cdt = h.dtype
    mask_col = jnp.transpose(mask_ref[0]).astype(jnp.float32)  # [TN, 1]
    g = g_ref[0].astype(jnp.float32)            # [1, D]
    out = out_ref[0].astype(jnp.float32)        # [1, D]
    m = ml_ref[0, 0, 0]
    l = jnp.maximum(ml_ref[0, 0, 1], 1e-30)
    wc_row = wc_row_ref[...]                    # [1, Da]

    t = jnp.tanh(jnp.dot(h, wa_ref[...].astype(cdt),
                         preferred_element_type=jnp.float32) + ba_ref[...])
    # daf/dbf fold the inverted-dropout keep masks and the 1/(1-rate)
    # scale; the same factors appear in the forward scores AND as the
    # chain-rule factor of each pre-activation gradient
    daf = (_u8_to_f32(da_ref[0]) * inv_keep) if dropout else None
    if gated:
        u = jax.nn.sigmoid(
            jnp.dot(h, wb_ref[...].astype(cdt),
                    preferred_element_type=jnp.float32) + bb_ref[...])
        if dropout:
            dbf = _u8_to_f32(db_ref[0]) * inv_keep
            ta = t * daf
            ub = u * dbf
        else:
            ta, ub = t, u
        z = ta * ub
    else:
        z = t * daf if dropout else t
    s = jnp.sum(z * wc_row, axis=1, keepdims=True) + cc_ref[0, 0]  # [TN,1]
    # mask before the exp exactly like the forward — for an all-masked
    # bag m is NEG_INF and unmasked s - m would overflow to inf * 0 = nan
    s = jnp.where(mask_col > 0, s, NEG_INF)
    a = jnp.exp(s - m) / l * mask_col            # [TN, 1]

    # VPU multiply-reduce (mosaic cannot lower a bf16 (1,1)-contraction)
    alpha = jnp.sum(h.astype(jnp.float32) * g, axis=1,
                    keepdims=True)               # [TN, 1]
    gout = jnp.sum(g * out)
    ds = a * (alpha - gout)                      # [TN, 1]
    dz = ds * wc_row                             # [TN, Da]
    if gated:
        dpa = dz * ub * (1.0 - t * t)
        dpb = dz * ta * u * (1.0 - u)
        if dropout:
            dpa = dpa * daf
            dpb = dpb * dbf
    else:
        dpa = dz * (1.0 - t * t)
        if dropout:
            dpa = dpa * daf
        dpb = jnp.zeros_like(dz)

    dpa_c = dpa.astype(cdt)
    dpb_c = dpb.astype(cdt)
    dh = a * g                                   # [TN, D]
    dh = dh + jnp.dot(dpa_c, wat_ref[...].astype(cdt),
                      preferred_element_type=jnp.float32)
    if gated:
        dh = dh + jnp.dot(dpb_c, wbt_ref[...].astype(cdt),
                          preferred_element_type=jnp.float32)
    dh_ref[0] = dh.astype(dh_ref.dtype)

    dwa_ref[...] += jax.lax.dot_general(
        h, dpa_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dba_ref[...] += jnp.sum(dpa, axis=0, keepdims=True)
    if gated:
        dwb_ref[...] += jax.lax.dot_general(
            h, dpb_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbb_ref[...] += jnp.sum(dpb, axis=0, keepdims=True)
    dwc_ref[...] += jnp.sum(z * ds, axis=0, keepdims=True)
    # dcc = sum(ds) is analytically 0: softmax attention is invariant to a
    # constant logit shift, so sum_i ds_i = A - 1*A = 0 per bag.  Summing
    # in bf16 leaves O(1e-3) cancellation noise, so keep the exact zero
    # from _init instead of accumulating.


def _fused_pool_bwd_pallas(h, mask, params: AttnParams, out, ml, g,
                           gated: bool, tile_n: Optional[int] = None,
                           interpret: bool = False, da=None, db=None,
                           rate: float = ATTN_DROPOUT_RATE):
    """tile_n=1024 measured best on the v5e at training batch sizes
    (+~5% over tile 256 at B=32, same session; 2048 overflows VMEM —
    the block + f32 intermediates + dh exceed 16 MB).  With dropout the
    mask blocks + their i32 cast intermediates push tile 1024 ~7 MB
    over, so the tile halves to 512.  Those numbers are for bf16 bags
    at the production D=256; other dtypes/widths derive from the same
    byte budget below (on-chip evidence: tools/tpu_kernel_selftest.py)."""
    B, N, D = h.shape
    Da = params.Wa.shape[1]
    dropout = da is not None
    if tile_n is None:
        # byte-aware like the forward: the backward holds the h block,
        # the dh block, an f32 copy of h (alpha) and six [TN, Da] f32
        # intermediates, so its h-block budget is an eighth of the
        # forward's.  bf16 D=256 (the production shape) lands on the
        # tuned 1024/512; f32 or D=1024 shapes shrink instead of
        # overflowing scoped vmem (tools/tpu_kernel_selftest.py
        # compiles all of these on-chip)
        cap = 512 if dropout else 1024
        budget = 512 * 1024
        tile_n = max(min(cap, budget // (D * h.dtype.itemsize)), 256)
    tn = min(tile_n, _round_up(N, 128))
    n_pad = _round_up(N, tn)
    if n_pad != N:
        h = jnp.pad(h, ((0, 0), (0, n_pad - N), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, n_pad - N)))
        if dropout:
            da = jnp.pad(da, ((0, 0), (0, n_pad - N), (0, 0)))
            if gated:
                db = jnp.pad(db, ((0, 0), (0, n_pad - N), (0, 0)))
    n_tiles = n_pad // tn

    kernel = functools.partial(_fused_pool_bwd_kernel, gated=gated,
                               dropout=dropout,
                               inv_keep=1.0 / (1.0 - rate))
    in_specs = [
        pl.BlockSpec((1, tn, D), lambda b, j: (b, j, 0)),
        pl.BlockSpec((1, 1, tn), lambda b, j: (b, 0, j)),
    ]
    drop_inputs = []
    if dropout:
        in_specs.append(pl.BlockSpec((1, tn, Da), lambda b, j: (b, j, 0)))
        drop_inputs.append(da)
        if gated:
            in_specs.append(pl.BlockSpec((1, tn, Da),
                                         lambda b, j: (b, j, 0)))
            drop_inputs.append(db)
    in_specs += [
        pl.BlockSpec((1, 1, D), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, 1, D), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, 1, 2), lambda b, j: (b, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((D, Da), lambda b, j: (0, 0)),
        pl.BlockSpec((1, Da), lambda b, j: (0, 0)),
        pl.BlockSpec((D, Da), lambda b, j: (0, 0)),
        pl.BlockSpec((1, Da), lambda b, j: (0, 0)),
        pl.BlockSpec((1, Da), lambda b, j: (0, 0)),
        pl.BlockSpec((Da, D), lambda b, j: (0, 0)),
        pl.BlockSpec((Da, D), lambda b, j: (0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, tn, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((D, Da), lambda b, j: (0, 0)),
            pl.BlockSpec((1, Da), lambda b, j: (0, 0)),
            pl.BlockSpec((D, Da), lambda b, j: (0, 0)),
            pl.BlockSpec((1, Da), lambda b, j: (0, 0)),
            pl.BlockSpec((1, Da), lambda b, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda b, j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_pad, D), h.dtype),
            jax.ShapeDtypeStruct((D, Da), jnp.float32),
            jax.ShapeDtypeStruct((1, Da), jnp.float32),
            jax.ShapeDtypeStruct((D, Da), jnp.float32),
            jax.ShapeDtypeStruct((1, Da), jnp.float32),
            jax.ShapeDtypeStruct((1, Da), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * B * n_pad * D * (2 * Da if gated else Da),
            bytes_accessed=2 * B * n_pad * D * h.dtype.itemsize,
            transcendentals=B * n_pad * (2 * Da if gated else Da),
        ),
    )(h, mask[:, None, :], *drop_inputs,
      g.reshape(B, 1, D).astype(jnp.float32),
      out.reshape(B, 1, D).astype(jnp.float32), ml,
      params.Wa, params.ba.reshape(1, -1), params.Wb,
      params.bb.reshape(1, -1), params.wc.reshape(1, -1),
      params.Wa.T, params.Wb.T,
      params.cc.reshape(1, 1).astype(jnp.float32))
    dh, dwa, dba, dwb, dbb, dwc_row, dcc = outs
    dh = dh[:, :N, :]
    dparams = AttnParams(
        Wa=dwa.astype(params.Wa.dtype),
        ba=dba.reshape(-1).astype(params.ba.dtype),
        Wb=dwb.astype(params.Wb.dtype),
        bb=dbb.reshape(-1).astype(params.bb.dtype),
        wc=dwc_row.reshape(-1, 1).astype(params.wc.dtype),
        cc=dcc.reshape(1).astype(params.cc.dtype))
    return dh, dparams


def _pool_bwd_reference(h, mask, params: AttnParams, out, ml, g,
                        gated: bool, da=None, db=None,
                        rate: float = ATTN_DROPOUT_RATE):
    """XLA mirror of ``_fused_pool_bwd_kernel`` with EXPLICIT (out, ml)
    residuals — unlike the rematerialized fallback in
    ``_attention_pool_bwd``, the softmax statistics are taken from the
    caller, so the sharded pool can pass GLOBAL (max, normalizer) and
    the global pooled output and get the exact local restriction of the
    unsharded backward (ops/sharded_pool.py, CPU-mesh tests).
    ``da``/``db``: optional attention-branch dropout keep masks, same
    semantics as the fused kernels."""
    f32 = jnp.float32
    dropout = da is not None
    inv_keep = 1.0 / (1.0 - rate)
    m = ml[:, 0][:, None]
    l = jnp.maximum(ml[:, 1], 1e-30)[:, None]
    g = g.astype(f32)
    out = out.astype(f32)
    hf = h.astype(f32)
    t = jnp.tanh(hf @ params.Wa.astype(f32) + params.ba)
    daf = (da.astype(f32) * inv_keep) if dropout else None
    if gated:
        u = jax.nn.sigmoid(hf @ params.Wb.astype(f32) + params.bb)
        if dropout:
            dbf = db.astype(f32) * inv_keep
            ta, ub = t * daf, u * dbf
        else:
            ta, ub = t, u
        z = ta * ub
    else:
        u = None
        z = t * daf if dropout else t
    s = jnp.einsum("bnk,k->bn", z, params.wc.reshape(-1)) + params.cc[0]
    s = jnp.where(mask > 0, s, NEG_INF)
    a = jnp.exp(s - m) / l * (mask > 0)                     # [B, N]
    alpha = jnp.sum(hf * g[:, None, :], axis=-1)            # [B, N]
    gout = jnp.sum(g * out, axis=-1)[:, None]
    ds = a * (alpha - gout)                                 # [B, N]
    dz = ds[..., None] * params.wc.reshape(1, 1, -1)
    if gated:
        dpa = dz * ub * (1.0 - t * t)
        dpb = dz * ta * u * (1.0 - u)
        if dropout:
            dpa = dpa * daf
            dpb = dpb * dbf
    else:
        dpa = dz * (1.0 - t * t)
        if dropout:
            dpa = dpa * daf
        dpb = jnp.zeros_like(dz)
    dh = (a[..., None] * g[:, None, :]
          + dpa @ params.Wa.T.astype(f32)
          + (dpb @ params.Wb.T.astype(f32) if gated else 0.0))
    dparams = AttnParams(
        Wa=jnp.einsum("bnd,bnk->dk", hf, dpa).astype(params.Wa.dtype),
        ba=jnp.sum(dpa, axis=(0, 1)).astype(params.ba.dtype),
        Wb=(jnp.einsum("bnd,bnk->dk", hf, dpb)
            if gated else jnp.zeros_like(params.Wb)).astype(
                params.Wb.dtype),
        bb=(jnp.sum(dpb, axis=(0, 1)) if gated
            else jnp.zeros_like(params.bb)).astype(params.bb.dtype),
        wc=jnp.einsum("bnk,bn->k", z, ds).reshape(-1, 1).astype(
            params.wc.dtype),
        # dcc = sum(ds) is analytically 0 (logit-shift invariance);
        # keep the exact zero like the fused kernel
        cc=jnp.zeros_like(params.cc))
    return dh.astype(h.dtype), dparams


# ---------------------------------------------------------------------------
# Public op with custom VJP.
# ---------------------------------------------------------------------------

import contextlib

_FORCE_UNFUSED = False


@contextlib.contextmanager
def force_unfused():
    """Trace with the pure-XLA pooling even on TPU.  Used by
    utils/model_export.py for cross-platform serving artifacts: mosaic
    custom calls only lower for the tpu platform, while the unfused
    form lowers everywhere (and serving is forward-only, where XLA's
    fusion is within ~15% of the fused kernel — PERF.md).

    PROCESS-GLOBAL and not thread-safe: any OTHER trace happening
    while the context is open (e.g. a concurrent train-step retrace in
    a long-lived server) would also capture — and jit-cache — the
    unfused pooling.  Keep exports out of threads that share live jit
    state; the export CLI is single-threaded."""
    global _FORCE_UNFUSED
    prev = _FORCE_UNFUSED
    _FORCE_UNFUSED = True
    try:
        yield
    finally:
        _FORCE_UNFUSED = prev


def _use_pallas() -> bool:
    return not _FORCE_UNFUSED and jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def attention_pool(h, mask, params: AttnParams, gated: bool = True):
    """Fused gated/ungated attention-MIL pooling.

    h:    [B, N, D] padded bag features (post-FC, ref 256-d)
    mask: [B, N]    1.0 for real instances, 0.0 for padding
    params: AttnParams
    Returns pooled [B, D].
    """
    if _use_pallas():
        return _fused_pool_pallas(h, mask, params, gated)[0]
    return _pool_reference(h, mask, params, gated)


def _attention_pool_fwd(h, mask, params, gated):
    if _use_pallas():
        out, ml = _fused_pool_pallas(h, mask, params, gated)
        return out, (h, mask, params, out, ml)
    out = _pool_reference(h, mask, params, gated)
    return out, (h, mask, params, None, None)


# Toggle for the fused Pallas backward (vs XLA rematerialized autodiff).
USE_FUSED_BACKWARD = True


def _attention_pool_bwd(gated, res, g):
    h, mask, params, out, ml = res
    if USE_FUSED_BACKWARD and ml is not None and _use_pallas():
        dh, dparams = _fused_pool_bwd_pallas(h, mask, params, out, ml, g,
                                             gated)
        return dh, None, dparams
    # CPU fallback: rematerialized backward via XLA autodiff of the
    # reference form, recomputed in the bag's dtype (bf16 bags would
    # otherwise promote every backward matmul to f32).
    params_c = jax.tree.map(lambda p: p.astype(h.dtype), params)
    primal, vjp = jax.vjp(
        lambda hh, pp: _pool_reference(hh, mask, pp, gated), h, params_c)
    dh, dparams_c = vjp(g.astype(primal.dtype))
    dparams = jax.tree.map(lambda dp, p: dp.astype(p.dtype), dparams_c,
                           params)
    # dcc = sum(ds) is analytically 0 (softmax logit-shift invariance);
    # autodiff leaves f32 cancellation noise that Adam would normalize
    # into a full-size step — keep the exact zero like the fused kernel
    dparams = dparams._replace(cc=jnp.zeros_like(dparams.cc))
    return dh, None, dparams


attention_pool.defvjp(_attention_pool_fwd, _attention_pool_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def attention_pool_dropout(h, mask, da, db, params: AttnParams,
                           gated: bool = True,
                           rate: float = ATTN_DROPOUT_RATE):
    """Fused attention-MIL pooling WITH attention-branch dropout
    (ref model_modules.py:97-99; every published reference recipe
    passes --drop_out, commands.sh:7,12,19).

    ``da``/``db``: uint8 [B, N, Da] keep masks from
    ``make_dropout_masks`` — explicit tensor inputs so the forward and
    backward kernels (and the unfused test oracle) apply the identical
    bits.  Returns pooled [B, D].
    """
    if _use_pallas():
        return _fused_pool_pallas(h, mask, params, gated, da=da,
                                  db=db if gated else None, rate=rate)[0]
    return _pool_reference_dropout(h, mask, da, db, params, gated, rate)


def _attention_pool_dropout_fwd(h, mask, da, db, params, gated, rate):
    if _use_pallas():
        out, ml = _fused_pool_pallas(h, mask, params, gated, da=da,
                                     db=db if gated else None, rate=rate)
        return out, (h, mask, da, db, params, out, ml)
    out = _pool_reference_dropout(h, mask, da, db, params, gated, rate)
    return out, (h, mask, da, db, params, None, None)


def _attention_pool_dropout_bwd(gated, rate, res, g):
    h, mask, da, db, params, out, ml = res
    if USE_FUSED_BACKWARD and ml is not None and _use_pallas():
        dh, dparams = _fused_pool_bwd_pallas(
            h, mask, params, out, ml, g, gated, da=da,
            db=db if gated else None, rate=rate)
        return dh, None, None, None, dparams
    # CPU fallback: rematerialized XLA autodiff of the dropout reference
    params_c = jax.tree.map(lambda p: p.astype(h.dtype), params)
    primal, vjp = jax.vjp(
        lambda hh, pp: _pool_reference_dropout(hh, mask, da, db, pp,
                                               gated, rate), h, params_c)
    dh, dparams_c = vjp(g.astype(primal.dtype))
    dparams = jax.tree.map(lambda dp, p: dp.astype(p.dtype), dparams_c,
                           params)
    # dcc = sum(ds) stays analytically 0 under dropout (the masks change
    # z, not the softmax's logit-shift invariance)
    dparams = dparams._replace(cc=jnp.zeros_like(dparams.cc))
    return dh, None, None, None, dparams


attention_pool_dropout.defvjp(_attention_pool_dropout_fwd,
                              _attention_pool_dropout_bwd)


def attention_pool_with_attn(h, mask, params: AttnParams, gated: bool = True):
    """Unfused path that also returns the attention distribution and raw
    logits (for interpretability / ``attention_only`` escapes,
    ref model_attention_mil_path.py:68-70)."""
    s = attention_scores(h, params, gated)
    pooled, attn = masked_softmax_pool(s, h, mask)
    return pooled, attn, s
