"""Pallas fused attention pooling vs the jnp reference, on CPU in
interpret mode (the TPU path uses the identical kernel compiled)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalfusion_tpu.ops import mil_attention as mil


def make_inputs(rng, B=3, N=300, D=128, Da=64, dtype=np.float32):
    h = rng.normal(size=(B, N, D)).astype(dtype)
    lens = rng.integers(1, N + 1, size=B)
    mask = (np.arange(N)[None, :] < lens[:, None]).astype(dtype)
    params = mil.AttnParams(
        Wa=rng.normal(size=(D, Da)).astype(dtype) * 0.1,
        ba=rng.normal(size=(Da,)).astype(dtype) * 0.1,
        Wb=rng.normal(size=(D, Da)).astype(dtype) * 0.1,
        bb=rng.normal(size=(Da,)).astype(dtype) * 0.1,
        wc=rng.normal(size=(Da, 1)).astype(dtype) * 0.1,
        cc=np.zeros((1,), dtype),
    )
    return jnp.array(h), jnp.array(mask), jax.tree.map(jnp.array, params)


@pytest.mark.parametrize("gated", [True, False])
def test_pallas_matches_reference(rng, gated):
    h, mask, params = make_inputs(rng)
    ref = mil._pool_reference(h, mask, params, gated)
    out = mil._fused_pool_pallas(h, mask, params, gated, tile_n=128,
                                 interpret=True)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_tiling_invariance(rng):
    h, mask, params = make_inputs(rng, B=2, N=512, D=64, Da=32)
    outs = [mil._fused_pool_pallas(h, mask, params, True, tile_n=tn,
                                   interpret=True)[0]
            for tn in (128, 256, 512)]
    for o in outs[1:]:
        np.testing.assert_allclose(np.asarray(o), np.asarray(outs[0]),
                                   rtol=2e-5, atol=2e-5)


def test_matches_singleton_torch_semantics(rng):
    """Batch-of-bags pooling equals per-bag softmax pooling (the reference
    batch_size=1 semantics, model_attention_mil_path.py:50-60)."""
    h, mask, params = make_inputs(rng, B=4, N=200, D=32, Da=16)
    batched = mil._pool_reference(h, mask, params, True)
    for i in range(h.shape[0]):
        n = int(mask[i].sum())
        hi = h[i, :n][None]
        s = mil.attention_scores(hi, params, True)
        a = jax.nn.softmax(s, axis=1)
        expected = jnp.einsum("bn,bnd->bd", a, hi)
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(expected[0]),
                                   rtol=2e-5, atol=2e-5)


def test_grad_matches_reference(rng):
    h, mask, params = make_inputs(rng, B=2, N=100, D=32, Da=16)

    def loss_custom(h, params):
        return jnp.sum(mil.attention_pool(h, mask, params, True) ** 2)

    def loss_ref(h, params):
        return jnp.sum(mil._pool_reference(h, mask, params, True) ** 2)

    g1h, g1p = jax.grad(loss_custom, argnums=(0, 1))(h, params)
    g2h, g2p = jax.grad(loss_ref, argnums=(0, 1))(h, params)
    np.testing.assert_allclose(np.asarray(g1h), np.asarray(g2h), rtol=1e-4,
                               atol=1e-6)
    for a, b in zip(jax.tree.leaves(g1p), jax.tree.leaves(g2p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_padding_is_ignored(rng):
    """Growing the padded region must not change the result."""
    h, mask, params = make_inputs(rng, B=2, N=130, D=32, Da=16)
    h2 = jnp.pad(h, ((0, 0), (0, 126), (0, 0)), constant_values=7.0)
    mask2 = jnp.pad(mask, ((0, 0), (0, 126)))
    o1 = mil._pool_reference(h, mask, params, True)
    o2 = mil._pool_reference(h2, mask2, params, True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5,
                               atol=1e-7)
    p1 = mil._fused_pool_pallas(h, mask, params, True, tile_n=128,
                                interpret=True)[0]
    p2 = mil._fused_pool_pallas(h2, mask2, params, True, tile_n=128,
                                interpret=True)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-5,
                               atol=2e-5)


def test_fully_masked_bag_pools_to_zero(rng):
    h, mask, params = make_inputs(rng, B=2, N=64, D=32, Da=16)
    mask = mask.at[1].set(0.0)
    out = mil._pool_reference(h, mask, params, True)
    assert np.allclose(np.asarray(out[1]), 0.0)
    outp = mil._fused_pool_pallas(h, mask, params, True, tile_n=64,
                                  interpret=True)[0]
    assert np.allclose(np.asarray(outp[1]), 0.0, atol=1e-6)


def test_attn_distribution_sums_to_one(rng):
    h, mask, params = make_inputs(rng, B=3, N=50, D=16, Da=8)
    _, attn, _ = mil.attention_pool_with_attn(h, mask, params, True)
    sums = np.asarray(jnp.sum(attn, axis=1))
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)
    assert np.all(np.asarray(attn) * (1 - np.asarray(mask)) == 0)


@pytest.mark.parametrize("gated", [True, False])
def test_fused_backward_matches_reference(rng, gated):
    """The fused Pallas backward must reproduce XLA autodiff of the
    reference form: dh and every parameter gradient."""
    h, mask, params = make_inputs(rng, B=3, N=300, D=64, Da=32)
    g = jnp.array(rng.normal(size=(3, 64)).astype(np.float32))

    out, ml = mil._fused_pool_pallas(h, mask, params, gated, tile_n=128,
                                     interpret=True)
    dh, dparams = mil._fused_pool_bwd_pallas(h, mask, params, out, ml, g,
                                             gated, tile_n=128,
                                             interpret=True)
    _, vjp = jax.vjp(lambda hh, pp: mil._pool_reference(hh, mask, pp,
                                                        gated), h, params)
    dh_ref, dparams_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                               rtol=2e-4, atol=2e-5)
    for name in dparams._fields:
        a = np.asarray(getattr(dparams, name))
        b = np.asarray(getattr(dparams_ref, name))
        if not gated and name in ("Wb", "bb"):
            continue  # unused in ungated mode
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5,
                                   err_msg=f"grad {name}")


def test_fused_backward_bf16(rng):
    h, mask, params = make_inputs(rng, B=2, N=200, D=64, Da=32)
    hb = h.astype(jnp.bfloat16)
    g = jnp.array(rng.normal(size=(2, 64)).astype(np.float32))
    out, ml = mil._fused_pool_pallas(hb, mask, params, True, tile_n=128,
                                     interpret=True)
    dh, dparams = mil._fused_pool_bwd_pallas(hb, mask, params, out, ml, g,
                                             True, tile_n=128,
                                             interpret=True)
    assert dh.dtype == jnp.bfloat16
    _, vjp = jax.vjp(lambda hh, pp: mil._pool_reference(hh, mask, pp, True),
                     h, params)
    dh_ref, dparams_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(dh, dtype=np.float32),
                               np.asarray(dh_ref), rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(dparams.Wa),
                               np.asarray(dparams_ref.Wa), rtol=0.05,
                               atol=0.02)


def make_drop_masks(rng, B, N, Da, rate=0.25):
    da = (rng.uniform(size=(B, N, Da)) > rate).astype(np.uint8)
    db = (rng.uniform(size=(B, N, Da)) > rate).astype(np.uint8)
    return jnp.array(da), jnp.array(db)


@pytest.mark.parametrize("gated", [True, False])
def test_dropout_fused_matches_unfused(rng, gated):
    """Fused-with-dropout == unfused-with-dropout under a SHARED mask
    (VERDICT r3 item 1 acceptance (a))."""
    B, N, D, Da = 3, 300, 64, 32
    h, mask, params = make_inputs(rng, B=B, N=N, D=D, Da=Da)
    da, db = make_drop_masks(rng, B, N, Da)
    ref = mil._pool_reference_dropout(h, mask, da, db, params, gated)
    out = mil._fused_pool_pallas(h, mask, params, gated, tile_n=128,
                                 interpret=True, da=da,
                                 db=db if gated else None)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # all-keep masks reduce exactly to the no-dropout op scaled by
    # nothing (inverted dropout: kept units scaled by 1/(1-rate))
    ones = jnp.ones((B, N, Da), jnp.uint8)
    s_drop = mil.attention_scores_dropout(h, ones, ones, params, gated,
                                          rate=0.0)
    s_plain = mil.attention_scores(h, params, gated)
    np.testing.assert_allclose(np.asarray(s_drop), np.asarray(s_plain),
                               rtol=1e-5, atol=1e-6)


def test_dropout_fused_tiling_invariance(rng):
    B, N, D, Da = 2, 512, 64, 32
    h, mask, params = make_inputs(rng, B=B, N=N, D=D, Da=Da)
    da, db = make_drop_masks(rng, B, N, Da)
    outs = [mil._fused_pool_pallas(h, mask, params, True, tile_n=tn,
                                   interpret=True, da=da, db=db)[0]
            for tn in (128, 256, 512)]
    for o in outs[1:]:
        np.testing.assert_allclose(np.asarray(o), np.asarray(outs[0]),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("gated", [True, False])
def test_dropout_fused_backward_matches_reference(rng, gated):
    """The fused dropout backward must equal XLA autodiff of the
    unfused dropout form under the same masks."""
    B, N, D, Da = 3, 300, 64, 32
    h, mask, params = make_inputs(rng, B=B, N=N, D=D, Da=Da)
    da, db = make_drop_masks(rng, B, N, Da)
    g = jnp.array(rng.normal(size=(B, D)).astype(np.float32))

    out, ml = mil._fused_pool_pallas(h, mask, params, gated, tile_n=128,
                                     interpret=True, da=da,
                                     db=db if gated else None)
    dh, dparams = mil._fused_pool_bwd_pallas(
        h, mask, params, out, ml, g, gated, tile_n=128, interpret=True,
        da=da, db=db if gated else None)
    _, vjp = jax.vjp(
        lambda hh, pp: mil._pool_reference_dropout(hh, mask, da, db, pp,
                                                   gated), h, params)
    dh_ref, dparams_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                               rtol=2e-4, atol=2e-5)
    for name in dparams._fields:
        if name == "cc":
            continue  # analytic zero kept exactly (logit-shift invariance)
        if not gated and name in ("Wb", "bb"):
            continue
        np.testing.assert_allclose(
            np.asarray(getattr(dparams, name)),
            np.asarray(getattr(dparams_ref, name)),
            rtol=2e-4, atol=2e-5, err_msg=f"grad {name}")


def test_dropout_explicit_residual_backward_matches(rng):
    """_pool_bwd_reference with dropout masks (the sharded pool's CPU
    branch) equals autodiff of the dropout reference."""
    B, N, D, Da = 2, 200, 32, 16
    h, mask, params = make_inputs(rng, B=B, N=N, D=D, Da=Da)
    da, db = make_drop_masks(rng, B, N, Da)
    g = jnp.array(rng.normal(size=(B, D)).astype(np.float32))
    s = mil.attention_scores_dropout(h, da, db, params, True)
    s = jnp.where(mask > 0, s, mil.NEG_INF)
    m = jnp.max(s, axis=1)
    l = jnp.sum(jnp.exp(s - m[:, None]) * (mask > 0), axis=1)
    out = mil._pool_reference_dropout(h, mask, da, db, params, True)
    ml = jnp.stack([m, l], axis=1)
    dh, dparams = mil._pool_bwd_reference(h, mask, params, out, ml, g,
                                          True, da=da, db=db)
    _, vjp = jax.vjp(
        lambda hh, pp: mil._pool_reference_dropout(hh, mask, da, db, pp,
                                                   True), h, params)
    dh_ref, dparams_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dparams.Wa),
                               np.asarray(dparams_ref.Wa),
                               rtol=2e-4, atol=2e-5)


def test_dropout_custom_vjp_cpu_grads(rng):
    """attention_pool_dropout's custom VJP (CPU fallback branch) equals
    jax.grad of the unfused dropout reference."""
    B, N, D, Da = 2, 100, 32, 16
    h, mask, params = make_inputs(rng, B=B, N=N, D=D, Da=Da)
    da, db = make_drop_masks(rng, B, N, Da)

    def loss_custom(h, p):
        return jnp.sum(mil.attention_pool_dropout(h, mask, da, db, p,
                                                  True) ** 2)

    def loss_ref(h, p):
        return jnp.sum(mil._pool_reference_dropout(h, mask, da, db, p,
                                                   True) ** 2)

    g1h, g1p = jax.grad(loss_custom, argnums=(0, 1))(h, params)
    g2h, g2p = jax.grad(loss_ref, argnums=(0, 1))(h, params)
    np.testing.assert_allclose(np.asarray(g1h), np.asarray(g2h),
                               rtol=1e-4, atol=1e-6)
    for name in ("Wa", "ba", "Wb", "bb", "wc"):
        np.testing.assert_allclose(
            np.asarray(getattr(g1p, name)), np.asarray(getattr(g2p, name)),
            rtol=1e-4, atol=1e-6, err_msg=name)


def test_make_dropout_masks_properties(rng):
    da, db = mil.make_dropout_masks(jax.random.PRNGKey(3), (4, 100, 32),
                                    gated=True, rate=0.25)
    assert da.dtype == jnp.uint8 and db.dtype == jnp.uint8
    keep = float(np.mean(np.asarray(da)))
    assert 0.65 < keep < 0.85   # ~Bernoulli(0.75)
    assert not np.array_equal(np.asarray(da), np.asarray(db))
    ua, ub = mil.make_dropout_masks(jax.random.PRNGKey(3), (4, 100, 32),
                                    gated=False)
    assert np.array_equal(np.asarray(ua), np.asarray(ub))  # aliased


def test_fused_backward_empty_bag(rng):
    h, mask, params = make_inputs(rng, B=2, N=128, D=32, Da=16)
    mask = mask.at[1].set(0.0)
    g = jnp.ones((2, 32), jnp.float32)
    out, ml = mil._fused_pool_pallas(h, mask, params, True, tile_n=128,
                                     interpret=True)
    dh, dparams = mil._fused_pool_bwd_pallas(h, mask, params, out, ml, g,
                                             True, tile_n=128,
                                             interpret=True)
    assert np.all(np.isfinite(np.asarray(dh)))
    assert np.allclose(np.asarray(dh[1]), 0.0)
