"""Multi-device sharding on the virtual 8-device CPU mesh: data-parallel
training step and cross-chip bag-sharded attention pooling."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalfusion_tpu.ops import mil_attention as mil
from multimodalfusion_tpu.ops.sharded_pool import sharded_attention_pool
from multimodalfusion_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                pad_batch_to_devices,
                                                shard_batch)


def test_eight_devices_available():
    assert jax.device_count() == 8


def make_attn(rng, D=64, Da=32):
    return mil.AttnParams(
        Wa=jnp.array(rng.normal(size=(D, Da)).astype(np.float32) * 0.1),
        ba=jnp.zeros((Da,), jnp.float32),
        Wb=jnp.array(rng.normal(size=(D, Da)).astype(np.float32) * 0.1),
        bb=jnp.zeros((Da,), jnp.float32),
        wc=jnp.array(rng.normal(size=(Da, 1)).astype(np.float32) * 0.1),
        cc=jnp.zeros((1,), jnp.float32))


def test_bag_sharded_pool_matches_reference(rng):
    """Sharding the bag axis over 8 devices must give identical pooling
    to the single-device computation."""
    B, N, D = 2, 1024, 64
    h = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    lens = np.array([700, 1024])
    mask = jnp.array((np.arange(N)[None, :] < lens[:, None])
                     .astype(np.float32))
    params = make_attn(rng, D=D)
    ref = mil._pool_reference(h, mask, params, True)

    mesh = Mesh(np.array(jax.devices()), ("bag",))
    h_s = jax.device_put(h, NamedSharding(mesh, P(None, "bag", None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P(None, "bag")))
    out = sharded_attention_pool(h_s, mask_s, params, True, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bag_sharded_pool_jit_grad(rng):
    """The sharded pool must jit and differentiate (psum transpose)."""
    B, N, D = 1, 512, 32
    h = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    mask = jnp.ones((B, N), jnp.float32)
    params = make_attn(rng, D=D, Da=16)
    mesh = Mesh(np.array(jax.devices()), ("bag",))

    @jax.jit
    def loss(h):
        out = sharded_attention_pool(h, mask, params, True, mesh)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(jax.device_put(
        h, NamedSharding(mesh, P(None, "bag", None))))
    ref_g = jax.grad(lambda h: jnp.sum(
        mil._pool_reference(h, mask, params, True) ** 2))(h)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g), rtol=1e-4,
                               atol=1e-6)


def test_data_parallel_batch_sharding(rng):
    mesh = make_mesh()
    batch = {
        "x": rng.normal(size=(16, 8)).astype(np.float32),
        "subject_ids": np.array(["a"] * 16, dtype=object),
    }
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == P("data", None)
    assert isinstance(out["subject_ids"], np.ndarray)


def test_pad_batch_to_devices(rng):
    batch = {"x": np.ones((13, 4), np.float32),
             "valid": np.ones(13, np.float32)}
    out = pad_batch_to_devices(batch, 8)
    assert out["x"].shape[0] == 16
    assert out["valid"].sum() == 13


def test_dp_train_step_multidevice(rng):
    """Full training step over the 8-device mesh: loss finite, grads
    applied (exercises the same path as __graft_entry__)."""
    from multimodalfusion_tpu.engine.train import (TrainConfig, build_model,
                                                   make_optimizer,
                                                   make_steps)
    from multimodalfusion_tpu.parallel.mesh import replicate_sharding
    cfg = TrainConfig(model_type="max_net", mode="omic",
                      bag_loss="nll_surv", batch_size=8, omic_input_dim=12)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    train_step, eval_step = make_steps(cfg, model, tx)
    batch = {
        "genomic": rng.normal(size=(8, 12)).astype(np.float32),
        "Y": rng.integers(0, 4, 8).astype(np.int32),
        "t": rng.uniform(1, 50, 8).astype(np.float32),
        "c": np.zeros(8, np.float32),
        "valid": np.ones(8, np.float32),
    }
    mesh = make_mesh()
    variables = dict(model.init(jax.random.PRNGKey(0),
                                genomic_features=batch["genomic"]))
    opt_state = tx.init(variables["params"])
    repl = replicate_sharding(mesh)
    variables = jax.device_put(variables, repl)
    jbatch = shard_batch(batch, mesh)
    jbatch.pop("subject_ids", None)
    d0 = np.asarray(jax.tree.leaves(variables["params"])[0]).copy()
    new_vars, new_opt, out = train_step(variables, opt_state, jbatch,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(out["loss"]))
    d1 = jax.tree.leaves(new_vars["params"])[0]
    assert not np.allclose(d0, np.asarray(d1))


def test_bag_sharded_pool_param_grads_match(rng):
    """Gradients wrt the ATTENTION PARAMS through the sharded pool (the
    psum'd custom-VJP path) must equal the unsharded reference."""
    B, N, D = 2, 512, 32
    h = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    lens = np.array([300, 512])
    mask = jnp.array((np.arange(N)[None, :] < lens[:, None])
                     .astype(np.float32))
    params = make_attn(rng, D=D, Da=16)
    mesh = Mesh(np.array(jax.devices()), ("bag",))
    h_s = jax.device_put(h, NamedSharding(mesh, P(None, "bag", None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P(None, "bag")))

    def loss_sharded(p):
        return jnp.sum(sharded_attention_pool(h_s, mask_s, p, True,
                                              mesh) ** 2)

    def loss_ref(p):
        return jnp.sum(mil._pool_reference(h, mask, p, True) ** 2)

    g_s = jax.grad(loss_sharded)(params)
    g_r = jax.grad(loss_ref)(params)
    for name in ("Wa", "ba", "Wb", "bb", "wc"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_s, name)), np.asarray(getattr(g_r, name)),
            rtol=2e-4, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("drop_out", [False, True])
def test_bag_shard_training_step_matches_unsharded(rng, drop_out):
    """One FULL PathAMIL training step with cfg.bag_shard over the
    8-device mesh: loss and updated params equal the unsharded step
    (VERDICT r2 item 2 acceptance; drop_out=True is the r3 item 1
    acceptance (b) — the reference's canonical --drop_out recipes run
    on the sharded fused path)."""
    from multimodalfusion_tpu.engine.train import (TrainConfig, build_model,
                                                   make_optimizer,
                                                   make_steps)
    from multimodalfusion_tpu.parallel.mesh import (make_bag_mesh,
                                                    replicate_sharding,
                                                    shard_batch_bags)
    B, N = 2, 264   # multiple of 8 so BOTH runs share dropout-mask
    # shapes; the non-multiple padding path is covered separately below
    batch = {
        "path_bags": rng.normal(size=(B, N, 1024)).astype(np.float32),
        "path_mask": (np.arange(N)[None, :]
                      < np.array([200, 260])[:, None]).astype(np.float32),
        "Y": rng.integers(0, 4, B).astype(np.int32),
        "t": rng.uniform(1, 50, B).astype(np.float32),
        "c": np.zeros(B, np.float32),
        "valid": np.ones(B, np.float32),
    }
    results = {}
    for shard in (False, True):
        cfg = TrainConfig(model_type="path_attention_mil", mode="path",
                          bag_loss="nll_surv", batch_size=B,
                          drop_out=drop_out, bag_shard=shard)
        mesh = make_bag_mesh() if shard else None
        model = build_model(cfg, bag_mesh=mesh)
        tx = make_optimizer(cfg)
        train_step, eval_step = make_steps(cfg, model, tx)
        variables = dict(model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            bags=jnp.asarray(batch["path_bags"]),
            mask=jnp.asarray(batch["path_mask"]), deterministic=True))
        opt_state = tx.init(variables["params"])
        if shard:
            repl = replicate_sharding(mesh)
            variables = jax.device_put(variables, repl)
            opt_state = jax.device_put(opt_state, repl)
            jbatch = shard_batch_bags(dict(batch), mesh)
            assert jbatch["path_bags"].shape[1] == 264  # padded to 8x33
        else:
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        new_vars, _, out = train_step(variables, opt_state, jbatch,
                                      jax.random.PRNGKey(7))
        results[shard] = (float(out["loss"]),
                          jax.tree.map(np.asarray, new_vars["params"]))

    loss_u, p_u = results[False]
    loss_s, p_s = results[True]
    assert loss_s == pytest.approx(loss_u, rel=1e-5)
    # every param, cc included: all backward paths keep the analytic
    # dcc == 0 (softmax logit-shift invariance), so cc stays at init
    np.testing.assert_array_equal(p_s["attention_net"]["cc"], 0.0)
    flat_u = jax.tree.leaves(p_u)
    flat_s = jax.tree.leaves(p_s)
    # Adam divides by sqrt(v): elements whose gradient is near zero
    # amplify the paths' float-accumulation-order noise into a visible
    # relative step difference — hence the mixed tolerance
    for a, b in zip(flat_u, flat_s):
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=2e-5)


def test_bag_shard_pads_non_multiple_instance_axis(rng):
    """N not divisible by the mesh size: the op pads with masked rows
    (value-neutral) and unpads dh through jnp.pad's transpose."""
    B, N, D = 1, 260, 32
    h = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    mask = jnp.ones((B, N), jnp.float32)
    params = make_attn(rng, D=D, Da=16)
    mesh = Mesh(np.array(jax.devices()), ("bag",))
    out = sharded_attention_pool(h, mask, params, True, mesh)
    ref = mil._pool_reference(h, mask, params, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g = jax.grad(lambda hh: jnp.sum(sharded_attention_pool(
        hh, mask, params, True, mesh) ** 2))(h)
    g_ref = jax.grad(lambda hh: jnp.sum(
        mil._pool_reference(hh, mask, params, True) ** 2))(h)
    assert g.shape == h.shape
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_bag_sharded_pool_pallas_interpret_branch(rng, monkeypatch):
    """Exercise the TPU (fused-kernel) branch of the sharded pool on the
    CPU mesh via Pallas interpret mode — this is the branch real
    multi-chip hardware runs, which the default CPU tests bypass
    (catches residual-shape mismatches between the kernels and the
    collective combine)."""
    import functools as ft
    real_fwd = mil._fused_pool_pallas
    real_bwd = mil._fused_pool_bwd_pallas
    monkeypatch.setattr(mil, "_use_pallas", lambda: True)
    monkeypatch.setattr(mil, "_fused_pool_pallas",
                        ft.partial(real_fwd, interpret=True))
    monkeypatch.setattr(mil, "_fused_pool_bwd_pallas",
                        ft.partial(real_bwd, interpret=True))

    B, N, D, Da = 2, 1024, 256, 256
    h = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    lens = np.array([700, 1024])
    mask = jnp.array((np.arange(N)[None, :] < lens[:, None])
                     .astype(np.float32))
    params = make_attn(rng, D=D, Da=Da)
    mesh = Mesh(np.array(jax.devices()), ("bag",))
    h_s = jax.device_put(h, NamedSharding(mesh, P(None, "bag", None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P(None, "bag")))

    out = sharded_attention_pool(h_s, mask_s, params, True, mesh)
    ref = mil._pool_reference(h, mask, params, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)

    g = jax.grad(lambda hh: jnp.sum(sharded_attention_pool(
        hh, mask_s, params, True, mesh) ** 2))(h_s)
    g_ref = jax.grad(lambda hh: jnp.sum(
        mil._pool_reference(hh, mask, params, True) ** 2))(h)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-6)


def test_bag_sharded_pool_dropout_matches_reference(rng):
    """Bag-sharded pooling WITH attention-branch dropout masks equals
    the unfused dropout reference (values + gradients)."""
    B, N, D, Da = 2, 512, 32, 16
    h = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    lens = np.array([300, 512])
    mask = jnp.array((np.arange(N)[None, :] < lens[:, None])
                     .astype(np.float32))
    params = make_attn(rng, D=D, Da=Da)
    da = jnp.array((rng.uniform(size=(B, N, Da)) > 0.25).astype(np.uint8))
    db = jnp.array((rng.uniform(size=(B, N, Da)) > 0.25).astype(np.uint8))
    mesh = Mesh(np.array(jax.devices()), ("bag",))
    h_s = jax.device_put(h, NamedSharding(mesh, P(None, "bag", None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P(None, "bag")))

    out = sharded_attention_pool(h_s, mask_s, params, True, mesh,
                                 da=da, db=db)
    ref = mil._pool_reference_dropout(h, mask, da, db, params, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_s(hh, p):
        return jnp.sum(sharded_attention_pool(hh, mask_s, p, True, mesh,
                                              da=da, db=db) ** 2)

    def loss_r(hh, p):
        return jnp.sum(mil._pool_reference_dropout(hh, mask, da, db, p,
                                                   True) ** 2)

    gh_s, gp_s = jax.grad(loss_s, argnums=(0, 1))(h_s, params)
    gh_r, gp_r = jax.grad(loss_r, argnums=(0, 1))(h, params)
    np.testing.assert_allclose(np.asarray(gh_s), np.asarray(gh_r),
                               rtol=1e-4, atol=1e-6)
    for name in ("Wa", "ba", "Wb", "bb", "wc"):
        np.testing.assert_allclose(
            np.asarray(getattr(gp_s, name)), np.asarray(getattr(gp_r, name)),
            rtol=2e-4, atol=1e-6, err_msg=name)


def test_bag_sharded_pool_dropout_pallas_interpret(rng, monkeypatch):
    """The fused-kernel (TPU) branch of the sharded DROPOUT pool,
    exercised on CPU via Pallas interpret mode — the branch real
    multi-chip hardware runs under --drop_out."""
    import functools as ft
    real_fwd = mil._fused_pool_pallas
    real_bwd = mil._fused_pool_bwd_pallas
    monkeypatch.setattr(mil, "_use_pallas", lambda: True)
    monkeypatch.setattr(mil, "_fused_pool_pallas",
                        ft.partial(real_fwd, interpret=True))
    monkeypatch.setattr(mil, "_fused_pool_bwd_pallas",
                        ft.partial(real_bwd, interpret=True))

    B, N, D, Da = 2, 512, 64, 32
    h = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    mask = jnp.array((np.arange(N)[None, :]
                      < np.array([400, 512])[:, None]).astype(np.float32))
    params = make_attn(rng, D=D, Da=Da)
    da = jnp.array((rng.uniform(size=(B, N, Da)) > 0.25).astype(np.uint8))
    db = jnp.array((rng.uniform(size=(B, N, Da)) > 0.25).astype(np.uint8))
    mesh = Mesh(np.array(jax.devices()), ("bag",))
    h_s = jax.device_put(h, NamedSharding(mesh, P(None, "bag", None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P(None, "bag")))

    out = sharded_attention_pool(h_s, mask_s, params, True, mesh,
                                 da=da, db=db)
    ref = mil._pool_reference_dropout(h, mask, da, db, params, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)
    g = jax.grad(lambda hh: jnp.sum(sharded_attention_pool(
        hh, mask_s, params, True, mesh, da=da, db=db) ** 2))(h_s)
    g_ref = jax.grad(lambda hh: jnp.sum(mil._pool_reference_dropout(
        hh, mask, da, db, params, True) ** 2))(h)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-6)


def test_bag_sharded_pool_interpret_30k_instances(rng, monkeypatch):
    """The fused-kernel (TPU) branch of the sharded pool at the
    30k-instance regime bag sharding exists for: multi-slide concat
    bags reach ~30k patches (ref dataset_survival.py:362-367, SURVEY
    §7 risk).  N=32,768 over the 8-device mesh (4,096 instances per
    shard) at the flagship pool width (D=512 fc output, Da=256)
    exercises the VMEM byte-budget tile heuristics at the scale they
    were written for — small-N tests can't reach their large-N tile
    choices."""
    import functools as ft
    real_fwd = mil._fused_pool_pallas
    real_bwd = mil._fused_pool_bwd_pallas
    monkeypatch.setattr(mil, "_use_pallas", lambda: True)
    monkeypatch.setattr(mil, "_fused_pool_pallas",
                        ft.partial(real_fwd, interpret=True))
    monkeypatch.setattr(mil, "_fused_pool_bwd_pallas",
                        ft.partial(real_bwd, interpret=True))

    B, N, D, Da = 2, 32768, 512, 256
    h = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    lens = np.array([29873, 32768])  # ragged: one bag crosses shards
    mask = jnp.array((np.arange(N)[None, :] < lens[:, None])
                     .astype(np.float32))
    params = make_attn(rng, D=D, Da=Da)
    da = jnp.array((rng.uniform(size=(B, N, Da)) > 0.25).astype(np.uint8))
    db = jnp.array((rng.uniform(size=(B, N, Da)) > 0.25).astype(np.uint8))
    mesh = Mesh(np.array(jax.devices()), ("bag",))
    h_s = jax.device_put(h, NamedSharding(mesh, P(None, "bag", None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P(None, "bag")))

    for kw in ({}, {"da": da, "db": db}):
        out = sharded_attention_pool(h_s, mask_s, params, True, mesh, **kw)
        ref = (mil._pool_reference_dropout(h, mask, da, db, params, True)
               if kw else mil._pool_reference(h, mask, params, True))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-5, atol=5e-5)
    g = jax.grad(lambda hh: jnp.sum(sharded_attention_pool(
        hh, mask_s, params, True, mesh, da=da, db=db) ** 2))(h_s)
    g_ref = jax.grad(lambda hh: jnp.sum(mil._pool_reference_dropout(
        hh, mask, da, db, params, True) ** 2))(h)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-6)


def test_dp_bag_2d_mesh_pool_matches_reference(rng):
    """DP x SP composition on a ("data", "bag") 2x4 mesh: pooling and
    gradients equal the unsharded computation."""
    from multimodalfusion_tpu.parallel.mesh import make_dp_bag_mesh
    B, N, D = 4, 512, 32
    h = jnp.array(rng.normal(size=(B, N, D)).astype(np.float32))
    lens = np.array([300, 512, 128, 450])
    mask = jnp.array((np.arange(N)[None, :] < lens[:, None])
                     .astype(np.float32))
    params = make_attn(rng, D=D, Da=16)
    mesh = make_dp_bag_mesh(4)
    assert dict(mesh.shape) == {"data": 2, "bag": 4}
    h_s = jax.device_put(h, NamedSharding(mesh, P("data", "bag", None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("data", "bag")))

    out = sharded_attention_pool(h_s, mask_s, params, True, mesh,
                                 batch_axis="data")
    ref = mil._pool_reference(h, mask, params, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_s(hh, p):
        return jnp.sum(sharded_attention_pool(
            hh, mask_s, p, True, mesh, batch_axis="data") ** 2)

    def loss_r(hh, p):
        return jnp.sum(mil._pool_reference(hh, mask, p, True) ** 2)

    gh_s, gp_s = jax.grad(loss_s, argnums=(0, 1))(h_s, params)
    gh_r, gp_r = jax.grad(loss_r, argnums=(0, 1))(h, params)
    np.testing.assert_allclose(np.asarray(gh_s), np.asarray(gh_r),
                               rtol=1e-4, atol=1e-7)
    for name in ("Wa", "ba", "Wb", "bb", "wc"):
        np.testing.assert_allclose(
            np.asarray(getattr(gp_s, name)), np.asarray(getattr(gp_r, name)),
            rtol=2e-4, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("drop_out", [False, True])
def test_dp_bag_2d_training_step_matches_unsharded(rng, drop_out):
    """One full PathAMIL training step on the 2x4 DP x SP mesh equals
    the unsharded step (loss + updated params), with and without
    attention-branch dropout."""
    from multimodalfusion_tpu.engine.train import (TrainConfig, build_model,
                                                   make_optimizer,
                                                   make_steps)
    from multimodalfusion_tpu.parallel.mesh import (make_dp_bag_mesh,
                                                    replicate_sharding,
                                                    shard_batch_dp_bags)
    B, N = 4, 256
    batch = {
        "path_bags": rng.normal(size=(B, N, 1024)).astype(np.float32),
        "path_mask": (np.arange(N)[None, :]
                      < np.array([200, 256, 120, 233])[:, None]).astype(
                          np.float32),
        "Y": rng.integers(0, 4, B).astype(np.int32),
        "t": rng.uniform(1, 50, B).astype(np.float32),
        "c": np.zeros(B, np.float32),
        "valid": np.ones(B, np.float32),
    }
    results = {}
    for shard in (False, True):
        cfg = TrainConfig(model_type="path_attention_mil", mode="path",
                          bag_loss="nll_surv", batch_size=B,
                          drop_out=drop_out, bag_shard=shard,
                          data_parallel=shard, bag_shard_devices=4)
        mesh = make_dp_bag_mesh(4) if shard else None
        model = build_model(cfg, bag_mesh=mesh)
        tx = make_optimizer(cfg)
        train_step, _ = make_steps(cfg, model, tx)
        variables = dict(model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            bags=jnp.asarray(batch["path_bags"]),
            mask=jnp.asarray(batch["path_mask"]), deterministic=True))
        opt_state = tx.init(variables["params"])
        if shard:
            repl = replicate_sharding(mesh)
            variables = jax.device_put(variables, repl)
            opt_state = jax.device_put(opt_state, repl)
            jbatch = shard_batch_dp_bags(dict(batch), mesh)
        else:
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        new_vars, _, out = train_step(variables, opt_state, jbatch,
                                      jax.random.PRNGKey(7))
        results[shard] = (float(out["loss"]),
                          jax.tree.map(np.asarray, new_vars["params"]))

    loss_u, p_u = results[False]
    loss_s, p_s = results[True]
    assert loss_s == pytest.approx(loss_u, rel=1e-5)
    for a, b in zip(jax.tree.leaves(p_u), jax.tree.leaves(p_s)):
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=2e-5)
