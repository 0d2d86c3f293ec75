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
