"""Round benchmark — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current headline: attention-MIL survival training throughput (bags/sec)
on one chip, batched+fused (this framework) vs the reference
architecture's batch_size=1 unfused loop (ref utils/utils.py:39-46,
README.md:95) executed on the SAME hardware — i.e. the measured speedup
is architectural (batched masked bags + fused Pallas pooling + jit),
not a hardware delta.  Bag shape models TCGA WSI bags (4096 patches,
1024-d ResNet features; SURVEY.md §6).
"""
from __future__ import annotations

import json
import time

import numpy as np


def _setup():
    import jax
    import jax.numpy as jnp
    import optax
    from multimodalfusion_tpu.engine.train import (TrainConfig, build_model,
                                                   make_optimizer,
                                                   make_steps)
    B, N, D = 8, 4096, 1024
    rng = np.random.default_rng(0)
    batch = {
        "path_bags": rng.normal(size=(B, N, D)).astype(np.float32),
        "path_mask": (rng.uniform(size=(B, N)) < 0.9).astype(np.float32),
        "Y": rng.integers(0, 4, size=B).astype(np.int32),
        "t": rng.uniform(1, 100, size=B).astype(np.float32),
        "c": rng.integers(0, 2, size=B).astype(np.float32),
        "valid": np.ones(B, np.float32),
    }
    cfg = TrainConfig(model_type="path_attention_mil", mode="path",
                      bag_loss="nll_surv", gate_path=True, batch_size=B)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    train_step, _ = make_steps(cfg, model, tx)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)
    variables = dict(model.init({"params": key, "dropout": key},
                                bags=jbatch["path_bags"],
                                mask=jbatch["path_mask"],
                                deterministic=True))
    opt_state = tx.init(variables["params"])
    return (jax, jnp, optax, cfg, model, tx, train_step, variables,
            opt_state, jbatch, B, N, D)


def bench_batched(setup, iters=30):
    (jax, jnp, optax, cfg, model, tx, train_step, variables, opt_state,
     jbatch, B, N, D) = setup
    key = jax.random.PRNGKey(1)
    # warmup/compile
    v, o, _ = train_step(variables, opt_state, jbatch, key)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    for i in range(iters):
        v, o, out = train_step(v, o, jbatch, jax.random.fold_in(key, i))
    jax.block_until_ready(v)
    dt = time.perf_counter() - t0
    return B * iters / dt


def bench_reference_style(setup, iters=8):
    """Reference architecture on the same chip: batch_size=1, unfused
    softmax pooling, per-bag jit step (the torch pipeline's shape)."""
    (jax, jnp, optax, cfg, model, tx, train_step, variables, opt_state,
     jbatch, B, N, D) = setup
    from multimodalfusion_tpu.engine.train import (TrainConfig, build_model,
                                                   make_optimizer,
                                                   make_steps)
    cfg1 = TrainConfig(model_type="path_attention_mil", mode="path",
                       bag_loss="nll_surv", gate_path=True, batch_size=1)
    model1 = build_model(cfg1)
    tx1 = make_optimizer(cfg1)
    # force the unfused jnp pooling path (reference forms)
    from multimodalfusion_tpu.ops import mil_attention as mil
    orig = mil._use_pallas
    mil._use_pallas = lambda: False
    try:
        train_step1, _ = make_steps(cfg1, model1, tx1)
        key = jax.random.PRNGKey(2)
        b1 = {k: (v[:1] if hasattr(v, "shape") and v.ndim >= 1 else v)
              for k, v in jbatch.items()}
        variables1 = dict(model1.init({"params": key, "dropout": key},
                                      bags=b1["path_bags"],
                                      mask=b1["path_mask"],
                                      deterministic=True))
        opt_state1 = tx1.init(variables1["params"])
        v, o, _ = train_step1(variables1, opt_state1, b1, key)
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        for i in range(iters):
            v, o, out = train_step1(v, o, b1, jax.random.fold_in(key, i))
        jax.block_until_ready(v)
        dt = time.perf_counter() - t0
    finally:
        mil._use_pallas = orig
    return iters / dt


def main():
    setup = _setup()
    batched = bench_batched(setup)
    ref_style = bench_reference_style(setup)
    result = {
        "metric": "amil_train_bags_per_sec",
        "value": round(batched, 2),
        "unit": "bags/s/chip (4096x1024 WSI bags, nll_surv, fwd+bwd+opt)",
        "vs_baseline": round(batched / ref_style, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
