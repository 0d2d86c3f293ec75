"""Kernel-variant bench: AMIL train-step throughput WITH vs WITHOUT
attention-branch dropout, measured identically on the real chip.

Every published reference training recipe passes --drop_out
(ref commands/commands.sh:7,12,19); round 3's review flagged that the
fused Pallas kernels were bypassed in that configuration.  This tool
records the evidence that the fused-with-dropout path (r4) holds the
throughput: same methodology as bench.py's secondary AMIL metric
(steps chained in-graph, device-resident inputs, host-readback sync),
same session for both variants so the chip's ±30% session noise
cancels.

Writes PERF_VARIANTS.json at the repo root:
  {"amil_dropout_over_nodrop": R, "variants": {...}, ...}

Usage:  python tools/bench_variants.py  (on the TPU host)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# the harness (chained fori_loop steps, relay sync, best-of-reps) must
# stay identical to the headline bench or the A/B numbers stop being
# comparable to it — share one definition
from bench import chained_step_rate  # noqa: E402


def bench_amil(drop_out: bool, B=48, N=4096, D=1024, iters=100, reps=3):
    import jax
    import jax.numpy as jnp
    from multimodalfusion_tpu.engine.train import (TrainConfig, build_model,
                                                   make_optimizer,
                                                   make_steps)
    cfg = TrainConfig(model_type="path_attention_mil", mode="path",
                      bag_loss="nll_surv", gate_path=True, batch_size=B,
                      bag_dtype="bfloat16", drop_out=drop_out)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    train_step, _ = make_steps(cfg, model, tx)
    import jax.random as jrandom
    kb, km = jrandom.split(jrandom.PRNGKey(0))
    jbatch = {
        "path_bags": jrandom.normal(kb, (B, N, D), jnp.float32),
        "path_mask": (jrandom.uniform(km, (B, N)) < 0.9).astype(
            jnp.float32),
        "Y": jnp.asarray(np.random.default_rng(0).integers(0, 4, size=B),
                         jnp.int32),
        "t": jnp.asarray(np.random.default_rng(1).uniform(1, 100, size=B),
                         jnp.float32),
        "c": jnp.asarray(np.random.default_rng(2).integers(0, 2, size=B),
                         jnp.float32),
        "valid": jnp.ones(B, jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    variables = dict(model.init({"params": key, "dropout": key},
                                bags=jbatch["path_bags"],
                                mask=jbatch["path_mask"],
                                deterministic=True))
    opt_state = tx.init(variables["params"])
    return B * chained_step_rate(jax, train_step, variables, opt_state,
                                 jbatch, key, iters=iters, reps=reps)


def bench_mm_flagship(B=8, Nr=1024, Np=2048, G=36, n_mod=4, iters=50,
                      reps=3):
    """Steady-state train-step rate of the FLAGSHIP raw trimodal
    mm_attention_mil (radio_path_omic, tensor fusion, --drop_out, fused
    Pallas pooling on both bag branches) — the model the reference
    ships but cannot run (model_mm_attention_mil.py:83 crashes at
    build).  Same methodology as bench_amil."""
    import jax
    import jax.numpy as jnp
    from multimodalfusion_tpu.engine.train import (TrainConfig,
                                                   build_model,
                                                   make_optimizer,
                                                   make_steps)
    cfg = TrainConfig(model_type="mm_attention_mil",
                      mode="radio_path_omic", bag_loss="nll_surv",
                      fusion="tensor", radio_fusion="concat",
                      gate=True, gate_path=True, gate_radio=True,
                      omic_input_dim=G, batch_size=B,
                      bag_dtype="bfloat16", drop_out=True)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    train_step, _ = make_steps(cfg, model, tx)
    import jax.random as jrandom
    kr, kp, kg, km = jrandom.split(jrandom.PRNGKey(0), 4)
    rng = np.random.default_rng(0)
    jbatch = {
        "radio_bags": jrandom.normal(kr, (B, Nr, n_mod * 1024),
                                     jnp.float32),
        "radio_mask": (jrandom.uniform(km, (B, Nr)) < 0.9).astype(
            jnp.float32),
        "path_bags": jrandom.normal(kp, (B, Np, 1024), jnp.float32),
        "path_mask": jnp.ones((B, Np), jnp.float32),
        "genomic": jrandom.normal(kg, (B, G), jnp.float32),
        "Y": jnp.asarray(rng.integers(0, 4, size=B), jnp.int32),
        "t": jnp.asarray(rng.uniform(1, 100, size=B), jnp.float32),
        "c": jnp.asarray(rng.integers(0, 2, size=B), jnp.float32),
        "valid": jnp.ones(B, jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    init_kwargs = {k: jbatch[k] for k in
                   ("radio_bags", "radio_mask", "path_bags",
                    "path_mask", "genomic")}
    variables = dict(model.init({"params": key, "dropout": key},
                                deterministic=True, **init_kwargs))
    opt_state = tx.init(variables["params"])
    return B * chained_step_rate(jax, train_step, variables, opt_state,
                                 jbatch, key, iters=iters, reps=reps)


def main():
    import jax
    from bench import _start_watchdog  # flags a mid-session relay wedge
    backend = jax.default_backend()
    wd = _start_watchdog(phase="AMIL variants")
    nodrop = bench_amil(drop_out=False)
    drop = bench_amil(drop_out=True)
    mm = bench_mm_flagship()
    wd.set()
    # the watchdog may have fired on a slow-but-healthy phase (heavy
    # compile through the relay); the run COMPLETED, so drop the note —
    # a surviving BENCH_ERROR.txt would falsely claim a wedge
    err_note = os.path.join(REPO, "BENCH_ERROR.txt")
    if os.path.exists(err_note):
        os.remove(err_note)
    out = {
        "metric": "amil_train_bags_per_sec_variants",
        "unit": "bags/s/chip (48x4096x1024 bf16 bags, nll_surv, "
                "fwd+bwd+opt, in-graph chained, same session)",
        "backend": backend,
        "variants": {
            "no_dropout": round(nodrop, 2),
            "attn_dropout_fused": round(drop, 2),
            "mm_flagship_dropout": round(mm, 2),
        },
        "mm_flagship_unit": "subjects/s/chip (B=8: radio 1024x4096 + "
                            "path 2048x1024 bf16 bags + 36-d omic, "
                            "tensor fusion, nll_surv, fwd+bwd+opt, "
                            "in-graph chained)",
        "amil_dropout_over_nodrop": round(drop / nodrop, 4),
    }
    path = os.path.join(REPO, "PERF_VARIANTS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
