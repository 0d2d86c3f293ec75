"""Serving-path bench: exported StableHLO artifact inference throughput.

Builds a path-AMIL scorer artifact in-process (utils/model_export.py;
on a TPU backend the default platforms keep the fused Pallas pooling),
then measures batch scoring with the calls chained inside one jitted
fori_loop — the same relay-aware methodology as bench.py (per-dispatch
latency through this environment's tunnel would otherwise dominate;
block_until_ready is a no-op, so sync is a scalar readback).

Prints one JSON line and writes PERF_SERVING.json:

    {"metric": "serving_bags_per_sec", "value": ..., "batch": B,
     "bag_len": N, "per_dispatch_bags_per_sec": ...}

Run on the TPU host:  python tools/bench_serving.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _start_watchdog  # noqa: E402  (wedge diagnostics)


def main(B: int = 32, N: int = 4096, iters: int = 100) -> int:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from multimodalfusion_tpu.engine.train import (TrainConfig,
                                                   build_model)
    from multimodalfusion_tpu.utils.model_export import export_scorer

    wd = _start_watchdog(phase="serving bench")
    cfg = TrainConfig(model_type="path_attention_mil", mode="path",
                      bag_loss="nll_surv", gate_path=True,
                      bag_dtype="bfloat16")
    model = build_model(cfg)
    kb, km = jax.random.split(jax.random.PRNGKey(0))
    bags = jax.random.normal(kb, (B, N, 1024), jnp.float32)
    mask = (jax.random.uniform(km, (B, N)) < 0.9).astype(jnp.float32)
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        deterministic=True, bags=bags, mask=mask))
    blob = export_scorer(model, variables, cfg, batch_size=B, bag_len=N)
    exp = jexport.deserialize(bytearray(blob))

    # per-dispatch serving: ONE jit wrapper around Exported.call (a bare
    # exp.call re-traces on every invocation — measured ~1000x slower;
    # examples/serving.md tells deployments to jit-wrap it once)
    served = jax.jit(lambda kw: exp.call(kw))
    out = served({"bags": bags, "mask": mask})
    float(jnp.sum(out["risk"]))  # sync incl. compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = served({"bags": bags, "mask": mask})
    float(jnp.sum(out["risk"]))
    per_dispatch = B * iters / (time.perf_counter() - t0)

    # steady-state: calls chained inside ONE jitted loop (an Exported
    # can be invoked from another traced program).  Each iteration
    # writes the previous risk into one bag element — WITHOUT that
    # serial dependence XLA hoists the loop-invariant call out of the
    # fori_loop and the "loop" measures one forward + N adds
    @jax.jit
    def chained(bags, mask):
        def body(i, carry):
            bags_c, acc = carry
            r = exp.call({"bags": bags_c, "mask": mask})["risk"]
            s = jnp.sum(r)
            bags_c = jax.lax.dynamic_update_slice(
                bags_c, s.reshape(1, 1, 1).astype(bags_c.dtype),
                (0, 0, 0))
            return bags_c, acc + s
        return jax.lax.fori_loop(0, iters, body, (bags, 0.0))[1]

    float(chained(bags, mask))  # compile
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        s = chained(bags, mask)
        float(s)
        best = max(best, B * iters / (time.perf_counter() - t0))
    wd.set()

    result = {
        "metric": "serving_bags_per_sec",
        "value": round(best, 2),
        "unit": f"bags/s/chip (exported StableHLO scorer, {B}x{N}x1024 "
                "bags, fwd only, calls chained in-graph)",
        "batch": B,
        "bag_len": N,
        "per_dispatch_bags_per_sec": round(per_dispatch, 2),
        "backend": jax.default_backend(),
    }
    with open(os.path.join(REPO, "PERF_SERVING.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--bag_len", type=int, default=4096)
    p.add_argument("--iters", type=int, default=100)
    a = p.parse_args()
    sys.exit(main(a.batch, a.bag_len, a.iters))
