"""On-chip parity selftest for the fused Pallas MIL pooling kernels.

The pytest suite proves fused == unfused in Pallas INTERPRET mode on
CPU (tests/test_mil_attention.py) — that validates the kernel math,
not the mosaic COMPILATION of it.  This tool runs the same oracle
comparisons on the real TPU with the actually-compiled kernels, over
the shapes/dtypes training uses:

  * forward:  _fused_pool_pallas vs the pure-jnp reference, f32 + bf16,
              gated + ungated, with and without attention dropout,
              ragged masks, tile-crossing N
  * backward: the fused backward kernel vs XLA autodiff of the
              reference form (cotangents from a shared loss)

Writes TPU_SELFTEST.json with the worst relative errors per case and
exits nonzero past tolerance.  Tolerances are bf16-rounding-scale for
BOTH dtypes (1e-2 f32, 2e-2/5e-2 bf16): TPU f32 matmuls run as bf16
MXU passes under the default precision, and the fused kernel and the
XLA oracle round differently (measured ~3e-3 rel) — the selftest's
job is catching wrong math, wrong masks, VMEM overflows and
tile-boundary bugs, all of which show up orders of magnitude above
that floor.  Exact f32 equivalence is covered by the CPU interpret
tests under jax_default_matmul_precision=highest.

Run on the TPU host:  python tools/tpu_kernel_selftest.py
(~1 min; needs the chip — refuses to "pass" on CPU.)  Groups can run
separately (`--only kernels|sharded|bigbag`); results merge into the
same JSON.  The `bigbag` group proves the N=32,768 multi-slide-concat
regime (SURVEY §7): a full fused --drop_out train step plus pool
oracle checks at that N, compiled on the chip.
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from multimodalfusion_tpu.ops import mil_attention as mil


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = max(float(np.max(np.abs(b))), 1e-12)
    return float(np.max(np.abs(a - b)) / denom)


def make_case(rng, B, N, D, Da, dtype, ragged=True):
    h = jnp.asarray(rng.normal(size=(B, N, D)), dtype)
    if ragged:
        lens = rng.integers(max(1, N // 4), N + 1, size=B)
        mask = jnp.asarray(
            (np.arange(N)[None, :] < lens[:, None]).astype(np.float32))
    else:
        mask = jnp.ones((B, N), jnp.float32)
    params = mil.AttnParams(
        Wa=jnp.asarray(rng.normal(size=(D, Da)) * 0.1, jnp.float32),
        ba=jnp.asarray(rng.normal(size=(Da,)) * 0.1, jnp.float32),
        Wb=jnp.asarray(rng.normal(size=(D, Da)) * 0.1, jnp.float32),
        bb=jnp.asarray(rng.normal(size=(Da,)) * 0.1, jnp.float32),
        wc=jnp.asarray(rng.normal(size=(Da, 1)) * 0.1, jnp.float32),
        cc=jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32))
    return h, mask, params


def fwd_case(rng, B, N, D, Da, dtype, gated, dropout):
    h, mask, params = make_case(rng, B, N, D, Da, dtype)
    if dropout:
        da, db = mil.make_dropout_masks(
            jax.random.PRNGKey(int(rng.integers(1 << 30))), (B, N, Da),
            gated=gated)
        fused = mil._fused_pool_pallas(h, mask, params, gated,
                                       da=da, db=db if gated else None)[0]
        ref = mil._pool_reference_dropout(h, mask, da, db, params, gated)
    else:
        fused = mil._fused_pool_pallas(h, mask, params, gated)[0]
        ref = mil._pool_reference(h, mask, params, gated)
    return rel_err(fused, ref)


def bwd_case(rng, B, N, D, Da, dtype, gated, dropout):
    h, mask, params = make_case(rng, B, N, D, Da, dtype)
    g = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    da = db = None
    if dropout:
        da, db = mil.make_dropout_masks(
            jax.random.PRNGKey(int(rng.integers(1 << 30))), (B, N, Da),
            gated=gated)
        out, ml = mil._fused_pool_pallas(h, mask, params, gated, da=da,
                                         db=db if gated else None)
        dh, dp = mil._fused_pool_bwd_pallas(h, mask, params, out, ml, g,
                                            gated, da=da,
                                            db=db if gated else None)

        def f(hh, pp):
            return jnp.sum(
                mil._pool_reference_dropout(hh, mask, da, db, pp, gated)
                * g)
    else:
        out, ml = mil._fused_pool_pallas(h, mask, params, gated)
        dh, dp = mil._fused_pool_bwd_pallas(h, mask, params, out, ml, g,
                                            gated)

        def f(hh, pp):
            return jnp.sum(mil._pool_reference(hh, mask, pp, gated) * g)

    params_f = jax.tree.map(lambda p: p.astype(jnp.float32), params)
    dh_ref, dp_ref = jax.grad(f, argnums=(0, 1))(h.astype(jnp.float32),
                                                 params_f)
    errs = {"dh": rel_err(dh.astype(jnp.float32), dh_ref)}
    for name in ("Wa", "ba", "Wb", "bb", "wc"):
        if not gated and name in ("Wb", "bb"):
            continue
        errs[name] = rel_err(getattr(dp, name), getattr(dp_ref, name))
    # dcc is an exact analytic zero in the kernel; autodiff leaves
    # cancellation noise — assert the kernel side only
    errs["cc_is_zero"] = float(np.max(np.abs(np.asarray(dp.cc))))
    return errs


def sharded_pool_case(rng):
    """Compile + run the bag-sharded pooling (shard_map + fused kernels
    + pmax/psum combine) on the real chip via a 1-device mesh, forward
    and backward, with and without dropout — the CPU tests only ever
    exercise this path in interpret mode or on the virtual mesh."""
    from jax.sharding import Mesh
    from multimodalfusion_tpu.ops.sharded_pool import sharded_attention_pool

    mesh = Mesh(np.array(jax.devices()[:1]), ("bag",))
    errs = {}
    for dropout in (False, True):
        h, mask, params = make_case(rng, 4, 700, 256, 256, jnp.float32)
        da = db = None
        if dropout:
            da, db = mil.make_dropout_masks(jax.random.PRNGKey(7),
                                            (4, 700, 256), gated=True)

        def f_sh(hh, pp):
            return jnp.sum(sharded_attention_pool(
                hh, mask, pp, True, mesh, da=da, db=db) ** 2)

        def f_ref(hh, pp):
            if dropout:
                return jnp.sum(mil._pool_reference_dropout(
                    hh, mask, da, db, pp, True) ** 2)
            return jnp.sum(mil._pool_reference(hh, mask, pp, True) ** 2)

        out_sh = sharded_attention_pool(h, mask, params, True, mesh,
                                        da=da, db=db)
        out_ref = (mil._pool_reference_dropout(h, mask, da, db, params,
                                               True) if dropout
                   else mil._pool_reference(h, mask, params, True))
        key = "dropout" if dropout else "plain"
        errs[f"{key}_fwd"] = rel_err(out_sh, out_ref)
        g_sh = jax.grad(f_sh, argnums=(0, 1))(h, params)
        g_ref = jax.grad(f_ref, argnums=(0, 1))(h, params)
        errs[f"{key}_dh"] = rel_err(g_sh[0], g_ref[0])
        errs[f"{key}_dWa"] = rel_err(g_sh[1].Wa, g_ref[1].Wa)
    return errs


def bigbag_case(rng):
    """The 30k-instance regime (SURVEY §7 risk: multi-slide concat bags
    reach ~30k patches, ref dataset_survival.py:362-367): one full
    fused TRAIN STEP — path AMIL, --drop_out, bf16 bags — compiled and
    executed on the chip at B=2 x N=32,768, plus fused-vs-oracle pool
    checks at that N so the VMEM byte-budget tile heuristics are
    validated compiled at the scale they were written for."""
    from multimodalfusion_tpu.engine.train import (TrainConfig,
                                                   build_model,
                                                   make_optimizer,
                                                   make_steps)
    errs = {}
    # pool-level oracle at the flagship pool width (fc output D=512)
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        h, mask, params = make_case(rng, 2, 32768, 512, 256, dtype)
        fused = mil._fused_pool_pallas(h, mask, params, True)[0]
        ref = mil._pool_reference(h, mask, params, True)
        errs[f"pool_fwd_{tag}"] = rel_err(fused, ref)
    h, mask, params = make_case(rng, 2, 32768, 512, 256, jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 512)), jnp.float32)
    out, ml = mil._fused_pool_pallas(h, mask, params, True)
    dh, dp = mil._fused_pool_bwd_pallas(h, mask, params, out, ml, g, True)
    dh_ref, dp_ref = jax.grad(
        lambda hh, pp: jnp.sum(mil._pool_reference(hh, mask, pp, True)
                               * g),
        argnums=(0, 1))(h, params)
    errs["pool_bwd_dh"] = rel_err(dh, dh_ref)
    errs["pool_bwd_dWa"] = rel_err(dp.Wa, dp_ref.Wa)

    # full fused train step (model + loss + grads + Adam) at N=32,768
    B, N, D = 2, 32768, 1024
    cfg = TrainConfig(model_type="path_attention_mil", mode="path",
                      bag_loss="nll_surv", gate_path=True, batch_size=B,
                      bag_dtype="bfloat16", drop_out=True)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    train_step, _ = make_steps(cfg, model, tx)
    kb, km = jax.random.split(jax.random.PRNGKey(0))
    batch = {
        "path_bags": jax.random.normal(kb, (B, N, D), jnp.float32),
        "path_mask": (jax.random.uniform(km, (B, N)) < 0.93).astype(
            jnp.float32),
        "Y": jnp.asarray(rng.integers(0, 4, size=B), jnp.int32),
        "t": jnp.asarray(rng.uniform(1, 100, size=B), jnp.float32),
        "c": jnp.asarray(rng.integers(0, 2, size=B), jnp.float32),
        "valid": jnp.ones(B, jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    variables = dict(model.init({"params": key, "dropout": key},
                                bags=batch["path_bags"],
                                mask=batch["path_mask"],
                                deterministic=True))
    opt_state = tx.init(variables["params"])
    v, o, out1 = train_step(variables, opt_state, batch, key)
    loss1 = float(out1["loss"])

    # one shared harness definition (warmup + chained fori_loop + relay
    # sync) so this rate stays comparable to bench.py's
    from bench import chained_step_rate
    # reps=3 like every other arm: a single rep once enshrined a
    # relay-congested window as a 3.4x-low record
    rate = chained_step_rate(jax, train_step, v, o, batch, key,
                             iters=8, reps=3)
    errs["train_loss_finite"] = float(np.isfinite(loss1))
    errs["train_instances_per_s"] = B * N * rate
    errs["train_bags_per_s"] = B * rate
    return errs, loss1


def _group_of(name: str) -> str:
    if "sharded_pool" in name:
        return "sharded"
    if "bigbag" in name:
        return "bigbag"
    return "kernels"


def _belongs_to(name: str, only: str) -> bool:
    """Whether a case key / failure line belongs to the group being
    re-run (so merging replaces it instead of duplicating)."""
    return _group_of(name) == only


def main() -> int:
    # `--only kernels` / `--only sharded` split the run across two
    # invocations: the full set of compiles can exceed a 10-minute
    # wrapper timeout through the remote-compile relay.  Results merge
    # into the same TPU_SELFTEST.json.
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "not on TPU backend; this selftest "
                          "only means something on the real chip"}))
        return 2
    rng = np.random.default_rng(0)
    out_path = os.path.join(REPO, "TPU_SELFTEST.json")
    report = {"backend": jax.default_backend(),
              "device": str(jax.devices()[0]),
              "cases": {}, "failures": []}
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        report["cases"] = prev.get("cases", {})
        report["failures"] = [x for x in prev.get("failures", [])
                              if not _belongs_to(x, only)]
        report["cases"] = {k: v for k, v in report["cases"].items()
                           if not _belongs_to(k, only)}
    # shapes cross tile boundaries (tile 2048/1024 fwd, 1024/512 bwd)
    # and exercise non-multiple-of-128 N padding
    shapes = [(4, 300, 256, 256), (8, 1100, 256, 256),
              (2, 4096, 1024, 256), (3, 2500, 1024, 256)]
    if only in (None, "kernels"):
        for dtype, tol_f, tol_b in ((jnp.float32, 1e-2, 1e-2),
                                    (jnp.bfloat16, 2e-2, 5e-2)):
            for gated in (True, False):
                for dropout in (False, True):
                    worst_f = 0.0
                    worst_b = {}
                    for (B, N, D, Da) in shapes:
                        worst_f = max(worst_f, fwd_case(
                            rng, B, N, D, Da, dtype, gated, dropout))
                        for k, v in bwd_case(rng, B, N, D, Da, dtype,
                                             gated, dropout).items():
                            worst_b[k] = max(worst_b.get(k, 0.0), v)
                    key = (f"{np.dtype(dtype).name}_"
                           f"{'gated' if gated else 'ungated'}"
                           f"{'_dropout' if dropout else ''}")
                    print(f"[{key}] fwd {worst_f:.2e}", file=sys.stderr,
                          flush=True)
                    report["cases"][key] = {
                        "fwd_rel": worst_f, "bwd_rel": worst_b,
                        "tol_fwd": tol_f, "tol_bwd": tol_b}
                    if worst_f > tol_f:
                        report["failures"].append(f"{key}: fwd {worst_f}")
                    for k, v in worst_b.items():
                        tol = 1e-6 if k == "cc_is_zero" else tol_b
                        if v > tol:
                            report["failures"].append(
                                f"{key}: bwd {k} {v}")
    if only in (None, "bigbag"):
        bb, loss1 = bigbag_case(rng)
        print(f"[bigbag_n32768] {bb} loss {loss1}", file=sys.stderr,
              flush=True)
        report["cases"]["bigbag_n32768"] = {
            "B": 2, "N": 32768, "drop_out": True,
            "bag_dtype": "bfloat16", "rel": bb, "first_loss": loss1,
            "tol_f32": 1e-2, "tol_bf16": 2e-2}
        for k, v in bb.items():
            if k.startswith("pool_"):
                tol = 2e-2 if k.endswith("bf16") else 1e-2
                if v > tol:
                    report["failures"].append(f"bigbag_n32768 {k} {v}")
        if not bb["train_loss_finite"]:
            report["failures"].append(
                f"bigbag_n32768: non-finite train loss {loss1}")
    if only in (None, "sharded"):
        sh = sharded_pool_case(rng)
        print(f"[sharded_pool] {sh}", file=sys.stderr, flush=True)
        report["cases"]["sharded_pool_1dev_mesh"] = {"rel": sh,
                                                     "tol": 1e-2}
        for k, v in sh.items():
            if v > 1e-2:
                report["failures"].append(f"sharded_pool {k} {v}")
    report["ok"] = not report["failures"]
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps({"ok": report["ok"],
                      "n_cases": len(report["cases"]),
                      "failures": report["failures"]}))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
