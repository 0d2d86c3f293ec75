"""Export a trained experiment to a single-file serving artifact.

No reference equivalent (the reference deploys torch checkpoints that
need its full codebase); this CLI loads a fold checkpoint exactly like
``cli.infer`` and writes a jax.export StableHLO artifact with the
weights baked in (utils/model_export.py) plus a ``.json`` input-
signature sidecar.  The artifact runs on any JAX runtime for the
chosen platforms with NO model code:

    python -m multimodalfusion_tpu.cli.export_model \
        --model_path results/brain/5foldcv/EXP --which_k 0 \
        --out exp_k0.stablehlo --platforms tpu cpu --check
"""
from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="export a fold checkpoint "
                                            "to a StableHLO artifact")
    p.add_argument("--model_path", type=str, required=True,
                   help="experiment dir (stage-2 or stage-4)")
    p.add_argument("--which_k", type=int, default=0,
                   help="fold checkpoint to export")
    p.add_argument("--out", type=str, default=None,
                   help="artifact path (default "
                        "<model_path>/s_{k}_scorer.stablehlo)")
    p.add_argument("--batch_size", type=int, default=8,
                   help="serving batch size baked into the artifact")
    p.add_argument("--bag_len", type=int, default=512,
                   help="padded bag length baked into the artifact "
                        "(MIL models)")
    p.add_argument("--platforms", type=str, nargs="+", default=None,
                   help="lowering platforms, e.g. --platforms tpu cpu "
                        "(default: the current backend)")
    p.add_argument("--check", action="store_true",
                   help="after writing, deserialize the artifact and "
                        "verify it reproduces the checkpoint's outputs "
                        "on random inputs")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from multimodalfusion_tpu.engine.train import build_model, model_inputs
    from multimodalfusion_tpu.utils.experiment import (config_from_settings,
                                                       read_settings)
    from multimodalfusion_tpu.utils.model_export import (example_batch,
                                                         load_scorer,
                                                         save_scorer)

    exp_code = os.path.basename(os.path.normpath(args.model_path))
    settings = read_settings(os.path.join(args.model_path,
                                          f"experiment_{exp_code}.txt"))
    cfg = config_from_settings(settings, batch_size=args.batch_size)
    ckpt = os.path.join(args.model_path,
                        f"s_{args.which_k}_minloss_checkpoint.msgpack")
    from flax import serialization
    with open(ckpt, "rb") as f:
        ckpt_bytes = f.read()  # read ONCE; width probe + load share it
    if "omic" in cfg.mode and not cfg.pretrained \
            and cfg.omic_input_dim <= 0:
        # the genomic width is data-derived (not in the settings txt);
        # the checkpoint's first omic layer records it
        import dataclasses
        raw = serialization.msgpack_restore(ckpt_bytes)
        cfg = dataclasses.replace(cfg, omic_input_dim=int(
            raw["params"]["fc_omic_0"]["Dense_0"]["kernel"].shape[0]))
    model = build_model(cfg)
    kwargs = model_inputs(cfg, example_batch(cfg, args.batch_size,
                                             args.bag_len))
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        deterministic=True, **kwargs))
    variables = serialization.from_bytes(variables, ckpt_bytes)

    out_path = args.out or os.path.join(
        args.model_path, f"s_{args.which_k}_scorer.stablehlo")
    sidecar = save_scorer(out_path, model, variables, cfg,
                          batch_size=args.batch_size, bag_len=args.bag_len,
                          platforms=args.platforms)
    size = os.path.getsize(out_path)
    print(f"exported {cfg.model_type} fold {args.which_k} -> {out_path} "
          f"({size / 1e6:.2f} MB, inputs "
          f"{sorted(sidecar['inputs'])}, platforms "
          f"{sidecar['platforms']})")

    if args.check:
        # executing the artifact requires the current backend to be one
        # of its lowering platforms (jax.export refuses otherwise)
        backend = jax.default_backend()
        if backend not in sidecar["platforms"]:
            print(f"check SKIPPED: artifact lowered for "
                  f"{sidecar['platforms']} cannot execute on this "
                  f"process's '{backend}' backend — run --check on a "
                  f"matching host", file=sys.stderr)
            return 0
        with open(out_path, "rb") as f:
            scorer = load_scorer(f.read())
        rng = np.random.default_rng(0)
        probe = {k: rng.normal(size=spec["shape"]).astype(spec["dtype"])
                 if not k.endswith("mask") and k != "valid"
                 else np.ones(spec["shape"], spec["dtype"])
                 for k, spec in sidecar["inputs"].items()}
        got = scorer(probe)
        # reference outputs under the SAME kernel choice the artifact
        # was traced with: a cross-platform artifact carries the
        # unfused pooling while a bare apply on TPU would take the
        # fused Pallas kernel — different implementations only agree
        # to kernel-parity tolerance, not bit-exactly
        import contextlib

        from multimodalfusion_tpu.ops import mil_attention as mil
        from multimodalfusion_tpu.utils.model_export import traces_fused
        ctx = (contextlib.nullcontext() if traces_fused(args.platforms)
               else mil.force_unfused())
        with ctx:
            want = jax.jit(lambda kw: model.apply(
                variables, deterministic=True, **kw))(probe)
        for k in got:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=2e-5, atol=2e-5)
        print(f"check OK: artifact reproduces the checkpoint on "
              f"{sorted(got)} at rtol 2e-5")
    return 0


if __name__ == "__main__":
    sys.exit(main())
