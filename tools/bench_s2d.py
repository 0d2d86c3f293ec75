"""Same-session A/B of the space-to-depth ResNet stem on the real chip.

Round 4 adopted an s2d stem as the Embedder default (models/resnet.py::
_Stem — the MLPerf-ResNet TPU trick: the 7x7/s2 conv on 3 channels
offers the MXU 21 of 128 contraction lanes; regrouping 2x2 pixel blocks
into channels turns the same weights into a 4x4/s1 conv on 12 channels).
The tunnel wedged before its on-chip effect was measured (PERF.md), so
this script times BOTH stems in ONE process (the chip's session-to-
session variance is ~±30%; within-session comparisons are stable) and
prints one JSON line:

    {"s2d_patches_per_sec": ..., "plain_patches_per_sec": ...,
     "s2d_over_plain": ...}

Run on the real chip (no JAX_PLATFORMS=cpu):  python tools/bench_s2d.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _measure(s2d: bool, batch_size: int = 128, iters: int = 80) -> float:
    import jax.numpy as jnp
    from multimodalfusion_tpu.extract.features import Embedder
    emb = Embedder(batch_size=batch_size, dtype=jnp.bfloat16,
                   allow_random=True, s2d_stem=s2d)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(batch_size, 224, 224, 3),
                        dtype=np.uint8)
    jimgs = jnp.asarray(imgs)
    out = emb._embed(emb.variables, jimgs)
    float(jnp.sum(out))  # sync incl. compile (block_until_ready is a
    # no-op through the relay — CLAUDE.md gotcha)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = None
        for _ in range(iters):
            outs = emb._embed(emb.variables, jimgs)
        float(jnp.sum(outs))
        best = max(best, batch_size * iters / (time.perf_counter() - t0))
    return best


def main():
    import jax
    dev = jax.devices()[0]
    if "cpu" in str(dev).lower():
        print("refusing to A/B on CPU: this measures the TPU stem trade",
              file=sys.stderr)
        return 1
    # interleave A/B/A/B and keep each arm's best to cancel chip drift
    s2d = plain = 0.0
    for _ in range(2):
        s2d = max(s2d, _measure(True))
        plain = max(plain, _measure(False))
    print(json.dumps({
        "s2d_patches_per_sec": round(s2d, 1),
        "plain_patches_per_sec": round(plain, 1),
        "s2d_over_plain": round(s2d / plain, 4),
        "device": str(dev),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
