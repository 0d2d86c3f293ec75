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

Each arm's pipeline is built and compiled ONCE via bench.py's shared
harness (the exact headline measurement), then the timed windows are
interleaved s2d/plain/s2d/... so chip drift cancels; bench.py's wedge
watchdog covers a mid-measurement relay outage.

Run on the real chip (no JAX_PLATFORMS=cpu):  python tools/bench_s2d.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import _start_watchdog, make_extraction_setup, time_extraction


def main():
    import jax
    dev = jax.devices()[0]
    if "cpu" in str(dev).lower():
        print("refusing to A/B on CPU: this measures the TPU stem trade",
              file=sys.stderr)
        return 1
    wd = _start_watchdog(phase="s2d A/B")
    arms = {True: make_extraction_setup(s2d_stem=True),
            False: make_extraction_setup(s2d_stem=False)}
    best = {True: 0.0, False: 0.0}
    for _ in range(3):  # interleaved reps cancel chip drift
        for s2d, (emb, jimgs) in arms.items():
            best[s2d] = max(best[s2d], time_extraction(emb, jimgs))
    wd.set()
    print(json.dumps({
        "s2d_patches_per_sec": round(best[True], 1),
        "plain_patches_per_sec": round(best[False], 1),
        "s2d_over_plain": round(best[True] / best[False], 4),
        "device": str(dev),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
