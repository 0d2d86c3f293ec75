"""Pool fold-level c-indexes across seeds and bootstrap 95% CIs (10k
resamples) — the BASELINE.md aggregation.  Usage:

    python tools/pool_ci.py 0.775,0.628,... 0.739,0.686,...

(first list = reference folds, second = this repo, any length.)"""
import sys
import numpy as np

def ci(vals, n=10000, seed=0):
    rng = np.random.default_rng(seed)
    vals = np.asarray(vals, float)
    boots = rng.choice(vals, size=(n, len(vals)), replace=True).mean(axis=1)
    return vals.mean(), np.percentile(boots, 2.5), np.percentile(boots, 97.5)

def ci_delta(a, b, n=10000, seed=0):
    """PAIRED bootstrap: both arms ran the identical split CSVs, so each
    resample draws the same fold indexes from both (exploiting the
    fold-level correlation; independent draws would inflate the CI)."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    assert len(a) == len(b), "paired delta needs equal-length fold lists"
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(a), size=(n, len(a)))
    boots = (b - a)[idx].mean(axis=1)
    return b.mean() - a.mean(), np.percentile(boots, 2.5), np.percentile(boots, 97.5)

if __name__ == "__main__":
    ref = [float(x) for x in sys.argv[1].split(",")]
    ours = [float(x) for x in sys.argv[2].split(",")]
    m, lo, hi = ci(ref);  print(f"ref   pooled {m:.4f} [{lo:.3f}, {hi:.3f}]  n={len(ref)}")
    m, lo, hi = ci(ours); print(f"ours  pooled {m:.4f} [{lo:.3f}, {hi:.3f}]  n={len(ours)}")
    d, lo, hi = ci_delta(ref, ours); print(f"delta {d:+.4f} [{lo:+.3f}, {hi:+.3f}]")
