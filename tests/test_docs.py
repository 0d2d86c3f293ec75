"""Documentation hygiene guards.

Rounds 1-3 of review each caught PERF.md/README.md restating stale
throughput values that had drifted from the actual bench output
(BENCH_r{N}.json).  This test makes the policy structural: prose may
explain measurements and relative effects, but absolute throughput
values live ONLY in machine-generated artifacts (bench.py output,
BENCH_r{N}.json, PERF_VARIANTS.json).
"""
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# a number (possibly k-suffixed or a numeric range) directly attached
# to a throughput unit, e.g. "6829 bags/s", "~15.6k patches/s",
# "1.0-1.7k bags/s"
_THROUGHPUT = re.compile(
    r"[0-9][0-9,.]*(?:\s*[-–]\s*[0-9][0-9,.]*)?\s*k?\s*"
    r"(?:bags|patches|slices|images)\s*/\s*s", re.IGNORECASE)
# "at 3.89x" / "~3.5-3.9x a reference-style pipeline" restatements of
# bench.py's vs_baseline ratio: a multiplier on a line that compares
# against the baseline/reference/target (same-session relative tuning
# ratios like "tile 1024 adds ~5%" or "0.93x of the B=32 rate" are
# fine — they don't drift with the bench)
_MULT = re.compile(r"[0-9]+(\.[0-9]+)?(\s*[-–]\s*[0-9]+(\.[0-9]+)?)?"
                   r"\s*[x×](?![a-z0-9])")
_BASEY = re.compile(r"baseline|reference-style|the .*target", re.IGNORECASE)


def _offending_lines(path, pattern):
    out = []
    with open(path) as f:
        for i, line in enumerate(f, 1):
            if pattern.search(line):
                out.append(f"{os.path.basename(path)}:{i}: {line.strip()}")
    return out


def test_no_hardcoded_throughput_numbers_in_docs():
    bad = []
    for name in ("PERF.md", "README.md"):
        bad += _offending_lines(os.path.join(REPO, name), _THROUGHPUT)
    assert not bad, (
        "absolute throughput values must not be restated in prose "
        "(they drift from BENCH_r{N}.json; reference the artifact "
        "instead):\n" + "\n".join(bad))


def test_no_hardcoded_vs_baseline_multipliers_in_docs():
    bad = []
    for name in ("PERF.md", "README.md"):
        path = os.path.join(REPO, name)
        with open(path) as f:
            for i, line in enumerate(f, 1):
                if _MULT.search(line) and _BASEY.search(line):
                    bad.append(f"{name}:{i}: {line.strip()}")
    assert not bad, (
        "vs-baseline multipliers must not be restated in prose "
        "(bench.py's vs_baseline field is the number of record):\n"
        + "\n".join(bad))
