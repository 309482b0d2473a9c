"""Octave-error diagnosis via predicted/GT BPM ratio buckets (mirror of
reference ``validation/analysis/analyze_ratio_buckets.py``): bins the
pred/GT ratio into metrical families {1, 1/2, 2, 1/3, 3, 2/3, 3/2, other}
to show whether misses are tempo-family folds or genuine errors.

Usage: python -m validation.analysis.analyze_ratio_buckets results.csv
"""

from __future__ import annotations

import csv
import json
import sys

RATIO_BUCKETS = [
    ("1x", 1.0), ("1/2x", 0.5), ("2x", 2.0), ("2/3x", 2.0 / 3.0),
    ("3/2x", 1.5), ("1/3x", 1.0 / 3.0), ("3x", 3.0), ("3/4x", 0.75),
    ("4/3x", 4.0 / 3.0),
]
TOL = 0.04  # relative tolerance around each family ratio


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: analyze_ratio_buckets results.csv", file=sys.stderr)
        return 2
    with open(argv[0], newline="") as f:
        rows = [r for r in csv.DictReader(f) if r.get("gt_bpm") and r.get("bpm")]

    buckets = {name: [] for name, _ in RATIO_BUCKETS}
    buckets["other"] = []
    for r in rows:
        gt = float(r["gt_bpm"])
        pred = float(r["bpm"])
        if gt <= 0 or pred <= 0:
            continue
        ratio = pred / gt
        for name, target in RATIO_BUCKETS:
            if abs(ratio / target - 1.0) <= TOL:
                buckets[name].append(r["file"])
                break
        else:
            buckets["other"].append(r["file"])

    n = sum(len(v) for v in buckets.values())
    out = {
        name: {"n": len(v), "pct": round(len(v) / n, 4) if n else 0}
        for name, v in buckets.items()
        if v
    }
    out["_total"] = n
    # the misses that are family folds (candidate for fold-gate tuning)
    fold_n = sum(len(buckets[k]) for k in buckets if k not in ("1x", "other"))
    out["_family_fold_misses"] = fold_n
    print(json.dumps(out, indent=2))
    for name in ("1/2x", "2x", "3/2x", "2/3x"):
        for f in buckets.get(name, [])[:5]:
            print(f"  {name}: {f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
