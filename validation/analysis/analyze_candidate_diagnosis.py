"""Analyze a candidate-diagnosis CSV produced by ``diagnose_candidates``
(mirror of reference ``validation/analysis/analyze_candidate_diagnosis.py``):
GT-in-topN hit rate overall and bucketed by the magnitude of the previous
BPM error — distinguishing "the right answer never surfaced" (seeding
problem) from "it surfaced but scored wrong" (scoring problem).

Usage: python -m validation.analysis.analyze_candidate_diagnosis \
           --file candidate_diagnosis.csv [--tol 2.0]
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path

BINS = [
    ("<=5", 0.0, 5.0),
    ("5-20", 5.0, 20.0),
    ("20-50", 20.0, 50.0),
    ("50-100", 50.0, 100.0),
    (">100", 100.0, 1e9),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", required=True, help="candidate_diagnosis_*.csv")
    ap.add_argument("--tol", type=float, default=2.0)
    args = ap.parse_args(argv)

    path = Path(args.file)
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    rows = [r for r in rows if r.get("gt_in_topn") in ("YES", "NO")]
    if not rows:
        print("No usable rows")
        return 0

    hit = sum(1 for r in rows if r["gt_in_topn"] == "YES")
    print(f"File: {path.name}")
    print(
        f"n={len(rows)} GT-in-topN (±{args.tol}): {hit}/{len(rows)} "
        f"({100.0 * hit / len(rows):.1f}%)"
    )
    print()

    for name, a, b in BINS:
        sub = [r for r in rows if a < float(r["prev_bpm_error"]) <= b]
        if not sub:
            continue
        sub_hit = sum(1 for r in sub if r["gt_in_topn"] == "YES")
        print(f"{name:6s} n={len(sub):3d} GT-in-topN={sub_hit / len(sub) * 100:5.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
