"""Key-error breakdown (mirror of reference
``validation/analysis/analyze_key_errors.py``): classify wrong keys by
relation to GT — relative major/minor, parallel mode, fifth up/down, other —
the musically-close confusions that dominate template-matching errors.

Usage: python -m validation.analysis.analyze_key_errors results.csv
"""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from validation._keys import parse_key  # noqa: E402


def relation(pred, gt) -> str:
    if pred.is_major == gt.is_major and pred.tonic == gt.tonic:
        return "exact"
    if pred.is_major != gt.is_major:
        if pred.tonic == gt.tonic:
            return "parallel_mode"
        # relative: major tonic = minor tonic + 3
        if gt.is_major and not pred.is_major and (pred.tonic - gt.tonic) % 12 == 9:
            return "relative"
        if not gt.is_major and pred.is_major and (pred.tonic - gt.tonic) % 12 == 3:
            return "relative"
    d = (pred.tonic - gt.tonic) % 12
    if pred.is_major == gt.is_major and d in (5, 7):
        return "fifth"
    return "other"


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: analyze_key_errors results.csv", file=sys.stderr)
        return 2
    with open(argv[0], newline="") as f:
        rows = [r for r in csv.DictReader(f) if r.get("gt_key") and r.get("key")]

    counts: dict[str, int] = {}
    examples: dict[str, list[str]] = {}
    for r in rows:
        pred = parse_key(r["key"])
        gt = parse_key(r["gt_key"])
        if pred is None or gt is None:
            continue
        rel = relation(pred, gt)
        counts[rel] = counts.get(rel, 0) + 1
        if rel != "exact":
            examples.setdefault(rel, []).append(
                f"{r['file']}: {gt.name()} -> {pred.name()}"
            )

    n = sum(counts.values())
    out = {k: {"n": v, "pct": round(v / n, 4)} for k, v in sorted(counts.items())}
    out["_total"] = n
    print(json.dumps(out, indent=2))
    for rel, ex in examples.items():
        for line in ex[:5]:
            print(f"  {rel}: {line}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
