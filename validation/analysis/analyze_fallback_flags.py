"""Escalation trigger-rate report (mirror of reference
``validation/analysis/analyze_fallback_flags.py``): how often multi-res /
percussive escalation triggered, was used, and whether it helped.

Usage: python -m validation.analysis.analyze_fallback_flags results.csv
"""

from __future__ import annotations

import csv
import json
import sys


def truthy(v) -> bool:
    return str(v).lower() in ("true", "1")


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: analyze_fallback_flags results.csv", file=sys.stderr)
        return 2
    with open(argv[0], newline="") as f:
        rows = [r for r in csv.DictReader(f) if not r.get("error")]

    used = [r for r in rows if truthy(r.get("multi_res_used"))]
    scored_used = [r for r in used if r.get("bpm_err")]
    scored_not = [r for r in rows if r.get("bpm_err") and not truthy(r.get("multi_res_used"))]

    def acc2(rs):
        return (
            round(sum(1 for r in rs if float(r["bpm_err"]) <= 2.0) / len(rs), 4)
            if rs
            else None
        )

    print(
        json.dumps(
            {
                "tracks": len(rows),
                "multi_res_used": len(used),
                "multi_res_used_pct": round(len(used) / len(rows), 4) if rows else 0,
                "acc2_when_used": acc2(scored_used),
                "acc2_when_not_used": acc2(scored_not),
            },
            indent=2,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
