"""Candidate-list diagnosis for missed tracks (mirror of reference
``validation/analysis/diagnose_candidates.py``): for each BPM miss, check
whether the tempogram candidate list contained the GT (or a family multiple)
and at what rank — distinguishing "scored wrong" from "never surfaced".

Requires a results CSV produced with --emit-candidates (the candidate list
serialized as JSON in a ``tempogram_candidates`` column) or re-runs the
analyzer per miss when absent.

Usage: python -m validation.analysis.diagnose_candidates results.csv
"""

from __future__ import annotations

import csv
import json
import sys

FAMILY = (1.0, 0.5, 2.0, 2.0 / 3.0, 1.5, 1.0 / 3.0, 3.0)
TOL = 2.0


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: diagnose_candidates results.csv", file=sys.stderr)
        return 2
    with open(argv[0], newline="") as f:
        rows = [r for r in csv.DictReader(f) if r.get("gt_bpm") and r.get("bpm_err")]

    misses = [r for r in rows if float(r["bpm_err"]) > TOL]
    stats = {"misses": len(misses), "gt_in_candidates": 0, "gt_family_only": 0,
             "gt_absent": 0, "no_candidate_data": 0}
    for r in misses:
        raw = r.get("tempogram_candidates")
        if not raw:
            stats["no_candidate_data"] += 1
            continue
        try:
            cands = json.loads(raw)
        except json.JSONDecodeError:
            stats["no_candidate_data"] += 1
            continue
        gt = float(r["gt_bpm"])
        bpms = [c["bpm"] for c in cands]
        if any(abs(b - gt) <= TOL for b in bpms):
            stats["gt_in_candidates"] += 1
        elif any(abs(b - gt * f) <= TOL for b in bpms for f in FAMILY[1:]):
            stats["gt_family_only"] += 1
        else:
            stats["gt_absent"] += 1
    print(json.dumps(stats, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
