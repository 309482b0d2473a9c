"""Candidate-list diagnosis for missed tracks (mirror of reference
``validation/analysis/diagnose_candidates.py``): for each BPM miss, check
whether the tempogram candidate list contained the GT (or a family multiple)
and at what rank — distinguishing "scored wrong" from "never surfaced".

Requires a results CSV produced with --emit-candidates (the candidate list
serialized as JSON in a ``tempogram_candidates`` column).

Also writes a ``candidate_diagnosis`` CSV (``--out``) with the reference's
schema (file, bpm_gt, prev_bpm_error, gt_in_topn YES/NO, gt_rank,
bpm_candidates_json — reference diagnose_candidates.py:177-186), which
``analyze_candidate_diagnosis`` consumes.

Usage: python -m validation.analysis.diagnose_candidates results.csv
           [--out candidate_diagnosis.csv] [--only-misses] [--tol 2.0]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys

FAMILY = (1.0, 0.5, 2.0, 2.0 / 3.0, 1.5, 1.0 / 3.0, 3.0)
TOL = 2.0


def find_rank(cands, gt: float, tol: float):
    """1-based rank of the first candidate within ±tol of GT (score order)."""
    ordered = sorted(cands, key=lambda c: -c.get("score", 0.0))
    for rank, c in enumerate(ordered, 1):
        if abs(c["bpm"] - gt) <= tol:
            return rank
    return None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("results_csv")
    ap.add_argument("--out", default=None, help="candidate_diagnosis CSV path")
    ap.add_argument("--only-misses", action="store_true")
    ap.add_argument("--tol", type=float, default=TOL)
    args = ap.parse_args(argv)
    tol = args.tol
    with open(args.results_csv, newline="") as f:
        rows = [r for r in csv.DictReader(f) if r.get("gt_bpm") and r.get("bpm_err")]

    targets = rows
    if args.only_misses:
        targets = [r for r in rows if float(r["bpm_err"]) > tol]

    misses = [r for r in rows if float(r["bpm_err"]) > tol]
    stats = {"misses": len(misses), "gt_in_candidates": 0, "gt_family_only": 0,
             "gt_absent": 0, "no_candidate_data": 0}
    out_rows = []
    for r in targets:
        raw = r.get("tempogram_candidates")
        gt = float(r["gt_bpm"])
        err = float(r["bpm_err"])
        is_miss = err > tol
        if not raw:
            if is_miss:
                stats["no_candidate_data"] += 1
            out_rows.append({
                "file": r.get("file", ""), "bpm_gt": gt, "prev_bpm_error": err,
                "gt_in_topn": "ERROR", "gt_rank": "", "bpm_candidates_json": "",
            })
            continue
        try:
            cands = json.loads(raw)
        except json.JSONDecodeError:
            if is_miss:
                stats["no_candidate_data"] += 1
            continue
        bpms = [c["bpm"] for c in cands]
        rank = find_rank(cands, gt, tol)
        if is_miss:
            if rank is not None:
                stats["gt_in_candidates"] += 1
            elif any(abs(b - gt * f) <= tol for b in bpms for f in FAMILY[1:]):
                stats["gt_family_only"] += 1
            else:
                stats["gt_absent"] += 1
        out_rows.append({
            "file": r.get("file", ""), "bpm_gt": gt, "prev_bpm_error": err,
            "gt_in_topn": "YES" if rank is not None else "NO",
            "gt_rank": rank if rank is not None else "",
            "bpm_candidates_json": json.dumps(cands),
        })
    print(json.dumps(stats, indent=2))
    if args.out and out_rows:
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(out_rows[0].keys()))
            w.writeheader()
            w.writerows(out_rows)
        print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
