"""Worst-failure exemplars + per-band head-to-head (mirror of reference
``validation/analysis/analyze_exemplars.py``): list the largest BPM misses
with their confidences/flags so failures can be triaged by hand.

Usage: python -m validation.analysis.analyze_exemplars results.csv [-n 20]
"""

from __future__ import annotations

import argparse
import csv
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("results_csv")
    p.add_argument("-n", type=int, default=20)
    args = p.parse_args(argv)
    with open(args.results_csv, newline="") as f:
        rows = [r for r in csv.DictReader(f) if r.get("gt_bpm") and r.get("bpm_err")]

    rows.sort(key=lambda r: -float(r["bpm_err"]))
    print(f"{'file':60} {'gt':>7} {'pred':>7} {'err':>7} {'conf':>6} {'mr':>4}")
    for r in rows[: args.n]:
        print(
            f"{r['file'][-60:]:60} {float(r['gt_bpm']):7.1f} {float(r['bpm']):7.1f} "
            f"{float(r['bpm_err']):7.1f} {float(r.get('bpm_confidence') or 0):6.3f} "
            f"{str(r.get('multi_res_used', '')):>4}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
