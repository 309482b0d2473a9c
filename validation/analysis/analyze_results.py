"""Summary statistics over a validation results CSV (mirror of reference
``validation/analysis/analyze_results.py``): accuracy bands, MAE, confidence
distributions, per-tempo-band breakdown.

Usage: python -m validation.analysis.analyze_results results.csv
"""

from __future__ import annotations

import csv
import json
import sys

import numpy as np

TEMPO_BANDS = [(0, 80), (80, 100), (100, 120), (120, 140), (140, 170), (170, 1000)]


def load(path):
    with open(path, newline="") as f:
        return [r for r in csv.DictReader(f)]


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: analyze_results results.csv", file=sys.stderr)
        return 2
    rows = [r for r in load(argv[0]) if r.get("bpm") and not r.get("error")]
    scored = [r for r in rows if r.get("gt_bpm")]

    errs = np.asarray([float(r["bpm_err"]) for r in scored]) if scored else np.zeros(0)
    summary = {
        "tracks": len(rows),
        "scored": len(scored),
        "bpm_acc_2": round(float(np.mean(errs <= 2.0)), 4) if len(errs) else None,
        "bpm_acc_5": round(float(np.mean(errs <= 5.0)), 4) if len(errs) else None,
        "bpm_acc_10": round(float(np.mean(errs <= 10.0)), 4) if len(errs) else None,
        "bpm_mae": round(float(errs.mean()), 3) if len(errs) else None,
        "bpm_median_err": round(float(np.median(errs)), 3) if len(errs) else None,
    }

    key_rows = [r for r in rows if r.get("key_ok") not in (None, "")]
    if key_rows:
        hits = sum(1 for r in key_rows if r["key_ok"] in ("True", True, "true", "1"))
        summary["key_acc"] = round(hits / len(key_rows), 4)
        summary["key_scored"] = len(key_rows)

    bands = {}
    for lo, hi in TEMPO_BANDS:
        sel = [r for r in scored if lo <= float(r["gt_bpm"]) < hi]
        if sel:
            e = np.asarray([float(r["bpm_err"]) for r in sel])
            bands[f"{lo}-{hi}"] = {
                "n": len(sel),
                "acc_2": round(float(np.mean(e <= 2.0)), 4),
                "mae": round(float(e.mean()), 3),
            }
    summary["tempo_bands"] = bands

    conf = np.asarray([float(r["bpm_confidence"]) for r in rows if r.get("bpm_confidence")])
    if len(conf):
        summary["bpm_confidence_p50"] = round(float(np.median(conf)), 4)

    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
