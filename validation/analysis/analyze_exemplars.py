"""Diagnostic exemplar report (mirror of reference
``validation/analysis/analyze_exemplars.py:43-60``): worst BPM misses
overall and per GT tempo band, pred/GT ratio-bucket breakdown per band, and
the strict-±2 head-to-head against the ID3 TAG baseline (Mixed-In-Key in the
reference's reports) in both directions.

Usage:
    python -m validation.analysis.analyze_exemplars results.csv [-n 20]
        [--tol 0.08]
"""

from __future__ import annotations

import argparse
import csv
import sys
from collections import Counter, defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from validation._id3 import read_tag_bpm_key  # noqa: E402

GT_BANDS = (
    ("<60", 0.0, 60.0),
    ("60-90", 60.0, 90.0),
    ("90-120", 90.0, 120.0),
    ("120-150", 120.0, 150.0),
    ("150-180", 150.0, 180.0),
    (">=180", 180.0, float("inf")),
)

RATIO_BUCKETS = (
    ("1x", 1.0), ("2x", 2.0), ("1/2x", 0.5), ("3/2x", 1.5),
    ("2/3x", 2.0 / 3.0), ("4/3x", 4.0 / 3.0), ("3/4x", 0.75),
)


def band_for(gt: float) -> str:
    for name, lo, hi in GT_BANDS:
        if lo <= gt < hi:
            return name
    return "?"


def ratio_bucket(pred: float, gt: float, tol: float) -> str:
    if gt <= 0 or pred <= 0:
        return "n/a"
    r = pred / gt
    for name, f in RATIO_BUCKETS:
        if abs(r - f) <= tol:
            return name
    return "other"


def load_rows(results_csv: str, with_tags: bool = True):
    with open(results_csv, newline="") as f:
        rows = [r for r in csv.DictReader(f) if r.get("gt_bpm") and r.get("bpm")]
    for r in rows:
        r["_gt"] = float(r["gt_bpm"])
        r["_pred"] = float(r["bpm"])
        r["_err"] = abs(r["_pred"] - r["_gt"])
        r["_band"] = band_for(r["_gt"])
        r["_tag"] = None
        if with_tags:
            tag_bpm, _ = read_tag_bpm_key(r["file"])
            r["_tag"] = tag_bpm
    return rows


def _line(r, tol):
    tag = f"{r['_tag']:7.2f}" if r["_tag"] else "    n/a"
    return (
        f"{Path(r['file']).name[-44:]:44} band={r['_band']:>7} "
        f"gt={r['_gt']:7.2f} pred={r['_pred']:7.2f} err={r['_err']:6.2f} "
        f"bucket={ratio_bucket(r['_pred'], r['_gt'], tol):>5} "
        f"conf={float(r.get('bpm_confidence') or 0):5.3f} "
        f"mr={str(r.get('multi_res_used', '')):>5} tag={tag}"
    )


def report(rows, topn: int, tol: float, out=None) -> None:
    out = out if out is not None else sys.stdout
    w = lambda s="": print(s, file=out)
    w(f"n={len(rows)} scored tracks")

    w(f"\n== worst {topn} BPM errors (overall) ==")
    for r in sorted(rows, key=lambda r: -r["_err"])[:topn]:
        w(_line(r, tol))

    w(f"\n== worst {min(topn, 10)} per GT tempo band ==")
    for name, _, _ in GT_BANDS:
        sub = [r for r in rows if r["_band"] == name]
        if not sub:
            continue
        hits = sum(r["_err"] <= 2.0 for r in sub)
        w(f"\n[{name}] n={len(sub)} acc2={hits / len(sub):.3f}")
        for r in sorted(sub, key=lambda r: -r["_err"])[: min(topn, 10)]:
            w("  " + _line(r, tol))

    w("\n== pred/GT ratio buckets per band ==")
    per_band = defaultdict(Counter)
    for r in rows:
        per_band[r["_band"]][ratio_bucket(r["_pred"], r["_gt"], tol)] += 1
    for name, _, _ in GT_BANDS:
        c = per_band.get(name)
        if not c:
            continue
        items = ", ".join(f"{k}={v}" for k, v in c.most_common())
        w(f"{name:>7} n={sum(c.values()):<4} | {items}")

    tagged = [r for r in rows if r["_tag"]]
    tag_wins = [r for r in tagged if abs(r["_tag"] - r["_gt"]) <= 2.0 and r["_err"] > 2.0]
    we_win = [r for r in tagged if r["_err"] <= 2.0 and abs(r["_tag"] - r["_gt"]) > 2.0]
    w(f"\n== TAG head-to-head (strict +-2; {len(tagged)} tracks have TBPM) ==")
    w(f"TAG within +-2, pipeline not: {len(tag_wins)}")
    for r in sorted(tag_wins, key=lambda r: -r["_err"])[:topn]:
        w("  " + _line(r, tol))
    w(f"pipeline within +-2, TAG not: {len(we_win)}")
    for r in sorted(we_win, key=lambda r: -abs(r["_tag"] - r["_gt"]))[:topn]:
        w("  " + _line(r, tol))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results_csv")
    p.add_argument("-n", type=int, default=20)
    p.add_argument("--tol", type=float, default=0.08,
                   help="ratio-bucket tolerance (default 0.08)")
    p.add_argument("--no-tags", action="store_true",
                   help="skip reading ID3 TBPM tags from the audio files")
    args = p.parse_args(argv)
    rows = load_rows(args.results_csv, with_tags=not args.no_tags)
    report(rows, args.n, args.tol)
    return 0


if __name__ == "__main__":
    sys.exit(main())
