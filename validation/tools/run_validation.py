"""Accuracy validation runner (mirror of reference
``validation/tools/run_validation.py``).

Reads a ground-truth CSV (columns: file, bpm[, key]), analyzes every track
through the batched pipeline, and reports ±2/±5/±10 BPM accuracy, MAE, and
exact key accuracy — against the CSV GT and, when available, against ID3
TBPM/TKEY tags (the Mixed-In-Key baseline in the reference's reports).

Usage:
    python -m validation.tools.run_validation batch.csv [--out results.csv]
        [--batch-size 8] [--limit N] [-- <analysis flags>]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from stratum_dsp_tpu.analysis import PipelineCaps, analyze_batch, decode_results  # noqa: E402
from stratum_dsp_tpu.cli.args import add_config_flags, config_from_args  # noqa: E402
from stratum_dsp_tpu.io.decode import decode_batch  # noqa: E402
from validation._id3 import read_tag_bpm_key  # noqa: E402
from validation._keys import keys_equal, parse_key  # noqa: E402

SR = 44100
BUCKETS = (60.0, 120.0, 240.0, 420.0)


def bucket_for(n: int) -> int:
    secs = n / SR
    for b in BUCKETS:
        if secs <= b:
            return int(b * SR)
    return int(BUCKETS[-1] * SR)


def load_batch_csv(path: str, limit: int = 0):
    rows = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            rows.append(row)
    if limit:
        rows = rows[:limit]
    return rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("batch_csv")
    p.add_argument("--out", default=None, help="per-track results CSV")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--emit-candidates", action="store_true")
    add_config_flags(p)
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    if args.emit_candidates:
        cfg = cfg.replace(emit_tempogram_candidates=True)

    rows = load_batch_csv(args.batch_csv, args.limit)
    paths = [r["file"] for r in rows]
    print(f"validating {len(paths)} tracks", file=sys.stderr)

    t0 = time.time()
    decoded = decode_batch(paths, target_sr=SR)

    records = []
    groups: dict[int, list[int]] = {}
    for i, (samples, _sr, err) in enumerate(decoded):
        if err is not None or samples is None or samples.size == 0:
            records.append({"file": paths[i], "error": err or "empty"})
            continue
        groups.setdefault(bucket_for(len(samples)), []).append(i)

    results_by_idx = {}
    caps = PipelineCaps()
    for bucket_len, idxs in sorted(groups.items()):
        for s in range(0, len(idxs), args.batch_size):
            chunk = idxs[s : s + args.batch_size]
            batch = np.zeros((len(chunk), bucket_len), np.float32)
            lengths = np.zeros((len(chunk),), np.int32)
            for j, i in enumerate(chunk):
                x = decoded[i][0][:bucket_len]
                batch[j, : len(x)] = x
                lengths[j] = len(x)
            out = analyze_batch(batch, lengths, cfg, SR, caps)
            for j, i in enumerate(chunk):
                results_by_idx[i] = decode_results(out, SR)[j]

    # --- scoring ---
    n_bpm, hit2, hit5, hit10, abs_err = 0, 0, 0, 0, []
    n_key, key_hits = 0, 0
    tag_n_bpm, tag_hit2 = 0, 0
    tag_n_key, tag_key_hits = 0, 0
    for i, row in enumerate(rows):
        r = results_by_idx.get(i)
        rec = {"file": row["file"]}
        if r is None:
            rec["error"] = "decode_failed"
            records.append(rec)
            continue
        rec.update(
            bpm=round(r.bpm, 2), bpm_confidence=round(r.bpm_confidence, 4),
            key=r.key.name(), key_confidence=round(r.key_confidence, 4),
            key_clarity=round(r.key_clarity, 4),
            grid_stability=round(r.grid_stability, 4),
            multi_res_used=r.metadata.tempogram_multi_res_used,
        )
        gt_bpm = float(row["bpm"]) if row.get("bpm") else None
        if gt_bpm and gt_bpm > 0:
            n_bpm += 1
            d = abs(r.bpm - gt_bpm)
            abs_err.append(d)
            hit2 += d <= 2.0
            hit5 += d <= 5.0
            hit10 += d <= 10.0
            rec["gt_bpm"] = gt_bpm
            rec["bpm_err"] = round(d, 2)
        gt_key = parse_key(row.get("key", "") or "")
        if gt_key is not None:
            n_key += 1
            ok = keys_equal(r.key, gt_key)
            key_hits += ok
            rec["gt_key"] = gt_key.name()
            rec["key_ok"] = ok
        # TAG (ID3) baseline
        tag_bpm, tag_key_raw = read_tag_bpm_key(row["file"])
        if gt_bpm and tag_bpm:
            tag_n_bpm += 1
            tag_hit2 += abs(tag_bpm - gt_bpm) <= 2.0
        tk = parse_key(tag_key_raw or "")
        if gt_key is not None and tk is not None:
            tag_n_key += 1
            tag_key_hits += keys_equal(tk, gt_key)
        records.append(rec)

    wall = time.time() - t0
    summary = {
        "tracks": len(rows),
        "analyzed": len(results_by_idx),
        "wall_s": round(wall, 1),
        "tracks_per_sec": round(len(results_by_idx) / max(wall, 1e-9), 2),
        "bpm_acc_2": round(hit2 / n_bpm, 4) if n_bpm else None,
        "bpm_acc_5": round(hit5 / n_bpm, 4) if n_bpm else None,
        "bpm_acc_10": round(hit10 / n_bpm, 4) if n_bpm else None,
        "bpm_mae": round(float(np.mean(abs_err)), 3) if abs_err else None,
        "key_acc": round(key_hits / n_key, 4) if n_key else None,
        "tag_bpm_acc_2": round(tag_hit2 / tag_n_bpm, 4) if tag_n_bpm else None,
        "tag_key_acc": round(tag_key_hits / tag_n_key, 4) if tag_n_key else None,
    }
    print(json.dumps(summary, indent=2))

    if args.out:
        keys = sorted({k for r in records for k in r})
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(records)
        print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
