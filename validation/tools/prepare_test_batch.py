"""Build a ground-truth batch CSV from a directory of audio files (mirror of
reference ``validation/tools/prepare_test_batch.py`` /
``build_hllmr_metadata.py``): snapshots ID3 TBPM/TKEY tags (or an external
metadata CSV) into the ``file,bpm,key`` schema `run_validation` consumes.

Usage:
    python -m validation.tools.prepare_test_batch tracks_dir batch.csv
    python -m validation.tools.prepare_test_batch tracks_dir batch.csv --from-csv meta.csv
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from validation._id3 import read_tag_bpm_key  # noqa: E402

AUDIO_EXTS = {".wav", ".mp3", ".flac", ".ogg", ".m4a"}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("tracks_dir")
    p.add_argument("out_csv")
    p.add_argument("--from-csv", default=None,
                   help="external metadata CSV with file,bpm[,key] columns")
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)

    meta = {}
    if args.from_csv:
        with open(args.from_csv, newline="") as f:
            for row in csv.DictReader(f):
                meta[Path(row["file"]).name] = row

    files = sorted(
        f for f in Path(args.tracks_dir).rglob("*") if f.suffix.lower() in AUDIO_EXTS
    )
    if args.limit:
        files = files[: args.limit]

    rows = []
    for f in files:
        m = meta.get(f.name, {})
        bpm, key = m.get("bpm"), m.get("key")
        if bpm is None and key is None:
            tag_bpm, tag_key = read_tag_bpm_key(str(f))
            bpm = tag_bpm if tag_bpm else ""
            key = tag_key or ""
        rows.append({"file": str(f), "bpm": bpm or "", "key": key or ""})

    with open(args.out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file", "bpm", "key"])
        w.writeheader()
        w.writerows(rows)
    n_bpm = sum(1 for r in rows if r["bpm"])
    n_key = sum(1 for r in rows if r["key"])
    print(f"wrote {len(rows)} rows ({n_bpm} with BPM GT, {n_key} with key GT)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
