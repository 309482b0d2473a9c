"""Build a ground-truth batch CSV for ``run_validation``.

Mirror of reference ``validation/tools/prepare_test_batch.py`` (336 lines,
FMA/Echonest selection) and ``build_hllmr_metadata.py`` (ID3 snapshots),
emitting the ``file,bpm,key`` schema ``run_validation`` consumes.

Three sources:

* ID3 tags — snapshot TBPM/TKEY from the files themselves (DJ libraries).
* ``--from-csv`` — external metadata CSV with file,bpm[,key] columns.
* ``--fma-metadata DIR`` — FMA-style metadata: ``tracks.csv`` (hierarchical
  3-row header; genre + optional filepath) joined with ``echonest.csv``
  (4-row header; echonest/audio_features/tempo+key+mode), filtered to tracks
  whose audio file exists, optionally randomly subsampled with ``--seed``
  (reference prepare_test_batch.py:33-155 semantics: tempo>0 required, key
  from Echonest pitch-class + mode where present).

Usage:
    python -m validation.tools.prepare_test_batch tracks_dir batch.csv
    python -m validation.tools.prepare_test_batch tracks_dir batch.csv --from-csv meta.csv
    python -m validation.tools.prepare_test_batch fma_small batch.csv \
        --fma-metadata fma_metadata --num-tracks 200 --seed 7
"""

from __future__ import annotations

import argparse
import csv
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from validation._id3 import read_tag_bpm_key  # noqa: E402

AUDIO_EXTS = {".wav", ".mp3", ".flac", ".ogg", ".m4a"}
PITCH_NAMES = ("C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B")


def echonest_key_name(key: int, mode: int) -> str:
    """Echonest pitch class (0..11) + mode (1=major, 0=minor) -> key name."""
    if not 0 <= key < 12:
        return ""
    if mode == 1:
        return PITCH_NAMES[key]
    if mode == 0:
        return PITCH_NAMES[key] + "m"
    return ""


def read_fma_tracks_csv(path: Path) -> dict:
    """FMA tracks.csv: 3 header rows (category / name / track_id legend);
    returns {track_id: {genre, filepath}}."""
    out = {}
    with open(path, newline="", encoding="utf-8") as f:
        r = csv.reader(f)
        next(r)
        next(r)
        header = next(r)
        tid_i = header.index("track_id") if "track_id" in header else 0
        genre_i = header.index("track.genre_top") if "track.genre_top" in header else None
        fp_i = header.index("filepath") if "filepath" in header else None
        for row in r:
            try:
                tid = int(row[tid_i])
            except (ValueError, IndexError):
                continue
            out[tid] = {
                "genre": row[genre_i] if genre_i is not None and len(row) > genre_i else "",
                "filepath": row[fp_i] if fp_i is not None and len(row) > fp_i else "",
            }
    return out


def read_fma_echonest_csv(path: Path) -> dict:
    """FMA echonest.csv: 4 header rows (echonest / audio_features / field /
    track_id legend); returns {track_id: {"tempo": f, "key": name}}."""
    out = {}
    with open(path, newline="", encoding="utf-8") as f:
        r = csv.reader(f)
        h1, h2, h3, h4 = next(r), next(r), next(r), next(r)
        tid_i = h4.index("track_id") if "track_id" in h4 else 0

        def find(field):
            for i, c in enumerate(h1):
                if (
                    c == "echonest"
                    and i < len(h2) and h2[i] == "audio_features"
                    and i < len(h3) and h3[i] == field
                ):
                    return i
            return None

        tempo_i, key_i, mode_i = find("tempo"), find("key"), find("mode")
        if tempo_i is None:
            return out
        for row in r:
            try:
                tid = int(row[tid_i])
                tempo = float(row[tempo_i]) if row[tempo_i].strip() else 0.0
            except (ValueError, IndexError):
                continue
            rec = {}
            if tempo > 0:
                rec["tempo"] = tempo
            if key_i is not None and mode_i is not None and len(row) > max(key_i, mode_i):
                try:
                    name = echonest_key_name(
                        int(float(row[key_i])), int(float(row[mode_i]))
                    )
                    if name:
                        rec["key"] = name
                except ValueError:
                    pass
            if rec:
                out[tid] = rec
    return out


def fma_track_path(audio_dir: Path, track_id: int) -> Path:
    """FMA layout: XXX/XXXXXX.mp3 with XXX = track_id // 1000."""
    return audio_dir / f"{track_id // 1000:03d}" / f"{track_id:06d}.mp3"


def rows_from_fma(audio_dir: Path, meta_dir: Path, num_tracks: int, seed):
    tracks = read_fma_tracks_csv(meta_dir / "tracks.csv")
    echo = read_fma_echonest_csv(meta_dir / "echonest.csv")
    candidates = []
    for tid, info in tracks.items():
        rec = echo.get(tid)
        if not rec or "tempo" not in rec:
            continue
        fp = Path(info["filepath"]) if info.get("filepath") else fma_track_path(audio_dir, tid)
        if not fp.exists():
            continue
        candidates.append(
            {"file": str(fp.resolve()), "bpm": rec["tempo"], "key": rec.get("key", "")}
        )
    candidates.sort(key=lambda r: r["file"])
    if num_tracks and num_tracks < len(candidates):
        rng = random.Random(seed)
        candidates = rng.sample(candidates, num_tracks)
    return candidates


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("tracks_dir")
    p.add_argument("out_csv")
    p.add_argument("--from-csv", default=None,
                   help="external metadata CSV with file,bpm[,key] columns")
    p.add_argument("--fma-metadata", default=None,
                   help="FMA metadata dir containing tracks.csv + echonest.csv")
    p.add_argument("--num-tracks", type=int, default=0,
                   help="random subsample size for --fma-metadata (0 = all)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)

    if args.fma_metadata:
        rows = rows_from_fma(
            Path(args.tracks_dir), Path(args.fma_metadata), args.num_tracks, args.seed
        )
    else:
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
