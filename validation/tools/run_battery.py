"""Synthetic accuracy battery driver.

Synthesizes the ~300-track adversarial battery (``testing/battery.py``) to
WAVs with an exact ground-truth CSV, runs it through the standard validation
runner (``run_validation.py`` — the same path real corpora take, mirroring
the reference's offline harness ``/root/reference/validation/tools/
run_validation.py``), and reports overall + per-family exact +-2 BPM / MAE /
exact-key accuracy. This produces the repo's accuracy evidence analogous to
the reference's 87.7% +-2 BPM / 72.1% key production numbers
(``/root/reference/docs/progress-reports/PHASE_1F_VALIDATION.md:213-222``).

Usage:
    python -m validation.tools.run_battery [--json ACCURACY.json]
        [--families sweep_offbeat key_clean ...] [--limit N]
        [--batch-size 16] [-- <analysis flags>]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from stratum_dsp_tpu.testing.battery import SAMPLE_RATE, battery_specs  # noqa: E402
from validation._beats import score_beats  # noqa: E402
from validation._keys import keys_equal, parse_key  # noqa: E402
from validation.tools import run_validation  # noqa: E402

DEFAULT_WAV_DIR = Path(__file__).resolve().parent.parent / "battery_wavs"
DEFAULT_RESULTS = Path(__file__).resolve().parent.parent / "results" / "battery_results.csv"


def write_wav(path: Path, samples: np.ndarray, sr: int = SAMPLE_RATE) -> None:
    pcm = (np.clip(samples, -1.0, 1.0) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def synthesize_corpus(specs, wav_dir: Path, force: bool = False) -> None:
    wav_dir.mkdir(parents=True, exist_ok=True)
    n_new = 0
    for spec in specs:
        path = wav_dir / f"{spec.name}.wav"
        if path.exists() and not force:
            continue
        write_wav(path, spec.synthesize())
        n_new += 1
    if n_new:
        print(f"synthesized {n_new} battery WAVs -> {wav_dir}", file=sys.stderr)


def write_batch_csv(specs, wav_dir: Path, csv_path: Path, ext: str = "wav") -> None:
    # beats/downbeats columns: the exact synthesis-time grids (JSON lists,
    # original-track seconds) so the GT CSV is self-contained for grid
    # scoring; run_validation ignores the extra columns.
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file", "bpm", "key", "family", "beats", "downbeats"])
        for spec in specs:
            gt = spec.beat_ground_truth()
            w.writerow([
                str(wav_dir / f"{spec.name}.{ext}"),
                f"{spec.gt_bpm:.4f}" if spec.gt_bpm is not None else "",
                spec.gt_key or "",
                spec.family,
                json.dumps([round(t, 4) for t in gt[0]]) if gt else "",
                json.dumps([round(t, 4) for t in gt[1]]) if gt else "",
            ])


def _acc(hits: int, n: int):
    return round(hits / n, 4) if n else None


def score_by_family(specs, results_csv: Path) -> dict:
    recs = {}
    with open(results_csv, newline="") as f:
        for rec in csv.DictReader(f):
            if rec.get("file"):
                recs[Path(rec["file"]).stem] = rec

    fams: dict = {}
    overall = dict(n=0, analyzed=0, n_bpm=0, hit2=0, hit5=0, errs=[],
                   n_key=0, key_hits=0, grid=[])
    worst_bpm, worst_key, worst_grid = [], [], []
    for spec in specs:
        fam = fams.setdefault(spec.family, dict(
            n=0, analyzed=0, n_bpm=0, hit2=0, hit5=0, errs=[], n_key=0,
            key_hits=0, grid=[]))
        fam["n"] += 1
        overall["n"] += 1
        rec = recs.get(spec.name)
        if rec is None or rec.get("error"):
            continue
        fam["analyzed"] += 1
        overall["analyzed"] += 1
        if spec.gt_bpm is not None and rec.get("bpm"):
            d = abs(float(rec["bpm"]) - spec.gt_bpm)
            for s in (fam, overall):
                s["n_bpm"] += 1
                s["hit2"] += d <= 2.0
                s["hit5"] += d <= 5.0
                s["errs"].append(d)
            if d > 2.0:
                worst_bpm.append((d, spec.name, spec.gt_bpm, float(rec["bpm"])))
        if spec.gt_key and rec.get("key"):
            ok = keys_equal(parse_key(rec["key"]), parse_key(spec.gt_key))
            for s in (fam, overall):
                s["n_key"] += 1
                s["key_hits"] += ok
            if not ok:
                worst_key.append((spec.name, spec.gt_key, rec["key"]))
        gt = spec.beat_ground_truth()
        if gt is not None and rec.get("beats"):
            sc = score_beats(
                gt[0], gt[1],
                json.loads(rec["beats"]), json.loads(rec["downbeats"] or "[]"),
            )
            for s in (fam, overall):
                s["grid"].append(sc)
            if sc["beat_f"] < 0.9:
                worst_grid.append((sc["beat_f"], spec.name, round(sc["beat_amlt"], 3)))

    def fmt(s):
        out = {"n": s["n"], "analyzed": s["analyzed"]}
        if s["n_bpm"]:
            out.update(
                bpm_acc_2=_acc(s["hit2"], s["n_bpm"]),
                bpm_acc_5=_acc(s["hit5"], s["n_bpm"]),
                bpm_mae=round(float(np.mean(s["errs"])), 3),
                n_bpm=s["n_bpm"],
            )
        if s["n_key"]:
            out.update(key_acc=_acc(s["key_hits"], s["n_key"]), n_key=s["n_key"])
        if s.get("grid"):
            g = s["grid"]
            out.update(
                n_grid=len(g),
                beat_f=round(float(np.mean([x["beat_f"] for x in g])), 4),
                beat_cmlt=round(float(np.mean([x["beat_cmlt"] for x in g])), 4),
                beat_amlt=round(float(np.mean([x["beat_amlt"] for x in g])), 4),
                downbeat_f=round(float(np.mean([x["downbeat_f"] for x in g])), 4),
            )
        return out

    # core-range subset: GT tempo inside the reference's convention zone
    # [85, 170) — outside it the tuned fold gates intentionally prefer the
    # metrical family inside the zone (tempogram.rs:669-699,
    # multi_resolution.rs:698-751), so exact GT is contestable there
    core = dict(n=0, analyzed=0, n_bpm=0, hit2=0, hit5=0, errs=[], n_key=0, key_hits=0)
    for spec in specs:
        rec = recs.get(spec.name)
        if rec is None or rec.get("error") or not rec.get("bpm"):
            continue
        if spec.gt_bpm is not None and 85.0 <= spec.gt_bpm < 170.0:
            d = abs(float(rec["bpm"]) - spec.gt_bpm)
            core["n"] += 1
            core["analyzed"] += 1
            core["n_bpm"] += 1
            core["hit2"] += d <= 2.0
            core["hit5"] += d <= 5.0
            core["errs"].append(d)

    worst_bpm.sort(reverse=True)
    worst_grid.sort()
    return {
        "overall": fmt(overall),
        "bpm_core_85_170": fmt(core),
        "families": {f: fmt(s) for f, s in sorted(fams.items())},
        "bpm_misses": [
            {"name": n, "gt": g, "pred": p, "err": round(d, 2)}
            for d, n, g, p in worst_bpm
        ],
        "key_misses": [
            {"name": n, "gt": g, "pred": p} for n, g, p in sorted(worst_key)
        ],
        "grid_worst": [
            {"name": n, "beat_f": round(f, 3), "beat_amlt": a}
            for f, n, a in worst_grid[:40]
        ],
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-dir", default=str(DEFAULT_WAV_DIR))
    p.add_argument("--out", default=str(DEFAULT_RESULTS))
    p.add_argument("--json", default=None, help="write the summary JSON here")
    p.add_argument("--families", nargs="*", default=None)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--force-synth", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--score-only", action="store_true",
                   help="skip analysis; re-score an existing --out CSV")
    p.add_argument("--tc", action="store_true",
                   help="also run the key_detuned* families with "
                        "--enable-key-tuning-compensation, reported as *_tc")
    p.add_argument("--codec", action="store_true",
                   help="also re-encode a deterministic battery slice to MP3 "
                        "(libmp3lame) and OGG (libvorbis) via the native "
                        "encoder and run it through the SAME accuracy loop "
                        "— proves lossy decode + codec smear against the "
                        "knife-edge thresholds (the reference's corpora are "
                        "lossy real music, validation/README.md:1-12); "
                        "reported as *_mp3 / *_ogg families")
    p.add_argument("--bcf", action="store_true",
                   help="also run the fractional family with "
                        "--beat-contrast-fractional true (float-period "
                        "comb extension), reported as fractional_bcf")
    p.add_argument("--ra", action="store_true",
                   help="also run the grid-scored families with "
                        "--enable-beat-phase-search false (the reference's "
                        "first-onset anchor, hmm.rs:241-249), reported as "
                        "*_refanchor — pins the reference-faithful baseline "
                        "next to the default phase-search numbers")
    args, extra = p.parse_known_args(argv)
    if extra and extra[0] == "--":
        extra = extra[1:]

    specs = battery_specs()
    if args.families:
        specs = [s for s in specs if s.family in set(args.families)]
    if args.limit:
        specs = specs[: args.limit]
    print(f"battery: {len(specs)} tracks, "
          f"{len({s.family for s in specs})} families", file=sys.stderr)

    wav_dir = Path(args.wav_dir)
    synthesize_corpus(specs, wav_dir, force=args.force_synth)
    batch_csv = wav_dir / "battery.csv"
    write_batch_csv(specs, wav_dir, batch_csv)

    results_csv = Path(args.out)
    results_csv.parent.mkdir(parents=True, exist_ok=True)
    if not args.score_only:
        rv_args = [str(batch_csv), "--out", str(results_csv),
                   "--batch-size", str(args.batch_size), "--emit-beats"]
        if args.resume:
            rv_args.append("--resume")
        run_validation.main(rv_args + extra)

    summary = score_by_family(specs, results_csv)

    if args.tc:
        # second pass: the detuned families with tuning compensation ON —
        # the config-variant measurement of the tuning path itself
        tc_specs = [s for s in specs if s.family.startswith("key_detuned")]
        if tc_specs:
            tc_csv = wav_dir / "battery_tc.csv"
            write_batch_csv(tc_specs, wav_dir, tc_csv)
            tc_out = results_csv.with_name(results_csv.stem + "_tc.csv")
            run_validation.main(
                [str(tc_csv), "--out", str(tc_out),
                 "--batch-size", str(args.batch_size),
                 "--enable-key-tuning-compensation", "true"] + extra)
            tc_summary = score_by_family(tc_specs, tc_out)
            for fam, s in tc_summary["families"].items():
                summary["families"][fam + "_tc"] = s

    if args.bcf:
        # fractional only. The flag was also measured on fullmix and is NET
        # NEGATIVE there: it rescues fullmix_Fsm_106 (70.66 -> 105.98, the
        # integer-comb drift failure) but promotes 2/3 members on two
        # previously-correct tracks (Em_110 -> 73.33, Fm_126 -> 83.83) —
        # the consistency penalty that protects click-like content does not
        # separate 2/3 grids on dense polyphonic mixes.
        bcf_specs = [s for s in specs if s.family == "fractional"]
        if bcf_specs:
            bcf_csv = wav_dir / "battery_bcf.csv"
            write_batch_csv(bcf_specs, wav_dir, bcf_csv)
            bcf_out = results_csv.with_name(results_csv.stem + "_bcf.csv")
            run_validation.main(
                [str(bcf_csv), "--out", str(bcf_out),
                 "--batch-size", str(args.batch_size), "--emit-beats",
                 "--beat-contrast-fractional", "true"] + extra)
            bcf_summary = score_by_family(bcf_specs, bcf_out)
            for fam, s in bcf_summary["families"].items():
                summary["families"][fam + "_bcf"] = s

    if args.codec:
        from stratum_dsp_tpu.io.decode import encode_audio, ffmpeg_available

        if not ffmpeg_available():
            print("codec pass skipped: ffmpeg unavailable", file=sys.stderr)
        else:
            codec_fams = {"sweep_offbeat", "sweep_backbeat", "key_clean",
                          "combined", "fullmix"}
            codec_specs = [s for s in specs if s.family in codec_fams][::2]
            for ext, codec in (("mp3", "libmp3lame"), ("ogg", "libvorbis")):
                cdir = wav_dir / ext
                cdir.mkdir(parents=True, exist_ok=True)
                n_new = 0
                for spec in codec_specs:
                    path = cdir / f"{spec.name}.{ext}"
                    if path.exists() and not args.force_synth:
                        continue
                    encode_audio(str(path), spec.synthesize(), SAMPLE_RATE, codec)
                    n_new += 1
                if n_new:
                    print(f"encoded {n_new} {ext} tracks -> {cdir}", file=sys.stderr)
                c_csv = wav_dir / f"battery_{ext}.csv"
                write_batch_csv(codec_specs, cdir, c_csv, ext=ext)
                c_out = results_csv.with_name(results_csv.stem + f"_{ext}.csv")
                run_validation.main(
                    [str(c_csv), "--out", str(c_out),
                     "--batch-size", str(args.batch_size), "--emit-beats"]
                    + extra)
                c_summary = score_by_family(codec_specs, c_out)
                for fam, s in c_summary["families"].items():
                    summary["families"][fam + "_" + ext] = s
                summary[f"codec_{ext}_overall"] = c_summary["overall"]
            # slice-matched WAV baseline: the SAME tracks scored from the
            # main (WAV) results, so codec deltas compare like with like
            wav_base = score_by_family(codec_specs, results_csv)
            for fam, s in wav_base["families"].items():
                summary["families"][fam + "_wavslice"] = s
            summary["codec_wavslice_overall"] = wav_base["overall"]

    if args.ra:
        # second pass: the reference's first-onset grid anchor, so the
        # improvement (and the reference-faithful baseline) are both pinned
        ra_specs = [s for s in specs if s.beat_ground_truth() is not None]
        if ra_specs:
            ra_csv = wav_dir / "battery_ra.csv"
            write_batch_csv(ra_specs, wav_dir, ra_csv)
            ra_out = results_csv.with_name(results_csv.stem + "_ra.csv")
            run_validation.main(
                [str(ra_csv), "--out", str(ra_out),
                 "--batch-size", str(args.batch_size), "--emit-beats",
                 "--enable-beat-phase-search", "false",
                 "--enable-beat-grid-fill", "false",
                 "--enable-downbeat-phase-search", "false"] + extra)
            ra_summary = score_by_family(ra_specs, ra_out)
            for fam, s in ra_summary["families"].items():
                summary["families"][fam + "_refanchor"] = s
            summary["overall_refanchor_grid"] = {
                k: v for k, v in ra_summary["overall"].items()
                if k.startswith(("beat_", "downbeat_", "n_grid"))
            }

    print(json.dumps(summary, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"wrote {args.json}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
