"""Validation analysis scripts on a synthetic results CSV (pure host code)."""

import csv
import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from validation._keys import keys_equal, parse_key  # noqa: E402
from validation.analysis import (  # noqa: E402
    analyze_exemplars,
    analyze_fallback_flags,
    analyze_key_errors,
    analyze_ratio_buckets,
    analyze_results,
)
from stratum_dsp_tpu.result import Key  # noqa: E402


@pytest.fixture()
def results_csv(tmp_path):
    rows = [
        # exact hit
        dict(file="a.mp3", bpm=128.0, gt_bpm=128.2, bpm_err=0.2,
             bpm_confidence=0.8, key="Am", gt_key="Am", key_ok=True,
             multi_res_used=False, grid_stability=0.9, key_confidence=0.5,
             key_clarity=0.6),
        # half-time miss
        dict(file="b.mp3", bpm=87.0, gt_bpm=174.0, bpm_err=87.0,
             bpm_confidence=0.3, key="C", gt_key="Am", key_ok=False,
             multi_res_used=True, grid_stability=0.5, key_confidence=0.2,
             key_clarity=0.3),
        # 3/2 miss with fifth key error
        dict(file="c.mp3", bpm=180.0, gt_bpm=120.0, bpm_err=60.0,
             bpm_confidence=0.4, key="G", gt_key="C", key_ok=False,
             multi_res_used=True, grid_stability=0.7, key_confidence=0.4,
             key_clarity=0.5),
    ]
    p = tmp_path / "results.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    return str(p)


def test_parse_key_variants():
    assert parse_key("Am") == Key(9, False)
    assert parse_key("A min") == Key(9, False)
    assert parse_key("F# major") == Key(6, True)
    assert parse_key("8A") is not None
    assert parse_key("1A") == Key.from_numerical("1A")
    assert parse_key("") is None
    assert keys_equal(parse_key("C"), Key(0, True))


def test_analyze_exemplars(results_csv, capsys):
    """Worst-N + per-band + ratio buckets + TAG head-to-head sections all
    render (reference validation/analysis/analyze_exemplars.py:43-60)."""
    assert analyze_exemplars.main([results_csv, "--no-tags"]) == 0
    out = capsys.readouterr().out
    assert "worst" in out and "per GT tempo band" in out
    # b.mp3 (gt 174, pred 87) is a 1/2x bucket in the 150-180 band
    assert "[150-180]" in out and "1/2x=1" in out
    # c.mp3 (gt 120, pred 180) is a 3/2x bucket in the 120-150 band
    assert "3/2x=1" in out
    assert "TAG head-to-head" in out and "0 tracks have TBPM" in out
    # per-band exact accuracy lines present
    assert "acc2=" in out


def test_analyze_exemplars_reads_tags(results_csv, capsys, tmp_path, monkeypatch):
    """With tag reading enabled, missing files degrade to no-tag rows."""
    assert analyze_exemplars.main([results_csv]) == 0
    out = capsys.readouterr().out
    assert "0 tracks have TBPM" in out


def test_analyze_results(results_csv, capsys):
    assert analyze_results.main([results_csv]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["scored"] == 3
    assert out["bpm_acc_2"] == pytest.approx(1 / 3, abs=1e-3)
    assert out["key_acc"] == pytest.approx(1 / 3, abs=1e-3)


def test_ratio_buckets(results_csv, capsys):
    assert analyze_ratio_buckets.main([results_csv]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["1x"]["n"] == 1
    assert out["1/2x"]["n"] == 1
    assert out["3/2x"]["n"] == 1
    assert out["_family_fold_misses"] == 2


def test_key_errors(results_csv, capsys):
    assert analyze_key_errors.main([results_csv]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["exact"]["n"] == 1
    assert out["relative"]["n"] == 1
    assert out["fifth"]["n"] == 1


def test_fallback_flags(results_csv, capsys):
    assert analyze_fallback_flags.main([results_csv]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["multi_res_used"] == 2
    assert out["acc2_when_not_used"] == 1.0


@pytest.fixture()
def candidates_csv(tmp_path):
    rows = [
        dict(file="a.mp3", gt_bpm=128.0, bpm_err=0.2,
             tempogram_candidates=json.dumps(
                 [{"bpm": 128.0, "score": 0.9, "selected": True},
                  {"bpm": 64.0, "score": 0.5, "selected": False}])),
        # miss where GT is present but outranked
        dict(file="b.mp3", gt_bpm=174.0, bpm_err=87.0,
             tempogram_candidates=json.dumps(
                 [{"bpm": 87.0, "score": 0.9, "selected": True},
                  {"bpm": 174.0, "score": 0.6, "selected": False}])),
        # miss where only a family multiple surfaced
        dict(file="c.mp3", gt_bpm=120.0, bpm_err=60.0,
             tempogram_candidates=json.dumps(
                 [{"bpm": 180.0, "score": 0.8, "selected": True},
                  {"bpm": 90.0, "score": 0.3, "selected": False}])),
    ]
    p = tmp_path / "results_cands.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    return str(p)


def test_diagnose_candidates_writes_diagnosis_csv(candidates_csv, tmp_path, capsys):
    from validation.analysis import diagnose_candidates

    out_csv = str(tmp_path / "diag.csv")
    assert diagnose_candidates.main([candidates_csv, "--out", out_csv]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["misses"] == 2
    assert stats["gt_in_candidates"] == 1  # b: 174 present at rank 2
    assert stats["gt_family_only"] == 1    # c: only 180 = 1.5x and 90 = 0.75x
    with open(out_csv, newline="") as f:
        rows = list(csv.DictReader(f))
    by_file = {r["file"]: r for r in rows}
    assert by_file["a.mp3"]["gt_in_topn"] == "YES"
    assert by_file["a.mp3"]["gt_rank"] == "1"
    assert by_file["b.mp3"]["gt_in_topn"] == "YES"
    assert by_file["b.mp3"]["gt_rank"] == "2"
    assert by_file["c.mp3"]["gt_in_topn"] == "NO"


def test_analyze_candidate_diagnosis(candidates_csv, tmp_path, capsys):
    from validation.analysis import analyze_candidate_diagnosis, diagnose_candidates

    out_csv = str(tmp_path / "diag.csv")
    diagnose_candidates.main([candidates_csv, "--out", out_csv])
    capsys.readouterr()
    assert analyze_candidate_diagnosis.main(["--file", out_csv]) == 0
    text = capsys.readouterr().out
    assert "GT-in-topN" in text
    assert "n=3" in text


def test_debug_dump_formatting():
    import numpy as np

    from stratum_dsp_tpu.analysis.debug import format_debug_dump

    host = {
        "dbg_base_bpm": np.asarray([85.0]),
        "dbg_base_conf": np.asarray([0.12]),
        "dbg_base_agree": np.asarray([1]),
        "dbg_s_base": np.asarray([0.9]),
        "dbg_s_2x": np.asarray([0.85]),
        "dbg_s_half": np.asarray([0.0]),
        "dbg_trap_low": np.asarray([False]),
        "dbg_trap_high": np.asarray([False]),
        "dbg_family_competes": np.asarray([True]),
        "dbg_weak_base": np.asarray([False]),
        "dbg_fold_into_trap": np.asarray([True]),
        "dbg_ambiguous": np.asarray([True]),
        "cand_bpm": np.asarray([[85.0, 170.0, 0.0]]),
        "cand_score": np.asarray([[0.9, 0.85, 0.0]]),
        "cand_fft": np.asarray([[0.8, 0.7, 0.0]]),
        "cand_ac": np.asarray([[0.95, 0.9, 0.0]]),
        "cand_valid": np.asarray([[True, True, False]]),
        "cand_selected": np.asarray([[True, False, False]]),
        "multi_res_triggered": np.asarray([True]),
        "multi_res_used": np.asarray([False]),
        "percussive_triggered": np.asarray([False]),
        "percussive_used": np.asarray([False]),
    }
    text = format_debug_dump(host, 0, 42, gt_bpm=170.0, top_n=5)
    assert "track_id=42" in text
    assert "GT bpm: 170.000" in text
    assert "family_competes=True" in text
    assert "bpm=  85.00" in text and "<== selected" in text
    assert "gt_in_candidates=True" in text
    assert "multi_res_triggered=True" in text


def test_run_validation_resume_scoring(tmp_path):
    from validation.tools import run_validation as rv

    out = tmp_path / "results.csv"
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=rv.RESULT_FIELDS, extrasaction="ignore")
        w.writeheader()
        w.writerow({"file": "a.wav", "bpm": 128.0, "key": "Am"})
    done = rv.load_done(str(out))
    assert set(done) == {"a.wav"}
    rows = [{"file": "a.wav", "bpm": "128.2", "key": "Am"},
            {"file": "b.wav", "bpm": "90", "key": ""}]
    chunks = rv.make_chunks(rows, done, batch_size=4)
    assert chunks == [[1]]  # only the undone track
    summary = rv.score_records(rows, done)
    assert summary["analyzed"] == 1
    assert summary["bpm_acc_2"] == 1.0
    assert summary["key_acc"] == 1.0


def test_prepare_test_batch_fma(tmp_path):
    """FMA-style hierarchical CSVs -> file,bpm,key batch rows (reference
    prepare_test_batch.py:33-155 semantics)."""
    from validation.tools.prepare_test_batch import main as prep_main

    meta = tmp_path / "fma_metadata"
    audio = tmp_path / "fma_small"
    meta.mkdir()
    (audio / "000").mkdir(parents=True)
    # two tracks with audio on disk, one without; one with key GT
    for tid in (2, 5):
        (audio / "000" / f"{tid:06d}.mp3").write_bytes(b"x")
    (meta / "tracks.csv").write_text(
        "cat,a\nname,b\ntrack_id,track.genre_top\n2,Rock\n5,Jazz\n9,Pop\n"
    )
    (meta / "echonest.csv").write_text(
        ",echonest,echonest,echonest\n"
        ",audio_features,audio_features,audio_features\n"
        ",tempo,key,mode\n"
        "track_id,,,\n"
        "2,120.5,0,1\n"
        "5,98.0,,\n"
        "9,140.0,9,0\n"
    )
    out_csv = tmp_path / "batch.csv"
    prep_main([str(audio), str(out_csv), "--fma-metadata", str(meta)])
    import csv as csvmod

    rows = list(csvmod.DictReader(open(out_csv)))
    by_bpm = {float(r["bpm"]): r for r in rows}
    assert set(by_bpm) == {120.5, 98.0}  # track 9 has no file on disk
    assert by_bpm[120.5]["key"] == "C"
    assert by_bpm[98.0]["key"] == ""


def test_prepare_test_batch_fma_subsample(tmp_path):
    from validation.tools.prepare_test_batch import main as prep_main

    meta = tmp_path / "m"
    audio = tmp_path / "a"
    meta.mkdir()
    (audio / "000").mkdir(parents=True)
    rows_meta = []
    for tid in range(1, 11):
        (audio / "000" / f"{tid:06d}.mp3").write_bytes(b"x")
        rows_meta.append(f"{tid},{90 + tid},0,1")
    (meta / "tracks.csv").write_text(
        "cat\nname\ntrack_id\n" + "\n".join(str(t) for t in range(1, 11)) + "\n"
    )
    (meta / "echonest.csv").write_text(
        ",echonest,echonest,echonest\n,audio_features,audio_features,audio_features\n"
        ",tempo,key,mode\ntrack_id,,,\n" + "\n".join(rows_meta) + "\n"
    )
    out_csv = tmp_path / "b.csv"
    prep_main([str(audio), str(out_csv), "--fma-metadata", str(meta),
               "--num-tracks", "4", "--seed", "3"])
    import csv as csvmod

    rows = list(csvmod.DictReader(open(out_csv)))
    assert len(rows) == 4
    # deterministic under the seed
    prep_main([str(audio), str(out_csv), "--fma-metadata", str(meta),
               "--num-tracks", "4", "--seed", "3"])
    rows2 = list(csvmod.DictReader(open(out_csv)))
    assert rows == rows2
