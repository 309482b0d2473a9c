"""Validation analysis scripts on a synthetic results CSV (pure host code)."""

import csv
import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from validation._keys import keys_equal, parse_key  # noqa: E402
from validation.analysis import (  # noqa: E402
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
