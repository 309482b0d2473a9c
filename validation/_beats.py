"""Beat-tracking accuracy metrics (numpy, stdlib-only).

Standard continuity/F-measure definitions from the beat-tracking
literature (Davies, Degara & Plumbley, "Evaluation methods for musical
audio beat tracking algorithms", 2009) as implemented across common
evaluation toolkits:

* ``beat_f_measure`` — greedy one-to-one matching inside a ±70 ms window.
* ``cml_t`` — continuity-based correctness at the annotated metrical level:
  a detected beat counts only when both its phase error to the nearest
  annotation and its inter-beat-interval error are inside 17.5% of the
  local annotation interval AND the previous detection was also correct;
  CMLt is the fraction of detections inside such continuous segments.
* ``aml_t`` — CMLt maximized over allowed metrical levels (double, half
  at both phases, and the offbeat), which scores trackers that lock to a
  coherent grid at a related level.

These score the third product output (the beat grid) at battery scale; the
reference's evidence for its grid is per-interval integration asserts
(``/root/reference/tests/integration_tests.rs:47-275``) and the shipped
grid-stability metric (``/root/reference/src/features/beat_tracking/
mod.rs:425-485``) — this module provides the corpus-level counterpart.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

F_WINDOW_S = 0.07
CONTINUITY_TOL = 0.175


def _as_sorted(x) -> np.ndarray:
    a = np.asarray(x, np.float64).ravel()
    return np.sort(a[np.isfinite(a)])


def beat_f_measure(
    ref: Sequence[float], est: Sequence[float], window_s: float = F_WINDOW_S
) -> Tuple[float, float, float]:
    """(f_measure, precision, recall) with greedy one-to-one ±window matching."""
    r, e = _as_sorted(ref), _as_sorted(est)
    if len(r) == 0 and len(e) == 0:
        return 1.0, 1.0, 1.0
    if len(r) == 0 or len(e) == 0:
        return 0.0, 0.0, 0.0
    hits = 0
    j = 0
    for t in r:
        # advance past est beats too early to match this or any later ref
        while j < len(e) and e[j] < t - window_s:
            j += 1
        if j < len(e) and abs(e[j] - t) <= window_s:
            hits += 1
            j += 1  # one-to-one: consume the matched estimate
    precision = hits / len(e)
    recall = hits / len(r)
    f = 0.0 if hits == 0 else 2 * precision * recall / (precision + recall)
    return f, precision, recall


def _continuity_correct(ref: np.ndarray, est: np.ndarray, tol: float) -> np.ndarray:
    """Per-detection correctness mask under the phase+period+continuity rule."""
    n = len(est)
    ok = np.zeros(n, bool)
    if n == 0 or len(ref) < 2:
        return ok
    # nearest annotation and its local interval
    idx = np.searchsorted(ref, est)
    idx = np.clip(idx, 1, len(ref) - 1)
    nearest = np.where(
        np.abs(est - ref[idx - 1]) <= np.abs(est - ref[idx]), idx - 1, idx
    )
    local_ibi = np.diff(ref)[np.clip(nearest, 0, len(ref) - 2)]
    phase_ok = np.abs(est - ref[nearest]) < tol * local_ibi
    period_ok = np.zeros(n, bool)
    if n >= 2:
        est_ibi = np.diff(est)
        period_ok[1:] = np.abs(est_ibi - local_ibi[1:]) < tol * local_ibi[1:]
    # continuity: detection i is correct iff its own phase+period are inside
    # tolerance AND the previous detection was phase-correct (the standard
    # "previous beat must also be accurate" rule)
    ok = phase_ok & period_ok & np.concatenate([[False], phase_ok[:-1]])
    return ok


def _segment_stats(ok: np.ndarray) -> Tuple[int, int]:
    """(total beats in continuous correct segments, longest segment)."""
    total = int(ok.sum())
    longest = run = 0
    for v in ok:
        run = run + 1 if v else 0
        longest = max(longest, run)
    return total, longest


def cml_t(ref, est, tol: float = CONTINUITY_TOL) -> float:
    r, e = _as_sorted(ref), _as_sorted(est)
    if len(r) < 2 or len(e) < 2:
        return 0.0
    ok = _continuity_correct(r, e, tol)
    total, _ = _segment_stats(ok)
    return total / max(len(r), len(e))


def _metrical_variants(ref: np.ndarray) -> List[np.ndarray]:
    """Allowed metrical levels: annotated, double, half (both phases),
    offbeat (shifted half interval)."""
    out = [ref]
    if len(ref) >= 2:
        mid = (ref[:-1] + ref[1:]) / 2.0
        out.append(np.sort(np.concatenate([ref, mid])))  # double time
        out.append(ref[::2])  # half time, on-phase
        out.append(ref[1::2])  # half time, off-phase
        out.append(mid)  # offbeat
    return out


def aml_t(ref, est, tol: float = CONTINUITY_TOL) -> float:
    r, e = _as_sorted(ref), _as_sorted(est)
    best = 0.0
    for variant in _metrical_variants(r):
        if len(variant) < 2 or len(e) < 2:
            continue
        ok = _continuity_correct(variant, e, tol)
        total, _ = _segment_stats(ok)
        best = max(best, total / max(len(variant), len(e)))
    return best


def score_beats(
    ref_beats,
    ref_downbeats,
    est_beats,
    est_downbeats,
    window_s: float = F_WINDOW_S,
) -> dict:
    """All grid metrics for one track, ground truth vs predictions."""
    f, p, rcl = beat_f_measure(ref_beats, est_beats, window_s)
    db_f, _, _ = beat_f_measure(ref_downbeats, est_downbeats, window_s)
    return {
        "beat_f": f,
        "beat_precision": p,
        "beat_recall": rcl,
        "beat_cmlt": cml_t(ref_beats, est_beats),
        "beat_amlt": aml_t(ref_beats, est_beats),
        "downbeat_f": db_f,
    }
