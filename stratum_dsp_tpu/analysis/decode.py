"""Host-side decode: device result arrays -> per-track ``AnalysisResult``.

Mirrors the reference's result assembly (lib.rs:1595-1619) and the CLI's
JSON schema (examples/analyze_file.rs:724-731).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..result import (
    AnalysisMetadata,
    AnalysisResult,
    BeatGrid,
    Key,
    TempoCandidateDebug,
)

SIG_NAMES = {0: "4/4", 1: "3/4", 2: "6/8"}


def decode_results(out: Dict, sample_rate: int) -> List[AnalysisResult]:
    """Convert the pipeline's array dict to AnalysisResult objects."""
    host = {k: np.asarray(v) for k, v in out.items()}
    b = host["bpm"].shape[0]
    results = []
    for i in range(b):
        beats = host["beat_times"][i][host["beat_valid"][i]].tolist()
        downbeats = host["downbeat_times"][i][host["downbeat_valid"][i]].tolist()
        grid = BeatGrid(downbeats=downbeats, beats=beats, bars=list(downbeats))

        warnings = []
        flags = []
        if host["warn_bpm_failed"][i]:
            warnings.append(
                "BPM detection failed: insufficient onsets or estimation error"
            )
        if host["warn_low_grid_stability"][i]:
            warnings.append(
                f"Low beat grid stability: {host['grid_stability'][i]:.2f} "
                "(may indicate tempo variation)"
            )
        if host["warn_low_key_confidence"][i]:
            warnings.append(
                f"Low key detection confidence: {host['key_confidence'][i]:.2f} "
                "(may indicate ambiguous or atonal music)"
            )
        if host["warn_low_key_clarity"][i]:
            warnings.append(
                f"Low key clarity: {host['key_clarity'][i]:.2f} "
                "(track may be atonal or have weak tonality)"
            )
            flags.append("WeakTonality")
        if host.get("confidence_flag_multimodal_bpm") is not None:
            if host["confidence_flag_multimodal_bpm"][i]:
                flags.append("MultimodalBpm")
            if host["confidence_flag_tempo_variation"][i]:
                flags.append("TempoVariation")

        cands = None
        if "cand_bpm" in host:
            cands = [
                TempoCandidateDebug(
                    bpm=float(host["cand_bpm"][i, j]),
                    score=float(host["cand_score"][i, j]),
                    fft_norm=float(host["cand_fft"][i, j]),
                    autocorr_norm=float(host["cand_ac"][i, j]),
                    selected=bool(host["cand_selected"][i, j]),
                )
                for j in range(host["cand_bpm"].shape[1])
                if host["cand_valid"][i, j]
            ]

        # Per-track method list from the pipeline's actual decision booleans.
        # The reference hardcodes exactly three entries (lib.rs:1605-1609);
        # those stay for schema compatibility, and the escalation/fallback
        # paths that actually ran (consensus, multi-res, percussive, legacy
        # — lib.rs:1613-1617 only exposes them as separate booleans) are
        # appended so the list is truthful per track.
        methods = ["energy_flux"]
        if host.get("onset_consensus_used") is not None and bool(
            host["onset_consensus_used"][i]
        ):
            methods.append("onset_consensus")
        if host.get("legacy_used") is not None and bool(host["legacy_used"][i]):
            methods.append("legacy_autocorr_comb")
        elif host["bpm"][i] > 0.0:
            methods.append("tempogram")
        if host["multi_res_used"][i]:
            methods.append("multi_resolution")
        if host["percussive_used"][i]:
            methods.append("percussive_fallback")
        methods += ["chroma_extraction", "key_detection"]

        meta = AnalysisMetadata(
            duration_seconds=float(host["duration_seconds"][i]),
            sample_rate=sample_rate,
            processing_time_ms=float(host["processing_time_ms"][i])
            if "processing_time_ms" in host
            else 0.0,
            onset_method_consensus=1.0 if host["onset_count"][i] > 0 else 0.0,
            methods_used=methods,
            flags=flags,
            confidence_warnings=warnings,
            tempogram_candidates=cands,
            tempogram_multi_res_triggered=bool(host["multi_res_triggered"][i]),
            tempogram_multi_res_used=bool(host["multi_res_used"][i]),
            tempogram_percussive_triggered=bool(host["percussive_triggered"][i]),
            tempogram_percussive_used=bool(host["percussive_used"][i]),
        )
        results.append(
            AnalysisResult(
                bpm=float(host["bpm"][i]),
                bpm_confidence=float(host["bpm_confidence"][i]),
                key=Key.from_index(int(host["key_idx"][i])),
                key_confidence=float(host["key_confidence"][i]),
                key_clarity=float(host["key_clarity"][i]),
                beat_grid=grid,
                grid_stability=float(host["grid_stability"][i]),
                metadata=meta,
            )
        )
    return results
