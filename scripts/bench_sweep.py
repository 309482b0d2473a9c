#!/usr/bin/env python
"""Measure full-pipeline throughput at ONE batch size (fresh process per B).

Usage: B=32 [AMBIG=0.0] [REPS=3] python scripts/bench_sweep.py

Tracks are synthesized ON DEVICE (tunnel h2d is ~8 MB/s). AMBIG sets the
fraction of tracks whose BPM sits in the 55-80 trap zone, forcing the
multi-res escalation cond for sensitivity measurement (VERDICT r1 item 2).
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 44100
SECS = 180.0


def main() -> int:
    b = int(os.environ.get("B", "8"))
    reps = int(os.environ.get("REPS", "3"))
    ambig = float(os.environ.get("AMBIG", "-1"))  # -1: default 80..175 ramp

    from stratum_dsp_tpu import compile_cache
    compile_cache.enable()

    import jax

    from stratum_dsp_tpu.analysis.pipeline import PipelineCaps, analyze_batch_arrays
    from stratum_dsp_tpu.config import AnalysisConfig
    from stratum_dsp_tpu.testing import kick_pattern_device

    cfg = AnalysisConfig()
    chunk = int(os.environ.get("CHUNK", "0"))  # BPM-path chunk re-sweeps
    caps = PipelineCaps(chunk_frames=chunk) if chunk else PipelineCaps()

    if ambig < 0:
        bpms = np.linspace(80.0, 175.0, b)
    else:
        n_amb = int(round(ambig * b))
        # 55-80 trap zone triggers the ambiguity gate; 95-170 stays clear
        bpms = np.concatenate([
            np.linspace(58.0, 78.0, max(n_amb, 1))[:n_amb],
            np.linspace(95.0, 170.0, max(b - n_amb, 1))[: b - n_amb],
        ])
    lengths = np.full((b,), int(SECS * SR), np.int32)

    synth = jax.jit(lambda x: kick_pattern_device(x, SECS))
    sj = synth(jax.device_put(bpms.astype(np.float32)))
    jax.block_until_ready(sj)
    lj = jax.device_put(lengths)

    fn = jax.jit(analyze_batch_arrays, static_argnames=("cfg", "sample_rate", "caps"))
    perturb = jax.jit(lambda x, e: x + e)

    t0 = time.time()
    out = fn(sj, lj, cfg=cfg, sample_rate=SR, caps=caps)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    times = []
    for r in range(reps):
        # fresh input value per rep: CONTINUOUS random supra-ulp DC offset
        # (discrete offset grids collided with earlier runs in the tunnel's
        # cross-process result cache). Timing runs until a host readback of
        # the bpm array completes — device->host transfer cannot finish
        # before the compute, whatever block_until_ready means remotely.
        t0 = time.time()
        s_r = perturb(sj, np.float32(rng.uniform(1e-5, 1e-3)))
        out = fn(s_r, lj, cfg=cfg, sample_rate=SR, caps=caps)
        np.asarray(out["bpm"])
        times.append(time.time() - t0)

    # Rep 1 absorbs one-time costs (first readback through the tunnel has
    # been observed at 100+ s); among the rest, server-side result dedup can
    # still produce sub-ms artifacts, so keep reps within 2x of the slowest
    # post-warmup rep and take their median.
    rest = times[1:] if len(times) > 1 else times
    clean = [x for x in rest if x > 0.5 * max(rest)]
    dt = float(np.median(clean))
    got = np.asarray(out["bpm"])
    err = np.abs(got - bpms)
    fam = np.minimum.reduce([err, np.abs(got - 2 * bpms), np.abs(got - 0.5 * bpms)])
    print(json.dumps({
        "batch": b,
        "ambig_frac": ambig,
        "batch_seconds": round(dt, 4),
        "tracks_per_sec": round(b / dt, 2),
        "compile_s": round(compile_s, 1),
        "times": [round(x, 4) for x in times],
        "cache_suspect_reps": len(times) - len(clean),
        "bpm_family_accuracy": float(np.mean(fam < 2.0)),
        "mr_used_frac": float(np.mean(np.asarray(out["multi_res_used"]))),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
