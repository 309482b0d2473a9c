#!/usr/bin/env python
"""Measure ONE pipeline variant in a fresh process (axon-safe).

Usage: python scripts/profile_one.py VARIANT [reps]
Variants: full, no_multires, no_consensus, no_hpcp, no_harmonic_mask,
          no_segvote, key_only, grid_only, bpm_only
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SR = 44100


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from stratum_dsp_tpu import compile_cache
    compile_cache.enable()

    import jax

    from _axon_bench import Bench
    from stratum_dsp_tpu.analysis.pipeline import PipelineCaps, analyze_batch_arrays
    from stratum_dsp_tpu.config import AnalysisConfig
    from stratum_dsp_tpu.features.beat import generate_beat_grid
    from stratum_dsp_tpu.features.key import detect_key_batch
    from stratum_dsp_tpu.testing import kick_pattern

    b = int(os.environ.get("B", "8"))
    secs = float(os.environ.get("SECS", "180"))
    caps = PipelineCaps()
    bpms = np.linspace(80.0, 175.0, b)
    samples = np.stack([kick_pattern(x, secs) for x in bpms]).astype(np.float32)
    lengths = np.full((b,), samples.shape[1], np.int32)

    bench = Bench()
    sj = jax.device_put(samples)
    lj = jax.device_put(lengths)

    cfgs = {
        "full": AnalysisConfig(),
        "no_multires": AnalysisConfig(enable_tempogram_multi_resolution=False),
        "no_consensus": AnalysisConfig(enable_onset_consensus=False),
        "no_hpcp": AnalysisConfig(enable_key_hpcp=False),
        "no_harmonic_mask": AnalysisConfig(enable_key_harmonic_mask=False),
        "no_segvote": AnalysisConfig(enable_key_segment_voting=False),
    }

    if variant == "key_only":
        fn = jax.jit(lambda s, l: detect_key_batch(s, l, AnalysisConfig(), SR))
        bench.timeit(fn, (sj, lj), perturb_idx=(0,), reps=reps, label="key_only")
    elif variant == "grid_only":
        rng = np.random.default_rng(0)
        onset_times = np.zeros((b, caps.max_onsets), np.float32)
        onset_valid = np.zeros((b, caps.max_onsets), bool)
        for i, bpm in enumerate(bpms):
            beat = 60.0 / bpm
            n = min(int(secs / beat), caps.max_onsets)
            onset_times[i, :n] = np.sort(np.abs(np.arange(n) * beat + rng.normal(0, 0.004, n)))
            onset_valid[i, :n] = True
        fn = jax.jit(lambda bb, cc, t, v: generate_beat_grid(
            bb, cc, t, v, caps.max_beats, caps.seg_beat_cap, caps.max_segments))
        bench.timeit(
            fn,
            (jax.device_put(bpms.astype(np.float32)),
             jax.device_put(np.full((b,), 0.5, np.float32)),
             jax.device_put(onset_times), jax.device_put(onset_valid)),
            perturb_idx=(2,), reps=reps, label="grid_only",
        )
    else:
        cfg = cfgs[variant]
        fn = jax.jit(analyze_batch_arrays, static_argnames=("cfg", "sample_rate", "caps"))
        bench.timeit(
            lambda s, l: fn(s, l, cfg=cfg, sample_rate=SR, caps=caps),
            (sj, lj), perturb_idx=(0,), reps=reps, label=variant,
        )

    import json
    print(json.dumps(bench.rows))


if __name__ == "__main__":
    main()
