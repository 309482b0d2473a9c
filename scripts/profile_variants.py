#!/usr/bin/env python
"""Attribute full-pipeline cost via config variants + isolated sub-stages.

Every timing uses fresh on-device inputs (see _axon_bench). Variants keep the
full output structure so XLA cannot DCE differently; deltas between variants
attribute stage costs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SR = 44100


def main():
    from stratum_dsp_tpu import compile_cache
    compile_cache.enable()

    import jax
    import jax.numpy as jnp

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

    fn = jax.jit(analyze_batch_arrays, static_argnames=("cfg", "sample_rate", "caps"))

    def run_cfg(cfg):
        return lambda s, l: fn(s, l, cfg=cfg, sample_rate=SR, caps=caps)

    variants = [
        ("full default", AnalysisConfig()),
        ("no multires", AnalysisConfig(enable_tempogram_multi_resolution=False)),
        ("no onset consensus", AnalysisConfig(enable_onset_consensus=False)),
        ("no key hpcp (plain chroma)", AnalysisConfig(enable_key_hpcp=False)),
        ("no key harmonic mask", AnalysisConfig(enable_key_harmonic_mask=False)),
        ("no segment voting", AnalysisConfig(enable_key_segment_voting=False)),
    ]
    for label, cfg in variants:
        bench.timeit(run_cfg(cfg), (sj, lj), perturb_idx=(0,), reps=3, label=label)

    # isolated stages
    key_fn = jax.jit(
        lambda s, l: detect_key_batch(s, l, AnalysisConfig(), SR)
    )
    bench.timeit(key_fn, (sj, lj), perturb_idx=(0,), reps=3, label="detect_key_batch alone")

    rng = np.random.default_rng(0)
    onset_times = np.zeros((b, caps.max_onsets), np.float32)
    onset_valid = np.zeros((b, caps.max_onsets), bool)
    for i, bpm in enumerate(bpms):
        beat = 60.0 / bpm
        n = min(int(secs / beat), caps.max_onsets)
        t = np.sort(np.abs(np.arange(n) * beat + rng.normal(0, 0.004, n)))
        onset_times[i, :n] = t
        onset_valid[i, :n] = True
    grid_fn = jax.jit(
        lambda bb, cc, t, v: generate_beat_grid(
            bb, cc, t, v, caps.max_beats, caps.seg_beat_cap, caps.max_segments
        )
    )
    bj = jax.device_put(bpms.astype(np.float32))
    cj = jax.device_put(np.full((b,), 0.5, np.float32))
    tj = jax.device_put(onset_times)
    vj = jax.device_put(onset_valid)
    bench.timeit(grid_fn, (bj, cj, tj, vj), perturb_idx=(2,), reps=3,
                 label="generate_beat_grid alone")

    import json
    print(json.dumps(bench.rows))


if __name__ == "__main__":
    main()
