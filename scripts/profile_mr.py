#!/usr/bin/env python
"""Attribute multi_resolution_estimate across its sub-stages.

Scalar outputs; fresh perturbed inputs per rep; prints a no-op probe so the
tunnel's fixed dispatch+readback overhead (~28 ms) can be subtracted.

Usage: [B=8] [SECS=180] [REPS=3] python scripts/profile_mr.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 44100


def main() -> int:
    from stratum_dsp_tpu import compile_cache

    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    from _axon_bench import Bench
    from stratum_dsp_tpu.config import AnalysisConfig
    from stratum_dsp_tpu.features.period import multi_resolution as mr
    from stratum_dsp_tpu.features.period import novelty as nov
    from stratum_dsp_tpu.features.period import tempogram as tg
    from stratum_dsp_tpu.features.period import tempogram_fft as tft
    from stratum_dsp_tpu.testing import kick_pattern_device

    b = int(os.environ.get("B", "8"))
    secs = float(os.environ.get("SECS", "180"))
    reps = int(os.environ.get("REPS", "3"))
    cfg = AnalysisConfig()

    bpms = np.linspace(80.0, 175.0, b).astype(np.float32)
    sj = jax.jit(lambda x: kick_pattern_device(x, secs))(jax.device_put(bpms))
    jax.block_until_ready(sj)
    lj = jax.device_put(np.full((b,), int(secs * SR), np.int32))
    bench = Bench()

    def scalar(tree):
        return sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "astype")
        )

    def timeit(label, fn):
        fnj = jax.jit(fn)
        r = fnj(sj, lj)
        float(np.asarray(r))
        ts = []
        for _ in range(reps):
            s = bench.fresh(sj)
            t0 = time.time()
            r = fnj(s, lj)
            float(np.asarray(r))
            ts.append(time.time() - t0)
        med = float(np.median(ts))
        print(f"{label:36s} {med*1e3:8.1f} ms  {[round(t*1e3,1) for t in ts]}",
              flush=True)
        return med

    timeit("noop probe", lambda s, l: jnp.sum(s[:, :8]))

    def feats256(s, l):
        feats, fc, _ = nov.compute_bpm_spectral_features(
            s, l, cfg, SR, cfg.frame_size, 256, chunk_frames=1024)
        return scalar(feats)

    timeit("hop-256 feats (stft+novelty)", feats256)

    def cand256(s, l):
        est, nv, m, nva = mr.hop_candidates(s, l, cfg, SR, 256, 10)
        return scalar(est)

    timeit("hop-256 candidates (full)", cand256)

    # the precomputed-base path as the pipeline invokes it
    def full_mr(s, l):
        feats, frame_counts, _ = nov.compute_bpm_spectral_features(
            s, l, cfg, SR, cfg.frame_size, cfg.hop_size, chunk_frames=1024)
        curves, nov_mask, n_valid = nov.assemble_novelty_curves(feats, frame_counts, cfg)
        frame_rate = SR / cfg.hop_size
        fft_size = tft.padded_fft_size(curves["full"].shape[-1], frame_rate)
        variants = tg.compute_variants(curves, nov_mask, n_valid, frame_rate, cfg, fft_size)
        base_top_n = max(cfg.tempogram_candidates_top_n, cfg.tempogram_multi_res_top_k, 10)
        base = tg.estimate_bpm_tempogram(variants, cfg, frame_rate, fft_size, base_top_n)
        pre = {
            "est": base,
            "feats": {k: feats[k] for k in ("superflux", "superflux2", "energy", "hfc", "mel") if k in feats},
            "frame_counts": frame_counts,
            "novelty_full": curves["full"],
            "n_valid": n_valid,
        }
        out = mr.multi_resolution_estimate(s, l, cfg, SR, pre)
        return scalar(out)

    def base_only(s, l):
        feats, frame_counts, _ = nov.compute_bpm_spectral_features(
            s, l, cfg, SR, cfg.frame_size, cfg.hop_size, chunk_frames=1024)
        curves, nov_mask, n_valid = nov.assemble_novelty_curves(feats, frame_counts, cfg)
        frame_rate = SR / cfg.hop_size
        fft_size = tft.padded_fft_size(curves["full"].shape[-1], frame_rate)
        variants = tg.compute_variants(curves, nov_mask, n_valid, frame_rate, cfg, fft_size)
        base_top_n = max(cfg.tempogram_candidates_top_n, cfg.tempogram_multi_res_top_k, 10)
        base = tg.estimate_bpm_tempogram(variants, cfg, frame_rate, fft_size, base_top_n)
        return scalar(base)

    t_base = timeit("base (512 feats+tempogram)", base_only)
    t_full = timeit("base + full multires", full_mr)
    print(json.dumps({"batch": b, "mr_delta_ms": round((t_full - t_base) * 1e3, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
