#!/usr/bin/env python
"""A/B the fused novelty Pallas kernel vs the XLA reducer on the real chip.

Times ONLY the streamed BPM frontend (compute_bpm_spectral_features) at the
base hop and the multi-res hop, kernel on vs off.

Usage: [B=8] [SECS=180] STRATUM_NO_PALLAS_NOVELTY=?  python scripts/bench_novelty_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 44100


def main() -> int:
    from stratum_dsp_tpu import compile_cache

    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    from stratum_dsp_tpu.config import AnalysisConfig
    from stratum_dsp_tpu.features.period import novelty as nov
    from stratum_dsp_tpu.testing import kick_pattern_device

    b = int(os.environ.get("B", "8"))
    secs = float(os.environ.get("SECS", "180"))
    cfg = AnalysisConfig()

    bpms = np.linspace(80.0, 175.0, b).astype(np.float32)
    sj = jax.jit(lambda x: kick_pattern_device(x, secs))(jax.device_put(bpms))
    jax.block_until_ready(sj)
    lj = jax.device_put(np.full((b,), int(secs * SR), np.int32))

    def scalar(tree):
        import jax.numpy as jnp
        return sum(jnp.sum(x.astype(jnp.float32)) for x in
                   jax.tree_util.tree_leaves(tree) if hasattr(x, "astype"))

    def run(hop):
        def f(s, l):
            feats, fc, _ = nov.compute_bpm_spectral_features(
                s, l, cfg, SR, cfg.frame_size, hop, chunk_frames=1024)
            return scalar(feats)
        fn = jax.jit(f)
        r = fn(sj, lj); jax.block_until_ready(r)
        times = []
        for i in range(3):
            s_i = jax.jit(lambda x, e: x + e)(sj, np.float32(1e-5 + i * 7e-7))
            jax.block_until_ready(s_i)
            t0 = time.time()
            float(np.asarray(fn(s_i, lj)))
            times.append(time.time() - t0)
        return float(np.median(times)) * 1e3

    for hop in (cfg.hop_size, 256):
        ms = run(hop)
        print(f"hop={hop:4d}  {ms:7.1f} ms  (pallas={'off' if os.environ.get('STRATUM_NO_PALLAS_NOVELTY') else 'on'})",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
