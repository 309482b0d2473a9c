#!/usr/bin/env python
"""Per-stage cumulative device timing via analysis.timing.stage_timings.

Usage: [B=8] [SECS=180] python scripts/profile_stages2.py
Each stage prefix is its own jitted program (XLA dead-code-eliminates
everything after the stop point), so deltas are true stage costs with no
per-dispatch pollution. Tracks synthesize on device.
"""

import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 44100


def main() -> int:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    b = int(os.environ.get("B", "8"))
    secs = float(os.environ.get("SECS", "180"))

    from stratum_dsp_tpu import compile_cache
    compile_cache.enable()

    import jax

    from stratum_dsp_tpu.analysis.timing import stage_timings
    from stratum_dsp_tpu.testing import kick_pattern_device

    bpms = np.linspace(80.0, 175.0, b).astype(np.float32)
    sj = jax.jit(lambda x: kick_pattern_device(x, secs))(jax.device_put(bpms))
    jax.block_until_ready(sj)
    lj = jax.device_put(np.full((b,), int(secs * SR), np.int32))

    t = stage_timings(sj, lj, reps=int(os.environ.get("REPS", "3")))
    print(json.dumps({"batch": b, **{k: round(v * 1e3, 2) for k, v in t.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
