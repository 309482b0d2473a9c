#!/usr/bin/env python
"""Capture a jax.profiler trace of one full-pipeline step on the real chip
and print the per-op device-time breakdown (top HLO ops + fusion groups).

Usage: [B=8] [SECS=180] python scripts/profile_trace.py [outdir]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 44100


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stratum_trace"
    b = int(os.environ.get("B", "8"))
    secs = float(os.environ.get("SECS", "180"))

    from stratum_dsp_tpu import compile_cache
    compile_cache.enable()

    import jax

    from stratum_dsp_tpu.analysis.pipeline import PipelineCaps, analyze_batch_arrays
    from stratum_dsp_tpu.config import AnalysisConfig
    from stratum_dsp_tpu.testing import kick_pattern_device

    cfg = AnalysisConfig()
    caps = PipelineCaps()
    bpms = np.linspace(80.0, 175.0, b).astype(np.float32)
    sj = jax.jit(lambda x: kick_pattern_device(x, secs))(jax.device_put(bpms))
    jax.block_until_ready(sj)
    lj = jax.device_put(np.full((b,), int(secs * SR), np.int32))

    fn = jax.jit(analyze_batch_arrays, static_argnames=("cfg", "sample_rate", "caps"))
    out = fn(sj, lj, cfg=cfg, sample_rate=SR, caps=caps)
    jax.block_until_ready(out)

    perturb = jax.jit(lambda x, e: x + e)
    s2 = perturb(sj, np.float32(int.from_bytes(os.urandom(4), "little") % 997 * 1e-9))
    jax.block_until_ready(s2)

    with jax.profiler.trace(outdir):
        out = fn(s2, lj, cfg=cfg, sample_rate=SR, caps=caps)
        jax.block_until_ready(out)

    # ---- parse the xplane proto for per-op device times ----
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane captured", file=sys.stderr)
        return 1
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([paths[-1]], "framework_op_stats", {})
    import gzip
    import io
    import csv as csvmod

    # framework_op_stats returns CSV bytes (possibly gzipped)
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    rows = list(csvmod.DictReader(io.StringIO(data)))
    rows = [r for r in rows if r.get("host_or_device", "").lower() != "host"]
    key_time = "total_self_time_us" if rows and "total_self_time_us" in rows[0] else None
    if key_time is None and rows:
        # fall back: print available fields
        print("fields:", list(rows[0].keys()))
        key_time = next(k for k in rows[0] if "self" in k and "time" in k)
    rows.sort(key=lambda r: -float(r[key_time] or 0))
    total = sum(float(r[key_time] or 0) for r in rows)
    print(f"total device self time: {total/1e3:.2f} ms   (batch {b})")
    for r in rows[:45]:
        t = float(r[key_time] or 0)
        if t < total * 0.003:
            break
        name = (r.get("operation") or r.get("op_name") or "?")[:100]
        cat = r.get("category", "")
        print(f"{t/1e3:9.3f} ms  {100*t/total:5.1f}%  {cat:18s} {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
