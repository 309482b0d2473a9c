#!/usr/bin/env python
"""Scaling-efficiency evidence for the SPMD pipeline (SURVEY §7 M7).

Only ONE real TPU chip is reachable in this environment, so multi-chip
scaling cannot be measured on hardware. This script produces the honest
substitutes, all on an 8-device virtual CPU mesh:

1. **Collective inventory** — compile the full default pipeline for the
   1-D ``tracks`` mesh and the 2-D ``(tracks, time)`` mesh and count every
   collective op (all-gather / collective-permute / all-reduce / all-to-all)
   in the optimized HLO, with moved bytes. The tracks axis is the rayon
   analogue (SURVEY §2.3): if it compiles to ZERO collectives, per-chip
   throughput is structurally independent of chip count — scaling efficiency
   is bounded by dispatch overhead only, not communication.
2. **ICI cost model for the 2-D mesh** — bytes-per-collective / ICI
   bandwidth vs the measured single-chip step time: the modeled efficiency
   of time-sharding 3-minute tracks.
3. **Virtual-CPU weak scaling** — 1 device with B tracks vs 8 devices with
   8B tracks (same per-device work). All 8 virtual devices share the SAME
   host cores, so this UNDER-estimates real scaling; it is reported as a
   lower bound with that caveat.

Prints one JSON object. Run: python scripts/scaling_report.py
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np

SR = 44100
# v5e: 4 ICI links/chip x ~186 GB/s bidirectional total per chip (public
# spec: 1600 Gbps). Used only for the 2-D-mesh cost model.
ICI_BYTES_PER_S = 186e9

COLLECTIVE_RE = re.compile(
    r"^\s*(?:\S+ = )?(\S+)\s+(all-gather|all-reduce|collective-permute|"
    r"all-to-all|reduce-scatter)", re.M
)
SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "c64": 8}


def collective_inventory(hlo_text: str):
    """(count, total_bytes, per-op list) of collectives in optimized HLO."""
    ops = []
    total = 0
    for m in COLLECTIVE_RE.finditer(hlo_text):
        shape_str, kind = m.group(1), m.group(2)
        nbytes = 0
        for sm in SHAPE_RE.finditer(shape_str):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * DTYPE_BYTES.get(dt, 4)
        ops.append({"kind": kind, "bytes": nbytes})
        total += nbytes
    return len(ops), total, ops


def compiled_hlo(fn, *args, **kwargs):
    return fn.lower(*args, **kwargs).compile().as_text()


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stratum_dsp_tpu.analysis.pipeline import PipelineCaps, analyze_batch_arrays
    from stratum_dsp_tpu.config import AnalysisConfig
    from stratum_dsp_tpu.parallel.mesh import make_mesh, pad_batch_for_mesh
    from stratum_dsp_tpu.testing import kick_pattern

    cfg = AnalysisConfig()
    secs = float(os.environ.get("SECS", "12"))
    per_dev = int(os.environ.get("PER_DEV", "2"))
    t = int(secs * SR)

    report = {"track_seconds": secs, "tracks_per_device": per_dev}

    # ---- 1. collective inventory: 1-D tracks mesh ----
    mesh1 = make_mesh(jax.devices()[:8])
    caps = PipelineCaps(max_onsets=256, max_beats=256, seg_beat_cap=32,
                        max_segments=12)
    b8 = 8 * per_dev
    ds1 = NamedSharding(mesh1, P("tracks"))
    fn1 = jax.jit(
        analyze_batch_arrays, static_argnums=(2, 3, 4, 5, 6),
        in_shardings=(ds1, ds1), out_shardings=ds1,
    )
    bpms8 = np.linspace(85.0, 168.0, b8).astype(np.float32)
    s8 = np.stack([kick_pattern(x, secs) for x in bpms8]).astype(np.float32)
    l8 = np.full((b8,), t, np.int32)
    hlo1 = compiled_hlo(fn1, s8, l8, cfg, SR, caps, "", None)
    n1, bytes1, _ = collective_inventory(hlo1)
    report["tracks_mesh_collectives"] = n1
    report["tracks_mesh_collective_bytes"] = bytes1

    # ---- 2. collective inventory + ICI model: 2-D (tracks, time) mesh ----
    mesh2 = make_mesh(jax.devices()[:8], n_time=2)
    ds2 = NamedSharding(mesh2, P("tracks", "time"))
    ls2 = NamedSharding(mesh2, P("tracks"))
    fn2 = jax.jit(
        analyze_batch_arrays, static_argnums=(2, 3, 4, 5, 6),
        in_shardings=(ds2, ls2), out_shardings=ls2,
    )
    b4 = 4 * per_dev
    bpms4 = bpms8[:b4]
    s4 = np.stack([kick_pattern(x, secs) for x in bpms4]).astype(np.float32)
    s4 = pad_batch_for_mesh(s4, mesh2)
    l4 = np.full((b4,), t, np.int32)
    hlo2 = compiled_hlo(fn2, s4, l4, cfg, SR, caps, "", mesh2)
    n2, bytes2, ops2 = collective_inventory(hlo2)
    report["time_mesh_collectives"] = n2
    report["time_mesh_collective_bytes"] = bytes2
    # the modeled ICI share: collective bytes vs the measured single-chip
    # batch time (pass STEP_SECONDS from a real-TPU bench run; default from
    # BENCH at B=8: ~0.30 s)
    step_s = float(os.environ.get("STEP_SECONDS", "0.30"))
    ici_s = bytes2 / ICI_BYTES_PER_S
    report["time_mesh_modeled_ici_seconds"] = round(ici_s, 6)
    report["time_mesh_modeled_efficiency_vs_step"] = round(
        step_s / (step_s + ici_s), 4
    )

    # ---- 3. virtual-CPU weak scaling (lower bound; shared host cores) ----
    mesh_1dev = make_mesh(jax.devices()[:1])
    ds_1 = NamedSharding(mesh_1dev, P("tracks"))
    fn_1 = jax.jit(
        analyze_batch_arrays, static_argnums=(2, 3, 4, 5, 6),
        in_shardings=(ds_1, ds_1), out_shardings=ds_1,
    )
    s1, l1 = s8[:per_dev], l8[:per_dev]

    def timed(fn, s, l, mesh_arg):
        out = fn(s, l, cfg, SR, caps, "", mesh_arg)  # compile
        jax.block_until_ready(out)
        times = []
        for _ in range(3):
            t0 = time.time()
            out = fn(s, l, cfg, SR, caps, "", mesh_arg)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        return float(np.median(times))

    t_1dev = timed(fn_1, s1, l1, None)
    t_8dev = timed(fn1, s8, l8, None)
    report["cpu_weak_scaling_1dev_s"] = round(t_1dev, 4)
    report["cpu_weak_scaling_8dev_s"] = round(t_8dev, 4)
    report["cpu_weak_scaling_efficiency_lower_bound"] = round(t_1dev / t_8dev, 4)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
