"""Device-mesh scale-out for the analysis pipeline.

The reference's only parallelism is a rayon thread pool over independent
files (examples/analyze_batch.rs:239-262). The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``tracks`` axis: the padded ``[B, T]`` batch is
sharded over devices with ``NamedSharding(P("tracks"))`` and the whole
pipeline runs as ONE jitted SPMD program — XLA partitions every stage (all
stages are track-parallel; no cross-track collectives are needed, so scaling
is embarrassingly parallel over ICI just like rayon over cores, but with each
shard running the batched tensor pipeline).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh()``;
the mesh then spans all processes' devices and per-host shards are assembled
with ``jax.make_array_from_process_local_data``.

A second ``time`` axis for long-track time-block sharding (overlap-save STFT
halos via ppermute) is planned in ``parallel/timeblocks.py``; the batch axis
covers the 500 tracks/sec target since every track is independent.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..analysis.pipeline import PipelineCaps, analyze_batch_arrays
from ..config import AnalysisConfig


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), axis_names=("tracks",))


def analyze_batch_sharded(
    samples,
    lengths,
    cfg: AnalysisConfig,
    sample_rate: int,
    caps: PipelineCaps,
    mesh: Mesh,
):
    """Jit the full pipeline with the batch sharded over the tracks axis."""
    data_sharding = NamedSharding(mesh, P("tracks"))
    replicated = NamedSharding(mesh, P())

    fn = jax.jit(
        analyze_batch_arrays,
        static_argnums=(2, 3, 4),
        in_shardings=(data_sharding, data_sharding),
        out_shardings=data_sharding,
    )
    samples = jax.device_put(samples, data_sharding)
    lengths = jax.device_put(lengths, data_sharding)
    del replicated
    return fn(samples, lengths, cfg, sample_rate, caps)


def dryrun_multichip(n_devices: int) -> None:
    """Create an n-device mesh, jit the FULL analysis step sharded over it,
    and run one step on tiny shapes (driver validation hook)."""
    import os

    # The axon TPU plugin in this environment overrides the JAX_PLATFORMS
    # env var; when the caller requested virtual CPU devices via XLA_FLAGS,
    # force the CPU platform explicitly (a config update is the only thing
    # that works here).
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # backend already initialized — use what we have
            pass
    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(devices)}"
    )
    mesh = make_mesh(devices)

    cfg = AnalysisConfig()  # full default pipeline incl. multi-res escalation
    caps = PipelineCaps(max_onsets=128, max_beats=128, seg_beat_cap=16, max_segments=6)

    t = 5 * 8192  # a few key-STFT frames worth of audio (~0.93 s)
    b = n_devices
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal((b, t)) * 0.1).astype(np.float32)
    # kick-like impulses so the pipeline has onsets to chew on
    for i in range(b):
        samples[i, :: t // 8] += 0.9
    lengths = np.full((b,), t, np.int32)

    out = analyze_batch_sharded(samples, lengths, cfg, 44100, caps, mesh)
    jax.block_until_ready(out)
    bpm = np.asarray(out["bpm"])
    assert bpm.shape == (b,), bpm.shape
    print(f"dryrun_multichip OK: {n_devices} devices, bpm={np.round(bpm, 2)}")
