#!/usr/bin/env python
"""Throughput benchmark: 3-minute tracks analyzed per second per chip.

Runs the full default pipeline (BPM + multi-res escalation + key + beat grid)
on a batch of synthetic 3-minute kick tracks on the available device(s) and
prints ONE JSON line:

  {"metric": "tracks_per_sec_per_chip", "value": N, "unit": "3min-tracks/s",
   "vs_baseline": N}

Baseline: the reference Rust engine's full-machine batch throughput of
~21.3 tracks/sec with CPU-1 rayon workers (PHASE_1F_BENCHMARKS.md:76-78).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_TRACKS_PER_SEC = 21.3
TRACK_SECONDS = 180.0
SR = 44100


def main() -> int:
    from stratum_dsp_tpu import compile_cache

    compile_cache.enable()
    import jax

    from stratum_dsp_tpu.analysis.pipeline import PipelineCaps, analyze_batch_arrays
    from stratum_dsp_tpu.config import AnalysisConfig
    from stratum_dsp_tpu.testing import kick_pattern_device

    # B=40 is the round-4 knee AFTER fixing the bench harness's own OOM
    # (12 resident rep inputs; now a donated 2-buffer chain): 16 -> 115.4,
    # 24 -> 122.4, 32 -> 124.3, 40 -> 127.5, 44 -> 119.9, 48 -> 120.5
    # tracks/s. The >=44 dip tracks the escalated-track fraction of the
    # linspace seed mix (10/44 vs 5/40), not a hardware wall — the pipeline
    # program itself is only ~5-8 GB by memory_analysis. Chunk stays 256.
    batch = int(os.environ.get("BENCH_BATCH", "40"))
    # 12+ reps: throughput is measured on a pipelined stream of batches, and
    # short streams understate it ~8% (the first post-warmup dispatches
    # amortize stream startup; measured 64.1 @ reps=4 vs 70.3 @ reps=16 on
    # identical code). Production (analyze_batch CLI) runs long streams.
    reps = int(os.environ.get("BENCH_REPS", "12"))

    cfg = AnalysisConfig()
    # BENCH_CHUNK: streaming chunk size override for re-sweeps (the optimum
    # follows the TOTAL working set, so re-tune after batch changes)
    chunk = int(os.environ.get("BENCH_CHUNK", "0"))
    caps = PipelineCaps(chunk_frames=chunk) if chunk else PipelineCaps()

    t = int(TRACK_SECONDS * SR)
    # CLEAN mix: seeds stay below the >=170 fold-down region
    # (tempogram.rs:669-699, multi_resolution.rs:698-724) so EXACT +-2
    # accuracy is the right bar; ~12% of seeds escalate. This is the
    # flattering case and is reported as `value` for round-over-round
    # continuity.
    bpms = np.linspace(80.0, 168.0, batch)
    # ADVERSARIAL mix: ~30% of tracks inside the 55-80 / 170-200 trap zones
    # (the ambiguity gate's escalation triggers, lib.rs:412-459), matching
    # the measured real-world sensitivity point (BENCH_NOTES round 4:
    # 118 -> 108 tracks/s at 10% -> 35% mr_used). The reference reports its
    # latency percentiles on real tracks (PHASE_1F_BENCHMARKS.md:66-83);
    # this mix is the synthetic stand-in, reported as `value_adversarial` —
    # quote THIS number for perf claims. Trap-high seeds legitimately fold
    # to half per the reference's >=170 convention, so the accuracy bar is
    # exact on core seeds + family-exact on trap seeds.
    # Core seeds are ROUNDED to integers: fractional seeds can land on
    # genuine half-time knife edges of a pure 3-min kick train (measured:
    # 149.56 -> 74.0 while 149.0 and 150.0 are exact — the base tempogram's
    # 0.55/0.45 score is near-tied for a subdivision-free click train), and
    # a regression GATE needs seeds that pass at HEAD.
    n_trap = max(2, int(round(0.30 * batch)))
    lo = np.round(np.linspace(56.0, 79.0, n_trap // 2))
    hi = np.round(np.linspace(172.0, 199.0, n_trap - n_trap // 2))
    adv_bpms = np.concatenate(
        [np.round(np.linspace(85.0, 168.0, batch - n_trap)), lo, hi]
    )
    # synthesize ON DEVICE: the tunnel's host->device path runs at ~8 MB/s,
    # so shipping the [B, 7.9M] batch would dominate bench startup
    synth = jax.jit(lambda x: kick_pattern_device(x, TRACK_SECONDS))
    sj = synth(jax.device_put(bpms.astype(np.float32)))
    jax.block_until_ready(sj)
    lj = jax.device_put(np.full((batch,), t, np.int32))

    fn = jax.jit(analyze_batch_arrays, static_argnames=("cfg", "sample_rate", "caps"))

    # warmup / compile (the adversarial mix reuses this executable: same
    # shapes, and every escalation tier is compiled into the lax.switch)
    out = fn(sj, lj, cfg=cfg, sample_rate=SR, caps=caps)
    jax.block_until_ready(out)

    # XLA's own cost model for the compiled program: model FLOPs + HBM
    # traffic, for MFU / roofline reporting (anchors perf claims to hardware
    # peak, not just the Rust baseline).
    cost_flops = cost_bytes = None
    try:
        cost = (
            fn.lower(sj, lj, cfg=cfg, sample_rate=SR, caps=caps)
            .compile()
            .cost_analysis()
        )
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        cost_flops = float(cost.get("flops", 0.0)) or None
        cost_bytes = float(cost.get("bytes accessed", 0.0)) or None
    except Exception:
        pass

    # Each rep must see a NEVER-BEFORE-RUN input value: the axon tunnel
    # content-caches (executable, input) results server-side, so re-running
    # on previously-seen values measures cache-fetch time, not compute. The
    # random DC offset must exceed the f32 ulp of EVERY sample (ulp(1.0) =
    # 1.2e-7) or the buffer fingerprint can collide with a previous run's —
    # a sub-ulp offset produced 0.7 ms "pipeline" timings. 2e-6..2e-3 DC is
    # inaudible and BPM/key invariant (flux/chroma are difference/band ops).
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    # DONATED perturbation chain: materializing all rep inputs up front kept
    # reps x [B, 7.9M] f32 resident (9.1 GB at B=24/reps=12) — THAT, not the
    # pipeline (5.2 GB temps by memory_analysis), was the B>24 bench OOM.
    # Donating x lets PJRT reuse each input buffer for the next rep once its
    # analyze dispatch has consumed it, so only ~2 inputs are live.
    perturb = jax.jit(lambda x, eps: x + eps, donate_argnums=0)

    # BENCH_TRACE=<dir>: capture a jax.profiler trace of the timed reps
    # (device ops are visible on a locally-attached TPU; the axon tunnel
    # only records host activity).
    import contextlib

    trace_dir = os.environ.get("BENCH_TRACE", "")

    def run_mix(seed_track, trace=False):
        # Throughput is measured on a PIPELINED stream of batches, the way
        # the batch CLI runs in production: dispatch every rep
        # asynchronously (JAX async dispatch queues them on the device
        # back-to-back), then read all results. A synchronous per-rep loop
        # instead pays the tunnel's ~28 ms dispatch+readback round-trip per
        # batch, which production streaming overlaps with device compute.
        # Rep 0 (untimed) absorbs one-time tunnel costs; the stream clock
        # starts after it completes.
        epss = [
            np.float32(rng.uniform(1e-5, 1e-3)) * (1 if r % 2 == 0 else -1)
            for r in range(reps)
        ]
        tracer = (
            jax.profiler.trace(trace_dir)
            if (trace_dir and trace)
            else contextlib.nullcontext()
        )
        with tracer:
            x = perturb(seed_track, epss[0])
            out0 = fn(x, lj, cfg=cfg, sample_rate=SR, caps=caps)
            np.asarray(out0["bpm"])  # host readback forces true completion
            t0 = time.time()
            outs = []
            for eps in epss[1:]:
                x = perturb(x, eps)  # donates the previous buffer
                outs.append(fn(x, lj, cfg=cfg, sample_rate=SR, caps=caps))
            for o in outs:
                np.asarray(o["bpm"])
            stream_dt = time.time() - t0
        return stream_dt / max(reps - 1, 1), outs[-1]

    dt, out = run_mix(sj, trace=True)
    adv_sj = synth(jax.device_put(adv_bpms.astype(np.float32)))
    jax.block_until_ready(adv_sj)
    adv_dt, adv_out = run_mix(adv_sj)

    n_dev = jax.device_count()
    tracks_per_sec = batch / dt
    per_chip = tracks_per_sec / max(n_dev, 1)

    # TPU-only Pallas kernels: compare against interpret mode on small shapes
    # (CI runs CPU/interpret only, so a TPU lowering regression would
    # otherwise ship silently — VERDICT r1 weak item 8).
    kernels_ok = True
    if jax.default_backend() == "tpu":
        from stratum_dsp_tpu.ops.downbeats_pallas import downbeat_mask
        from stratum_dsp_tpu.ops.viterbi_pallas import viterbi_decode
        from stratum_dsp_tpu.ops.polyphase_pallas import polyphase_stage2

        import jax.numpy as jnp_

        rng = np.random.default_rng(1)
        # polyphase stage-2 kernel: TPU lowering vs interpreter on a small
        # shape (a silent TPU-only regression would skew the key path)
        bd = jnp_.asarray(rng.standard_normal((2, 48, 256)).astype(np.float32))
        m_tpu = np.asarray(polyphase_stage2(bd, 16, 24, 100))
        m_int = np.asarray(polyphase_stage2(bd, 16, 24, 100, interpret=True))
        kernels_ok &= bool(
            np.allclose(m_tpu, m_int, rtol=5e-3, atol=5e-3 * float(np.max(m_int)))
        )
        emis = jnp_.asarray(rng.random((5, 96), np.float32) * 0.9 + 0.05)
        kernels_ok &= bool(
            np.array_equal(
                np.asarray(viterbi_decode(emis)),
                np.asarray(viterbi_decode(emis, True)),
            )
        )
        tms = jnp_.asarray(np.sort(rng.random((5, 64), np.float32) * 30, axis=-1))
        nb = jnp_.asarray(np.full((5,), 64, np.int32))
        br = jnp_.asarray(np.full((5,), 2.0, np.float32))
        kernels_ok &= bool(
            np.array_equal(
                np.asarray(downbeat_mask(tms, nb, br)),
                np.asarray(downbeat_mask(tms, nb, br, True)),
            )
        )

    # CLEAN-mix sanity: BPM must be EXACTLY the seeded values (+-2). Exact
    # is the GATE (a fold-gate regression flipping a track to its 2x family
    # member must fail the bench); family accuracy stays as telemetry only.
    got = np.asarray(out["bpm"])
    err = np.abs(got - bpms)
    exact_accuracy = float(np.mean(err <= 2.0))
    fam_ok = np.minimum.reduce([err, np.abs(got - 2 * bpms), np.abs(got - 0.5 * bpms)])
    accuracy = float(np.mean(fam_ok < 2.0))

    # ADVERSARIAL-mix accuracy: trap-high seeds fold to half by the
    # reference's >=170 convention, so the bar is exact on core seeds
    # ([85,170)) and family-exact everywhere.
    adv_got = np.asarray(adv_out["bpm"])
    adv_err = np.abs(adv_got - adv_bpms)
    adv_fam = np.minimum.reduce(
        [adv_err, np.abs(adv_got - 2 * adv_bpms), np.abs(adv_got - 0.5 * adv_bpms)]
    )
    core = (adv_bpms >= 85.0) & (adv_bpms < 170.0)
    adv_exact_core = float(np.mean(adv_err[core] <= 2.0))
    adv_family = float(np.mean(adv_fam < 2.0))

    adv_per_chip = batch / adv_dt / max(n_dev, 1)
    rec = {
        "metric": "tracks_per_sec_per_chip",
        "value": round(per_chip, 3),
        "unit": "3min-tracks/s",
        "vs_baseline": round(per_chip / BASELINE_TRACKS_PER_SEC, 3),
        "value_adversarial": round(adv_per_chip, 3),
        "vs_baseline_adversarial": round(adv_per_chip / BASELINE_TRACKS_PER_SEC, 3),
        "batch": batch,
        "devices": n_dev,
        "batch_seconds": round(dt, 3),
        "batch_seconds_adversarial": round(adv_dt, 3),
        "bpm_exact_accuracy": exact_accuracy,
        "bpm_family_accuracy": accuracy,
        "adv_bpm_exact_core_accuracy": adv_exact_core,
        "adv_bpm_family_accuracy": adv_family,
        "pallas_kernels_ok": kernels_ok,
    }
    # --- roofline: analytic FLOPs of the dominant MXU matmuls ---
    # XLA's cost_analysis counts while/scan loop bodies ONCE (verified: a
    # 10-iteration scan of a matmul reports 1 matmul of flops), so under the
    # streaming-chunk design it understates by ~the chunk count; the cost-
    # model numbers are kept below as labeled lower bounds only. The
    # analytic model counts the three matmul FLOP dominators:
    #   1. BPM STFT: frames @ fused basis [2048, 2*1025] (ops/stft.py:177)
    #   2. key polyphase stage 1 [hop, 2*Kp] + stage-2 banded box sums
    #      (ops/stft.py:289-343, Kp ~ 911 band-limited bins)
    #   3. escalation hop-256 STFT on multi-res tracks (frames x2)
    frames = t // cfg.hop_size
    kp = 911  # 100-5000 Hz band at frame 8192 (config key_stft_frame_size)
    bpm_stft = 2 * frames * cfg.frame_size * 2 * (cfg.frame_size // 2 + 1)
    key_stage1 = 2 * t * 2 * kp
    key_stage2 = 2 * frames * 144 * 2 * kp  # FT=128, R=16 banded tiles
    n_mr = int(np.sum(np.asarray(out["multi_res_used"]))) if "multi_res_used" in out else 0
    mr_stft = 2 * (2 * frames) * cfg.frame_size * 2 * (cfg.frame_size // 2 + 1)
    flops_batch = batch * (bpm_stft + key_stage1 + key_stage2) + n_mr * mr_stft

    # v5e peak: 197 TFLOP/s bf16 (MXU), HBM ~819 GB/s. The roofline verdict
    # for this pipeline is HBM-bound: MFU is single-digit by design (DSP
    # streaming, not dense training math).
    PEAK_BF16 = 197e12
    PEAK_HBM = 819e9
    rec["analytic_flops_per_batch"] = float(flops_batch)
    rec["mfu_bf16_peak"] = round(flops_batch / dt / PEAK_BF16, 4)
    rec["escalated_tracks"] = n_mr
    rec["escalated_tracks_adversarial"] = int(
        np.sum(np.asarray(adv_out["multi_res_used"]))
    ) if "multi_res_used" in adv_out else 0
    if cost_flops:
        rec["xla_costmodel_flops_lower_bound"] = cost_flops
    if cost_bytes:
        rec["xla_costmodel_hbm_gb_lower_bound"] = round(cost_bytes / 1e9, 2)
        rec["hbm_bw_util_lower_bound"] = round(cost_bytes / dt / PEAK_HBM, 4)
    print(json.dumps(rec))
    # EXACT-FIRST regression gate: a decision regression (fold gate flip,
    # escalation selection change) must fail the bench run, not just dent a
    # telemetry field. Family accuracy is telemetry only.
    gate_ok = (
        exact_accuracy == 1.0 and adv_exact_core == 1.0 and adv_family == 1.0
    )
    if not gate_ok:
        print(
            f"BENCH GATE FAILED: clean_exact={exact_accuracy} "
            f"adv_exact_core={adv_exact_core} adv_family={adv_family}",
            file=sys.stderr,
        )
        bad = np.nonzero(err > 2.0)[0].tolist()
        adv_bad = np.nonzero((adv_fam >= 2.0) | (core & (adv_err > 2.0)))[0].tolist()
        for i in bad:
            print(f"  clean seed {bpms[i]:.2f} -> {got[i]:.2f}", file=sys.stderr)
        for i in adv_bad:
            print(f"  adv seed {adv_bpms[i]:.2f} -> {adv_got[i]:.2f}", file=sys.stderr)
    return 0 if gate_ok else 1


if __name__ == "__main__":
    sys.exit(main())
