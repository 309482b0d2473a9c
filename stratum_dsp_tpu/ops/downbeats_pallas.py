"""Pallas TPU kernel for greedy downbeat marking.

``detect_downbeats`` (beat_tracking/mod.rs:363-404) is a greedy sequential
walk over the beat list: the first beat is a downbeat, each later beat is one
iff it lands within ±10% of one bar after the last downbeat. Over the final
beat capacity (~4096 slots) the ``lax.scan`` formulation costs ~1 s of XLA
while-loop overhead per batch; here the whole walk is one kernel with the
beat times in SMEM (~10 scalar ops per slot).

Blocking: TPU requires SMEM block rows divisible by 8, and a full-batch
[B, N] block overflows the 1 MB SMEM at B >= 64 — so each grid cell stages
an 8-row block and walks its 8 tracks in one interleaved loop (ILP across
rows). The wrapper pads B to a multiple of 8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8


def _downbeat_kernel(times_ref, nbeats_ref, bar_ref, out_ref):
    n_slots = times_ref.shape[1]
    row0 = pl.program_id(0) * ROWS  # 1-D scalars stay full-array (rank-1
    # blocks must equal the array dim on TPU); 2-D blocks are per-8-rows

    def step(i, carry):
        # carry: tuple of ROWS (last_db, any_db) pairs, interleaved for ILP
        out = []
        for r in range(ROWS):
            last_db, any_db = carry[2 * r], carry[2 * r + 1]
            bar = bar_ref[row0 + r]
            t = times_ref[r, i]
            ok = i < nbeats_ref[row0 + r]
            first = jnp.logical_and(ok, jnp.logical_not(any_db))
            hit = jnp.logical_and(
                jnp.logical_and(ok, any_db),
                jnp.abs(t - (last_db + bar)) <= bar * 0.1,
            )
            is_db = jnp.logical_or(first, hit)
            out_ref[r, i] = is_db.astype(jnp.int32)
            out.append(jnp.where(is_db, t, last_db))
            out.append(jnp.logical_or(any_db, is_db))
        return tuple(out)

    init = tuple(
        v for _ in range(ROWS) for v in (jnp.float32(0.0), jnp.bool_(False))
    )
    jax.lax.fori_loop(0, n_slots, step, init)


@functools.partial(jax.jit, static_argnums=(3,))
def downbeat_mask(
    times: jax.Array, n_beats: jax.Array, bar: jax.Array, interpret: bool = False
) -> jax.Array:
    """Greedy downbeat mask [B, N] bool for compacted ascending ``times``."""
    b, n = times.shape
    bp = -(-b // ROWS) * ROWS
    if bp != b:
        times = jnp.pad(times, ((0, bp - b), (0, 0)))
        n_beats = jnp.pad(n_beats, (0, bp - b))
        bar = jnp.pad(bar, (0, bp - b), constant_values=1.0)
    out = pl.pallas_call(
        _downbeat_kernel,
        grid=(bp // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, n), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bp,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((bp,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, n), lambda i: (i, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), jnp.int32),
        interpret=interpret,
    )(times, n_beats.astype(jnp.int32), bar.astype(jnp.float32))
    return out[:b].astype(bool)
