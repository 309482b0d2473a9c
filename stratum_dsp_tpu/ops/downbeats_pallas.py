"""Pallas TPU kernel for greedy downbeat marking.

``detect_downbeats`` (beat_tracking/mod.rs:363-404) is a greedy sequential
walk over the beat list: the first beat is a downbeat, each later beat is one
iff it lands within ±10% of one bar after the last downbeat. Over the final
beat capacity (~4096 slots) the ``lax.scan`` formulation costs ~1 s of XLA
while-loop overhead per batch; here the whole walk is one kernel with the
beat times in SMEM (~10 scalar ops per slot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _downbeat_kernel(times_ref, nbeats_ref, bar_ref, out_ref):
    """One track per grid cell; only that track's row is staged into SMEM
    (a full-batch [B, N] block overflows the 1 MB SMEM at B >= 64)."""
    n_slots = times_ref.shape[1]
    n = nbeats_ref[0]
    bar = bar_ref[0]
    tol = bar * 0.1

    def step(i, carry):
        last_db, any_db = carry
        t = times_ref[0, i]
        ok = i < n
        first = jnp.logical_and(ok, jnp.logical_not(any_db))
        hit = jnp.logical_and(
            jnp.logical_and(ok, any_db), jnp.abs(t - (last_db + bar)) <= tol
        )
        is_db = jnp.logical_or(first, hit)
        out_ref[0, i] = is_db.astype(jnp.int32)
        last_db = jnp.where(is_db, t, last_db)
        any_db = jnp.logical_or(any_db, is_db)
        return last_db, any_db

    jax.lax.fori_loop(0, n_slots, step, (jnp.float32(0.0), False))


@functools.partial(jax.jit, static_argnums=(3,))
def downbeat_mask(
    times: jax.Array, n_beats: jax.Array, bar: jax.Array, interpret: bool = False
) -> jax.Array:
    """Greedy downbeat mask [B, N] bool for compacted ascending ``times``."""
    b, n = times.shape
    out = pl.pallas_call(
        _downbeat_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        interpret=interpret,
    )(times, n_beats.astype(jnp.int32), bar.astype(jnp.float32))
    return out.astype(bool)
