"""Pallas TPU kernel for the 5-state HMM Viterbi decode.

The beat tracker's Viterbi (hmm.rs:308-375) is a sequential DP over up to
~1000 beat frames with a tiny banded state space (5 tempo states, transitions
0.7 self / 0.15 adjacent). As a ``lax.scan`` this costs ~1000 sequential XLA
loop iterations of [B, 5, 5] work; as a Pallas kernel the whole decode runs
in one kernel launch with the probabilities in SMEM scalars — the 13 nonzero
transition products per step are fully unrolled at trace time (the transition
matrix is a compile-time constant), so each timestep is ~50 scalar ops.

Emissions are state-independent in the reference (its per-state tempo is
computed but unused, hmm.rs:268-270), so the kernel takes ``emissions
[B, T]`` and returns the decoded state sequence ``[B, T] int32``. The decoded
path only affects the reported states — beat extraction does not depend on
it — so bit-level tie behavior (first-index argmax, strict-> comparisons,
f32 multiplicative underflow) mirrors hmm.rs exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_STATES = 5


def _transition_matrix() -> np.ndarray:
    i = np.arange(NUM_STATES)[:, None]
    j = np.arange(NUM_STATES)[None, :]
    d = np.abs(i - j)
    m = np.where(d == 0, 0.7, np.where(d == 1, 0.15, 0.0)).astype(np.float32)
    return m / m.sum(axis=1, keepdims=True)


def _viterbi_kernel(em_ref, states_ref, v_scratch, bp_scratch):
    """One track per grid cell. em_ref [1, T, 1] f32 VMEM; states_ref [1, T]
    int32 SMEM out (blocked per row — a full-batch SMEM block overflows the
    1 MB SMEM at large B); v_scratch SMEM (NUM_STATES,); bp_scratch SMEM
    [T, NUM_STATES] int32."""
    t_total = em_ref.shape[1]
    trans = _transition_matrix()  # python constant -> unrolled

    # init: uniform prior * first emission (hmm.rs:330-334)
    em0 = em_ref[0, 0, 0]
    for s in range(NUM_STATES):
        v_scratch[s] = (1.0 / NUM_STATES) * em0

    def step(t, _):
        em_t = em_ref[0, t, 0]
        prev = [v_scratch[s] for s in range(NUM_STATES)]
        for s in range(NUM_STATES):
            best_prob = jnp.float32(0.0)
            best_prev = jnp.int32(0)
            for p in range(NUM_STATES):
                w = float(trans[p, s])
                if w == 0.0:
                    continue
                prob = prev[p] * w
                take = prob > best_prob
                best_prob = jnp.where(take, prob, best_prob)
                best_prev = jnp.where(take, jnp.int32(p), best_prev)
            bp_scratch[t, s] = best_prev
            v_scratch[s] = best_prob * em_t
        return 0

    jax.lax.fori_loop(1, t_total, step, 0)

    # final state = argmax (first max on ties, hmm.rs:352-361)
    best = v_scratch[0]
    best_s = jnp.int32(0)
    for s in range(1, NUM_STATES):
        take = v_scratch[s] > best
        best = jnp.where(take, v_scratch[s], best)
        best_s = jnp.where(take, jnp.int32(s), best_s)
    states_ref[0, t_total - 1] = best_s

    def back(i, cur):
        t = t_total - 1 - i  # t from T-1 down to 1
        nxt = jnp.int32(0)
        for s in range(NUM_STATES):
            nxt = jnp.where(cur == s, bp_scratch[t, s], nxt)
        states_ref[0, t - 1] = nxt
        return nxt

    jax.lax.fori_loop(0, t_total - 1, back, best_s)


@functools.partial(jax.jit, static_argnums=(1,))
def viterbi_decode(emissions: jax.Array, interpret: bool = False) -> jax.Array:
    """Decode states [B, T] int32 from state-independent emissions [B, T]."""
    b, t = emissions.shape
    em = emissions[..., None]  # [B, T, 1]
    return pl.pallas_call(
        _viterbi_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t), lambda i: (i, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, t), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((NUM_STATES,), jnp.float32),
            pltpu.SMEM((t, NUM_STATES), jnp.int32),
        ],
        interpret=interpret,
    )(em)
