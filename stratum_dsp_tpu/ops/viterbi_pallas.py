"""Pallas TPU kernel for the 5-state HMM Viterbi decode.

The beat tracker's Viterbi (hmm.rs:308-375) is a sequential DP over up to
~1000 beat frames with a tiny banded state space (5 tempo states, transitions
0.7 self / 0.15 adjacent). As a ``lax.scan`` this costs ~1000 sequential XLA
loop iterations of [B, 5, 5] work; as a Pallas kernel the whole decode runs
in one kernel launch with the probabilities in SMEM scalars — the 13 nonzero
transition products per step are fully unrolled at trace time (the transition
matrix is a compile-time constant).

Blocking: TPU requires SMEM block rows divisible by 8 (and a full-batch SMEM
block would overflow the 1 MB SMEM at large B), so each grid cell decodes 8
tracks with the per-timestep state update interleaved across rows for ILP.
The wrapper pads B to a multiple of 8.

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
ROWS = 8


def _transition_matrix() -> np.ndarray:
    i = np.arange(NUM_STATES)[:, None]
    j = np.arange(NUM_STATES)[None, :]
    d = np.abs(i - j)
    m = np.where(d == 0, 0.7, np.where(d == 1, 0.15, 0.0)).astype(np.float32)
    return m / m.sum(axis=1, keepdims=True)


def _viterbi_kernel(em_ref, states_ref, v_scratch, bp_scratch):
    """8 tracks per grid cell. em_ref [ROWS, T, 1] f32 VMEM; states_ref
    [ROWS, T] int32 SMEM; v_scratch SMEM [ROWS, NUM_STATES] f32; bp_scratch
    SMEM [ROWS, T, NUM_STATES] int32."""
    t_total = em_ref.shape[1]
    trans = _transition_matrix()  # python constant -> unrolled

    # init: uniform prior * first emission (hmm.rs:330-334)
    for r in range(ROWS):
        em0 = em_ref[r, 0, 0]
        for s in range(NUM_STATES):
            v_scratch[r, s] = (1.0 / NUM_STATES) * em0

    def step(t, _):
        for r in range(ROWS):
            em_t = em_ref[r, t, 0]
            prev = [v_scratch[r, s] for s in range(NUM_STATES)]
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
                bp_scratch[r, t, s] = best_prev
                v_scratch[r, s] = best_prob * em_t
        return 0

    jax.lax.fori_loop(1, t_total, step, 0)

    # final state = argmax (first max on ties, hmm.rs:352-361); then backtrack
    finals = []
    for r in range(ROWS):
        best = v_scratch[r, 0]
        best_s = jnp.int32(0)
        for s in range(1, NUM_STATES):
            take = v_scratch[r, s] > best
            best = jnp.where(take, v_scratch[r, s], best)
            best_s = jnp.where(take, jnp.int32(s), best_s)
        states_ref[r, t_total - 1] = best_s
        finals.append(best_s)

    def back(i, carry):
        t = t_total - 1 - i  # t from T-1 down to 1
        out = []
        for r in range(ROWS):
            cur = carry[r]
            nxt = jnp.int32(0)
            for s in range(NUM_STATES):
                nxt = jnp.where(cur == s, bp_scratch[r, t, s], nxt)
            states_ref[r, t - 1] = nxt
            out.append(nxt)
        return tuple(out)

    jax.lax.fori_loop(0, t_total - 1, back, tuple(finals))


@functools.partial(jax.jit, static_argnums=(1,))
def viterbi_decode(emissions: jax.Array, interpret: bool = False) -> jax.Array:
    """Decode states [B, T] int32 from state-independent emissions [B, T]."""
    b, t = emissions.shape
    bp = -(-b // ROWS) * ROWS
    if bp != b:
        emissions = jnp.pad(emissions, ((0, bp - b), (0, 0)))
    em = emissions[..., None]  # [B, T, 1]
    out = pl.pallas_call(
        _viterbi_kernel,
        grid=(bp // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, t, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((ROWS, t), lambda i: (i, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((bp, t), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((ROWS, NUM_STATES), jnp.float32),
            pltpu.SMEM((ROWS, t, NUM_STATES), jnp.int32),
        ],
        interpret=interpret,
    )(em)
    return out[:b]
