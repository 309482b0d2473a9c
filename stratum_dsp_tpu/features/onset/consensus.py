"""Onset consensus voting (batched, fixed capacity).

Mirror of reference ``onset/consensus.rs:111-287``. The reference greedily
clusters the time-sorted union of all methods' onsets, joining a cluster when
within tolerance of ANY member. Because onsets arrive sorted and a new cluster
only starts when the gap to every earlier cluster exceeds the tolerance, the
greedy rule reduces exactly to *split the sorted union at gaps > tolerance* —
which is a parallel segmented reduction:

1. merge the 4 methods' fixed-capacity onset lists, sort by sample;
2. cluster boundary where ``pos[i] - pos[i-1] > tol_samples``;
3. cluster id = prefix sum of boundaries; per-cluster segment sums give the
   center (integer mean, consensus.rs:239), total weight (sum over *all*
   member onsets, duplicates included, consensus.rs:245-249), and the
   voted-method count (OR of one-hots);
4. confidence = total_weight / sum(weights) clamped to [0,1].

The orchestrator policy (lib.rs:259-285) — prefer clusters with >=2 voting
methods, fall back to all clusters — is ``consensus_onsets``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

INT_BIG = jnp.iinfo(jnp.int32).max


def vote_onsets(
    method_positions: Sequence[jax.Array],
    method_valids: Sequence[jax.Array],
    weights: Sequence[float],
    tolerance_ms: int,
    sample_rate: int,
):
    """Cluster + vote. Each method contributes ``positions [B, K_m] int32`` /
    ``valid [B, K_m]`` (sorted by time). Returns a dict with fixed capacity
    C = sum(K_m): centers [B, C] int32, confidence [B, C], voted_by [B, C]
    int32, valid [B, C] — clusters ordered by time.
    """
    assert len(method_positions) == len(method_valids) == len(weights)
    n_methods = len(weights)
    b = method_positions[0].shape[0]
    tol = int(tolerance_ms / 1000.0 * sample_rate)

    pos = jnp.concatenate(
        [jnp.where(v, p, INT_BIG) for p, v in zip(method_positions, method_valids)], axis=-1
    )
    w = jnp.concatenate(
        [
            jnp.where(v, jnp.float32(weights[m]), 0.0)
            for m, v in enumerate(method_valids)
        ],
        axis=-1,
    )
    method_id = jnp.concatenate(
        [jnp.full(v.shape, m, jnp.int32) for m, v in enumerate(method_valids)], axis=-1
    )
    valid = jnp.concatenate(method_valids, axis=-1)

    c = pos.shape[-1]
    order = jnp.argsort(pos, axis=-1)
    pos = jnp.take_along_axis(pos, order, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    method_id = jnp.take_along_axis(method_id, order, axis=-1)
    valid = jnp.take_along_axis(valid, order, axis=-1)

    prev = jnp.concatenate([jnp.full((b, 1), -(2**30), pos.dtype), pos[:, :-1]], axis=-1)
    boundary = ((pos - prev) > tol) | (jnp.arange(c) == 0)
    seg = jnp.cumsum(boundary.astype(jnp.int32), axis=-1) - 1  # [B, C] cluster ids
    # entry's offset from its cluster's first onset (small, overflow-safe)
    seg_first_entry = jax.lax.cummax(jnp.where(boundary, pos, -(2**30)), axis=1)
    rel = pos - seg_first_entry

    def seg_sum(vals, ids):
        return jax.vmap(lambda v, i: jax.ops.segment_sum(v, i, num_segments=c))(vals, ids)

    # Invalid entries (pos = INT_BIG, sorted last) contribute zero to every
    # reduction below, so their trailing segments read as empty clusters.
    ones = valid.astype(jnp.int32)
    counts = seg_sum(ones, seg)
    rel_sum = seg_sum(jnp.where(valid, rel, 0), seg)
    seg_first = seg_sum(jnp.where(boundary & valid, pos, 0), seg)
    w_sum = seg_sum(jnp.where(valid, w, 0.0), seg)
    onehots = jax.nn.one_hot(method_id, n_methods, dtype=jnp.int32) * ones[..., None]
    voted = jnp.stack(
        [seg_sum(onehots[..., m], seg) for m in range(n_methods)], axis=-1
    )  # [B, C, M] counts per method
    voted_by = jnp.sum(voted > 0, axis=-1).astype(jnp.int32)

    cluster_valid = counts > 0
    # integer mean = first + floor(sum(rel)/count) (consensus.rs:239)
    centers = jnp.where(cluster_valid, seg_first + rel_sum // jnp.maximum(counts, 1), 0)
    max_weight = float(sum(weights))
    confidence = (
        jnp.clip(w_sum / max_weight, 0.0, 1.0) if max_weight > 0 else jnp.zeros_like(w_sum)
    )
    return {
        "centers": centers,
        "confidence": jnp.where(cluster_valid, confidence, 0.0),
        "voted_by": jnp.where(cluster_valid, voted_by, 0),
        "valid": cluster_valid,
    }


def consensus_onsets(
    vote: dict, max_onsets: int
) -> Tuple[jax.Array, jax.Array]:
    """Orchestrator policy (lib.rs:259-285): use clusters with >=2 votes if
    any exist for the track, else all clusters. Returns time-sorted
    ``(positions [B, K], valid [B, K])``."""
    centers, valid, voted_by = vote["centers"], vote["valid"], vote["voted_by"]
    strong = valid & (voted_by >= 2)
    has_strong = jnp.any(strong, axis=-1, keepdims=True)
    chosen = jnp.where(has_strong, strong, valid)
    key = jnp.where(chosen, centers, INT_BIG)
    s = jnp.sort(key, axis=-1)[:, :max_onsets]
    return jnp.where(s == INT_BIG, 0, s), s != INT_BIG
