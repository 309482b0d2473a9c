"""Time-block ("sequence parallel") sharding of the spectral frontend.

The analogue of context parallelism for this workload (SURVEY §2.3): a long
track's sample axis is sharded into contiguous blocks across a ``time`` mesh
axis. The STFT needs ``frame_size - hop`` samples of right-neighbor context
for the frames that straddle a block boundary (overlap-save), exchanged with
one ``jax.lax.ppermute`` per pass. Each device computes its block's frames
with the SAME streaming reducer as the single-device path; the resulting
per-frame features are tiny (~14 floats/frame vs 2048 samples/hop of audio),
so they are ``all_gather``-ed along the time axis and every device finishes
the (cheap) novelty-conditioning + tempogram stages on the full curve.

The flux-type features need one *previous* frame of spectral context at the
block boundary; each block therefore computes one extra leading frame (its
first frame's predecessor) locally — block starts are aligned to hop
multiples so that frame's samples live at the end of the left block, which
means a second ppermute for ``hop`` left-context samples.

Layout requirements: ``T % (n_time * hop) == 0`` and ``frame_size % hop == 0``
(true for every config the pipeline uses).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import AnalysisConfig
from ..features.period import novelty as nov
from ..ops import masked as masked_ops
from ..ops.stft import DFT_MATMUL_MAX, dft_basis, extract_frames, hann_window, stft_magnitude_chunk


def compute_bpm_spectral_features_sharded(
    samples: jax.Array,
    lengths: jax.Array,
    cfg: AnalysisConfig,
    sample_rate: int,
    frame_size: int,
    hop: int,
    mesh: Mesh,
):
    """Time-sharded equivalent of ``novelty.compute_bpm_spectral_features``.

    ``samples [B, T]`` is sharded ``P('tracks', 'time')``; returns the same
    (features dict, frame_counts, n_frames_padded) as the single-device path,
    with features replicated along ``time`` after the gather.
    """
    b, t = samples.shape
    n_time = mesh.shape["time"]
    assert frame_size % hop == 0, "frame_size must be a hop multiple"
    assert t % (n_time * hop) == 0, (
        f"padded length {t} must be divisible by n_time*hop = {n_time * hop}"
    )
    t_blk = t // n_time
    frames_per_block = t_blk // hop
    halo = frame_size - hop

    reducer, carry_init, band_names = nov.make_bpm_reducer(cfg, sample_rate, frame_size)
    window = hann_window(frame_size)
    # global frame count on the padded grid (frames fully inside T)
    nf_total = (t - frame_size) // hop + 1

    def block_fn(block, lengths_rep):
        # block: [B_loc, T_blk]; lengths replicated over time
        ti = jax.lax.axis_index("time")
        d = jax.lax.axis_size("time")
        # right-context halo: first `halo` samples of the right neighbor
        right_perm = [(i, (i - 1) % d) for i in range(d)]
        recv_right = jax.lax.ppermute(block[:, :halo], "time", right_perm)
        # left-context: last `2*hop` samples of the left neighbor — the flux
        # features carry TWO previous frames of spectral context (stride-2
        # SuperFlux for the derived hop-2H novelty needs frame f-2)
        left_perm = [(i, (i + 1) % d) for i in range(d)]
        recv_left = jax.lax.ppermute(block[:, -2 * hop :], "time", left_perm)

        ext = jnp.concatenate([recv_left, block, recv_right], axis=1)
        # frames of ext start at global sample (ti*t_blk - 2*hop); frame j of
        # ext = global frame (ti*frames_per_block - 2 + j)
        n_ext_frames = frames_per_block + 2
        frames = extract_frames(ext, n_ext_frames, frame_size, hop)
        spec = stft_magnitude_chunk(frames, window)

        first_global = ti * frames_per_block - 2
        fidx = first_global + jnp.arange(n_ext_frames)
        frame_counts_local = jnp.where(
            lengths_rep >= frame_size, (lengths_rep - frame_size) // hop + 1, 0
        )
        fvalid = (fidx[None, :] >= 0) & (fidx[None, :] < frame_counts_local[:, None])
        fvalid = fvalid & (fidx[None, :] < nf_total)
        spec = jnp.where(fvalid[..., None], spec, 0.0)

        bloc = block.shape[0]
        outs, _ = reducer(spec, fidx, fvalid, carry_init(bloc))
        # drop the two leading context frames; they were only flux predecessors
        outs = jax.tree_util.tree_map(lambda x: x[:, 2:], outs)
        # gather features from every time block -> full frame axis
        outs = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, "time", axis=1, tiled=True), outs
        )
        return outs

    specs_in = (P("tracks", "time"), P("tracks"))
    template = {"superflux": 0, "energy": 0, "hfc": 0, "onset_sflux": 0}
    if cfg.enable_tempogram_multi_resolution:
        template["superflux2"] = 0
    if cfg.enable_tempogram_mel_novelty:
        template["mel"] = 0
    out_specs = jax.tree_util.tree_map(lambda _: P("tracks"), template)
    feats = jax.shard_map(
        block_fn, mesh=mesh, in_specs=specs_in, out_specs=out_specs,
        check_vma=False,
    )(samples, lengths)

    frame_counts = jnp.where(
        lengths >= frame_size, (lengths - frame_size) // hop + 1, 0
    ).astype(jnp.int32)
    feats["band_names"] = band_names
    nf_padded = n_time * frames_per_block
    return feats, frame_counts, nf_padded
