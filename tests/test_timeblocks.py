"""Time-block sharded spectral frontend == single-device frontend."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from stratum_dsp_tpu.config import AnalysisConfig
from stratum_dsp_tpu.features.period import novelty as nov
from stratum_dsp_tpu.parallel.timeblocks import compute_bpm_spectral_features_sharded
from stratum_dsp_tpu.testing import SAMPLE_RATE, kick_pattern, pad_batch

CFG = AnalysisConfig()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_features_match_unsharded():
    frame, hop = CFG.frame_size, CFG.hop_size
    n_time = 4
    tracks = [kick_pattern(120.0, 3.0), kick_pattern(132.0, 2.4)]
    # pad to a multiple of n_time*hop
    t = max(len(x) for x in tracks)
    t = ((t + n_time * hop - 1) // (n_time * hop)) * (n_time * hop)
    samples, lengths = pad_batch(tracks, pad_to=t)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("tracks", "time"))
    feats_sh, fc_sh, _ = compute_bpm_spectral_features_sharded(
        jnp.asarray(samples), jnp.asarray(lengths), CFG, SAMPLE_RATE, frame, hop, mesh
    )
    feats_ref, fc_ref, _ = nov.compute_bpm_spectral_features(
        jnp.asarray(samples), jnp.asarray(lengths), CFG, SAMPLE_RATE, frame, hop
    )
    np.testing.assert_array_equal(np.asarray(fc_sh), np.asarray(fc_ref))

    for name in ("superflux", "energy", "hfc", "onset_sflux", "mel"):
        if name not in feats_ref:
            continue
        a = np.asarray(feats_sh[name])
        b = np.asarray(feats_ref[name])
        nf = min(a.shape[1], b.shape[1])
        # compare only valid frames per track
        for bi in range(len(tracks)):
            n = int(fc_ref[bi])
            np.testing.assert_allclose(
                a[bi, :n], b[bi, :n], rtol=2e-4, atol=2e-4,
                err_msg=f"{name} mismatch (track {bi})",
            )
