"""Stereo to mono mixdown (reference ``preprocessing/channel_mixer.rs:80-144``).

Like the reference, this is not wired into ``analyze_audio`` — callers pre-mix
(the CLI decodes and mixes). Provided for API parity.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class ChannelMixMode(enum.Enum):
    MONO = "mono"  # (L+R)/2
    MID_SIDE = "mid_side"  # mid channel = (L+R)/2
    CENTER = "center"  # (L+R)/2
    DOMINANT = "dominant"  # louder channel per sample


def stereo_to_mono(left, right, mode: ChannelMixMode = ChannelMixMode.MONO):
    """Mix stereo ``[..., T]`` pairs down to mono.

    Mono/MidSide/Center are all (L+R)/2 in the reference
    (channel_mixer.rs:104-130); Dominant picks the louder channel per sample
    (channel_mixer.rs:132-144).
    """
    left = jnp.asarray(left)
    right = jnp.asarray(right)
    if mode == ChannelMixMode.DOMINANT:
        return jnp.where(jnp.abs(left) >= jnp.abs(right), left, right)
    return 0.5 * (left + right)
