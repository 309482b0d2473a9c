from .synth import (
    SAMPLE_RATE,
    kick_pattern,
    kick_pattern_device,
    c_major_scale,
    silence_sandwich,
    click_track,
    pad_batch,
)
