#!/usr/bin/env python
"""Write the synthetic WAV fixture set to tests/fixtures/ (mirror of
reference ``scripts/generate_fixtures.py``): 120/128 BPM kick patterns, the
C-major scale, and the silence sandwich — stdlib-only (wave + numpy)."""

import sys
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stratum_dsp_tpu.testing import (  # noqa: E402
    SAMPLE_RATE,
    c_major_scale,
    kick_pattern,
    silence_sandwich,
)

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def write_wav(path: Path, samples: np.ndarray) -> None:
    pcm = (np.clip(samples, -1.0, 1.0) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SAMPLE_RATE)
        w.writeframes(pcm.tobytes())
    print(f"  wrote {path} ({len(samples) / SAMPLE_RATE:.2f}s)")


def main() -> int:
    OUT.mkdir(parents=True, exist_ok=True)
    write_wav(OUT / "120bpm_4bar.wav", kick_pattern(120.0, 8.0))
    write_wav(OUT / "128bpm_4bar.wav", kick_pattern(128.0, 7.5))
    write_wav(OUT / "cmajor_scale.wav", c_major_scale())
    write_wav(OUT / "mixed_silence.wav", silence_sandwich(5.0, 5.0))
    return 0


if __name__ == "__main__":
    sys.exit(main())
