"""Key-name normalization (mirror of reference ``validation/_keys.py``):
parse musical and Camelot notations into a canonical (tonic, is_major) pair.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path
from typing import Optional, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stratum_dsp_tpu.result import Key  # noqa: E402

NOTE_TO_PC = {
    "C": 0, "C#": 1, "DB": 1, "D": 2, "D#": 3, "EB": 3, "E": 4, "FB": 4,
    "E#": 5, "F": 5, "F#": 6, "GB": 6, "G": 7, "G#": 8, "AB": 8, "A": 9,
    "A#": 10, "BB": 10, "B": 11, "CB": 11,
}

_CAMELOT_RE = re.compile(r"^([0-9]{1,2})\s*([ABab])$")
_NAME_RE = re.compile(r"^([A-Ga-g][#bB]?)\s*(maj(?:or)?|min(?:or)?|m)?$")


def parse_key(text: str) -> Optional[Key]:
    """Parse 'Am', 'A min', 'F# major', '8A', '11B', etc."""
    if not text:
        return None
    t = text.strip()
    m = _CAMELOT_RE.match(t)
    if m:
        return Key.from_numerical(f"{int(m.group(1))}{m.group(2).upper()}")
    m = _NAME_RE.match(t)
    if not m:
        return None
    note = m.group(1).upper().replace("B", "b") if len(m.group(1)) > 1 else m.group(1).upper()
    note = note.upper()
    pc = NOTE_TO_PC.get(note)
    if pc is None:
        return None
    mode = (m.group(2) or "").lower()
    is_major = mode in ("", "maj", "major")
    if mode in ("m", "min", "minor"):
        is_major = False
    return Key(pc, is_major)


def keys_equal(a: Optional[Key], b: Optional[Key]) -> bool:
    return a is not None and b is not None and a.tonic == b.tonic and a.is_major == b.is_major
