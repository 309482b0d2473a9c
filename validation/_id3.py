"""Minimal ID3v2.3/2.4 text-frame reader (mirror of reference
``validation/_id3.py``): extracts TBPM / TKEY / TXXX frames from MP3 files
without external dependencies.
"""

from __future__ import annotations

import struct
from typing import Dict, Optional


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _decode_text(data: bytes) -> str:
    if not data:
        return ""
    enc = data[0]
    body = data[1:]
    try:
        if enc == 0:
            return body.decode("latin-1").strip("\x00").strip()
        if enc == 1:
            return body.decode("utf-16").strip("\x00").strip()
        if enc == 2:
            return body.decode("utf-16-be").strip("\x00").strip()
        return body.decode("utf-8").strip("\x00").strip()
    except UnicodeDecodeError:
        return ""


def read_id3_text_frames(path: str) -> Dict[str, str]:
    """Return {frame_id_or_TXXX_desc: text} for the text frames present."""
    out: Dict[str, str] = {}
    try:
        with open(path, "rb") as f:
            header = f.read(10)
            if len(header) < 10 or header[:3] != b"ID3":
                return out
            version = header[3]
            size = _syncsafe(header[6:10])
            body = f.read(size)
    except OSError:
        return out

    pos = 0
    while pos + 10 <= len(body):
        frame_id = body[pos : pos + 4]
        if not frame_id.strip(b"\x00"):
            break
        if version >= 4:
            frame_size = _syncsafe(body[pos + 4 : pos + 8])
        else:
            frame_size = struct.unpack(">I", body[pos + 4 : pos + 8])[0]
        if frame_size <= 0 or pos + 10 + frame_size > len(body):
            break
        data = body[pos + 10 : pos + 10 + frame_size]
        fid = frame_id.decode("latin-1", "replace")
        if fid.startswith("T") and fid != "TXXX":
            out[fid] = _decode_text(data)
        elif fid == "TXXX" and data:
            txt = _decode_text(data)
            if "\x00" in txt:
                desc, val = txt.split("\x00", 1)
                out[f"TXXX:{desc}"] = val
        pos += 10 + frame_size
    return out


def read_tag_bpm_key(path: str) -> tuple[Optional[float], Optional[str]]:
    frames = read_id3_text_frames(path)
    bpm = None
    raw = frames.get("TBPM") or frames.get("TXXX:BPM")
    if raw:
        try:
            bpm = float(raw)
        except ValueError:
            bpm = None
    key = frames.get("TKEY") or frames.get("TXXX:INITIALKEY") or frames.get("TXXX:KEY")
    return bpm, key
