"""Minimal spec-correct FLAC encoder (testing only).

There is no FLAC encoder on this system (no libFLAC / ffmpeg / soundfile), so
fixture .flac files for the native decoder's tests are written here. Emits
16-bit streams with correct CRC-8/CRC-16 and exercises the decoder's paths:
CONSTANT, VERBATIM and FIXED(0..2) subframes with partition-order-0 rice
residuals, independent or mid/side stereo. Compression is not the point —
spec validity is.

Format reference: the public FLAC format spec (frame/subframe/rice layout
as implemented by native/flac_decoder.cpp).
"""

from __future__ import annotations

import struct

import numpy as np


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_coded(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | ((n >> shift) & ((1 << (7 - nbytes)) - 1)))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.mean(np.abs(res.astype(np.float64)))) + 1.0
    p = int(max(0, np.ceil(np.log2(mean))))
    return min(p, 14)


def _write_residual(bw: _BitWriter, res: np.ndarray):
    """Partition order 0 rice coding (method 00)."""
    bw.write(0, 2)  # rice, 4-bit params
    bw.write(0, 4)  # partition order 0
    p = _rice_param(res)
    bw.write(p, 4)
    for r in res.tolist():
        z = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        z = (r << 1) if r >= 0 else ((-r) << 1) - 1
        bw.write_unary(z >> p)
        if p:
            bw.write(z & ((1 << p) - 1), p)


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int, kind: str):
    bw.write(0, 1)  # padding
    if kind == "constant":
        bw.write(0b000000, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(int(x[0]), bps)
        return
    if kind == "verbatim":
        bw.write(0b000001, 6)
        bw.write(0, 1)
        for v in x.tolist():
            bw.write(int(v), bps)
        return
    order = int(kind[-1])  # fixed0/1/2
    bw.write(0b001000 | order, 6)
    bw.write(0, 1)
    xi = x.astype(np.int64)
    for v in xi[:order].tolist():
        bw.write(int(v), bps)
    if order == 0:
        res = xi
    elif order == 1:
        res = xi[1:] - xi[:-1]
    else:
        res = xi[2:] - 2 * xi[1:-1] + xi[:-2]
    _write_residual(bw, res)


def write_flac(
    path: str,
    samples: np.ndarray,
    sample_rate: int,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    subframe_cycle=("fixed2", "fixed1", "fixed0", "verbatim", "constant"),
):
    """Write 16-bit FLAC. ``samples``: int16 [N] or [N, channels] (2 max).

    ``subframe_cycle`` picks the subframe type per frame round-robin
    ("constant" falls back to fixed2 unless the block really is constant).
    ``stereo_mode``: "independent" or "mid_side".
    """
    x = np.asarray(samples)
    assert x.dtype == np.int16, "16-bit input only"
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    assert ch in (1, 2)

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max framesize unknown
    # sample rate (20) | channels-1 (3) | bps-1 (5) | total samples (36)
    v = (sample_rate << 44) | ((ch - 1) << 41) | ((16 - 1) << 36) | n
    si += v.to_bytes(8, "big")
    si += b"\x00" * 16  # MD5 unset
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)

    n_frames = -(-n // block_size)
    for fi in range(n_frames):
        blk = x[fi * block_size : (fi + 1) * block_size]
        bs = blk.shape[0]
        hdr = bytearray()
        hdr += bytes([0xFF, 0xF8])  # sync + reserved0 + fixed blocksize
        # blocksize code 0b0111 (16-bit-1 follows), sample rate code 0 (STREAMINFO)
        hdr += bytes([(0b0111 << 4) | 0b0000])
        if ch == 2 and stereo_mode == "mid_side":
            ch_code = 10
        else:
            ch_code = ch - 1
        hdr += bytes([(ch_code << 4) | (0b100 << 1)])  # 16-bit, reserved0
        hdr += _utf8_coded(fi)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))

        bw = _BitWriter()
        kind = subframe_cycle[fi % len(subframe_cycle)]

        def pick(v, k=kind):
            if k == "constant" and not np.all(v == v[0]):
                return "fixed2" if len(v) > 2 else "verbatim"
            if k.startswith("fixed") and len(v) <= int(k[-1]):
                return "verbatim"
            return k

        if ch == 2 and stereo_mode == "mid_side":
            l = blk[:, 0].astype(np.int64)
            r = blk[:, 1].astype(np.int64)
            mid = (l + r) >> 1
            side = l - r
            _write_subframe(bw, mid, 16, pick(mid))
            _write_subframe(bw, side, 17, pick(side))
        else:
            for c in range(ch):
                v = blk[:, c].astype(np.int64)
                _write_subframe(bw, v, 16, pick(v))
        bw.align()
        body = bw.bytes()
        frame = bytes(hdr) + body
        frame += struct.pack(">H", _crc16(frame))
        out += frame

    with open(path, "wb") as f:
        f.write(bytes(out))
