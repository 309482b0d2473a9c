// From-scratch FLAC decoder (no libFLAC on this system; the reference gets
// FLAC for free from symphonia, examples/analyze_file.rs:25-180).
//
// Implements the full frame-level format: STREAMINFO metadata, frame headers
// (all blocksize/samplerate/samplesize codes, UTF-8 frame numbers), subframe
// types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), wasted bits, rice and
// rice2 partitioned residuals with escape codes, and all four stereo modes
// (independent, left/side, right/side, mid/side). 8/12/16/20/24/32-bit
// streams. CRCs are parsed but not verified (analysis inputs are trusted
// files; a bit error surfaces as a parse failure at the next frame anyway).
//
// Exposes flac_decode_buffer() consumed by stratum_audio.cpp's decode_any.

#include <cstdint>
#include <cstring>
#include <vector>

namespace flac {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte = 0;
  int bit = 0;  // bits consumed in current byte (0..7), MSB first
  bool error = false;

  BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool eof() const { return byte >= size; }

  uint32_t read_bits(int n) {  // n <= 32
    uint32_t v = 0;
    while (n > 0) {
      if (byte >= size) {
        error = true;
        return 0;
      }
      int avail = 8 - bit;
      int take = n < avail ? n : avail;
      int shift = avail - take;
      v = (v << take) | ((data[byte] >> shift) & ((1u << take) - 1));
      bit += take;
      n -= take;
      if (bit == 8) {
        bit = 0;
        byte++;
      }
    }
    return v;
  }

  uint64_t read_bits64(int n) {
    uint64_t v = 0;
    if (n > 32) {
      v = read_bits(n - 32);
      v = (v << 32) | read_bits(32);
    } else {
      v = read_bits(n);
    }
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits64(n);
    // sign-extend
    if (n > 0 && (v >> (n - 1)) & 1) v |= ~((uint64_t(1) << n) - 1);
    return static_cast<int64_t>(v);
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    for (;;) {
      if (byte >= size) {
        error = true;
        return q;
      }
      // fast path: whole remaining byte is zeros
      uint8_t rest = data[byte] & ((1u << (8 - bit)) - 1);
      if (rest == 0) {
        q += 8 - bit;
        bit = 0;
        byte++;
        continue;
      }
      // find highest set bit within the remaining bits
      int pos = 7 - bit;
      while (!((rest >> pos) & 1)) {
        pos--;
        q++;
      }
      bit = 8 - pos;
      if (bit == 8) {
        bit = 0;
        byte++;
      }
      return q;
    }
  }

  void align_byte() {
    if (bit != 0) {
      bit = 0;
      byte++;
    }
  }
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bits_per_sample = 0;
  uint64_t total_samples = 0;
};

// UTF-8-style coded number in frame headers (up to 36 bits / 7 bytes).
bool read_coded_number(BitReader& br, uint64_t* out) {
  uint32_t b0 = br.read_bits(8);
  if (br.error) return false;
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) {
    *out = b0;
    return true;
  } else if ((b0 & 0xE0) == 0xC0) {
    extra = 1;
    v = b0 & 0x1F;
  } else if ((b0 & 0xF0) == 0xE0) {
    extra = 2;
    v = b0 & 0x0F;
  } else if ((b0 & 0xF8) == 0xF0) {
    extra = 3;
    v = b0 & 0x07;
  } else if ((b0 & 0xFC) == 0xF8) {
    extra = 4;
    v = b0 & 0x03;
  } else if ((b0 & 0xFE) == 0xFC) {
    extra = 5;
    v = b0 & 0x01;
  } else if (b0 == 0xFE) {
    extra = 6;
    v = 0;
  } else {
    return false;
  }
  for (int i = 0; i < extra; i++) {
    uint32_t b = br.read_bits(8);
    if (br.error || (b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

// Decode one subframe into out[0..blocksize); bps includes the +1 for side
// channels. Returns false on parse error.
bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& out) {
  if (br.read_bits(1) != 0) return false;  // padding bit must be 0
  uint32_t type = br.read_bits(6);
  int wasted = 0;
  if (br.read_bits(1)) wasted = 1 + br.read_unary();
  if (br.error) return false;
  int ebps = bps - wasted;
  if (ebps <= 0 || ebps > 33) return false;

  out.resize(blocksize);
  int order = -1;
  bool is_lpc = false;
  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(ebps);
    for (int i = 0; i < blocksize; i++) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; i++) out[i] = br.read_signed(ebps);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
    order = type & 0x07;
  } else if (type & 0x20) {  // LPC
    order = (type & 0x1F) + 1;
    is_lpc = true;
  } else {
    return false;
  }

  if (order >= 0) {
    for (int i = 0; i < order; i++) out[i] = br.read_signed(ebps);

    int shift = 0;
    int precision = 0;
    int32_t coefs[32];
    if (is_lpc) {
      precision = br.read_bits(4);
      if (precision == 15 || br.error) return false;
      precision += 1;
      shift = static_cast<int>(br.read_signed(5));
      if (shift < 0) return false;
      for (int i = 0; i < order; i++)
        coefs[i] = static_cast<int32_t>(br.read_signed(precision));
    }

    // partitioned rice residual
    uint32_t method = br.read_bits(2);
    if (method > 1 || br.error) return false;
    int plen = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    int porder = br.read_bits(4);
    int nparts = 1 << porder;
    if (blocksize % nparts != 0) return false;
    int psize = blocksize >> porder;
    if (psize <= 0 || (nparts == 1 && psize < order)) return false;

    int idx = order;
    for (int p = 0; p < nparts; p++) {
      int count = psize - (p == 0 ? order : 0);
      if (count < 0) return false;
      uint32_t param = br.read_bits(plen);
      if (param == escape) {
        int raw = br.read_bits(5);
        for (int i = 0; i < count; i++)
          out[idx++] = raw ? br.read_signed(raw) : 0;
      } else {
        for (int i = 0; i < count; i++) {
          uint32_t q = br.read_unary();
          uint32_t r = param ? br.read_bits(param) : 0;
          uint64_t z = (uint64_t(q) << param) | r;
          out[idx++] = static_cast<int64_t>(z >> 1) ^ -static_cast<int64_t>(z & 1);
        }
      }
      if (br.error) return false;
    }

    // apply predictor in place
    if (is_lpc) {
      for (int i = order; i < blocksize; i++) {
        int64_t acc = 0;
        for (int j = 0; j < order; j++) acc += int64_t(coefs[j]) * out[i - 1 - j];
        out[i] += acc >> shift;
      }
    } else {
      switch (order) {
        case 0:
          break;
        case 1:
          for (int i = 1; i < blocksize; i++) out[i] += out[i - 1];
          break;
        case 2:
          for (int i = 2; i < blocksize; i++)
            out[i] += 2 * out[i - 1] - out[i - 2];
          break;
        case 3:
          for (int i = 3; i < blocksize; i++)
            out[i] += 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
          break;
        case 4:
          for (int i = 4; i < blocksize; i++)
            out[i] += 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4];
          break;
      }
    }
  }

  if (wasted > 0)
    for (int i = 0; i < blocksize; i++) out[i] <<= wasted;
  return !br.error;
}

}  // namespace flac

// Decode a whole FLAC file buffer to interleaved f32 in [-1, 1].
// Returns 0 on success; 2 = not FLAC / corrupt; 3 = unsupported.
int flac_decode_buffer(const uint8_t* buf, size_t size,
                       std::vector<float>* interleaved, int* channels_out,
                       int* sample_rate_out) {
  using namespace flac;
  if (size < 8 || std::memcmp(buf, "fLaC", 4) != 0) return 2;

  StreamInfo si;
  size_t off = 4;
  bool last = false;
  bool have_si = false;
  while (!last && off + 4 <= size) {
    uint8_t hdr = buf[off];
    last = hdr & 0x80;
    int btype = hdr & 0x7F;
    uint32_t blen = (uint32_t(buf[off + 1]) << 16) | (uint32_t(buf[off + 2]) << 8) |
                    buf[off + 3];
    off += 4;
    if (off + blen > size) return 2;
    if (btype == 0 && blen >= 34) {
      const uint8_t* p = buf + off;
      si.sample_rate = (uint32_t(p[10]) << 12) | (uint32_t(p[11]) << 4) | (p[12] >> 4);
      si.channels = ((p[12] >> 1) & 0x7) + 1;
      si.bits_per_sample = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      si.total_samples = (uint64_t(p[13] & 0x0F) << 32) | (uint64_t(p[14]) << 24) |
                         (uint64_t(p[15]) << 16) | (uint64_t(p[16]) << 8) | p[17];
      have_si = true;
    }
    off += blen;
  }
  if (!have_si || si.sample_rate == 0 || si.channels == 0) return 2;
  if (si.channels > 8) return 3;

  BitReader br(buf, size);
  br.byte = off;
  interleaved->clear();
  if (si.total_samples)
    interleaved->reserve(si.total_samples * si.channels);

  std::vector<int64_t> ch[8];
  const double scale = 1.0 / (double(1u << (si.bits_per_sample - 1)));

  static const int kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, -1, -2,
                                      256, 512,  1024, 2048, 4096, 8192, 16384, 32768};

  while (true) {
    br.align_byte();
    if (br.byte >= size) break;
    // frame sync: 14 bits 0b11111111111110
    uint32_t sync = br.read_bits(14);
    if (br.error) break;  // clean EOF
    if (sync != 0x3FFE) return 2;
    br.read_bits(1);  // reserved
    br.read_bits(1);  // blocking strategy
    uint32_t bs_code = br.read_bits(4);
    uint32_t sr_code = br.read_bits(4);
    uint32_t ch_code = br.read_bits(4);
    uint32_t ss_code = br.read_bits(3);
    br.read_bits(1);  // reserved
    uint64_t frame_no;
    if (!read_coded_number(br, &frame_no)) return 2;

    int blocksize;
    if (bs_code == 0) return 2;
    else if (kBlockSizes[bs_code] == -1) blocksize = br.read_bits(8) + 1;
    else if (kBlockSizes[bs_code] == -2) blocksize = br.read_bits(16) + 1;
    else blocksize = kBlockSizes[bs_code];

    if (sr_code == 12) br.read_bits(8);        // kHz
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
    else if (sr_code == 15) return 2;

    int bps = si.bits_per_sample;
    switch (ss_code) {
      case 0: break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return 2;
    }
    br.read_bits(8);  // CRC-8 (not verified)
    if (br.error) return 2;

    int nch;
    int mode = 0;  // 0 independent, 1 L/S, 2 R/S, 3 M/S
    if (ch_code < 8) {
      nch = ch_code + 1;
    } else if (ch_code <= 10) {
      nch = 2;
      mode = ch_code - 7;
    } else {
      return 3;
    }
    if (nch != si.channels) return 2;

    for (int c = 0; c < nch; c++) {
      int sub_bps = bps;
      if ((mode == 1 && c == 1) || (mode == 2 && c == 0) || (mode == 3 && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!decode_subframe(br, blocksize, sub_bps, ch[c])) return 2;
    }
    br.align_byte();
    br.read_bits(16);  // CRC-16 (not verified)
    if (br.error) return 2;

    // undo stereo decorrelation
    if (mode == 1) {  // left/side: R = L - S
      for (int i = 0; i < blocksize; i++) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (mode == 2) {  // right/side: L = R + S ; ch0=side, ch1=right
      for (int i = 0; i < blocksize; i++) {
        int64_t side = ch[0][i];
        ch[0][i] = ch[1][i] + side;
      }
    } else if (mode == 3) {  // mid/side
      for (int i = 0; i < blocksize; i++) {
        int64_t mid = ch[0][i], side = ch[1][i];
        mid = (mid << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    size_t base = interleaved->size();
    interleaved->resize(base + size_t(blocksize) * nch);
    for (int i = 0; i < blocksize; i++)
      for (int c = 0; c < nch; c++)
        (*interleaved)[base + size_t(i) * nch + c] =
            static_cast<float>(ch[c][i] * scale);

    if (si.total_samples &&
        interleaved->size() >= si.total_samples * si.channels)
      break;
  }

  if (interleaved->empty()) return 2;
  *channels_out = si.channels;
  *sample_rate_out = static_cast<int>(si.sample_rate);
  return 0;
}
