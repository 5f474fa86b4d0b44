// flac_tpu native runtime: the host-side hot paths of the codec.
//
// TPU-native counterpart of the reference's C runtime around the DSP:
//   - MD5 accumulate with channel interleave (src/libFLAC/md5.c:388-520):
//     fuses the [C,N] int32 -> little-endian bytes/sample interleave with
//     the hash so no intermediate buffer is materialized.
//   - frame-sync scan (src/libFLAC/stream_decoder.c:2321 frame_sync_ +
//     read_frame_header_ :2624): finds byte-aligned 0xFFF8 sync codes,
//     CRC-8-verifies headers, applies the sequential-number invariant.
//   - CRC-8 / CRC-16 (src/libFLAC/crc.c) for host-side verification.
//   - ordered frame gather: slices the device's padded per-frame word
//     buffers into one contiguous byte stream (the host half of the
//     encoder's ordered bitbuffer drain, stream_encoder.c:3614-3626).
//
// Built as a plain shared library; bound from Python with ctypes.

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// CRC-8 (poly x^8+x^2+x+1 = 0x07) and CRC-16 (poly 0x8005), MSB-first
// ---------------------------------------------------------------------------

static uint8_t CRC8_TABLE[256];
static uint16_t CRC16_TABLE[256];
static bool tables_ready = false;

static void init_tables() {
  if (tables_ready) return;
  for (int i = 0; i < 256; i++) {
    uint8_t c8 = (uint8_t)i;
    uint16_t c16 = (uint16_t)(i << 8);
    for (int b = 0; b < 8; b++) {
      c8 = (uint8_t)((c8 << 1) ^ ((c8 & 0x80) ? 0x07 : 0));
      c16 = (uint16_t)((c16 << 1) ^ ((c16 & 0x8000) ? 0x8005 : 0));
    }
    CRC8_TABLE[i] = c8;
    CRC16_TABLE[i] = c16;
  }
  tables_ready = true;
}

uint8_t ft_crc8(const uint8_t* data, int64_t len) {
  init_tables();
  uint8_t crc = 0;
  for (int64_t i = 0; i < len; i++) crc = CRC8_TABLE[crc ^ data[i]];
  return crc;
}

uint16_t ft_crc16(const uint8_t* data, int64_t len, uint16_t crc) {
  init_tables();
  for (int64_t i = 0; i < len; i++)
    crc = (uint16_t)((crc << 8) ^ CRC16_TABLE[(crc >> 8) ^ data[i]]);
  return crc;
}

// ---------------------------------------------------------------------------
// MD5 (RFC 1321) with fused PCM interleave
// ---------------------------------------------------------------------------

typedef struct {
  uint32_t h[4];
  uint64_t nbytes;
  uint8_t buf[64];
  uint32_t buflen;
} MD5Ctx;

static inline uint32_t rol32(uint32_t x, int c) {
  return (x << c) | (x >> (32 - c));
}

static const uint32_t MD5_K[64] = {
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf, 0x4787c62a,
    0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821, 0xf61e2562, 0xc040b340,
    0x265e5a51, 0xe9b6c7aa, 0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
    0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70, 0x289b7ec6, 0xeaa127fa,
    0xd4ef3085, 0x04881d05, 0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92,
    0xffeff47d, 0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391};
static const int MD5_R[64] = {7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
                              7, 12, 17, 22, 5, 9,  14, 20, 5, 9,  14, 20,
                              5, 9,  14, 20, 5, 9,  14, 20, 4, 11, 16, 23,
                              4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
                              6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21,
                              6, 10, 15, 21};

static void md5_block(MD5Ctx* c, const uint8_t* p) {
  uint32_t m[16];
  for (int i = 0; i < 16; i++)
    m[i] = (uint32_t)p[4 * i] | ((uint32_t)p[4 * i + 1] << 8) |
           ((uint32_t)p[4 * i + 2] << 16) | ((uint32_t)p[4 * i + 3] << 24);
  uint32_t a = c->h[0], b = c->h[1], d0 = c->h[2], d1 = c->h[3];
  for (int i = 0; i < 64; i++) {
    uint32_t f;
    int g;
    if (i < 16) {
      f = (b & d0) | (~b & d1);
      g = i;
    } else if (i < 32) {
      f = (d1 & b) | (~d1 & d0);
      g = (5 * i + 1) & 15;
    } else if (i < 48) {
      f = b ^ d0 ^ d1;
      g = (3 * i + 5) & 15;
    } else {
      f = d0 ^ (b | ~d1);
      g = (7 * i) & 15;
    }
    uint32_t tmp = d1;
    d1 = d0;
    d0 = b;
    b = b + rol32(a + f + MD5_K[i] + m[g], MD5_R[i]);
    a = tmp;
  }
  c->h[0] += a;
  c->h[1] += b;
  c->h[2] += d0;
  c->h[3] += d1;
}

void ft_md5_init(MD5Ctx* c) {
  c->h[0] = 0x67452301;
  c->h[1] = 0xefcdab89;
  c->h[2] = 0x98badcfe;
  c->h[3] = 0x10325476;
  c->nbytes = 0;
  c->buflen = 0;
}

void ft_md5_update(MD5Ctx* c, const uint8_t* data, int64_t len) {
  c->nbytes += (uint64_t)len;
  if (c->buflen) {
    int64_t need = 64 - c->buflen;
    if (need > len) need = len;
    memcpy(c->buf + c->buflen, data, (size_t)need);
    c->buflen += (uint32_t)need;
    data += need;
    len -= need;
    if (c->buflen == 64) {
      md5_block(c, c->buf);
      c->buflen = 0;
    }
  }
  while (len >= 64) {
    md5_block(c, data);
    data += 64;
    len -= 64;
  }
  if (len) {
    memcpy(c->buf, data, (size_t)len);
    c->buflen = (uint32_t)len;
  }
}

// Interleave [channels, n] int32 (C-contiguous, channel-major) into the
// FLAC MD5 byte stream: sample-major, little-endian, bytes_per_sample
// bytes each — and hash it in 64 KiB chunks without a full copy.
void ft_md5_update_pcm(MD5Ctx* c, const int32_t* pcm, int64_t channels,
                       int64_t n, int32_t bytes_per_sample) {
  uint8_t chunk[65536];
  const int64_t stride = (int64_t)bytes_per_sample * channels;
  const int64_t per_chunk = (int64_t)(sizeof(chunk)) / stride;
  for (int64_t s0 = 0; s0 < n; s0 += per_chunk) {
    int64_t cnt = n - s0 < per_chunk ? n - s0 : per_chunk;
    uint8_t* w = chunk;
    for (int64_t s = s0; s < s0 + cnt; s++) {
      for (int64_t ch = 0; ch < channels; ch++) {
        uint32_t v = (uint32_t)pcm[ch * n + s];
        for (int b = 0; b < bytes_per_sample; b++) {
          *w++ = (uint8_t)(v & 0xff);
          v >>= 8;
        }
      }
    }
    ft_md5_update(c, chunk, cnt * stride);
  }
}

void ft_md5_final(MD5Ctx* c, uint8_t* out16) {
  uint64_t bits = c->nbytes * 8;
  uint8_t pad = 0x80;
  ft_md5_update(c, &pad, 1);
  uint8_t zero = 0;
  while (c->buflen != 56) ft_md5_update(c, &zero, 1);
  uint8_t lenb[8];
  for (int i = 0; i < 8; i++) lenb[i] = (uint8_t)(bits >> (8 * i));
  // bypass nbytes accounting for the trailer
  uint64_t saved = c->nbytes;
  ft_md5_update(c, lenb, 8);
  c->nbytes = saved;
  for (int i = 0; i < 4; i++)
    for (int b = 0; b < 4; b++) out16[4 * i + b] = (uint8_t)(c->h[i] >> (8 * b));
}

int32_t ft_md5_ctx_size() { return (int32_t)sizeof(MD5Ctx); }

// ---------------------------------------------------------------------------
// Frame-sync scan (stream_decoder.c:2321,2624)
// ---------------------------------------------------------------------------

static const int32_t BLOCKSIZE_TABLE[16] = {0,   192,  576,  1152, 2304, 4608,
                                            -1,  -2,   256,  512,  1024, 2048,
                                            4096, 8192, 16384, 32768};
static const int32_t SAMPLE_RATE_TABLE[16] = {0,     88200, 176400, 192000,
                                              8000,  16000, 22050,  24000,
                                              32000, 44100, 48000,  96000,
                                              -1,    -2,    -3,     0};
static const int32_t BPS_TABLE[8] = {0, 8, 12, 0, 16, 20, 24, 32};

// Decode FLAC's extended-UTF-8 coded number (bitwriter.c:832,879 format).
// Returns value or -1; *nbytes set to consumed length.
static int64_t utf8_decode(const uint8_t* d, int64_t avail, int* nbytes) {
  if (avail < 1) return -1;
  uint8_t b0 = d[0];
  int extra;
  int64_t v;
  if (b0 < 0x80) {
    *nbytes = 1;
    return b0;
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
    return -1;
  }
  if (avail < 1 + extra) return -1;
  for (int i = 1; i <= extra; i++) {
    if ((d[i] & 0xC0) != 0x80) return -1;
    v = (v << 6) | (d[i] & 0x3F);
  }
  *nbytes = 1 + extra;
  return v;
}

// Parse one byte-aligned frame header at data[pos].  Mirrors
// decoder.parse_frame_header / read_frame_header_ (stream_decoder.c:2624).
// Fills out[0..8] = {number, blocksize, sample_rate, channels, assignment,
// bps, variable, header_end_bits, 0}; returns 1 on success.
static int parse_header(const uint8_t* data, int64_t len, int64_t pos,
                        int32_t stream_bps, int64_t stream_rate,
                        int64_t* out) {
  if (pos + 5 > len) return 0;
  if (data[pos] != 0xFF || (data[pos + 1] & 0xFC) != 0xF8) return 0;
  int variable = data[pos + 1] & 1;
  uint8_t b2 = data[pos + 2], b3 = data[pos + 3];
  int bs_code = b2 >> 4, sr_code = b2 & 0xF;
  int ch_code = b3 >> 4, bps_code = (b3 >> 1) & 0x7;
  if (bs_code == 0 || sr_code == 15 || ch_code > 10 || (b3 & 1)) return 0;
  if (bps_code == 3 || (bps_code == 0 && stream_bps == 0)) return 0;
  int nb = 0;
  int64_t number = utf8_decode(data + pos + 4, len - pos - 4, &nb);
  if (number < 0) return 0;
  int64_t p = pos + 4 + nb;
  int64_t blocksize, sample_rate;
  if (bs_code == 6) {
    if (p + 1 > len) return 0;
    blocksize = data[p] + 1;
    p += 1;
  } else if (bs_code == 7) {
    if (p + 2 > len) return 0;
    blocksize = ((int64_t)data[p] << 8 | data[p + 1]) + 1;
    p += 2;
  } else {
    blocksize = BLOCKSIZE_TABLE[bs_code];
  }
  if (sr_code == 12) {
    if (p + 1 > len) return 0;
    sample_rate = (int64_t)data[p] * 1000;
    p += 1;
  } else if (sr_code == 13 || sr_code == 14) {
    if (p + 2 > len) return 0;
    sample_rate = ((int64_t)data[p] << 8 | data[p + 1]);
    if (sr_code == 14) sample_rate *= 10;
    p += 2;
  } else if (sr_code == 0) {
    sample_rate = stream_rate;
  } else {
    sample_rate = SAMPLE_RATE_TABLE[sr_code];
  }
  if (p >= len) return 0;
  if (ft_crc8(data + pos, p - pos) != data[p]) return 0;
  out[0] = number;
  out[1] = blocksize;
  out[2] = sample_rate;
  out[3] = ch_code < 8 ? ch_code + 1 : 2;
  out[4] = ch_code < 8 ? 0 : ch_code - 7;  // CHANNEL_ASSIGNMENT_*
  out[5] = bps_code == 0 ? stream_bps : BPS_TABLE[bps_code];
  out[6] = variable;
  out[7] = (p + 1 - pos) * 8;  // header length in bits
  return 1;
}

// Scan [start, len) for frames.  Fixed-blocksize streams must number
// consecutively (from ANY first value — the reference accepts trimmed
// streams, stream_decoder.c has no number==0 check); variable streams
// chain sample numbers — the same false-sync rejection as
// decoder.scan_frames.  Each accepted frame writes 9 int64s {offset,
// number, blocksize, sample_rate, channels, assignment, bps, variable,
// header_bits} into out.  Returns the frame count.
int64_t ft_scan_frames(const uint8_t* data, int64_t len, int64_t start,
                       int32_t stream_bps, int64_t stream_rate, int64_t* out,
                       int64_t max_frames) {
  init_tables();
  int64_t count = 0;
  int64_t expected = -1;
  int64_t last_off = -1000, last_num = 0, last_bs = 0;
  int64_t hdr[8];
  for (int64_t pos = start; pos + 1 < len && count < max_frames; pos++) {
    if (data[pos] != 0xFF || (data[pos + 1] & 0xFC) != 0xF8) continue;
    if (count && pos < last_off + 10) continue;  // inside minimal frame
    if (!parse_header(data, len, pos, stream_bps, stream_rate, hdr)) continue;
    if (!hdr[6] && count && hdr[0] != expected) continue;
    if (hdr[6] && count && hdr[0] != last_num + last_bs) continue;
    int64_t* o = out + 9 * count;
    o[0] = pos;
    memcpy(o + 1, hdr, 8 * sizeof(int64_t));
    last_off = pos;
    last_num = hdr[0];
    last_bs = hdr[1];
    expected = hdr[0] + 1;
    count++;
    pos += 9;  // skip the minimal frame body (next ++ makes 10)
  }
  return count;
}

// ---------------------------------------------------------------------------
// Ordered frame gather (encoder host assembly)
// ---------------------------------------------------------------------------

// words: [B, W] uint32 big-endian byte view flattened as bytes (B rows of
// 4*W bytes); lens: per-frame byte length.  Concatenates the first lens[i]
// bytes of each row into out.  Returns total bytes written.
int64_t ft_gather_frames(const uint8_t* rows, int64_t nrows, int64_t row_bytes,
                         const int64_t* lens, uint8_t* out) {
  int64_t total = 0;
  for (int64_t i = 0; i < nrows; i++) {
    memcpy(out + total, rows + i * row_bytes, (size_t)lens[i]);
    total += lens[i];
  }
  return total;
}

// ---------------------------------------------------------------------------
// Direct-form IIR filter (ReplayGain equal-loudness cascade)
// ---------------------------------------------------------------------------

// y[i] = b[0]*x[i] + sum_{k=1..order} (b[k]*x[i-k] - a[k]*y[i-k]).
// x and y each carry `order` history samples BEFORE index 0 (caller pads /
// threads state across calls), matching replaygain_analysis.c:258-297.
void ft_iir(const double* x, double* y, int64_t n, const double* b,
            const double* a, int32_t order) {
  for (int64_t i = 0; i < n; i++) {
    double acc = x[i] * b[0];
    for (int32_t k = 1; k <= order; k++)
      acc += x[i - k] * b[k] - y[i - k] * a[k];
    y[i] = acc;
  }
}

}  // extern "C"
