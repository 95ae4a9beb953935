// Native WAV decode: RIFF parse + PCM -> float32 planar (C, T).
//
// The host input pipeline decodes 4 stems x batch x segments per step
// (SURVEY.md §3.1 I/O hot path).  This decoder replaces the numpy
// frombuffer/reshape/transpose chain with a single fused parse+convert+
// deinterleave pass (one read of the file bytes, one write of the planar
// output), exported through a C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libwavio.so wavio.cpp

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

struct FmtChunk {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
};

bool parse(const uint8_t* data, size_t len, FmtChunk* fmt,
           const uint8_t** pcm, size_t* pcm_len) {
  if (len < 12 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return false;
  size_t pos = 12;
  bool have_fmt = false, have_data = false;
  while (pos + 8 <= len) {
    const uint8_t* id = data + pos;
    uint32_t size;
    memcpy(&size, data + pos + 4, 4);
    const uint8_t* body = data + pos + 8;
    if (pos + 8 + size > len) size = static_cast<uint32_t>(len - pos - 8);
    if (memcmp(id, "fmt ", 4) == 0 && size >= 16) {
      memcpy(&fmt->format, body, 2);
      memcpy(&fmt->channels, body + 2, 2);
      memcpy(&fmt->sample_rate, body + 4, 4);
      memcpy(&fmt->bits, body + 14, 2);
      if (fmt->format == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: real format code = first 2 bytes of the
        // SubFormat GUID at offset 24
        if (size >= 26) {
          memcpy(&fmt->format, body + 24, 2);
        } else {
          fmt->format = (fmt->bits == 32) ? 3 : 1;
        }
      }
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      *pcm = body;
      *pcm_len = size;
      have_data = true;
    }
    pos += 8 + size + (size & 1);
  }
  return have_fmt && have_data;
}

}  // namespace

extern "C" {

// Returns 0 on success. Fills channels/samples/sample_rate.
int wav_info(const uint8_t* data, size_t len, int32_t* channels,
             int64_t* samples, int32_t* sample_rate) {
  FmtChunk fmt;
  const uint8_t* pcm;
  size_t pcm_len;
  if (!parse(data, len, &fmt, &pcm, &pcm_len)) return -1;
  if (fmt.channels == 0 || fmt.bits == 0) return -2;
  size_t frame = fmt.channels * (fmt.bits / 8);
  *channels = fmt.channels;
  *samples = static_cast<int64_t>(pcm_len / frame);
  *sample_rate = static_cast<int32_t>(fmt.sample_rate);
  return 0;
}

// out must hold channels * samples floats; planar layout (C, T).
int wav_decode(const uint8_t* data, size_t len, float* out) {
  FmtChunk fmt;
  const uint8_t* pcm;
  size_t pcm_len;
  if (!parse(data, len, &fmt, &pcm, &pcm_len)) return -1;
  const int C = fmt.channels;
  const size_t frame = C * (fmt.bits / 8);
  const size_t T = pcm_len / frame;

  if (fmt.format == 1 && fmt.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(pcm);
    constexpr float k = 1.0f / 32768.0f;
    for (int c = 0; c < C; ++c) {
      float* dst = out + static_cast<size_t>(c) * T;
      for (size_t t = 0; t < T; ++t) dst[t] = s[t * C + c] * k;
    }
  } else if (fmt.format == 1 && fmt.bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(pcm);
    constexpr float k = 1.0f / 2147483648.0f;
    for (int c = 0; c < C; ++c) {
      float* dst = out + static_cast<size_t>(c) * T;
      for (size_t t = 0; t < T; ++t) dst[t] = s[t * C + c] * k;
    }
  } else if (fmt.format == 1 && fmt.bits == 24) {
    constexpr float k = 1.0f / 8388608.0f;
    for (int c = 0; c < C; ++c) {
      float* dst = out + static_cast<size_t>(c) * T;
      const uint8_t* p = pcm + c * 3;
      for (size_t t = 0; t < T; ++t, p += frame) {
        int32_t v = (p[0] | (p[1] << 8) | (static_cast<int8_t>(p[2]) << 16));
        dst[t] = v * k;
      }
    }
  } else if (fmt.format == 3 && fmt.bits == 32) {
    const float* s = reinterpret_cast<const float*>(pcm);
    for (int c = 0; c < C; ++c) {
      float* dst = out + static_cast<size_t>(c) * T;
      for (size_t t = 0; t < T; ++t) dst[t] = s[t * C + c];
    }
  } else if (fmt.format == 1 && fmt.bits == 8) {
    constexpr float k = 1.0f / 128.0f;
    for (int c = 0; c < C; ++c) {
      float* dst = out + static_cast<size_t>(c) * T;
      for (size_t t = 0; t < T; ++t)
        dst[t] = (static_cast<int>(pcm[t * C + c]) - 128) * k;
    }
  } else {
    return -3;  // unsupported format
  }
  return 0;
}

// Fused decode of 16-bit PCM straight into a caller-provided planar
// float32 buffer with optional crop [start, start+n) — the dataset's
// random-crop path never materializes the full track.
int wav_decode_crop(const uint8_t* data, size_t len, float* out,
                    int64_t start, int64_t n) {
  FmtChunk fmt;
  const uint8_t* pcm;
  size_t pcm_len;
  if (!parse(data, len, &fmt, &pcm, &pcm_len)) return -1;
  if (fmt.format != 1 || fmt.bits != 16) return -3;
  const int C = fmt.channels;
  const size_t T = pcm_len / (C * 2);
  if (start < 0 || static_cast<size_t>(start + n) > T) return -4;
  const int16_t* s = reinterpret_cast<const int16_t*>(pcm) + start * C;
  constexpr float k = 1.0f / 32768.0f;
  for (int c = 0; c < C; ++c) {
    float* dst = out + static_cast<size_t>(c) * n;
    for (int64_t t = 0; t < n; ++t) dst[t] = s[t * C + c] * k;
  }
  return 0;
}

}  // extern "C"
