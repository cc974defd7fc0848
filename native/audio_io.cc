// Native host-side audio data plane for roar_tpu.
//
// The reference framework leans on CPU dataloader workers (soundfile +
// librosa + torch DataLoader processes) for its host data path
// (roar/collections/asr/parts/preprocessing/segment.py).  On TPU the host
// must decode/resample fast enough to keep the chip fed, so the hot host
// loop lives here: RIFF/WAV decoding (PCM 16/24/32, float32), channel
// mixdown, polyphase windowed-sinc resampling, peak normalization and
// energy-based trimming.  Exposed as a plain C ABI consumed via ctypes
// (roar_tpu/native/__init__.py), with a pure-Python fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC audio_io.cc -o libroar_audio.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decoding
// ---------------------------------------------------------------------------

struct WavInfo {
  int32_t sample_rate;
  int32_t num_channels;
  int64_t num_frames;  // per-channel samples
  int32_t format;      // 1 = PCM int, 3 = IEEE float
  int32_t bits_per_sample;
};

static int read_header(FILE* f, WavInfo* info, long* data_offset,
                       int64_t* data_bytes) {
  char riff[4];
  uint32_t riff_size;
  char wave[4];
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0) return -1;
  if (fread(&riff_size, 4, 1, f) != 1) return -1;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) return -1;

  bool have_fmt = false;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) return -2;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[64];
      uint32_t n = size < sizeof(buf) ? size : sizeof(buf);
      if (fread(buf, 1, n, f) != n) return -3;
      if (size > n && fseek(f, size - n, SEEK_CUR) != 0) return -3;
      memcpy(&fmt, buf + 0, 2);
      memcpy(&channels, buf + 2, 2);
      memcpy(&rate, buf + 4, 4);
      memcpy(&bits, buf + 14, 2);
      if (fmt == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        uint16_t sub;
        memcpy(&sub, buf + 24, 2);
        fmt = sub;
      }
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      if (!have_fmt) return -4;
      *data_offset = ftell(f);
      *data_bytes = size;
      info->sample_rate = (int32_t)rate;
      info->num_channels = (int32_t)channels;
      info->format = (int32_t)fmt;
      info->bits_per_sample = (int32_t)bits;
      int bytes_per_frame = channels * (bits / 8);
      info->num_frames = bytes_per_frame ? (int64_t)size / bytes_per_frame : 0;
      return 0;
    } else {
      if (fseek(f, size + (size & 1), SEEK_CUR) != 0) return -5;
    }
  }
}

int roar_wav_info(const char* path, WavInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  long off;
  int64_t bytes;
  int rc = read_header(f, info, &off, &bytes);
  fclose(f);
  return rc;
}

// Decode to mono float32 in [-1, 1] (channel average).  Returns the number
// of frames written, or a negative error.
int64_t roar_wav_read_mono(const char* path, float* out, int64_t capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  WavInfo info;
  long off;
  int64_t bytes;
  int rc = read_header(f, &info, &off, &bytes);
  if (rc != 0) {
    fclose(f);
    return rc;
  }
  if (info.num_frames > capacity) {
    fclose(f);
    return -11;
  }
  fseek(f, off, SEEK_SET);
  const int ch = info.num_channels;
  const int64_t n = info.num_frames;
  const int bps = info.bits_per_sample;
  std::vector<uint8_t> raw((size_t)bytes);
  if (fread(raw.data(), 1, (size_t)bytes, f) != (size_t)bytes) {
    fclose(f);
    return -12;
  }
  fclose(f);

  const float inv_ch = 1.0f / (float)ch;
  if (info.format == 3 && bps == 32) {
    const float* src = reinterpret_cast<const float*>(raw.data());
    for (int64_t i = 0; i < n; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch; ++c) acc += src[i * ch + c];
      out[i] = acc * inv_ch;
    }
  } else if (info.format == 1 && bps == 16) {
    const int16_t* src = reinterpret_cast<const int16_t*>(raw.data());
    const float scale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch; ++c) acc += (float)src[i * ch + c];
      out[i] = acc * inv_ch * scale;
    }
  } else if (info.format == 1 && bps == 32) {
    const int32_t* src = reinterpret_cast<const int32_t*>(raw.data());
    const float scale = 1.0f / 2147483648.0f;
    for (int64_t i = 0; i < n; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch; ++c) acc += (float)src[i * ch + c] * scale;
      out[i] = acc * inv_ch;
    }
  } else if (info.format == 1 && bps == 24) {
    const uint8_t* src = raw.data();
    const float scale = 1.0f / 8388608.0f;
    for (int64_t i = 0; i < n; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch; ++c) {
        const uint8_t* p = src + 3 * (i * ch + c);
        int32_t v = (int32_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                              ((uint32_t)p[2] << 16));
        if (v & 0x800000) v |= ~0xFFFFFF;  // sign-extend
        acc += (float)v * scale;
      }
      out[i] = acc * inv_ch;
    }
  } else if (info.format == 1 && bps == 8) {
    const uint8_t* src = raw.data();
    const float scale = 1.0f / 128.0f;
    for (int64_t i = 0; i < n; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch; ++c) acc += ((float)src[i * ch + c] - 128.0f);
      out[i] = acc * inv_ch * scale;
    }
  } else {
    return -13;  // unsupported encoding
  }
  return n;
}

// ---------------------------------------------------------------------------
// Polyphase windowed-sinc resampling
// ---------------------------------------------------------------------------

// out must hold ceil(n_in * up / down) samples.  Kaiser-free design: Hann
// windowed sinc, `half_taps` zero crossings per side at the lower Nyquist.
int64_t roar_resample_poly(const float* in, int64_t n_in, int32_t up,
                           int32_t down, float* out, int64_t capacity,
                           int32_t half_taps) {
  if (up <= 0 || down <= 0 || n_in <= 0) return -1;
  if (up == down) {
    if (n_in > capacity) return -11;
    memcpy(out, in, sizeof(float) * (size_t)n_in);
    return n_in;
  }
  const int64_t n_out = (n_in * up + down - 1) / down;
  if (n_out > capacity) return -11;
  const double cutoff = 1.0 / (up > down ? (double)down : (double)up) *
                        (up > down ? (double)down : (double)up);  // == 1
  // effective lowpass at min(1/up, 1/down) of the upsampled Nyquist:
  const double fc = (up > down) ? 1.0 / (double)up : 1.0 / (double)down;
  const int64_t taps_per_side = (int64_t)half_taps * (int64_t)((up > down) ? up : down);
  (void)cutoff;

  for (int64_t j = 0; j < n_out; ++j) {
    // output sample j corresponds to upsampled index j * down
    const int64_t pos = j * down;  // in upsampled grid (spacing 1/up of input)
    double acc = 0.0;
    const int64_t lo = pos - taps_per_side;
    const int64_t hi = pos + taps_per_side;
    // input sample i sits at upsampled index i * up
    int64_t i_lo = lo / up - 1;
    int64_t i_hi = hi / up + 1;
    if (i_lo < 0) i_lo = 0;
    if (i_hi >= n_in) i_hi = n_in - 1;
    const double win_scale = M_PI / (double)(taps_per_side);
    for (int64_t i = i_lo; i <= i_hi; ++i) {
      const double d = (double)(i * up - pos);  // distance in upsampled units
      if (d < -(double)taps_per_side || d > (double)taps_per_side) continue;
      const double x = d * fc * M_PI;
      double sinc = (x == 0.0) ? 1.0 : sin(x) / x;
      const double w = 0.5 * (1.0 + cos(d * win_scale));  // Hann
      acc += (double)in[i] * sinc * w;
    }
    out[j] = (float)(acc * fc * (double)up);
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// Peak normalization + energy trim
// ---------------------------------------------------------------------------

void roar_peak_normalize(float* x, int64_t n, float level) {
  float peak = 0.f;
  for (int64_t i = 0; i < n; ++i) {
    float a = fabsf(x[i]);
    if (a > peak) peak = a;
  }
  if (peak <= 0.f) return;
  const float g = level / peak;
  for (int64_t i = 0; i < n; ++i) x[i] *= g;
}

// Returns start/end sample bounds of the non-silent region (RMS frames more
// than `threshold_db` below the peak frame are silence).
void roar_trim_bounds(const float* x, int64_t n, int32_t frame_length,
                      int32_t hop_length, float threshold_db, int64_t* start,
                      int64_t* end) {
  *start = 0;
  *end = n;
  if (n < frame_length) return;
  const int64_t n_frames = 1 + (n - frame_length) / hop_length;
  std::vector<float> rms((size_t)n_frames);
  float peak = 0.f;
  for (int64_t t = 0; t < n_frames; ++t) {
    double acc = 0.0;
    const float* p = x + t * hop_length;
    for (int32_t i = 0; i < frame_length; ++i) acc += (double)p[i] * p[i];
    rms[(size_t)t] = (float)sqrt(acc / frame_length);
    if (rms[(size_t)t] > peak) peak = rms[(size_t)t];
  }
  if (peak <= 0.f) return;
  const float thr = peak * powf(10.f, -threshold_db / 20.f);
  int64_t first = -1, last = -1;
  for (int64_t t = 0; t < n_frames; ++t) {
    if (rms[(size_t)t] > thr) {
      if (first < 0) first = t;
      last = t;
    }
  }
  if (first < 0) {
    *end = 0;
    return;
  }
  *start = first * hop_length;
  int64_t e = last * hop_length + frame_length;
  *end = e < n ? e : n;
}

}  // extern "C"
