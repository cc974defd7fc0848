// Sanitizer self-test for the native audio data plane (SURVEY §5.2 build
// note: native pieces get ASAN/UBSAN coverage).  Built by `make sanitize`
// with -fsanitize=address,undefined and run by tests/test_native.py; any
// out-of-bounds access, leak, or UB aborts with a nonzero exit.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "audio_io.cc"

static void check(bool ok, const char* what) {
  if (!ok) {
    fprintf(stderr, "FAIL: %s\n", what);
    exit(1);
  }
}

int main() {
  // --- resample: tone survives 22050 -> 16000 (ratio 320/441) ----------
  const int sr = 22050;
  const int n = sr / 2;
  std::vector<float> tone((size_t)n);
  for (int i = 0; i < n; ++i)
    tone[(size_t)i] = 0.5f * sinf(2.f * (float)M_PI * 440.f * i / sr);
  const int up = 320, down = 441;
  const int64_t cap = ((int64_t)n * up + down - 1) / down + 8;
  std::vector<float> out((size_t)cap);
  int64_t n_out = roar_resample_poly(tone.data(), n, up, down, out.data(),
                                     cap, 16);
  check(n_out > 0, "resample returns samples");
  check(n_out <= cap, "resample respects capacity");
  // capacity too small must be rejected, not overrun
  check(roar_resample_poly(tone.data(), n, up, down, out.data(), 4, 16) == -11,
        "resample rejects small capacity");
  check(roar_resample_poly(tone.data(), 0, up, down, out.data(), cap, 16) < 0,
        "resample rejects empty input");

  // --- peak normalize ----------------------------------------------------
  roar_peak_normalize(out.data(), n_out, 0.95f);
  float peak = 0.f;
  for (int64_t i = 0; i < n_out; ++i)
    peak = fabsf(out[(size_t)i]) > peak ? fabsf(out[(size_t)i]) : peak;
  check(fabsf(peak - 0.95f) < 1e-4f, "peak normalize hits level");
  roar_peak_normalize(out.data(), 0, 0.95f);  // empty input is a no-op

  // --- trim bounds ---------------------------------------------------------
  std::vector<float> padded((size_t)(2 * n));
  memset(padded.data(), 0, sizeof(float) * (size_t)(n / 2));
  memcpy(padded.data() + n / 2, tone.data(), sizeof(float) * (size_t)n);
  int64_t start = 0, end = 0;
  roar_trim_bounds(padded.data(), 2 * n, 2048, 512, 40.f, &start, &end);
  check(start > 0 && end > start, "trim finds interior bounds");
  check(end <= 2 * n, "trim end in range");
  // shorter-than-frame input leaves bounds untouched
  roar_trim_bounds(padded.data(), 16, 2048, 512, 40.f, &start, &end);
  check(start == 0 && end == 16, "trim short input is identity");

  // --- wav info on a missing file -----------------------------------------
  WavInfo info;
  check(roar_wav_info("/nonexistent/definitely_missing.wav", &info) < 0,
        "wav_info rejects missing file");
  float buf[4];
  check(roar_wav_read_mono("/nonexistent/missing.wav", buf, 4) < 0,
        "wav_read rejects missing file");

  printf("native sanitize self-test OK (%lld resampled)\n",
         (long long)n_out);
  return 0;
}
