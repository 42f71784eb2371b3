// llmvox_audio: native host-side audio runtime for LLMVoX-TPU.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this library owns the
// host audio hot path that the reference delegated to torchaudio/sox C++
// (SURVEY §2.9): sample-rate conversion, PCM format conversion, gain
// normalization, and a lock-free SPSC ring buffer for streaming playback.
// Exposed as a plain C ABI consumed via ctypes (llmvox_tpu/utils/native.py),
// with pure-numpy fallbacks when the library is not built.
//
// Build: `make -C csrc` (produces libllmvox_audio.so).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Windowed-sinc polyphase resampler (matches scipy.signal.resample_poly
// semantics closely: upsample by `up`, FIR low-pass, downsample by `down`).
// ---------------------------------------------------------------------------

static double bessel_i0(double x) {
  // modified Bessel function of the first kind, order 0 (series expansion)
  double sum = 1.0, term = 1.0;
  const double x2 = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= x2 / (double)(k * k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// Design the anti-aliasing FIR (Kaiser window, beta=8.555 ~ scipy default
// for resample_poly's kaiser(5.0)-ish quality; half_len taps per phase).
static void design_lowpass(std::vector<double>& h, int up, int down,
                           int half_len_per_phase) {
  const int max_rate = up > down ? up : down;
  const double f_c = 1.0 / (2.0 * max_rate);  // cutoff (normalized, fs=1)
  const int half_len = half_len_per_phase * max_rate;
  const int n_taps = 2 * half_len + 1;
  const double beta = 8.555;
  const double i0b = bessel_i0(beta);
  h.resize(n_taps);
  for (int i = 0; i < n_taps; ++i) {
    const int m = i - half_len;
    // sinc low-pass
    double s = (m == 0) ? 2.0 * f_c
                        : std::sin(2.0 * M_PI * f_c * m) / (M_PI * m);
    // Kaiser window
    const double r = (double)m / (double)half_len;
    const double w = bessel_i0(beta * std::sqrt(1.0 - r * r)) / i0b;
    h[i] = s * w * up;
  }
}

// Resample `n_in` float32 samples from rate (sr*down) to (sr*up).
// Returns the number of output samples written (caller sizes out as
// ceil(n_in * up / down)).
int64_t llmvox_resample_poly(const float* in, int64_t n_in, int up, int down,
                             float* out) {
  if (up == down) {
    std::memcpy(out, in, sizeof(float) * n_in);
    return n_in;
  }
  std::vector<double> h;
  design_lowpass(h, up, down, 10);
  const int64_t n_taps = (int64_t)h.size();
  const int64_t half = n_taps / 2;
  const int64_t n_out = (n_in * up + down - 1) / down;
  // y[m] = sum_k h[k] * x_up[m*down - k + half], x_up zero-stuffed by `up`
  for (int64_t m = 0; m < n_out; ++m) {
    const int64_t center = m * down + half;
    double acc = 0.0;
    // x_up[j] != 0 only when j % up == 0 -> input index j / up
    // j ranges over [center - n_taps + 1, center]
    int64_t j0 = center - n_taps + 1;
    int64_t rem = j0 % up;
    if (rem < 0) rem += up;
    int64_t j = j0 + (rem ? up - rem : 0);
    for (; j <= center; j += up) {
      const int64_t xi = j / up;
      if (xi >= 0 && xi < n_in) acc += h[center - j] * (double)in[xi];
    }
    out[m] = (float)acc;
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// PCM conversion + gain
// ---------------------------------------------------------------------------

void llmvox_f32_to_pcm16(const float* in, int64_t n, int16_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i];
    v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
    out[i] = (int16_t)lrintf(v * 32767.0f);
  }
}

void llmvox_pcm16_to_f32(const int16_t* in, int64_t n, float* out) {
  const float k = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * k;
}

// Peak-normalize to gain_db dBFS (sox "norm" semantics,
// WavTokenizer/decoder/dataset.py:70-72).
void llmvox_gain_normalize(float* buf, int64_t n, float gain_db) {
  float peak = 1e-9f;
  for (int64_t i = 0; i < n; ++i) {
    const float a = std::fabs(buf[i]);
    if (a > peak) peak = a;
  }
  const float target = std::pow(10.0f, gain_db / 20.0f);
  const float scale = target / peak;
  for (int64_t i = 0; i < n; ++i) buf[i] *= scale;
}

// ---------------------------------------------------------------------------
// Lock-free SPSC ring buffer (bytes) for streaming audio hand-off between
// the network writer and an audio device thread.
// ---------------------------------------------------------------------------

struct LlmvoxRing {
  std::vector<uint8_t> buf;
  std::atomic<uint64_t> head{0};  // written by producer
  std::atomic<uint64_t> tail{0};  // written by consumer
};

void* llmvox_ring_create(int64_t capacity) {
  auto* r = new LlmvoxRing();
  r->buf.resize((size_t)capacity);
  return r;
}

void llmvox_ring_destroy(void* ring) { delete (LlmvoxRing*)ring; }

int64_t llmvox_ring_write(void* ring, const uint8_t* data, int64_t n) {
  auto* r = (LlmvoxRing*)ring;
  const uint64_t cap = r->buf.size();
  const uint64_t head = r->head.load(std::memory_order_relaxed);
  const uint64_t tail = r->tail.load(std::memory_order_acquire);
  const int64_t freeb = (int64_t)(cap - (head - tail));
  const int64_t m = n < freeb ? n : freeb;
  for (int64_t i = 0; i < m; ++i) r->buf[(head + i) % cap] = data[i];
  r->head.store(head + m, std::memory_order_release);
  return m;
}

int64_t llmvox_ring_read(void* ring, uint8_t* data, int64_t n) {
  auto* r = (LlmvoxRing*)ring;
  const uint64_t cap = r->buf.size();
  const uint64_t tail = r->tail.load(std::memory_order_relaxed);
  const uint64_t head = r->head.load(std::memory_order_acquire);
  const int64_t avail = (int64_t)(head - tail);
  const int64_t m = n < avail ? n : avail;
  for (int64_t i = 0; i < m; ++i) data[i] = r->buf[(tail + i) % cap];
  r->tail.store(tail + m, std::memory_order_release);
  return m;
}

int64_t llmvox_ring_available(void* ring) {
  auto* r = (LlmvoxRing*)ring;
  return (int64_t)(r->head.load(std::memory_order_acquire) -
                   r->tail.load(std::memory_order_acquire));
}

}  // extern "C"
