// Copyright (c) 2026 touchnet_tpu authors.
// Native audio frontend: kaldi-compatible log-mel filterbank (fbank).
//
// Capability parity: the reference's CPU fbank path is torchaudio's
// compliance.kaldi (C++ under torch, SURVEY.md §2.9). This is the
// equivalent first-party native component for the TPU build's dataloader
// workers: framing (snip edges) -> dither -> DC removal -> pre-emphasis ->
// povey window -> real FFT (iterative radix-2) -> power spectrum ->
// kaldi-mel triangular filterbank -> log with eps floor.
// Exposed via a plain C ABI consumed through ctypes
// (touchnet_tpu/data/native.py); numerics match touchnet_tpu/data/dsp.py
// bit-closely (float64 internal accumulation, float32 I/O).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <vector>

namespace {

constexpr double kEps = 1.1920928955078125e-07;  // float32 machine epsilon

int next_pow2(int x) {
  int p = 1;
  while (p < x) p <<= 1;
  return p;
}

// Iterative radix-2 complex FFT with precomputed twiddles + bit-reversal
// table (plan-cached; built once per padded size).
struct FFTPlan {
  int n = 0;
  std::vector<int> rev;
  std::vector<double> tw_re, tw_im;  // per stage, concatenated

  void build(int size) {
    n = size;
    rev.resize(n);
    rev[0] = 0;
    for (int i = 1; i < n; ++i) {
      rev[i] = (rev[i >> 1] >> 1) | ((i & 1) ? (n >> 1) : 0);
    }
    tw_re.clear();
    tw_im.clear();
    for (int len = 2; len <= n; len <<= 1) {
      for (int j = 0; j < len / 2; ++j) {
        const double ang = -2.0 * M_PI * j / len;
        tw_re.push_back(std::cos(ang));
        tw_im.push_back(std::sin(ang));
      }
    }
  }
};

void fft(const FFTPlan& plan, std::vector<double>& re, std::vector<double>& im) {
  const int n = plan.n;
  for (int i = 0; i < n; ++i) {
    const int j = plan.rev[i];
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  size_t tw = 0;
  for (int len = 2; len <= n; len <<= 1) {
    for (int i = 0; i < n; i += len) {
      for (int j = 0; j < len / 2; ++j) {
        const double wr = plan.tw_re[tw + j], wi = plan.tw_im[tw + j];
        const double ur = re[i + j], ui = im[i + j];
        const double xr = re[i + j + len / 2], xi = im[i + j + len / 2];
        const double vr = xr * wr - xi * wi;
        const double vi = xr * wi + xi * wr;
        re[i + j] = ur + vr;
        im[i + j] = ui + vi;
        re[i + j + len / 2] = ur - vr;
        im[i + j + len / 2] = ui - vi;
      }
    }
    tw += len / 2;
  }
}

double mel_scale(double freq) { return 1127.0 * std::log(1.0 + freq / 700.0); }

struct SparseBank {
  int start = 0;
  std::vector<double> w;
};

struct FbankPlan {
  int sample_rate = 0;
  int num_mel = 0;
  int frame_len_ms = 0;
  int frame_shift_ms = 0;
  double low_freq = 20.0, high_freq = 0.0;
  int window_size = 0, window_shift = 0, padded = 0;
  std::vector<double> window;                 // povey
  std::vector<SparseBank> banks;              // sparse triangular filters
  FFTPlan fft_plan;

  void build() {
    window_size = sample_rate * frame_len_ms / 1000;
    window_shift = sample_rate * frame_shift_ms / 1000;
    padded = next_pow2(window_size);
    window.resize(window_size);
    for (int i = 0; i < window_size; ++i) {
      const double h = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / (window_size - 1));
      window[i] = std::pow(h, 0.85);
    }
    double hi = high_freq <= 0.0 ? 0.5 * sample_rate + high_freq : high_freq;
    const double mel_lo = mel_scale(low_freq), mel_hi = mel_scale(hi);
    const double mel_delta = (mel_hi - mel_lo) / (num_mel + 1);
    const double bin_width = static_cast<double>(sample_rate) / padded;
    const int nbins = padded / 2;
    banks.assign(num_mel, SparseBank{});
    for (int m = 0; m < num_mel; ++m) {
      const double left = mel_lo + m * mel_delta;
      const double center = mel_lo + (m + 1) * mel_delta;
      const double right = mel_lo + (m + 2) * mel_delta;
      int first = -1;
      std::vector<double> weights;
      for (int b = 0; b < nbins; ++b) {
        const double mel = mel_scale(bin_width * b);
        if (mel > left && mel < right) {
          if (first < 0) first = b;
          weights.push_back(mel <= center
                                ? (mel - left) / (center - left)
                                : (right - mel) / (right - center));
        } else if (first >= 0) {
          break;  // triangular support is contiguous
        }
      }
      banks[m].start = first < 0 ? 0 : first;
      banks[m].w = std::move(weights);
    }
    fft_plan.build(padded);
  }
};

std::mutex g_mutex;
FbankPlan g_plan;

}  // namespace

extern "C" {

// Returns the number of frames for n_samples under snip-edges framing.
int touchnet_fbank_num_frames(int n_samples, int sample_rate, int frame_len_ms,
                              int frame_shift_ms) {
  const int ws = sample_rate * frame_len_ms / 1000;
  const int sh = sample_rate * frame_shift_ms / 1000;
  if (n_samples < ws) return 0;
  return 1 + (n_samples - ws) / sh;
}

// wave: float32 samples (int16 scale, caller multiplies by 1<<15).
// out: float32 [num_frames, num_mel], caller-allocated.
// Returns number of frames written, or -1 on error.
int touchnet_fbank(const float* wave, int n_samples, int sample_rate,
                   int num_mel, int frame_len_ms, int frame_shift_ms,
                   float dither, uint64_t dither_seed, float* out) {
  std::lock_guard<std::mutex> lock(g_mutex);
  if (g_plan.sample_rate != sample_rate || g_plan.num_mel != num_mel ||
      g_plan.frame_len_ms != frame_len_ms ||
      g_plan.frame_shift_ms != frame_shift_ms) {
    g_plan.sample_rate = sample_rate;
    g_plan.num_mel = num_mel;
    g_plan.frame_len_ms = frame_len_ms;
    g_plan.frame_shift_ms = frame_shift_ms;
    g_plan.build();
  }
  const FbankPlan& plan = g_plan;
  const int ws = plan.window_size, sh = plan.window_shift;
  const int frames =
      touchnet_fbank_num_frames(n_samples, sample_rate, frame_len_ms,
                                frame_shift_ms);
  if (frames <= 0) return frames;

  std::mt19937_64 rng(dither_seed);
  std::normal_distribution<double> gauss(0.0, 1.0);
  std::vector<double> frame(ws);
  std::vector<double> re(plan.padded), im(plan.padded);

  for (int f = 0; f < frames; ++f) {
    const float* src = wave + static_cast<int64_t>(f) * sh;
    double mean = 0.0;
    for (int i = 0; i < ws; ++i) frame[i] = src[i];
    if (dither != 0.0f) {
      for (int i = 0; i < ws; ++i) frame[i] += dither * gauss(rng);
    }
    for (int i = 0; i < ws; ++i) mean += frame[i];
    mean /= ws;
    for (int i = 0; i < ws; ++i) frame[i] -= mean;  // remove DC
    // pre-emphasis 0.97 (first sample against itself, kaldi convention)
    for (int i = ws - 1; i > 0; --i) frame[i] -= 0.97 * frame[i - 1];
    frame[0] -= 0.97 * frame[0];
    for (int i = 0; i < ws; ++i) frame[i] *= plan.window[i];

    std::fill(re.begin(), re.end(), 0.0);
    std::fill(im.begin(), im.end(), 0.0);
    std::copy(frame.begin(), frame.end(), re.begin());
    fft(plan.fft_plan, re, im);

    const int nbins = plan.padded / 2;
    for (int m = 0; m < num_mel; ++m) {
      const SparseBank& bank = plan.banks[m];
      double acc = 0.0;
      const int limit =
          std::min<int>(bank.start + static_cast<int>(bank.w.size()), nbins);
      for (int b = bank.start; b < limit; ++b) {
        const double p = re[b] * re[b] + im[b] * im[b];
        acc += p * bank.w[b - bank.start];
      }
      out[static_cast<int64_t>(f) * num_mel + m] =
          static_cast<float>(std::log(acc > kEps ? acc : kEps));
    }
  }
  return frames;
}

}  // extern "C"
