// Native feature front-end.
//
// The reference's data-loading hot loop runs inside Kaldi C++ (MFCC
// extraction per utterance, reference src/common/feat.py:74-98 dispatching
// to kaldi.feat.mfcc).  This is the equivalent native muscle for the TPU
// framework's host side: a self-contained Kaldi-convention MFCC + CMN +
// splice + affine-transform pipeline exposed through a C ABI (ctypes).
//
// Numerics mirror fac_via_ppg_tpu/frontend/mfcc.py exactly (same framing
// formulas, povey window, HTK mel banks, orthonormal DCT, lifter); the two
// implementations are cross-checked in tests/test_native.py.

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------- FFT
// Iterative radix-2 complex FFT (n must be a power of two).
void fft_radix2(std::vector<std::complex<double>>& a) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * kPi / static_cast<double>(len);
    const std::complex<double> wlen(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      std::complex<double> w(1.0, 0.0);
      for (size_t j2 = 0; j2 < len / 2; ++j2) {
        const std::complex<double> u = a[i + j2];
        const std::complex<double> v = a[i + j2 + len / 2] * w;
        a[i + j2] = u + v;
        a[i + j2 + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
}

// ------------------------------------------------------------- windows
enum WindowType { kPovey = 0, kHanning = 1, kHamming = 2, kRectangular = 3 };

std::vector<double> feature_window(int size, int type) {
  std::vector<double> w(size);
  const double a = 2.0 * kPi / (size - 1);
  for (int i = 0; i < size; ++i) {
    switch (type) {
      case kPovey:
        w[i] = std::pow(0.5 - 0.5 * std::cos(a * i), 0.85);
        break;
      case kHanning:
        w[i] = 0.5 - 0.5 * std::cos(a * i);
        break;
      case kHamming:
        w[i] = 0.54 - 0.46 * std::cos(a * i);
        break;
      default:
        w[i] = 1.0;
    }
  }
  return w;
}

double mel_scale(double freq) { return 1127.0 * std::log(1.0 + freq / 700.0); }

struct MelBanks {
  // Sparse triangles: per bin, the first FFT index and its weight run.
  int num_bins;
  int num_fft_bins;
  std::vector<int> first;                    // per bin
  std::vector<std::vector<double>> weights;  // per bin, contiguous run

  MelBanks(int bins, int padded_window, double samp_freq, double low_freq,
           double high_freq_opt)
      : num_bins(bins), num_fft_bins(padded_window / 2), first(bins),
        weights(bins) {
    const double nyquist = 0.5 * samp_freq;
    const double high_freq =
        high_freq_opt > 0 ? high_freq_opt : nyquist + high_freq_opt;
    const double mel_low = mel_scale(low_freq);
    const double mel_high = mel_scale(high_freq);
    const double delta = (mel_high - mel_low) / (bins + 1);
    for (int b = 0; b < bins; ++b) {
      const double left = mel_low + b * delta;
      const double center = left + delta;
      const double right = center + delta;
      int run_first = -1;
      std::vector<double> run;
      for (int j = 0; j < num_fft_bins; ++j) {
        const double mel =
            mel_scale(static_cast<double>(j) * samp_freq / padded_window);
        if (mel > left && mel < right) {
          if (run_first < 0) run_first = j;
          run.push_back(mel <= center ? (mel - left) / delta
                                      : (right - mel) / delta);
        } else if (run_first >= 0) {
          break;  // triangles are contiguous
        }
      }
      first[b] = run_first < 0 ? 0 : run_first;
      weights[b] = std::move(run);
    }
  }
};

// Real FFT of 2n real samples via one n-point complex FFT (standard split).
// in: 2n reals; out: power spectrum bins 0..n-1 (|X_k|^2, k < n).
void real_power_spectrum(const double* in, int two_n,
                         std::vector<std::complex<double>>& scratch,
                         std::vector<double>& power) {
  const int n = two_n / 2;
  scratch.resize(n);
  for (int i = 0; i < n; ++i) {
    scratch[i] = std::complex<double>(in[2 * i], in[2 * i + 1]);
  }
  fft_radix2(scratch);
  power.resize(n);
  // X_k = (Z_k + conj(Z_{n-k}))/2 + e^{-i pi k / n} (Z_k - conj(Z_{n-k}))/(2i)
  for (int k = 0; k < n; ++k) {
    const std::complex<double> zk = scratch[k];
    const std::complex<double> znk = std::conj(scratch[(n - k) % n]);
    const std::complex<double> even = 0.5 * (zk + znk);
    const std::complex<double> odd =
        std::complex<double>(0.0, -0.5) * (zk - znk);
    const double ang = -kPi * k / n;
    const std::complex<double> tw(std::cos(ang), std::sin(ang));
    power[k] = std::norm(even + tw * odd);
  }
}

int reflect_index(long long idx, long long n) {
  // Kaldi edge reflection without repeating the edge sample.
  while (idx < 0 || idx >= n) {
    if (idx < 0) idx = -idx - 1;
    if (idx >= n) idx = 2 * n - 1 - idx;
  }
  return static_cast<int>(idx);
}

}  // namespace

extern "C" {

// Returns the snip_edges-aware frame count.
int fac_num_frames(long long num_samples, double samp_freq,
                   double frame_shift_ms, double frame_length_ms,
                   int snip_edges) {
  const long long shift =
      static_cast<long long>(samp_freq * 0.001 * frame_shift_ms);
  const long long size =
      static_cast<long long>(samp_freq * 0.001 * frame_length_ms);
  if (snip_edges) {
    if (num_samples < size) return 0;
    return static_cast<int>(1 + (num_samples - size) / shift);
  }
  return static_cast<int>((num_samples + shift / 2) / shift);
}

// Kaldi-convention MFCC.  `out` must hold n_frames * num_ceps floats.
// Returns the number of frames written, or -1 on bad arguments.
int fac_mfcc_compute(const double* wav, long long n_samples, double samp_freq,
                     double frame_shift_ms, double frame_length_ms,
                     double dither, double preemph, int remove_dc,
                     int window_type, int snip_edges, int num_bins,
                     double low_freq, double high_freq, int num_ceps,
                     int use_energy, double cepstral_lifter, uint64_t seed,
                     float* out) {
  const int shift = static_cast<int>(samp_freq * 0.001 * frame_shift_ms);
  const int size = static_cast<int>(samp_freq * 0.001 * frame_length_ms);
  if (shift <= 0 || size <= 0 || num_ceps > num_bins) return -1;
  int padded = 1;
  while (padded < size) padded <<= 1;
  const int n_frames = fac_num_frames(n_samples, samp_freq, frame_shift_ms,
                                      frame_length_ms, snip_edges);
  if (n_frames <= 0) return 0;

  const std::vector<double> window = feature_window(size, window_type);
  const MelBanks banks(num_bins, padded, samp_freq, low_freq, high_freq);

  // Orthonormal DCT-II rows (num_ceps x num_bins), with lifter folded in.
  std::vector<double> dct(static_cast<size_t>(num_ceps) * num_bins);
  for (int k = 0; k < num_ceps; ++k) {
    const double norm =
        k == 0 ? std::sqrt(1.0 / num_bins) : std::sqrt(2.0 / num_bins);
    const double lifter =
        cepstral_lifter != 0.0
            ? 1.0 + 0.5 * cepstral_lifter * std::sin(kPi * k / cepstral_lifter)
            : 1.0;
    for (int n = 0; n < num_bins; ++n) {
      dct[static_cast<size_t>(k) * num_bins + n] =
          norm * lifter * std::cos(kPi / num_bins * (n + 0.5) * k);
    }
  }

  std::mt19937_64 rng(seed);
  std::normal_distribution<double> gauss(0.0, 1.0);

  std::vector<double> frame(padded, 0.0);
  std::vector<std::complex<double>> scratch;
  std::vector<double> power;
  std::vector<double> mel(num_bins);

  for (int f = 0; f < n_frames; ++f) {
    long long start;
    if (snip_edges) {
      start = static_cast<long long>(f) * shift;
    } else {
      start = static_cast<long long>(f) * shift + shift / 2 - size / 2;
    }
    for (int i = 0; i < size; ++i) {
      frame[i] = wav[reflect_index(start + i, n_samples)];
    }
    if (dither != 0.0) {
      for (int i = 0; i < size; ++i) frame[i] += gauss(rng) * dither;
    }
    if (remove_dc) {
      double mean = 0.0;
      for (int i = 0; i < size; ++i) mean += frame[i];
      mean /= size;
      for (int i = 0; i < size; ++i) frame[i] -= mean;
    }
    double log_energy = 0.0;
    if (use_energy) {
      double e = 0.0;
      for (int i = 0; i < size; ++i) e += frame[i] * frame[i];
      log_energy = std::log(std::max(e, 1e-300));
    }
    if (preemph != 0.0) {
      for (int i = size - 1; i > 0; --i) frame[i] -= preemph * frame[i - 1];
      frame[0] -= preemph * frame[0];
    }
    for (int i = 0; i < size; ++i) frame[i] *= window[i];
    std::fill(frame.begin() + size, frame.end(), 0.0);

    real_power_spectrum(frame.data(), padded, scratch, power);

    for (int b = 0; b < num_bins; ++b) {
      double acc = 0.0;
      const std::vector<double>& wrow = banks.weights[b];
      const double* p = power.data() + banks.first[b];
      for (size_t i = 0; i < wrow.size(); ++i) acc += wrow[i] * p[i];
      mel[b] = std::log(std::max(acc, 1.1920928955078125e-07));  // f32 eps
    }

    float* row = out + static_cast<size_t>(f) * num_ceps;
    for (int k = 0; k < num_ceps; ++k) {
      double acc = 0.0;
      const double* drow = &dct[static_cast<size_t>(k) * num_bins];
      for (int n = 0; n < num_bins; ++n) acc += drow[n] * mel[n];
      row[k] = static_cast<float>(acc);
    }
    if (use_energy) row[0] = static_cast<float>(log_energy);
  }
  return n_frames;
}

// Per-utterance cepstral mean normalization, in place (T x D row-major).
void fac_cmn(float* feats, int t, int d) {
  for (int j = 0; j < d; ++j) {
    double mean = 0.0;
    for (int i = 0; i < t; ++i) mean += feats[static_cast<size_t>(i) * d + j];
    mean /= t;
    for (int i = 0; i < t; ++i) {
      feats[static_cast<size_t>(i) * d + j] -=
          static_cast<float>(mean);
    }
  }
}

// Context splicing with edge clamping: (T x D) -> (T x (L+1+R)*D).
void fac_splice(const float* feats, int t, int d, int left, int right,
                float* out) {
  const int width = left + 1 + right;
  for (int i = 0; i < t; ++i) {
    for (int c = 0; c < width; ++c) {
      int src = i + c - left;
      src = src < 0 ? 0 : (src >= t ? t - 1 : src);
      std::memcpy(out + (static_cast<size_t>(i) * width + c) * d,
                  feats + static_cast<size_t>(src) * d,
                  sizeof(float) * d);
    }
  }
}

// Affine transform: out(T x R) = feats(T x C) * linear' + offset, where
// `transform` is (R x C) pure-linear or (R x C+1) with offset column.
int fac_apply_transform(const float* feats, int t, int feat_dim,
                        const float* transform, int rows, int cols,
                        float* out) {
  const bool affine = cols == feat_dim + 1;
  if (!affine && cols != feat_dim) return -1;
  for (int i = 0; i < t; ++i) {
    const float* x = feats + static_cast<size_t>(i) * feat_dim;
    float* y = out + static_cast<size_t>(i) * rows;
    for (int r = 0; r < rows; ++r) {
      const float* w = transform + static_cast<size_t>(r) * cols;
      double acc = affine ? w[feat_dim] : 0.0;
      for (int c = 0; c < feat_dim; ++c) acc += w[c] * x[c];
      y[r] = static_cast<float>(acc);
    }
  }
  return 0;
}

}  // extern "C"
