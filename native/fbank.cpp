// Kaldi-compliance log-mel filterbank, native host implementation.
//
// The reference's data pipeline runs fbank extraction through native code
// (pykaldi C++ or torchaudio's kaldi-compliance kernels,
// /root/reference/DATA/data_utils.py:73-98); this is the equivalent for the
// simulst-tpu host data loader: framing, DC removal, preemphasis (0.97),
// povey window, radix-2 real FFT (512), mel triangle banks over [20, nyq],
// log with float32-epsilon floor.  Exactly mirrors simulst_tpu/ops/fbank.py
// (the numpy/jax twins); parity is enforced by tests/test_fbank_native.py.
//
// Build: g++ -O3 -shared -fPIC -o libfbank.so fbank.cpp
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr float kEpsilon = 1.1920928955078125e-07f;
constexpr double kPi = 3.14159265358979323846;

struct MelBanks {
  int n_mels, n_fft_bins;
  std::vector<float> weights;  // (n_mels, n_fft_bins)
};

double mel_scale(double f) { return 1127.0 * std::log(1.0 + f / 700.0); }

MelBanks make_mel_banks(int n_mels, int padded, double sample_freq,
                        double low_freq, double high_freq) {
  MelBanks mb;
  mb.n_mels = n_mels;
  mb.n_fft_bins = padded / 2;
  mb.weights.assign((size_t)n_mels * mb.n_fft_bins, 0.0f);
  double nyquist = 0.5 * sample_freq;
  if (high_freq <= 0.0) high_freq = nyquist + high_freq;
  double bin_width = sample_freq / padded;
  double mel_low = mel_scale(low_freq), mel_high = mel_scale(high_freq);
  double delta = (mel_high - mel_low) / (n_mels + 1);
  for (int m = 0; m < n_mels; ++m) {
    double left = mel_low + m * delta;
    double center = left + delta;
    double right = center + delta;
    for (int k = 0; k < mb.n_fft_bins; ++k) {
      double mel = mel_scale(bin_width * k);
      double up = (mel - left) / (center - left);
      double down = (right - mel) / (right - center);
      double w = std::min(up, down);
      if (w > 0.0) mb.weights[(size_t)m * mb.n_fft_bins + k] = (float)w;
    }
  }
  return mb;
}

// iterative in-place radix-2 complex FFT
void fft(std::vector<double>& re, std::vector<double>& im) {
  int n = (int)re.size();
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) { std::swap(re[i], re[j]); std::swap(im[i], im[j]); }
  }
  for (int len = 2; len <= n; len <<= 1) {
    double ang = -2.0 * kPi / len;
    double wr = std::cos(ang), wi = std::sin(ang);
    for (int i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (int j = 0; j < len / 2; ++j) {
        int a = i + j, b = i + j + len / 2;
        double ur = re[a], ui = im[a];
        double vr = re[b] * cr - im[b] * ci;
        double vi = re[b] * ci + im[b] * cr;
        re[a] = ur + vr; im[a] = ui + vi;
        re[b] = ur - vr; im[b] = ui - vi;
        double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

}  // namespace

extern "C" {

// Returns the number of frames for n_samples (25ms window / 10ms shift,
// snip_edges).
int fbank_num_frames(int n_samples, int sample_rate) {
  int window = sample_rate / 40;   // 25ms
  int shift = sample_rate / 100;   // 10ms
  if (n_samples < window) return 0;
  return 1 + (n_samples - window) / shift;
}

// wav: n_samples floats (already scaled x 2^15); out: (num_frames, n_mels).
// Returns number of frames written.
int fbank(const float* wav, int n_samples, int sample_rate, int n_mels,
          float* out) {
  int window = sample_rate / 40;
  int shift = sample_rate / 100;
  int n_frames = fbank_num_frames(n_samples, sample_rate);
  if (n_frames <= 0) return 0;
  int padded = 1;
  while (padded < window) padded <<= 1;

  static thread_local MelBanks mb;
  if (mb.n_mels != n_mels || mb.n_fft_bins != padded / 2)
    mb = make_mel_banks(n_mels, padded, sample_rate, 20.0, 0.0);

  std::vector<float> win(window);
  for (int i = 0; i < window; ++i) {
    double hann = 0.5 - 0.5 * std::cos(2.0 * kPi * i / (window - 1));
    win[i] = (float)std::pow(hann, 0.85);
  }

  std::vector<double> re(padded), im(padded);
  std::vector<float> frame(window);
  for (int f = 0; f < n_frames; ++f) {
    const float* x = wav + (size_t)f * shift;
    double mean = 0.0;
    for (int i = 0; i < window; ++i) mean += x[i];
    mean /= window;
    // dc removal + preemphasis (x[max(i-1,0)]) + window, fp32 like the twins
    frame[0] = (float)((x[0] - mean) - 0.97 * (x[0] - mean));
    for (int i = window - 1; i >= 1; --i)
      frame[i] = (float)((x[i] - mean) - 0.97 * (x[i - 1] - mean));
    for (int i = 0; i < window; ++i) {
      re[i] = (double)(frame[i] * win[i]);
      im[i] = 0.0;
    }
    std::fill(re.begin() + window, re.end(), 0.0);
    std::fill(im.begin() + window, im.end(), 0.0);
    fft(re, im);
    float* row = out + (size_t)f * n_mels;
    std::memset(row, 0, sizeof(float) * n_mels);
    for (int m = 0; m < n_mels; ++m) {
      const float* w = &mb.weights[(size_t)m * mb.n_fft_bins];
      double acc = 0.0;
      for (int k = 0; k < mb.n_fft_bins; ++k) {
        if (w[k] != 0.0f) {
          double p = re[k] * re[k] + im[k] * im[k];
          acc += w[k] * p;
        }
      }
      row[m] = std::log(std::max((float)acc, kEpsilon));
    }
  }
  return n_frames;
}

}  // extern "C"
