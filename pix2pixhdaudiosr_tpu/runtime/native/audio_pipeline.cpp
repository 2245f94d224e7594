// Native host-side audio pipeline: WAV PCM decode + polyphase sinc resample
// + segment assembly, OpenMP-parallel over batch items.
//
// Role: the TPU-native equivalent of the reference's native layer. The
// reference spends its C++/CUDA on DCT kernels (reference dct/src/*) because
// its transforms run on the GPU hot path; on TPU those transforms are XLA/MXU
// matmuls (see ops/dct.py), and the native-code hot spot moves to the HOST
// input pipeline that must keep a chip fed at batch 64 (the reference leans
// on torchaudio's C++ decoders + 16 worker processes, reference
// data/audio_dataset.py:30-58, data/custom_dataset_data_loader.py:43-62).
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// PCM decode: interleaved raw bytes -> float32 first channel.
// fmt: 1 = PCM int (bits 8/16/24/32), 3 = IEEE float (bits 32/64).
// Returns frames decoded, or -1 on unsupported format.
// ---------------------------------------------------------------------------
int64_t decode_pcm_first_channel(const uint8_t* raw, int64_t nbytes,
                                 int32_t fmt, int32_t bits, int32_t nch,
                                 float* out, int64_t out_cap) {
  if (nch <= 0) return -1;
  const int64_t bpf = (int64_t)nch * (bits / 8);
  if (bpf == 0) return -1;
  int64_t frames = nbytes / bpf;
  if (frames > out_cap) frames = out_cap;
  if (fmt == 1 && bits == 16) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < frames; ++i) {
      int16_t v;
      std::memcpy(&v, raw + i * bpf, 2);
      out[i] = (float)v / 32768.0f;
    }
  } else if (fmt == 1 && bits == 32) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < frames; ++i) {
      int32_t v;
      std::memcpy(&v, raw + i * bpf, 4);
      out[i] = (float)((double)v / 2147483648.0);
    }
  } else if (fmt == 1 && bits == 24) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < frames; ++i) {
      const uint8_t* b = raw + i * bpf;
      int32_t v = (int32_t)b[0] | ((int32_t)b[1] << 8) | ((int32_t)b[2] << 16);
      v = (v ^ 0x800000) - 0x800000;
      out[i] = (float)v / 8388608.0f;
    }
  } else if (fmt == 1 && bits == 8) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < frames; ++i)
      out[i] = ((float)raw[i * bpf] - 128.0f) / 128.0f;
  } else if (fmt == 3 && bits == 32) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < frames; ++i)
      std::memcpy(&out[i], raw + i * bpf, 4);
  } else if (fmt == 3 && bits == 64) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < frames; ++i) {
      double v;
      std::memcpy(&v, raw + i * bpf, 8);
      out[i] = (float)v;
    }
  } else {
    return -1;
  }
  return frames;
}

// ---------------------------------------------------------------------------
// Polyphase sinc resample, torchaudio-kernel convention (see
// ops/audio.py sinc_resample_kernel): output[j*q + i] = dot(kernel[i],
// x_padded[j*p : j*p + K]) with x padded by `width` left and `width + p`
// right. kernels: [q, K] row-major float64 from the Python side.
// Returns the number of output samples written (= ceil(n*q/p), clipped).
// ---------------------------------------------------------------------------
int64_t resample_poly_f32(const float* x, int64_t n, const double* kernels,
                          int64_t K, int64_t p, int64_t q, int64_t width,
                          float* out, int64_t out_cap) {
  const int64_t padded_len = n + width + width + p;
  const int64_t n_frames = (padded_len - K) / p + 1;
  int64_t target = (int64_t)std::ceil((double)n * (double)q / (double)p);
  if (target > out_cap) target = out_cap;

#pragma omp parallel for schedule(static)
  for (int64_t f = 0; f < n_frames; ++f) {
    const int64_t start = f * p - width;  // index into unpadded x
    for (int64_t i = 0; i < q; ++i) {
      const int64_t oi = f * q + i;
      if (oi >= target) continue;
      const double* k = kernels + i * K;
      double acc = 0.0;
      int64_t lo = start < 0 ? -start : 0;           // clip to valid x range
      int64_t hi = (start + K > n) ? (n - start) : K;
      for (int64_t t = lo; t < hi; ++t) acc += (double)x[start + t] * k[t];
      out[oi] = (float)acc;
    }
  }
  return target;
}

// ---------------------------------------------------------------------------
// Fused batch op: for each item, resample orig->hr and orig->lr->hr and
// crop/zero-pad both to segment_length (the whole AudioDataset.__getitem__
// compute, reference data/audio_dataset.py:56-62, parallel over the batch).
// All kernel banks are passed in from Python.
// ---------------------------------------------------------------------------
void make_pair_batch(const float* wavs, const int64_t* lens, int64_t batch,
                     int64_t max_len, int64_t segment_length,
                     // orig -> hr
                     const double* k_hr, int64_t K_hr, int64_t p_hr,
                     int64_t q_hr, int64_t w_hr,
                     // orig -> lr
                     const double* k_dn, int64_t K_dn, int64_t p_dn,
                     int64_t q_dn, int64_t w_dn,
                     // lr -> hr
                     const double* k_up, int64_t K_up, int64_t p_up,
                     int64_t q_up, int64_t w_up,
                     float* hr_out, float* lr_out) {
#pragma omp parallel
  {
    std::vector<float> tmp_lo;
    std::vector<float> tmp;
#pragma omp for schedule(dynamic)
    for (int64_t b = 0; b < batch; ++b) {
      const float* x = wavs + b * max_len;
      const int64_t n = lens[b];
      float* hr = hr_out + b * segment_length;
      float* lr = lr_out + b * segment_length;
      // hr path
      int64_t hr_len = (int64_t)std::ceil((double)n * q_hr / p_hr);
      tmp.assign((size_t)hr_len, 0.0f);
      if (p_hr == q_hr && K_hr == 0) {
        hr_len = n;
        tmp.assign(x, x + n);
      } else {
        hr_len = resample_poly_f32(x, n, k_hr, K_hr, p_hr, q_hr, w_hr,
                                   tmp.data(), hr_len);
      }
      for (int64_t i = 0; i < segment_length; ++i)
        hr[i] = i < hr_len ? tmp[i] : 0.0f;
      // lr path: down then up
      int64_t lo_len = (int64_t)std::ceil((double)n * q_dn / p_dn);
      tmp_lo.assign((size_t)lo_len, 0.0f);
      lo_len = resample_poly_f32(x, n, k_dn, K_dn, p_dn, q_dn, w_dn,
                                 tmp_lo.data(), lo_len);
      int64_t up_len = (int64_t)std::ceil((double)lo_len * q_up / p_up);
      tmp.assign((size_t)up_len, 0.0f);
      up_len = resample_poly_f32(tmp_lo.data(), lo_len, k_up, K_up, p_up,
                                 q_up, w_up, tmp.data(), up_len);
      for (int64_t i = 0; i < segment_length; ++i)
        lr[i] = i < up_len ? tmp[i] : 0.0f;
    }
  }
}

int32_t native_audio_version() { return 1; }

}  // extern "C"
