// Native host-side kernels for the cfun-tpu data path.
//
// The reference does these with skimage/torch on the host mid-pipeline
// (mold resize utils.py:389-393; mask unmold utils.py:443-460 +
// model.py:1856-1858).  Here they are OpenMP C++ kernels called through
// ctypes, fused so no multi-hundred-MB intermediate is ever materialized:
//
//   mold_resize_f32: [H,W,D] raw volume -> [Dt,Ht,Wt] molded volume
//     (trilinear, half-pixel convention == skimage order=1 w/o AA),
//     emitting directly in device layout and optionally z-scoring in the
//     same pass.
//   unmold_argmax_f32: [mD,mH,mW,C] mask probabilities -> int16 labels
//     pasted into a [D0,H0,W0] volume inside an integer box, sampling
//     trilinearly at every output voxel and taking the channel argmax
//     in-register (the reference materializes the full [D,H,W,C] float
//     stack first).
//
// Build: see native/build.sh (g++ -O3 -march=native -fopenmp -shared).

#include <algorithm>
#include <cmath>
#include <cstdint>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline void axis_coords(int n_out, int n_in, float* src, int* i0, int* i1,
                        float* frac) {
  const float scale = static_cast<float>(n_in) / static_cast<float>(n_out);
  for (int i = 0; i < n_out; ++i) {
    float s = (static_cast<float>(i) + 0.5f) * scale - 0.5f;
    s = std::min(std::max(s, 0.0f), static_cast<float>(n_in - 1));
    int lo = static_cast<int>(s);
    i0[i] = lo;
    i1[i] = std::min(lo + 1, n_in - 1);
    frac[i] = s - static_cast<float>(lo);
    src[i] = s;
  }
}

}  // namespace

extern "C" {

// src: [h0, w0, d0] C-contiguous float32 (the reference's [H, W, D] layout).
// dst: [dt, ht, wt] C-contiguous float32 (device [D, H, W] layout).
// normalize != 0: z-score the output in a second pass (mean/std of the
// molded volume, reference model.py:1902-1904).
void mold_resize_f32(const float* src, int h0, int w0, int d0, float* dst,
                     int dt, int ht, int wt, int normalize) {
  float* sbuf = new float[dt + ht + wt];
  int* z0 = new int[2 * (dt + ht + wt)];
  float* fr = new float[dt + ht + wt];
  float* s_d = sbuf;           // unused source coords (kept for clarity)
  int* d_i0 = z0;
  int* d_i1 = z0 + dt;
  float* d_f = fr;
  axis_coords(dt, d0, s_d, d_i0, d_i1, d_f);
  float* s_h = sbuf + dt;
  int* h_i0 = z0 + 2 * dt;
  int* h_i1 = z0 + 2 * dt + ht;
  float* h_f = fr + dt;
  axis_coords(ht, h0, s_h, h_i0, h_i1, h_f);
  float* s_w = sbuf + dt + ht;
  int* w_i0 = z0 + 2 * (dt + ht);
  int* w_i1 = z0 + 2 * (dt + ht) + wt;
  float* w_f = fr + dt + ht;
  axis_coords(wt, w0, s_w, w_i0, w_i1, w_f);

  const int64_t src_h_stride = static_cast<int64_t>(w0) * d0;
  double sum = 0.0, sumsq = 0.0;

#pragma omp parallel for schedule(static) reduction(+ : sum, sumsq)
  for (int z = 0; z < dt; ++z) {
    const int dz0 = d_i0[z], dz1 = d_i1[z];
    const float fz = d_f[z];
    float* out_plane = dst + static_cast<int64_t>(z) * ht * wt;
    for (int y = 0; y < ht; ++y) {
      const int hy0 = h_i0[y], hy1 = h_i1[y];
      const float fy = h_f[y];
      const float* r00 = src + hy0 * src_h_stride;
      const float* r10 = src + hy1 * src_h_stride;
      float* out_row = out_plane + static_cast<int64_t>(y) * wt;
      for (int x = 0; x < wt; ++x) {
        const int x0 = w_i0[x], x1 = w_i1[x];
        const float fx = w_f[x];
        // gather the 8 corners: src[h, w, d] layout
        const float* p00 = r00 + static_cast<int64_t>(x0) * d0;
        const float* p01 = r00 + static_cast<int64_t>(x1) * d0;
        const float* p10 = r10 + static_cast<int64_t>(x0) * d0;
        const float* p11 = r10 + static_cast<int64_t>(x1) * d0;
        const float v000 = p00[dz0], v001 = p00[dz1];
        const float v010 = p01[dz0], v011 = p01[dz1];
        const float v100 = p10[dz0], v101 = p10[dz1];
        const float v110 = p11[dz0], v111 = p11[dz1];
        const float c00 = v000 + fz * (v001 - v000);
        const float c01 = v010 + fz * (v011 - v010);
        const float c10 = v100 + fz * (v101 - v100);
        const float c11 = v110 + fz * (v111 - v110);
        const float c0 = c00 + fx * (c01 - c00);
        const float c1 = c10 + fx * (c11 - c10);
        const float v = c0 + fy * (c1 - c0);
        out_row[x] = v;
        sum += v;
        sumsq += static_cast<double>(v) * v;
      }
    }
  }

  if (normalize) {
    const int64_t n = static_cast<int64_t>(dt) * ht * wt;
    const double mean = sum / n;
    double var = sumsq / n - mean * mean;
    if (var < 1e-12) var = 1.0;
    const float inv = static_cast<float>(1.0 / std::sqrt(var));
    const float m = static_cast<float>(mean);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) dst[i] = (dst[i] - m) * inv;
  }

  delete[] sbuf;
  delete[] z0;
  delete[] fr;
}

// As mold_resize_f32(normalize=1) but additionally emits the z-scored
// volume quantized to int8 (clip +-clip_sigma, scale) -- the inference
// wire format -- in the same pass, so the host never touches the f32
// volume again.
void mold_resize_q8(const float* src, int h0, int w0, int d0, float* tmp,
                    int8_t* dst_q8, int dt, int ht, int wt, float clip_sigma,
                    float scale) {
  mold_resize_f32(src, h0, w0, d0, tmp, dt, ht, wt, 1);
  const int64_t n = static_cast<int64_t>(dt) * ht * wt;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    float v = tmp[i];
    v = std::min(std::max(v, -clip_sigma), clip_sigma) * scale;
    dst_q8[i] = static_cast<int8_t>(v);  // trunc, matching numpy astype
  }
}

// probs: [md, mh, mw, c] float32 (channels innermost, device output layout).
// out:   [od, oh, ow] int16, already zero-initialized by the caller.
// box:   z1, y1, x1, z2, y2, x2 integer voxel bounds in the output volume.
// Labels are the trilinear-resampled-probability argmax -- identical to the
// reference's resize-paste-argmax without the [D,H,W,C] intermediate.
void unmold_argmax_f32(const float* probs, int md, int mh, int mw, int c,
                       int16_t* out, int od, int oh, int ow, int z1, int y1,
                       int x1, int z2, int y2, int x2) {
  z1 = std::max(z1, 0); y1 = std::max(y1, 0); x1 = std::max(x1, 0);
  z2 = std::min(z2, od); y2 = std::min(y2, oh); x2 = std::min(x2, ow);
  const int bd = z2 - z1, bh = y2 - y1, bw = x2 - x1;
  if (bd <= 0 || bh <= 0 || bw <= 0) return;

  const int64_t sh = static_cast<int64_t>(mw) * c;    // crop h stride
  const int64_t sd = static_cast<int64_t>(mh) * sh;   // crop d stride

#pragma omp parallel for schedule(static)
  for (int z = 0; z < bd; ++z) {
    float sz = (static_cast<float>(z) + 0.5f) * md / bd - 0.5f;
    sz = std::min(std::max(sz, 0.0f), static_cast<float>(md - 1));
    const int z0 = static_cast<int>(sz);
    const int zz1 = std::min(z0 + 1, md - 1);
    const float fz = sz - z0;
    for (int y = 0; y < bh; ++y) {
      float sy = (static_cast<float>(y) + 0.5f) * mh / bh - 0.5f;
      sy = std::min(std::max(sy, 0.0f), static_cast<float>(mh - 1));
      const int y0 = static_cast<int>(sy);
      const int yy1 = std::min(y0 + 1, mh - 1);
      const float fy = sy - y0;
      int16_t* out_row = out + (static_cast<int64_t>(z + z1) * oh + (y + y1))
                             * ow + x1;
      for (int x = 0; x < bw; ++x) {
        float sx = (static_cast<float>(x) + 0.5f) * mw / bw - 0.5f;
        sx = std::min(std::max(sx, 0.0f), static_cast<float>(mw - 1));
        const int x0 = static_cast<int>(sx);
        const int xx1 = std::min(x0 + 1, mw - 1);
        const float fx = sx - x0;

        const float* p000 = probs + z0 * sd + y0 * sh + x0 * c;
        const float* p001 = probs + z0 * sd + y0 * sh + xx1 * c;
        const float* p010 = probs + z0 * sd + yy1 * sh + x0 * c;
        const float* p011 = probs + z0 * sd + yy1 * sh + xx1 * c;
        const float* p100 = probs + zz1 * sd + y0 * sh + x0 * c;
        const float* p101 = probs + zz1 * sd + y0 * sh + xx1 * c;
        const float* p110 = probs + zz1 * sd + yy1 * sh + x0 * c;
        const float* p111 = probs + zz1 * sd + yy1 * sh + xx1 * c;

        float best = -1e30f;
        int best_c = 0;
        for (int ch = 0; ch < c; ++ch) {
          const float c00 = p000[ch] + fx * (p001[ch] - p000[ch]);
          const float c01 = p010[ch] + fx * (p011[ch] - p010[ch]);
          const float c10 = p100[ch] + fx * (p101[ch] - p100[ch]);
          const float c11 = p110[ch] + fx * (p111[ch] - p110[ch]);
          const float c0 = c00 + fy * (c01 - c00);
          const float c1 = c10 + fy * (c11 - c10);
          const float v = c0 + fz * (c1 - c0);
          if (v > best) { best = v; best_c = ch; }
        }
        out_row[x] = static_cast<int16_t>(best_c);
      }
    }
  }
}

int cfun_native_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
