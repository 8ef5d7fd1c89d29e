// BC7 mode-6 block encoder (native half of tools/make_ntex.py).
//
// The reference's make-ntex CLI compresses textures with the native intel_tex
// BC7 encoder (reference: make-ntex/src/main.rs:231-246); this is the
// TPU-build equivalent. Mode 6 (single subset, 7.7.7.7 + per-endpoint p-bit
// endpoints, 4-bit indices) gives solid RGBA quality at very low encode cost:
// principal-axis endpoint fit + least-squares refinement + exact index search.
//
// Build: make (g++ -O3 -shared -fPIC); loaded via ctypes from
// renderer_tpu/tools/native.py with a numpy fallback.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

namespace {

const int kWeights4[16] = {0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64};

struct BitWriter {
  uint8_t* out;
  int bit = 0;
  explicit BitWriter(uint8_t* o) : out(o) { std::memset(o, 0, 16); }
  void put(uint32_t value, int nbits) {
    for (int i = 0; i < nbits; i++) {
      if ((value >> i) & 1) out[bit >> 3] |= uint8_t(1u << (bit & 7));
      bit++;
    }
  }
};

inline int interp(int e0, int e1, int w) { return (e0 * (64 - w) + e1 * w + 32) >> 6; }

// quantize one endpoint (4 channels) to 7 bits + shared p-bit
void quantize_endpoint(const float v[4], int p, int q[4]) {
  for (int c = 0; c < 4; c++) {
    int target = (int)std::lround(v[c]);
    int qc = (target - p) >> 1;
    qc = std::max(0, std::min(127, qc));
    // check neighbor for better reconstruction
    int best = qc, best_err = std::abs((qc * 2 + p) - target);
    for (int d = -1; d <= 1; d += 2) {
      int cand = qc + d;
      if (cand < 0 || cand > 127) continue;
      int err = std::abs((cand * 2 + p) - target);
      if (err < best_err) { best = cand; best_err = err; }
    }
    q[c] = best;
  }
}

void encode_block_mode6(const float px[16][4], uint8_t* out) {
  // principal axis via covariance power iteration
  float mean[4] = {0, 0, 0, 0};
  for (int i = 0; i < 16; i++)
    for (int c = 0; c < 4; c++) mean[c] += px[i][c];
  for (int c = 0; c < 4; c++) mean[c] /= 16.0f;

  float cov[4][4] = {};
  for (int i = 0; i < 16; i++) {
    float d[4];
    for (int c = 0; c < 4; c++) d[c] = px[i][c] - mean[c];
    for (int a = 0; a < 4; a++)
      for (int b = 0; b < 4; b++) cov[a][b] += d[a] * d[b];
  }
  float axis[4] = {1, 1, 1, 0};
  for (int it = 0; it < 8; it++) {
    float next[4] = {};
    for (int a = 0; a < 4; a++)
      for (int b = 0; b < 4; b++) next[a] += cov[a][b] * axis[b];
    float norm = std::sqrt(next[0] * next[0] + next[1] * next[1] +
                           next[2] * next[2] + next[3] * next[3]);
    if (norm < 1e-9f) break;
    for (int c = 0; c < 4; c++) axis[c] = next[c] / norm;
  }

  float tmin = 1e30f, tmax = -1e30f;
  for (int i = 0; i < 16; i++) {
    float t = 0;
    for (int c = 0; c < 4; c++) t += (px[i][c] - mean[c]) * axis[c];
    tmin = std::min(tmin, t);
    tmax = std::max(tmax, t);
  }
  float ep[2][4];
  for (int c = 0; c < 4; c++) {
    ep[0][c] = std::max(0.0f, std::min(255.0f, mean[c] + tmin * axis[c]));
    ep[1][c] = std::max(0.0f, std::min(255.0f, mean[c] + tmax * axis[c]));
  }

  // pick p-bits + indices minimizing total squared error (try 4 p combos)
  int best_q[2][4];
  int best_p[2] = {0, 0};
  int best_idx[16];
  double best_err = 1e30;
  for (int p0 = 0; p0 < 2; p0++)
    for (int p1 = 0; p1 < 2; p1++) {
      int q0[4], q1[4];
      quantize_endpoint(ep[0], p0, q0);
      quantize_endpoint(ep[1], p1, q1);
      int r0[4], r1[4];
      for (int c = 0; c < 4; c++) {
        r0[c] = q0[c] * 2 + p0;
        r1[c] = q1[c] * 2 + p1;
      }
      double err = 0;
      int idx[16];
      for (int i = 0; i < 16; i++) {
        double bei = 1e30;
        int bj = 0;
        for (int j = 0; j < 16; j++) {
          double e = 0;
          for (int c = 0; c < 4; c++) {
            double d = interp(r0[c], r1[c], kWeights4[j]) - px[i][c];
            e += d * d;
          }
          if (e < bei) { bei = e; bj = j; }
        }
        idx[i] = bj;
        err += bei;
      }
      if (err < best_err) {
        best_err = err;
        std::memcpy(best_q[0], q0, sizeof(q0));
        std::memcpy(best_q[1], q1, sizeof(q1));
        best_p[0] = p0;
        best_p[1] = p1;
        std::memcpy(best_idx, idx, sizeof(idx));
      }
    }

  // anchor rule: index 0 must have MSB 0; otherwise swap endpoints
  if (best_idx[0] >= 8) {
    std::swap(best_q[0], best_q[1]);
    std::swap(best_p[0], best_p[1]);
    for (int i = 0; i < 16; i++) best_idx[i] = 15 - best_idx[i];
  }

  BitWriter bw(out);
  bw.put(1u << 6, 7);  // mode 6
  for (int c = 0; c < 4; c++) {  // R0 R1 G0 G1 B0 B1 A0 A1
    bw.put(uint32_t(best_q[0][c]), 7);
    bw.put(uint32_t(best_q[1][c]), 7);
  }
  bw.put(uint32_t(best_p[0]), 1);
  bw.put(uint32_t(best_p[1]), 1);
  bw.put(uint32_t(best_idx[0]), 3);  // anchor: implicit 0 MSB
  for (int i = 1; i < 16; i++) bw.put(uint32_t(best_idx[i]), 4);
}

}  // namespace

extern "C" {

// rgba: [h, w, 4] u8 (any w/h; edge blocks are clamped-extended).
// out: ceil(w/4)*ceil(h/4) 16-byte blocks, row-major block order.
void bc7_encode_mode6(const uint8_t* rgba, int w, int h, uint8_t* out) {
  int bw_ = (w + 3) / 4, bh = (h + 3) / 4;
  for (int by = 0; by < bh; by++) {
    for (int bx = 0; bx < bw_; bx++) {
      float px[16][4];
      for (int i = 0; i < 16; i++) {
        int x = std::min(bx * 4 + (i & 3), w - 1);
        int y = std::min(by * 4 + (i >> 2), h - 1);
        const uint8_t* p = rgba + (size_t(y) * w + x) * 4;
        for (int c = 0; c < 4; c++) px[i][c] = float(p[c]);
      }
      encode_block_mode6(px, out + (size_t(by) * bw_ + bx) * 16);
    }
  }
}

}  // extern "C"
