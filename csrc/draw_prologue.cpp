// Draw-stream prologue (native half of scene/draw_stream.py).
//
// The reference's per-frame renderer prologue sorts the draw list and merges
// consecutive identical (tag, joints) draws into instanced indirect commands
// in ~20 us at 16k-draw capacity (renderer/src/renderer.rs:215-256). Here the
// equivalent work — one stable sort by the packed u64 draw key, then a
// gather of transforms + per-draw ints into the upload layout with the
// instance-merge group scan fused in — runs as a single native pass so the
// Python frame loop stays out of the per-draw path entirely.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>

extern "C" {

// keys [n] u64 packed sort keys (see scene.py _pack_key)
// transforms [n,16] f32 row-major 4x4 model matrices
// material/joints/skinned [n] i32 per-draw columns
// Outputs (caller allocates; pdf/pdi tails beyond n are caller-zeroed):
//   order [n] i32, sorted_keys [n] u64,
//   pdf [>=n,12] f32 (sorted 3x4 transform rows),
//   pdi [>=n,4] i32 (material, joints_offset, skinned, debug_id = the
//   sorted index of the draw's instance-merge group head).
void draw_prologue(const uint64_t* keys, const float* transforms,
                   const int32_t* material, const int32_t* joints,
                   const int32_t* skinned, int n, int32_t* order,
                   uint64_t* sorted_keys, float* pdf, int32_t* pdi) {
  std::iota(order, order + n, 0);
  std::stable_sort(order, order + n,
                   [&](int32_t a, int32_t b) { return keys[a] < keys[b]; });
  int32_t group_first = 0;
  for (int i = 0; i < n; i++) {
    const int32_t s = order[i];
    const uint64_t k = keys[s];
    if (i == 0 || k != sorted_keys[i - 1]) group_first = i;
    sorted_keys[i] = k;
    std::memcpy(pdf + size_t(i) * 12, transforms + size_t(s) * 16,
                12 * sizeof(float));
    int32_t* d = pdi + size_t(i) * 4;
    d[0] = material[s];
    d[1] = joints[s];
    d[2] = skinned[s];
    d[3] = group_first;
  }
}

}  // extern "C"
