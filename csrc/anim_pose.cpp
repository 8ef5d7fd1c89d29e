// Native animation pose evaluation (the hot half of
// assets/gltf_loader._fast_node_transforms).
//
// The reference evaluates keyframe animations on the CPU every frame in ~20
// us for the demo skeleton (gltf/src/gltf_json.rs:238-286 sampling +
// scene_queueing.rs joint palettes, README.md:85-86). The vectorized numpy
// path costs ~0.3 ms/frame in interpreter overhead; this native pass does
// the same work — per-channel keyframe search + LINEAR/STEP interpolation
// (slerp for rotations), TRS composition over the cached static decompose,
// and the parent-chain hierarchy walk — in a few microseconds. Arithmetic
// mirrors the numpy path operation-for-operation (f64 keyframe math and
// slerp, f32 lerp/compose/matmul) so the two stay within float tolerance;
// the numpy path remains as the fallback and test oracle.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

void quat_to_mat3(const float* q, float* m /*9*/) {
  const float x = q[0], y = q[1], z = q[2], w = q[3];
  const float xx = x * x, yy = y * y, zz = z * z;
  const float xy = x * y, xz = x * z, yz = y * z;
  const float wx = w * x, wy = w * y, wz = w * z;
  m[0] = 1 - 2 * (yy + zz); m[1] = 2 * (xy - wz); m[2] = 2 * (xz + wy);
  m[3] = 2 * (xy + wz); m[4] = 1 - 2 * (xx + zz); m[5] = 2 * (yz - wx);
  m[6] = 2 * (xz - wy); m[7] = 2 * (yz + wx); m[8] = 1 - 2 * (xx + yy);
}

// glam Quat::slerp parity (core/math3d.quat_slerp: f64 internals,
// shortest-path, nlerp above dot 0.9995, f32 result).
void quat_slerp(const float* af, const float* bf, double t, float* out) {
  double a[4] = {af[0], af[1], af[2], af[3]};
  double b[4] = {bf[0], bf[1], bf[2], bf[3]};
  double dot = a[0] * b[0] + a[1] * b[1] + a[2] * b[2] + a[3] * b[3];
  if (dot < 0.0) {
    for (int i = 0; i < 4; i++) b[i] = -b[i];
    dot = -dot;
  }
  if (dot > 0.9995) {
    double o[4], n = 0.0;
    for (int i = 0; i < 4; i++) { o[i] = a[i] + t * (b[i] - a[i]); n += o[i] * o[i]; }
    n = std::sqrt(n);
    for (int i = 0; i < 4; i++) out[i] = float(o[i] / n);
    return;
  }
  const double theta = std::acos(dot < -1.0 ? -1.0 : (dot > 1.0 ? 1.0 : dot));
  const double s = std::sin(theta);
  const double wa = std::sin((1.0 - t) * theta) / s;
  const double wb = std::sin(t * theta) / s;
  for (int i = 0; i < 4; i++) out[i] = float(wa * a[i] + wb * b[i]);
}

// c = a @ b for row-major 4x4 f32 (numpy matmul parity within ulp)
void mat4_mul(const float* a, const float* b, float* c) {
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 4; j++) {
      float acc = 0.0f;
      for (int k = 0; k < 4; k++) acc += a[i * 4 + k] * b[k * 4 + j];
      c[i * 4 + j] = acc;
    }
}

// math3d.mat3_to_quat parity (Shepperd branches, f64 internals, f32 out).
void mat3_to_quat(const double m[3][3], float* q /*xyzw*/) {
  const double t = m[0][0] + m[1][1] + m[2][2];
  double w, x, y, z;
  if (t > 0.0) {
    const double s = std::sqrt(t + 1.0) * 2.0;
    w = 0.25 * s;
    x = (m[2][1] - m[1][2]) / s;
    y = (m[0][2] - m[2][0]) / s;
    z = (m[1][0] - m[0][1]) / s;
  } else if (m[0][0] > m[1][1] && m[0][0] > m[2][2]) {
    const double s = std::sqrt(1.0 + m[0][0] - m[1][1] - m[2][2]) * 2.0;
    w = (m[2][1] - m[1][2]) / s;
    x = 0.25 * s;
    y = (m[0][1] + m[1][0]) / s;
    z = (m[0][2] + m[2][0]) / s;
  } else if (m[1][1] > m[2][2]) {
    const double s = std::sqrt(1.0 + m[1][1] - m[0][0] - m[2][2]) * 2.0;
    w = (m[0][2] - m[2][0]) / s;
    x = (m[0][1] + m[1][0]) / s;
    y = 0.25 * s;
    z = (m[1][2] + m[2][1]) / s;
  } else {
    const double s = std::sqrt(1.0 + m[2][2] - m[0][0] - m[1][1]) * 2.0;
    w = (m[1][0] - m[0][1]) / s;
    x = (m[0][2] + m[2][0]) / s;
    y = (m[1][2] + m[2][1]) / s;
    z = 0.25 * s;
  }
  q[0] = float(x); q[1] = float(y); q[2] = float(z); q[3] = float(w);
}

// gltf_loader._decompose_trs parity (glam to_scale_rotation_translation
// behavior): f64 column norms, determinant SIGN via cofactor expansion
// (the numpy path consumes only the sign of its LAPACK determinant).
void decompose_trs(const float* m /*16 row-major f32*/, float* s3, float* q4,
                   float* t3) {
  double c[3][3];
  for (int r = 0; r < 3; r++)
    for (int j = 0; j < 3; j++) c[r][j] = double(m[r * 4 + j]);
  t3[0] = m[3]; t3[1] = m[7]; t3[2] = m[11];
  const double det = c[0][0] * (c[1][1] * c[2][2] - c[1][2] * c[2][1]) -
                     c[0][1] * (c[1][0] * c[2][2] - c[1][2] * c[2][0]) +
                     c[0][2] * (c[1][0] * c[2][1] - c[1][1] * c[2][0]);
  const double sign = det < 0.0 ? -1.0 : 1.0;
  double scale[3];
  for (int j = 0; j < 3; j++)
    scale[j] = std::sqrt(c[0][j] * c[0][j] + c[1][j] * c[1][j] +
                         c[2][j] * c[2][j]);
  scale[0] *= sign;
  double rot[3][3];
  for (int j = 0; j < 3; j++) {
    const double safe = std::abs(scale[j]) > 1e-12 ? scale[j] : 1.0;
    for (int r = 0; r < 3; r++) rot[r][j] = c[r][j] / safe;
  }
  mat3_to_quat(rot, q4);
  for (int j = 0; j < 3; j++) s3[j] = float(scale[j]);
}

// glTF cubic Hermite over one keyframe span (gltf_loader._hermite parity:
// f64 coefficients/accumulation, f32 out; rotations renormalized, s == 0
// returns the keyframe value exactly).
void hermite(const float* v0, const float* b0, const float* v1,
             const float* a1, double s, double d, bool is_rot, float v[4]) {
  if (is_rot && s == 0.0) {
    std::memcpy(v, v0, 4 * sizeof(float));
    return;
  }
  const double s2 = s * s, s3 = s2 * s;
  const double c0 = 2.0 * s3 - 3.0 * s2 + 1.0;
  const double c1 = d * (s3 - 2.0 * s2 + s);
  const double c2 = -2.0 * s3 + 3.0 * s2;
  const double c3 = d * (s3 - s2);
  double r[4];
  for (int i = 0; i < 4; i++)
    r[i] = c0 * double(v0[i]) + c1 * double(b0[i]) + c2 * double(v1[i]) +
           c3 * double(a1[i]);
  if (is_rot) {
    double n = std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2] + r[3] * r[3]);
    if (n <= 0.0) n = 1.0;
    for (int i = 0; i < 4; i++) r[i] /= n;
  }
  for (int i = 0; i < 4; i++) v[i] = float(r[i]);
}

// One channel's keyframe sample at `time` into v[4] (the body of the
// channel loop in anim_pose, shared with the multi-animation path).
// Returns false on a past-the-end timestamp.
bool sample_channel(const double* ts, const float* vals, const float* in_tan,
                    const float* out_tan, int64_t count, bool is_step,
                    bool is_cubic, bool is_rot, double time, float v[4]) {
  if (count == 1 || time < ts[0]) {
    std::memcpy(v, vals, 4 * sizeof(float));
    return true;
  }
  int64_t lo = 0, hi = count;
  while (lo < hi) {  // searchsorted(side="right")
    const int64_t mid = (lo + hi) / 2;
    if (ts[mid] <= time) lo = mid + 1; else hi = mid;
  }
  const int64_t k = lo - 1;
  if (k >= count - 1) return false;  // past the end
  const float* v0 = vals + k * 4;
  const float* v1 = vals + (k + 1) * 4;
  if (is_step) {
    std::memcpy(v, v0, 4 * sizeof(float));
  } else {
    const double frac = (time - ts[k]) / (ts[k + 1] - ts[k]);
    if (is_cubic) {
      hermite(v0, out_tan + k * 4, v1, in_tan + (k + 1) * 4, frac,
              ts[k + 1] - ts[k], is_rot, v);
    } else if (is_rot) {
      if (frac == 0.0) std::memcpy(v, v0, 4 * sizeof(float));
      else quat_slerp(v0, v1, frac, v);
    } else {
      const float f = float(frac);
      for (int i = 0; i < 4; i++) v[i] = v0[i] * (1.0f - f) + v1[i] * f;
    }
  }
  return true;
}

// T*R*S compose into a row-major 4x4 (column scaling), matching
// math3d.trs_batch / the compose in anim_pose.
void compose_trs(const float* s, const float* q, const float* t, float* m) {
  float m3[9];
  quat_to_mat3(q, m3);
  for (int r = 0; r < 3; r++)
    for (int col = 0; col < 3; col++) m[r * 4 + col] = m3[r * 3 + col] * s[col];
  m[3] = t[0]; m[7] = t[1]; m[11] = t[2];
  m[12] = m[13] = m[14] = 0.0f;
  m[15] = 1.0f;
}

// Body of anim_pose_multi (shared with anim_prologue): layered evaluation
// of N playing animations into global node poses. Returns 0 on success,
// 1 + anim index on a past-the-end timestamp.
int eval_multi_mats(
    int64_t n_anims, const int64_t* chan_off, const int64_t* offsets,
    const double* times, const float* values, const float* in_tan,
    const float* out_tan, const int64_t* slot_of_chan, const int32_t* path_id,
    const uint8_t* step, const uint8_t* cubic, const double* query_times,
    const int64_t* touch_off, const float* s0, const float* q0,
    const float* t0, const int64_t* touched_idx, int64_t n_nodes,
    const float* static_locals, int64_t n_order, const int64_t* order,
    const int64_t* parents, float* mats) {
  std::vector<float> locals(static_locals,
                            static_locals + size_t(n_nodes) * 16);
  std::vector<uint8_t> touched(size_t(n_nodes), 0);
  std::vector<float> s, q, t;
  for (int64_t a = 0; a < n_anims; a++) {
    const int64_t tb = touch_off[a], te = touch_off[a + 1];
    const int64_t m = te - tb;
    if (m == 0) continue;
    s.assign(s0 + tb * 3, s0 + te * 3);
    q.assign(q0 + tb * 4, q0 + te * 4);
    t.assign(t0 + tb * 3, t0 + te * 3);
    for (int64_t i = 0; i < m; i++) {  // re-touched: base = decompose(now)
      const int64_t node = touched_idx[tb + i];
      if (touched[node])
        decompose_trs(&locals[size_t(node) * 16], &s[i * 3], &q[i * 4],
                      &t[i * 3]);
    }
    const double time = query_times[a];
    for (int64_t c = chan_off[a]; c < chan_off[a + 1]; c++) {
      float v[4];
      if (!sample_channel(times + offsets[c], values + offsets[c] * 4,
                          in_tan + offsets[c] * 4, out_tan + offsets[c] * 4,
                          offsets[c + 1] - offsets[c], step[c], cubic[c],
                          path_id[c] == 1, time, v))
        return 1 + int(a);
      const int64_t slot = slot_of_chan[c];
      switch (path_id[c]) {
        case 0: std::memcpy(&t[slot * 3], v, 3 * sizeof(float)); break;
        case 1: std::memcpy(&q[slot * 4], v, 4 * sizeof(float)); break;
        case 2: std::memcpy(&s[slot * 3], v, 3 * sizeof(float)); break;
        default: break;  // weights: callers fall back before reaching here
      }
    }
    for (int64_t i = 0; i < m; i++) {
      const int64_t node = touched_idx[tb + i];
      compose_trs(&s[i * 3], &q[i * 4], &t[i * 3],
                  &locals[size_t(node) * 16]);
      touched[node] = 1;
    }
  }
  for (int64_t r = 0; r < n_order; r++) {
    const int64_t ni = order[r], p = parents[r];
    if (p < 0)
      std::memcpy(mats + ni * 16, &locals[ni * 16], 16 * sizeof(float));
    else
      mat4_mul(mats + p * 16, &locals[ni * 16], mats + ni * 16);
  }
  return 0;
}

}  // namespace

extern "C" {

// Everything the per-frame animated-queue prologue needs, marshalled ONCE on
// the Python side into one struct (a 25-argument ctypes call costs more in
// argument conversion than the native work itself — tools/native.py
// make_anim_prologue). Every member is 8 bytes (int64_t or pointer), so the
// layout has no padding and the ctypes.Structure mirror matches exactly.
typedef struct {
  // pose evaluation (the anim_pose_multi argument set)
  int64_t n_anims;
  const int64_t* chan_off;       // [n_anims+1]
  const int64_t* offsets;        // [total_chans+1] global keyframe rows
  const double* times;
  const float* values;           // [total,4]
  const float* in_tan;           // [total,4]
  const float* out_tan;          // [total,4]
  const int64_t* slot_of_chan;   // anim-local touched slots
  const int32_t* path_id;        // 0=T 1=R 2=S
  const uint8_t* step;
  const uint8_t* cubic;
  const int64_t* touch_off;      // [n_anims+1]
  const float* s0;               // [total_touched,3]
  const float* q0;               // [total_touched,4]
  const float* t0;               // [total_touched,3]
  const int64_t* touched_idx;    // [total_touched]
  int64_t n_nodes;
  const float* static_locals;    // [n_nodes,16]
  int64_t n_order;
  const int64_t* order;          // [n_order]
  const int64_t* parents;        // [n_order]
  // frame products (scene_queueing.rs:17-57)
  int64_t n_joints;              // total joints across skins, alloc order
  const int64_t* joint_nodes;    // [n_joints] node index per joint
  const float* ibms;             // [n_joints,16] inverse bind matrices
  int64_t n_skinned;             // skinned draw rows (transform = root)
  int64_t n_static;              // static draw rows
  const int64_t* static_idx;     // [n_static] node index per static row
} AnimProloguePack;

// Evaluate one animation at `time` and return every node's GLOBAL pose.
// Channel arrays are the _CompiledAnimation layout (channel c owns
// times/values rows [offsets[c], offsets[c+1])); duplicate (slot, path)
// channels apply in channel order (last write wins). Returns 0 on success,
// 1 for an invalid (past-the-end) timestamp — the caller raises
// AnimationError exactly like the numpy path.
int anim_pose(
    int n_channels, const int64_t* offsets, const double* times,
    const float* values /*[total,4]*/, const float* in_tan /*[total,4]*/,
    const float* out_tan /*[total,4]*/, const int64_t* slot_of_chan,
    const int32_t* path_id /*0=T 1=R 2=S*/, const uint8_t* step,
    const uint8_t* cubic, double time,
    int n_touched, const float* s0 /*[m,3]*/, const float* q0 /*[m,4]*/,
    const float* t0 /*[m,3]*/, const int64_t* touched_idx /*[m]*/,
    int n_nodes, const float* static_locals /*[n,16]*/, int n_order,
    const int64_t* order, const int64_t* parents, float* mats /*[n,16]*/) {
  std::vector<float> s(s0, s0 + size_t(n_touched) * 3);
  std::vector<float> q(q0, q0 + size_t(n_touched) * 4);
  std::vector<float> t(t0, t0 + size_t(n_touched) * 3);

  for (int c = 0; c < n_channels; c++) {
    const int64_t o = offsets[c];
    float v[4];
    if (!sample_channel(times + o, values + o * 4, in_tan + o * 4,
                        out_tan + o * 4, offsets[c + 1] - o, step[c],
                        cubic[c], path_id[c] == 1, time, v))
      return 1;  // past the end
    const int64_t slot = slot_of_chan[c];
    switch (path_id[c]) {
      case 0: std::memcpy(&t[slot * 3], v, 3 * sizeof(float)); break;
      case 1: std::memcpy(&q[slot * 4], v, 4 * sizeof(float)); break;
      case 2: std::memcpy(&s[slot * 3], v, 3 * sizeof(float)); break;
      default: break;  // weights: callers fall back before reaching here
    }
  }

  // locals = static poses, touched nodes overridden by T*R*S (column scale)
  std::vector<float> locals(static_locals,
                            static_locals + size_t(n_nodes) * 16);
  for (int i = 0; i < n_touched; i++) {
    float m3[9];
    quat_to_mat3(&q[size_t(i) * 4], m3);
    float* m = &locals[size_t(touched_idx[i]) * 16];
    for (int r = 0; r < 3; r++)
      for (int col = 0; col < 3; col++)
        m[r * 4 + col] = m3[r * 3 + col] * s[size_t(i) * 3 + col];
    m[3] = t[size_t(i) * 3 + 0];
    m[7] = t[size_t(i) * 3 + 1];
    m[11] = t[size_t(i) * 3 + 2];
    m[12] = m[13] = m[14] = 0.0f;
    m[15] = 1.0f;
  }

  // parent-chain walk in the cached DFS order (lib.rs:181-193 parity:
  // flattened node transforms ARE re-multiplied by parents, a deliberate
  // reference quirk — see gltf_loader.get_node_transforms)
  for (int r = 0; r < n_order; r++) {
    const int64_t ni = order[r], p = parents[r];
    if (p < 0)
      std::memcpy(mats + ni * 16, &locals[ni * 16], 16 * sizeof(float));
    else
      mat4_mul(mats + p * 16, &locals[ni * 16], mats + ni * 16);
  }
  return 0;
}

// Layered evaluation of N playing animations (the fast analog of
// gltf/src/lib.rs:199-230 applied per playing animation in play order,
// scene_queueing.rs:17-57): each animation's TRS base is the DECOMPOSE of
// the accumulated local transform for nodes an earlier animation already
// touched, and the baked static decompose otherwise. All channel/touched
// arrays are the per-animation _CompiledAnimation layouts CONCATENATED in
// play order; chan_off/touch_off give each animation's ranges. Returns 0 on
// success, 1 + anim index for an invalid timestamp.
int anim_pose_multi(
    int n_anims, const int64_t* chan_off /*[n_anims+1]*/,
    const int64_t* offsets /*[total_chans+1] global rows*/,
    const double* times, const float* values /*[total,4]*/,
    const float* in_tan /*[total,4]*/, const float* out_tan /*[total,4]*/,
    const int64_t* slot_of_chan /*anim-local slots*/,
    const int32_t* path_id, const uint8_t* step, const uint8_t* cubic,
    const double* query_times /*[n_anims]*/,
    const int64_t* touch_off /*[n_anims+1]*/,
    const float* s0 /*[total_touched,3]*/, const float* q0 /*[·,4]*/,
    const float* t0 /*[·,3]*/, const int64_t* touched_idx /*[·]*/,
    int n_nodes, const float* static_locals /*[n,16]*/, int n_order,
    const int64_t* order, const int64_t* parents, float* mats /*[n,16]*/) {
  return eval_multi_mats(n_anims, chan_off, offsets, times, values, in_tan,
                         out_tan, slot_of_chan, path_id, step, cubic,
                         query_times, touch_off, s0, q0, t0, touched_idx,
                         n_nodes, static_locals, n_order, order, parents,
                         mats);
}

// The whole animated-queue frame prologue in ONE call (the fast analog of
// gltf_loader.queue_animated's per-frame work, scene_queueing.rs:17-57):
// layered pose evaluation, then joint palettes (palette[j] =
// mats[joint_node[j]] @ ibm[j]) written straight into the scene's palette
// storage, and the per-draw transform array in DrawBlock row order —
// skinned rows get the UN-multiplied root transform, static rows get
// root @ node pose. Returns 0 on success, 1 + anim index on a past-the-end
// timestamp (products are not written on failure).
int anim_prologue(const AnimProloguePack* p,
                  const double* query_times /*[n_anims]*/,
                  const float* root /*16 row-major*/,
                  float* mats /*[n_nodes,16] scratch + output*/,
                  float* palettes /*[n_joints,16] destination*/,
                  float* block_transforms /*[n_skinned+n_static,16]*/) {
  const int rc = eval_multi_mats(
      p->n_anims, p->chan_off, p->offsets, p->times, p->values, p->in_tan,
      p->out_tan, p->slot_of_chan, p->path_id, p->step, p->cubic, query_times,
      p->touch_off, p->s0, p->q0, p->t0, p->touched_idx, p->n_nodes,
      p->static_locals, p->n_order, p->order, p->parents, mats);
  if (rc != 0) return rc;
  for (int64_t j = 0; j < p->n_joints; j++)
    mat4_mul(mats + p->joint_nodes[j] * 16, p->ibms + j * 16,
             palettes + j * 16);
  for (int64_t i = 0; i < p->n_skinned; i++)
    std::memcpy(block_transforms + i * 16, root, 16 * sizeof(float));
  float* statics = block_transforms + p->n_skinned * 16;
  for (int64_t i = 0; i < p->n_static; i++)
    mat4_mul(root, mats + p->static_idx[i] * 16, statics + i * 16);
  return 0;
}

}  // extern "C"
