// Scalar C++ parity oracle for the reference fragment program.
//
// Independent, obviously-correct transliteration of the *math* of
// /root/reference/Code/shader/voxel_fragment.frag (lines cited per function)
// into plain scalar float32 C++ with real per-pixel loops and breaks — the
// native-code component of the framework's test harness (SURVEY.md §2 C12).
// Exposed via a C ABI for ctypes; see sdf3d_tpu/oracle/native.py.
//
// GLSL float semantics notes:
//  - all arithmetic is float (fp32); no doubles anywhere;
//  - GLSL min(x, NaN) conventionally returns x -> std::fmin here (frag:122);
//  - sqrt of a negative yields NaN, which then rides through fmin (frag:121).

#include <cmath>
#include <cstdint>

namespace {

constexpr float kPi = 3.1415925359f;     // frag:15
constexpr int kMaxSteps = 100;           // frag:17
constexpr float kMaxDistance = 100.0f;   // frag:18
constexpr float kEpsilon = 0.01f;        // frag:19

struct Vec3 {
  float x, y, z;
};

inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 operator*(float s, Vec3 v) { return {s * v.x, s * v.y, s * v.z}; }
inline float dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline float length(Vec3 v) { return std::sqrt(dot(v, v)); }
inline Vec3 normalize(Vec3 v) {
  float n = length(v);
  return {v.x / n, v.y / n, v.z / n};
}

// Parameter block layout (23 floats) — must match oracle/native.py.
struct Params {
  Vec3 sphere_center;   // frag:56-60 (0, 0.4, 0)
  float sphere_radius;  // frag:59 (0.2)
  Vec3 camera_pos;      // frag:179 (0, 0.2, 2)
  float fov_deg;        // frag:178 (60)
  Vec3 light_pos;       // frag:182 (5, 5, 0)
  float light_amb;      // frag:184 (0.1)
  Vec3 mat_amb;         // frag:186
  Vec3 mat_dif;         // frag:187
  Vec3 mat_ref;         // frag:188
  float mat_shn;        // frag:189 (12)
  float shadow_k;       // frag:205 (10)
};

// sceneSDF = min(INF, plane.y, sphere) — frag:54-81.
inline float scene_sdf(Vec3 p, const Params& prm) {
  float plane = p.y;                                          // frag:66-71
  float sph = length(p - prm.sphere_center) - prm.sphere_radius;  // frag:54-64
  float sdf = std::fmin(1.0f / 0.0f, plane);                  // frag:75-77
  return std::fmin(sdf, sph);                                 // frag:78
}

// raymarch — frag:86-103. Unconditional distance += sdf, then break test.
inline float raymarch(Vec3 position, Vec3 direction, const Params& prm) {
  float distance = 0.0f;
  for (int i = 0; i < kMaxSteps; ++i) {
    Vec3 ray = position + distance * direction;   // frag:95
    float sdf = scene_sdf(ray, prm);              // frag:96
    distance += sdf;                              // frag:97
    if (distance > kMaxDistance || sdf < kEpsilon) break;  // frag:99
  }
  return distance;
}

// shadow — frag:105-132 (Quilez improved soft shadow).
inline float shadow(Vec3 position, Vec3 direction, float k, const Params& prm) {
  float distance = 0.0f;
  float sdf = 1.0f / 0.0f;
  float sh = 1.0f;
  for (int i = 0; i < kMaxSteps; ++i) {
    Vec3 ray = position + distance * direction;                       // frag:118
    float sdf_new = scene_sdf(ray, prm);                              // frag:119
    float intersection = (i == 0) ? 0.0f : sdf_new * sdf_new / (2.0f * sdf);  // frag:120
    float d_est = std::sqrt(sdf_new * sdf_new - intersection * intersection); // frag:121
    sh = std::fmin(sh, k * d_est / std::fmax(0.0f, distance - intersection)); // frag:122
    sdf = sdf_new;                                                    // frag:123
    distance += sdf_new;                                              // frag:124
    if (distance > kMaxDistance || sh < kEpsilon) break;              // frag:126
  }
  if (sh < 0.0f) sh = 0.0f;  // frag:129 clamp
  if (sh > 1.0f) sh = 1.0f;
  return sh;
}

// normal — frag:134-155: 6-tap central differences at ±EPSILON.
inline Vec3 normal(Vec3 p, const Params& prm) {
  const Vec3 dx{kEpsilon, 0.0f, 0.0f}, dy{0.0f, kEpsilon, 0.0f}, dz{0.0f, 0.0f, kEpsilon};
  float nx = scene_sdf(p + dx, prm) - scene_sdf(p - dx, prm);
  float ny = scene_sdf(p + dy, prm) - scene_sdf(p - dy, prm);
  float nz = scene_sdf(p + dz, prm) - scene_sdf(p - dz, prm);
  return normalize({nx, ny, nz});
}

// Apply a row-major 4x4 to (v, w) and return xyz — the shader's
// inverse(V_mat) * vec4(v, w) at frag:180,192.
inline Vec3 xform(const float* m, Vec3 v, float w) {
  return {m[0] * v.x + m[1] * v.y + m[2] * v.z + m[3] * w,
          m[4] * v.x + m[5] * v.y + m[6] * v.z + m[7] * w,
          m[8] * v.x + m[9] * v.y + m[10] * v.z + m[11] * w};
}

}  // namespace

extern "C" {

// Render the reference scene: out_rgb is H*W*3 float32, row 0 at top.
// view_inv16: row-major inverse view matrix (identity when no arcball input).
// params: the 23-float Params block above.
void sdf3d_render_reference(const float* view_inv16, const float* params,
                            int width, int height, float* out_rgb) {
  const Params& prm = *reinterpret_cast<const Params*>(params);

  Vec3 cam_pos = xform(view_inv16, prm.camera_pos, 1.0f);  // frag:180
  float fz = -2.0f / std::tan(prm.fov_deg * kPi / 360.0f); // frag:191 (the quirky 2)
  float ar = static_cast<float>(width) / static_cast<float>(height);  // geom:8

  for (int row = 0; row < height; ++row) {
    // Fragment center UV with GL bottom-left origin; row 0 = image top.
    float qy = 1.0f - (2.0f * (static_cast<float>(row) + 0.5f) / static_cast<float>(height));
    for (int col = 0; col < width; ++col) {
      float qx = (2.0f * (static_cast<float>(col) + 0.5f) / static_cast<float>(width)) - 1.0f;

      Vec3 ray = normalize({qx * ar, qy, fz});             // frag:191
      ray = normalize(xform(view_inv16, ray, 0.0f));       // frag:192

      float d = raymarch(cam_pos, ray, prm);               // frag:195
      Vec3 P = cam_pos + d * ray;                          // frag:196 (no miss branch)
      Vec3 N = normal(P, prm);                             // frag:197

      Vec3 view = normalize(cam_pos - P);                  // frag:200
      Vec3 incident = normalize(prm.light_pos - P);        // frag:201
      Vec3 halfway = normalize(incident + view);           // frag:203
      float spec = std::pow(std::fmax(dot(N, halfway), 0.0f), prm.mat_shn);  // frag:204
      float diff_dot = dot(N, incident);                   // frag:205
      if (diff_dot < 0.0f) diff_dot = 0.0f;
      if (diff_dot > 1.0f) diff_dot = 1.0f;
      float sh = shadow(P + (2.0f * kEpsilon) * N, incident, prm.shadow_k, prm);
      float dif = diff_dot * sh;

      float* px = out_rgb + (static_cast<int64_t>(row) * width + col) * 3;
      px[0] = prm.light_amb * prm.mat_amb.x + dif * prm.mat_dif.x + spec * prm.mat_ref.x;
      px[1] = prm.light_amb * prm.mat_amb.y + dif * prm.mat_dif.y + spec * prm.mat_ref.y;
      px[2] = prm.light_amb * prm.mat_amb.z + dif * prm.mat_dif.z + spec * prm.mat_ref.z;
    }
  }
}

}  // extern "C"
