// Software triangle rasterizer for offline template synthesis.
//
// Native replacement for the reference's pyrender/OpenGL offscreen renderer
// (reference: utils/renderer.py:30-336). Template rendering is an offline CPU
// stage (SURVEY.md §2.3: "the OpenGL renderer has no TPU analog — keep it a
// CPU/offline component"), so it is implemented as a tight C++ z-buffer
// rasterizer with perspective-correct attribute interpolation and headlight
// Lambertian shading approximating the reference's camera-mounted spotlight
// (renderer.py:244-266).
//
// Design (measured on 1680x1680 SSAA templates, the gen_templates shape):
// - Two passes, GPU-style deferred shading: pass 1 is visibility only
//   (edge tests + 1/z compare + face-id store), pass 2 interpolates and
//   shades each pixel ONCE from its winning face. With ~2x overdraw on a
//   closed mesh, single-pass shading paid the (sqrt/div-heavy) shading for
//   every z-test winner; deferring it halves that work and shrinks pass 1's
//   hot loop to fit registers.
// - The edge functions and interpolated 1/z are affine in pixel coordinates;
//   per-row x-spans are pre-clipped to the triangle (a bounding-box loop
//   wastes ~half its iterations on reject tests). The per-pixel accept test
//   stays the exact DIRECT product form: the affine rearrangement loses the
//   exact cancellation on shared edges (adjacent triangles would both
//   reject seam pixels), and it must stay bit-identical to the numpy
//   fallback's test.
// - The z-test runs on 1/z (monotonic on positive floats), so no divide
//   until pass 2.
//
// Build: make -C native   (produces librasterizer.so; ctypes binding in
// foundpose_tpu/renderer/rasterizer.py with a numpy fallback).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

inline float dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

inline Vec3 normalize(const Vec3& v) {
  float n = std::sqrt(dot(v, v));
  if (n < 1e-20f) return {0.f, 0.f, 0.f};
  return {v.x / n, v.y / n, v.z / n};
}

// Projected per-face data cached by pass 1 for pass 2 (inv_area == 0 marks
// a culled/degenerate face, which can never appear in the fid buffer).
struct FaceProj {
  float u0, v0, u1, v1, u2, v2;
  float iz0, iz1, iz2;
  float inv_area;
};

}  // namespace

extern "C" {

// Rasterizes a triangle mesh given in CAMERA coordinates (OpenCV convention:
// +z forward, +y down) with pinhole intrinsics (fx, fy, cx, cy).
//
// vertices:  [n_vertices * 3] float, camera-space positions.
// faces:     [n_faces * 3] int32 vertex indices.
// colors:    [n_vertices * 3] float in [0,1], or nullptr (grey 0.5).
// normals:   [n_vertices * 3] float camera-space normals, or nullptr
//            (per-face geometric normals are used).
// shading:   0 = unlit vertex colors, 1 = Lambertian headlight * colors.
// ambient:   ambient term added to the Lambertian factor (clamped to 1).
// out_color: [h * w * 3] float (pre-initialized background).
// out_depth: [h * w] float (0 = empty).
// out_mask:  [h * w] uint8 (0 = empty).
void rasterize_mesh(
    const float* vertices, int n_vertices,
    const int32_t* faces, int n_faces,
    const float* colors,
    const float* normals,
    float fx, float fy, float cx, float cy,
    int width, int height,
    int shading, float ambient,
    float* out_color, float* out_depth, uint8_t* out_mask) {
  const size_t n_px = static_cast<size_t>(width) * height;
  // Inverse-z buffer initialized to 0 (= infinitely far). Larger 1/z wins;
  // x -> 1/x is strictly monotonic on positive floats, so the winner set is
  // identical to a z < zbuf test.
  float* izbuf = new float[n_px]();
  int32_t* fid = new int32_t[n_px];
  std::fill(fid, fid + n_px, -1);
  FaceProj* fproj = new FaceProj[n_faces];

  // ---- Pass 1: visibility (edge tests + 1/z compare + face-id store) ----
  for (int f = 0; f < n_faces; ++f) {
    fproj[f].inv_area = 0.f;
    const int32_t i0 = faces[3 * f + 0];
    const int32_t i1 = faces[3 * f + 1];
    const int32_t i2 = faces[3 * f + 2];
    if (i0 < 0 || i1 < 0 || i2 < 0 || i0 >= n_vertices || i1 >= n_vertices ||
        i2 >= n_vertices)
      continue;

    const float z0 = vertices[3 * i0 + 2], z1 = vertices[3 * i1 + 2],
                z2 = vertices[3 * i2 + 2];
    // Cull triangles behind the camera.
    if (z0 <= 1e-6f || z1 <= 1e-6f || z2 <= 1e-6f) continue;

    // Project (pixel centers at integer coordinates).
    const float u0 = vertices[3 * i0] / z0 * fx + cx;
    const float v0 = vertices[3 * i0 + 1] / z0 * fy + cy;
    const float u1 = vertices[3 * i1] / z1 * fx + cx;
    const float v1 = vertices[3 * i1 + 1] / z1 * fy + cy;
    const float u2 = vertices[3 * i2] / z2 * fx + cx;
    const float v2 = vertices[3 * i2 + 1] / z2 * fy + cy;

    const float area = (u1 - u0) * (v2 - v0) - (u2 - u0) * (v1 - v0);
    if (std::fabs(area) < 1e-12f) continue;
    const float inv_area = 1.0f / area;

    int xmin = std::max(0, static_cast<int>(std::floor(std::min({u0, u1, u2}))));
    int xmax = std::min(width - 1, static_cast<int>(std::ceil(std::max({u0, u1, u2}))));
    int ymin = std::max(0, static_cast<int>(std::floor(std::min({v0, v1, v2}))));
    int ymax = std::min(height - 1, static_cast<int>(std::ceil(std::max({v0, v1, v2}))));
    if (xmin > xmax || ymin > ymax) continue;

    const float iz0 = 1.0f / z0, iz1 = 1.0f / z1, iz2 = 1.0f / z2;
    fproj[f] = {u0, v0, u1, v1, u2, v2, iz0, iz1, iz2, inv_area};

    // Affine edge-function coefficients, used ONLY to pre-clip each row's
    // x-span (in double): w_i(px, py) = ea_i + eb_i*px + ec_i*py, already
    // divided by the signed area; w2 = 1 - w0 - w1. Derivation:
    // (u_a-px)(v_b-py) - (u_b-px)(v_a-py) =
    //     (u_a v_b - u_b v_a) + px (v_a - v_b) + py (u_b - u_a).
    const double ea0 = ((double)u1 * v2 - (double)u2 * v1) * inv_area;
    const double eb0 = ((double)v1 - v2) * inv_area;
    const double ec0 = ((double)u2 - u1) * inv_area;
    const double ea1 = ((double)u2 * v0 - (double)u0 * v2) * inv_area;
    const double eb1 = ((double)v2 - v0) * inv_area;
    const double ec1 = ((double)u0 - u2) * inv_area;

    for (int y = ymin; y <= ymax; ++y) {
      const float py = static_cast<float>(y);
      // Pre-clip the row's x-span to the triangle: each w_i >= 0 is linear
      // in x, so it bounds x on one side. The bounds carry a +-2 px guard,
      // and near-horizontal constraints (|eb| tiny, where a rounding-scale
      // w error maps to many pixels of bound error) don't clip at all —
      // every surviving pixel still runs the exact direct-form test, so
      // clipping only skips guaranteed rejects.
      int xlo = xmin, xhi = xmax;
      {
        const double r0 = ea0 + ec0 * py;
        const double r1 = ea1 + ec1 * py;
        const double r2 = 1.0 - r0 - r1;
        const double bs[3] = {eb0, eb1, -(eb0 + eb1)};
        const double rs[3] = {r0, r1, r2};
        for (int k = 0; k < 3; ++k) {
          if (std::fabs(bs[k]) < 1e-6) continue;  // grazing: no clip
          // Clamp before the int cast (a tiny |eb| makes the bound huge).
          const double bound = std::min(1e9, std::max(-1e9, -rs[k] / bs[k]));
          if (bs[k] > 0.0) {
            if (bound > xlo) xlo = static_cast<int>(std::floor(bound)) - 2;
          } else {
            if (bound < xhi) xhi = static_cast<int>(std::ceil(bound)) + 2;
          }
        }
        xlo = std::max(xlo, xmin);
        xhi = std::min(xhi, xmax);
      }
      float* iz_row = izbuf + static_cast<size_t>(y) * width;
      int32_t* fid_row = fid + static_cast<size_t>(y) * width;
      // Branchless body: after span pre-clipping nearly every iteration is
      // inside the triangle, so if-converted blends beat branches AND let
      // the compiler vectorize the loop (verified: gcc -O3 -march=native
      // emits masked AVX-512 stores here). The w tests keep the exact
      // direct product form (see the affine-coefficient comment above).
      for (int x = xlo; x <= xhi; ++x) {
        const float px = static_cast<float>(x);
        const float w0 =
            ((u1 - px) * (v2 - py) - (u2 - px) * (v1 - py)) * inv_area;
        const float w1 =
            ((u2 - px) * (v0 - py) - (u0 - px) * (v2 - py)) * inv_area;
        const float w2 = 1.0f - w0 - w1;
        const float iz = w0 * iz0 + w1 * iz1 + w2 * iz2;
        const bool pass =
            (w0 >= 0.f) & (w1 >= 0.f) & (w2 >= 0.f) & (iz > iz_row[x]);
        iz_row[x] = pass ? iz : iz_row[x];
        fid_row[x] = pass ? f : fid_row[x];
      }
    }
  }

  // ---- Pass 2: interpolate + shade each visible pixel once ----
  for (int y = 0; y < height; ++y) {
    const float py = static_cast<float>(y);
    const size_t row = static_cast<size_t>(y) * width;
    for (int x = 0; x < width; ++x) {
      const int32_t f = fid[row + x];
      if (f < 0) continue;
      const size_t idx = row + x;
      const FaceProj& fp = fproj[f];
      const int32_t i0 = faces[3 * f + 0];
      const int32_t i1 = faces[3 * f + 1];
      const int32_t i2 = faces[3 * f + 2];
      const float px = static_cast<float>(x);
      // Same direct-form weights the winning pass-1 iteration computed.
      const float w0 = ((fp.u1 - px) * (fp.v2 - py) -
                        (fp.u2 - px) * (fp.v1 - py)) * fp.inv_area;
      const float w1 = ((fp.u2 - px) * (fp.v0 - py) -
                        (fp.u0 - px) * (fp.v2 - py)) * fp.inv_area;
      const float w2 = 1.0f - w0 - w1;
      const float z = 1.0f / izbuf[idx];

      // Perspective-correct attribute weights.
      const float a0 = w0 * fp.iz0 * z, a1 = w1 * fp.iz1 * z,
                  a2 = w2 * fp.iz2 * z;

      Vec3 p0{vertices[3 * i0], vertices[3 * i0 + 1], vertices[3 * i0 + 2]};
      Vec3 p1{vertices[3 * i1], vertices[3 * i1 + 1], vertices[3 * i1 + 2]};
      Vec3 p2{vertices[3 * i2], vertices[3 * i2 + 1], vertices[3 * i2 + 2]};

      float c0[3] = {0.5f, 0.5f, 0.5f}, c1[3] = {0.5f, 0.5f, 0.5f},
            c2[3] = {0.5f, 0.5f, 0.5f};
      if (colors) {
        for (int k = 0; k < 3; ++k) {
          c0[k] = colors[3 * i0 + k];
          c1[k] = colors[3 * i1 + k];
          c2[k] = colors[3 * i2 + k];
        }
      }

      float shade = 1.0f;
      if (shading == 1) {
        Vec3 n;
        if (normals) {
          Vec3 n0{normals[3 * i0], normals[3 * i0 + 1], normals[3 * i0 + 2]};
          Vec3 n1{normals[3 * i1], normals[3 * i1 + 1], normals[3 * i1 + 2]};
          Vec3 n2{normals[3 * i2], normals[3 * i2 + 1], normals[3 * i2 + 2]};
          n = {a0 * n0.x + a1 * n1.x + a2 * n2.x,
               a0 * n0.y + a1 * n1.y + a2 * n2.y,
               a0 * n0.z + a1 * n1.z + a2 * n2.z};
        } else {
          Vec3 e1{p1.x - p0.x, p1.y - p0.y, p1.z - p0.z};
          Vec3 e2{p2.x - p0.x, p2.y - p0.y, p2.z - p0.z};
          // Geometric normal; direction is irrelevant under fabs below, but
          // normalize to match the fallback's interpolated magnitude.
          n = normalize(cross(e1, e2));
        }
        // Headlight: view direction from surface point to camera origin.
        Vec3 view{-(a0 * p0.x + a1 * p1.x + a2 * p2.x),
                  -(a0 * p0.y + a1 * p1.y + a2 * p2.y),
                  -(a0 * p0.z + a1 * p1.z + a2 * p2.z)};
        // |n_hat . v_hat| = |n.v| / sqrt((n.n)(v.v)): one sqrt + one divide
        // instead of two vector normalizes (2 sqrt + 6 div).
        const float nn = dot(n, n), vv = dot(view, view);
        const float denom = std::sqrt(nn * vv);
        const float lambert =
            denom > 1e-20f ? std::fabs(dot(n, view)) / denom : 0.f;
        shade = std::min(1.0f, ambient + (1.0f - ambient) * lambert);
      }

      out_color[3 * idx + 0] = shade * (a0 * c0[0] + a1 * c1[0] + a2 * c2[0]);
      out_color[3 * idx + 1] = shade * (a0 * c0[1] + a1 * c1[1] + a2 * c2[1]);
      out_color[3 * idx + 2] = shade * (a0 * c0[2] + a1 * c1[2] + a2 * c2[2]);
      out_depth[idx] = z;
      out_mask[idx] = 1;
    }
  }

  delete[] fproj;
  delete[] fid;
  delete[] izbuf;
}

}  // extern "C"
