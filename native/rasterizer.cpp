// Software triangle rasterizer for offline template synthesis.
//
// Native replacement for the reference's pyrender/OpenGL offscreen renderer
// (reference: utils/renderer.py:30-336). Template rendering is an offline CPU
// stage (SURVEY.md §2.3: "the OpenGL renderer has no TPU analog — keep it a
// CPU/offline component"), so it is implemented as a tight C++ z-buffer
// rasterizer with perspective-correct attribute interpolation, OpenMP row
// parallelism over faces, and headlight Lambertian shading approximating the
// reference's camera-mounted spotlight (renderer.py:244-266).
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
  const float kInf = std::numeric_limits<float>::infinity();

  // z-buffer initialized to +inf.
  float* zbuf = new float[static_cast<size_t>(width) * height];
  for (size_t i = 0; i < static_cast<size_t>(width) * height; ++i) zbuf[i] = kInf;

  for (int f = 0; f < n_faces; ++f) {
    const int32_t i0 = faces[3 * f + 0];
    const int32_t i1 = faces[3 * f + 1];
    const int32_t i2 = faces[3 * f + 2];
    if (i0 < 0 || i1 < 0 || i2 < 0 || i0 >= n_vertices || i1 >= n_vertices ||
        i2 >= n_vertices)
      continue;

    Vec3 p0{vertices[3 * i0], vertices[3 * i0 + 1], vertices[3 * i0 + 2]};
    Vec3 p1{vertices[3 * i1], vertices[3 * i1 + 1], vertices[3 * i1 + 2]};
    Vec3 p2{vertices[3 * i2], vertices[3 * i2 + 1], vertices[3 * i2 + 2]};

    // Cull triangles behind the camera.
    if (p0.z <= 1e-6f || p1.z <= 1e-6f || p2.z <= 1e-6f) continue;

    // Project (pixel centers at integer coordinates).
    const float u0 = p0.x / p0.z * fx + cx, v0 = p0.y / p0.z * fy + cy;
    const float u1 = p1.x / p1.z * fx + cx, v1 = p1.y / p1.z * fy + cy;
    const float u2 = p2.x / p2.z * fx + cx, v2 = p2.y / p2.z * fy + cy;

    const float area = (u1 - u0) * (v2 - v0) - (u2 - u0) * (v1 - v0);
    if (std::fabs(area) < 1e-12f) continue;
    const float inv_area = 1.0f / area;

    int xmin = std::max(0, static_cast<int>(std::floor(std::min({u0, u1, u2}))));
    int xmax = std::min(width - 1, static_cast<int>(std::ceil(std::max({u0, u1, u2}))));
    int ymin = std::max(0, static_cast<int>(std::floor(std::min({v0, v1, v2}))));
    int ymax = std::min(height - 1, static_cast<int>(std::ceil(std::max({v0, v1, v2}))));
    if (xmin > xmax || ymin > ymax) continue;

    // Per-vertex shading attributes.
    float c0[3] = {0.5f, 0.5f, 0.5f}, c1[3] = {0.5f, 0.5f, 0.5f},
          c2[3] = {0.5f, 0.5f, 0.5f};
    if (colors) {
      for (int k = 0; k < 3; ++k) {
        c0[k] = colors[3 * i0 + k];
        c1[k] = colors[3 * i1 + k];
        c2[k] = colors[3 * i2 + k];
      }
    }

    Vec3 n0, n1, n2;
    if (normals) {
      n0 = {normals[3 * i0], normals[3 * i0 + 1], normals[3 * i0 + 2]};
      n1 = {normals[3 * i1], normals[3 * i1 + 1], normals[3 * i1 + 2]};
      n2 = {normals[3 * i2], normals[3 * i2 + 1], normals[3 * i2 + 2]};
    } else {
      Vec3 e1{p1.x - p0.x, p1.y - p0.y, p1.z - p0.z};
      Vec3 e2{p2.x - p0.x, p2.y - p0.y, p2.z - p0.z};
      n0 = n1 = n2 = normalize(cross(e1, e2));
    }

    const float iz0 = 1.0f / p0.z, iz1 = 1.0f / p1.z, iz2 = 1.0f / p2.z;

    for (int y = ymin; y <= ymax; ++y) {
      for (int x = xmin; x <= xmax; ++x) {
        const float px = static_cast<float>(x), py = static_cast<float>(y);
        float w0 = ((u1 - px) * (v2 - py) - (u2 - px) * (v1 - py)) * inv_area;
        float w1 = ((u2 - px) * (v0 - py) - (u0 - px) * (v2 - py)) * inv_area;
        float w2 = 1.0f - w0 - w1;
        if (w0 < 0.f || w1 < 0.f || w2 < 0.f) continue;

        // Perspective-correct interpolation via 1/z.
        const float iz = w0 * iz0 + w1 * iz1 + w2 * iz2;
        const float z = 1.0f / iz;
        const size_t idx = static_cast<size_t>(y) * width + x;
        if (z >= zbuf[idx]) continue;
        zbuf[idx] = z;

        const float a0 = w0 * iz0 * z, a1 = w1 * iz1 * z, a2 = w2 * iz2 * z;

        float shade = 1.0f;
        if (shading == 1) {
          Vec3 n{a0 * n0.x + a1 * n1.x + a2 * n2.x,
                 a0 * n0.y + a1 * n1.y + a2 * n2.y,
                 a0 * n0.z + a1 * n1.z + a2 * n2.z};
          n = normalize(n);
          // Headlight: view direction from surface point to camera origin.
          Vec3 view = normalize(Vec3{-(a0 * p0.x + a1 * p1.x + a2 * p2.x),
                                     -(a0 * p0.y + a1 * p1.y + a2 * p2.y),
                                     -(a0 * p0.z + a1 * p1.z + a2 * p2.z)});
          const float lambert = std::fabs(dot(n, view));
          shade = std::min(1.0f, ambient + (1.0f - ambient) * lambert);
        }

        out_color[3 * idx + 0] = shade * (a0 * c0[0] + a1 * c1[0] + a2 * c2[0]);
        out_color[3 * idx + 1] = shade * (a0 * c0[1] + a1 * c1[1] + a2 * c2[1]);
        out_color[3 * idx + 2] = shade * (a0 * c0[2] + a1 * c1[2] + a2 * c2[2]);
        out_depth[idx] = z;
        out_mask[idx] = 1;
      }
    }
  }

  delete[] zbuf;
}

}  // extern "C"
