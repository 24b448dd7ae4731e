// gs2d_tpu native host library.
//
// TPU-native counterpart of the reference's host/CUDA helper layer:
//  * knn3_mean_sq_dist — mean squared distance to the 3 nearest
//    neighbors via a uniform spatial grid (capability of the
//    simple-knn CUDA submodule, SURVEY.md §2.2; used once at init).
//  * parse_points3d_bin / parse_images_bin_poses — fast COLMAP binary
//    parsing (multi-million-point models stall the pure-Python reader).
//
// Exposed as a C ABI for ctypes (no pybind11 in the image). Build:
//   make -C native
// Python falls back to numpy implementations when the .so is absent.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// KNN
// ---------------------------------------------------------------------------

// out[i] = mean of squared distances from point i to its 3 nearest
// neighbors. Uniform-grid neighborhood search with ring expansion;
// exact because the search radius grows until the 3-NN bound is proven.
void knn3_mean_sq_dist(const float* pts, int64_t n, float* out) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0.f;
    return;
  }
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], pts[3 * i + d]);
      hi[d] = std::max(hi[d], pts[3 * i + d]);
    }
  float ext[3] = {hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2]};
  float vol = std::max(ext[0], 1e-9f) * std::max(ext[1], 1e-9f) *
              std::max(ext[2], 1e-9f);
  // ~8 points per cell on average
  float cell = std::cbrt(vol * 8.f / (float)n);
  cell = std::max(cell, 1e-9f);
  int gx = std::max(1, std::min(512, (int)(ext[0] / cell) + 1));
  int gy = std::max(1, std::min(512, (int)(ext[1] / cell) + 1));
  int gz = std::max(1, std::min(512, (int)(ext[2] / cell) + 1));
  float inv[3] = {gx / std::max(ext[0], 1e-9f), gy / std::max(ext[1], 1e-9f),
                  gz / std::max(ext[2], 1e-9f)};

  std::vector<int> cix(n), ciy(n), ciz(n);
  std::vector<int64_t> cell_of(n);
  std::vector<int64_t> counts((int64_t)gx * gy * gz + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    int cx = std::min(gx - 1, std::max(0, (int)((pts[3 * i] - lo[0]) * inv[0])));
    int cy = std::min(gy - 1, std::max(0, (int)((pts[3 * i + 1] - lo[1]) * inv[1])));
    int cz = std::min(gz - 1, std::max(0, (int)((pts[3 * i + 2] - lo[2]) * inv[2])));
    cix[i] = cx; ciy[i] = cy; ciz[i] = cz;
    cell_of[i] = ((int64_t)cz * gy + cy) * gx + cx;
    counts[cell_of[i] + 1]++;
  }
  for (size_t c = 1; c < counts.size(); ++c) counts[c] += counts[c - 1];
  std::vector<int64_t> order(n);
  {
    std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
    for (int64_t i = 0; i < n; ++i) order[cursor[cell_of[i]]++] = i;
  }

  float csx = ext[0] / gx, csy = ext[1] / gy, csz = ext[2] / gz;
  float cmin = std::min({csx, csy, csz});

#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n; ++i) {
    float best[3] = {1e30f, 1e30f, 1e30f};
    const float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
    int maxring = std::max({gx, gy, gz});
    for (int ring = 0; ring <= maxring; ++ring) {
      // points guaranteed closer than (ring)*cmin are already covered
      if (ring > 0) {
        float safe = (ring - 1) * cmin;
        if (best[2] < safe * safe) break;
      }
      int x0 = std::max(0, cix[i] - ring), x1 = std::min(gx - 1, cix[i] + ring);
      int y0 = std::max(0, ciy[i] - ring), y1 = std::min(gy - 1, ciy[i] + ring);
      int z0 = std::max(0, ciz[i] - ring), z1 = std::min(gz - 1, ciz[i] + ring);
      for (int cz = z0; cz <= z1; ++cz)
        for (int cy = y0; cy <= y1; ++cy)
          for (int cx = x0; cx <= x1; ++cx) {
            // only the shell of this ring (Chebyshev distance == ring;
            // clamped bounds must not re-visit interior cells)
            int cheb = std::max({std::abs(cx - cix[i]), std::abs(cy - ciy[i]),
                                 std::abs(cz - ciz[i])});
            if (cheb != ring) continue;
            int64_t c = ((int64_t)cz * gy + cy) * gx + cx;
            for (int64_t k = counts[c]; k < counts[c + 1]; ++k) {
              int64_t j = order[k];
              if (j == i) continue;
              float dx = pts[3 * j] - px, dy = pts[3 * j + 1] - py,
                    dz = pts[3 * j + 2] - pz;
              float d2 = dx * dx + dy * dy + dz * dz;
              if (d2 < best[2]) {
                if (d2 < best[0]) {
                  best[2] = best[1]; best[1] = best[0]; best[0] = d2;
                } else if (d2 < best[1]) {
                  best[2] = best[1]; best[1] = d2;
                } else {
                  best[2] = d2;
                }
              }
            }
          }
      if (ring > 0 && (x0 == 0 && y0 == 0 && z0 == 0 && x1 == gx - 1 &&
                       y1 == gy - 1 && z1 == gz - 1))
        break;  // searched everything
    }
    // average only the FILLED neighbor slots: with n == 2 or 3 the
    // 1e30 sentinels would otherwise poison the mean (log-scale init
    // then explodes to exp(34)-unit splats)
    float sum = 0.0f;
    int filled = 0;
    for (int b = 0; b < 3; ++b)
      if (best[b] < 9e29f) { sum += best[b]; ++filled; }
    out[i] = filled ? sum / (float)filled : 1e-8f;
  }
}

// ---------------------------------------------------------------------------
// COLMAP binary parsing
// ---------------------------------------------------------------------------

static uint64_t read_u64(FILE* f) {
  uint64_t v = 0;
  if (fread(&v, 8, 1, f) != 1) return 0;
  return v;
}

// Returns point count, or -1 on error. Call with buffers of size n*3 (xyz,
// f64), n*3 (rgb, u8), n (err, f64); pass nullptrs with n_alloc=0 to query
// the count only.
int64_t parse_points3d_bin(const char* path, double* xyz, uint8_t* rgb,
                           double* err, int64_t n_alloc) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = read_u64(f);
  if (n_alloc == 0) {
    fclose(f);
    return (int64_t)n;
  }
  if ((int64_t)n > n_alloc) {
    fclose(f);
    return -1;
  }
  for (uint64_t i = 0; i < n; ++i) {
    int64_t id;
    if (fread(&id, 8, 1, f) != 1) { fclose(f); return -1; }
    if (fread(xyz + 3 * i, 8, 3, f) != 3) { fclose(f); return -1; }
    if (fread(rgb + 3 * i, 1, 3, f) != 3) { fclose(f); return -1; }
    if (fread(err + i, 8, 1, f) != 1) { fclose(f); return -1; }
    uint64_t track = read_u64(f);
    if (fseek(f, (long)(track * 8), SEEK_CUR) != 0) { fclose(f); return -1; }
  }
  fclose(f);
  return (int64_t)n;
}

// Parses image poses only (qvec, tvec, camera_id, name). Names are packed
// into `names` (null-separated, cap `names_cap` bytes). Returns image
// count or -1.
int64_t parse_images_bin_poses(const char* path, double* qvec, double* tvec,
                               int32_t* cam_ids, int32_t* img_ids,
                               char* names, int64_t names_cap,
                               int64_t n_alloc) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = read_u64(f);
  if (n_alloc == 0) {
    fclose(f);
    return (int64_t)n;
  }
  if ((int64_t)n > n_alloc) { fclose(f); return -1; }
  int64_t name_off = 0;
  for (uint64_t i = 0; i < n; ++i) {
    if (fread(img_ids + i, 4, 1, f) != 1) { fclose(f); return -1; }
    if (fread(qvec + 4 * i, 8, 4, f) != 4) { fclose(f); return -1; }
    if (fread(tvec + 3 * i, 8, 3, f) != 3) { fclose(f); return -1; }
    if (fread(cam_ids + i, 4, 1, f) != 1) { fclose(f); return -1; }
    int ch;
    while ((ch = fgetc(f)) != EOF && ch != 0) {
      if (name_off < names_cap - 1) names[name_off++] = (char)ch;
    }
    // bounds-checked terminator: once names fills up, further images
    // must not write past the caller's buffer
    if (name_off < names_cap) names[name_off++] = 0;
    uint64_t npts = read_u64(f);
    if (fseek(f, (long)(npts * 24), SEEK_CUR) != 0) { fclose(f); return -1; }
  }
  fclose(f);
  return (int64_t)n;
}

}  // extern "C"
