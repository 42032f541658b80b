// Fine-occupancy-grid assembly — native geometry kernel.
//
// Builds the dense fine grid the isosurface pass consumes: nearest-
// upsampled coarse values (sign-correct away from the surface), exact
// coarse values at shared grid points, and refined values scattered at the
// active-voxel sample points. The numpy version of this (3x np.repeat over
// ~340 MB + a 35M-element fancy scatter) dominated mesh-generation wall
// time on the single host core; this does one fused pass.

#include <cstdint>
#include <cstring>

extern "C" {

// coarse: [(r0+1)^3] C-order; out: [(r0*u+1)^3] C-order (pre-allocated).
// flat_idx/vals: n refined samples addressed into the fine grid.
void assemble_fine(const float* coarse, int r0, int u,
                   const int64_t* flat_idx, const float* vals, int64_t n,
                   float* out) {
  const int rc = r0 + 1;
  const int rf = r0 * u + 1;
  // nearest upsample: fine point f maps to coarse voxel min(f / u, r0 - 1);
  // exact coarse value where f % u == 0
  for (int x = 0; x < rf; ++x) {
    int cx_n = x / u < r0 ? x / u : r0 - 1;
    int cx_e = x / u;                     // exact when x % u == 0
    for (int y = 0; y < rf; ++y) {
      int cy_n = y / u < r0 ? y / u : r0 - 1;
      int cy_e = y / u;
      const float* crow_n = coarse + ((size_t)cx_n * rc + cy_n) * rc;
      const float* crow_e = coarse + ((size_t)cx_e * rc + cy_e) * rc;
      float* orow = out + ((size_t)x * rf + y) * rf;
      bool xy_exact = (x % u == 0) && (y % u == 0);
      for (int z = 0; z < rf; ++z) {
        if (xy_exact && z % u == 0) {
          orow[z] = crow_e[z / u];
        } else {
          int cz = z / u < r0 ? z / u : r0 - 1;
          orow[z] = crow_n[cz];
        }
      }
    }
  }
  for (int64_t i = 0; i < n; ++i) out[flat_idx[i]] = vals[i];
}

}  // extern "C"
