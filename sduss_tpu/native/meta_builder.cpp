// Native patch-metadata builder for mixed-resolution batching.
//
// Rebuilds (in C++) the index-structure construction the reference does in
// Python inside its CUDA-adjacent hot path (reference
// sduss/model_executor/modules/unet.py:104-185 split_sample: padding_idx /
// latent_offset / patch_map built per forward).  In this framework the
// structures are cached per batch composition (sduss_tpu/ops/patching.py),
// but a serving engine sees new compositions continuously under mixed
// workloads; this keeps the builder off the Python interpreter.
//
// Layout contract (must match patching.build_meta exactly; verified by
// tests/test_native.py):
//   image_id     (p_pad,)          patch -> image (i_pad-1 for padding)
//   neighbors    (p_pad, 8)        [up, down, left, right, ul, ur, dl, dr]
//   group_gather (i_pad * max_pp,) group row -> patch index (-1 padded)
//   patch_pos    (p_pad,)          patch -> group row
//   kv_mask      (i_pad, max_pp)   1 where the group slot holds a real patch
//
// Built standalone with g++ (no pybind11 in the image); loaded via ctypes.

#include <cstdint>

extern "C" {

void build_patch_meta(const int32_t* grids, int32_t n_images,
                      int32_t p_pad, int32_t i_pad, int32_t max_pp,
                      int32_t n_patches,
                      int32_t* image_id, int32_t* neighbors,
                      int32_t* group_gather, int32_t* patch_pos,
                      uint8_t* kv_mask) {
  // defaults
  for (int32_t p = 0; p < p_pad; ++p) {
    image_id[p] = i_pad - 1;
    patch_pos[p] = 0;
    for (int k = 0; k < 8; ++k) neighbors[p * 8 + k] = -1;
  }
  const int64_t n_rows = (int64_t)i_pad * max_pp;
  for (int64_t r = 0; r < n_rows; ++r) group_gather[r] = -1;
  for (int64_t r = 0; r < n_rows; ++r) kv_mask[r] = 0;

  int32_t base = 0;
  for (int32_t img = 0; img < n_images; ++img) {
    const int32_t g = grids[img];
    for (int32_t i = 0; i < g; ++i) {
      for (int32_t j = 0; j < g; ++j) {
        const int32_t p = base + i * g + j;
        const int32_t pos = i * g + j;
        image_id[p] = img;
        patch_pos[p] = img * max_pp + pos;
        group_gather[(int64_t)img * max_pp + pos] = p;
        kv_mask[(int64_t)img * max_pp + pos] = 1;

        const int32_t di[8] = {-1, 1, 0, 0, -1, -1, 1, 1};
        const int32_t dj[8] = {0, 0, -1, 1, -1, 1, -1, 1};
        for (int k = 0; k < 8; ++k) {
          const int32_t ii = i + di[k];
          const int32_t jj = j + dj[k];
          neighbors[p * 8 + k] =
              (ii >= 0 && ii < g && jj >= 0 && jj < g) ? base + ii * g + jj
                                                       : -1;
        }
      }
    }
    base += g * g;
  }
  // padded patches point at the dummy image's first group slot
  if (p_pad > n_patches) {
    for (int32_t p = n_patches; p < p_pad; ++p)
      patch_pos[p] = (i_pad - 1) * max_pp;
  }
}

}  // extern "C"
