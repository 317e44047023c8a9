// Native host-side data kernels for the input pipeline.
//
// The reference delegates its host data path to torch DataLoader workers +
// torchvision C++ kernels (SURVEY.md §2 "Data pipeline"); this is the
// equivalent native layer for the TPU build: fused crop + horizontal-flip +
// normalize([-1,1]) batch assembly in one pass over each image, threaded
// across the batch. Random crop/flip *parameters* are drawn in Python (same
// RNG stream as the numpy path) so both paths are bit-identical; only the
// pixel work lives here.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// One image: crop (top,left,crop_h,crop_w) from (h,w,c) uint8, optional
// horizontal flip, normalize to [-1,1] float32. out: (crop_h, crop_w, c).
static void crop_flip_normalize_one(const uint8_t* img, int h, int w, int c,
                                    int top, int left, int flip, int crop_h,
                                    int crop_w, float* out) {
  (void)h;
  // IEEE division (not reciprocal-multiply) keeps this bit-identical to the
  // numpy path `x.astype(f32) / 127.5 - 1.0`.
  for (int y = 0; y < crop_h; ++y) {
    const uint8_t* row = img + (size_t)(top + y) * w * c + (size_t)left * c;
    float* orow = out + (size_t)y * crop_w * c;
    if (!flip) {
      for (int i = 0; i < crop_w * c; ++i) orow[i] = row[i] / 127.5f - 1.0f;
    } else {
      for (int x = 0; x < crop_w; ++x) {
        const uint8_t* px = row + (size_t)(crop_w - 1 - x) * c;
        float* opx = orow + (size_t)x * c;
        for (int k = 0; k < c; ++k) opx[k] = px[k] / 127.5f - 1.0f;
      }
    }
  }
}

// Same geometry for uint8 labels -> int32 (no normalize).
static void crop_flip_label_one(const uint8_t* lab, int h, int w, int top,
                                int left, int flip, int crop_h, int crop_w,
                                int32_t* out) {
  (void)h;
  for (int y = 0; y < crop_h; ++y) {
    const uint8_t* row = lab + (size_t)(top + y) * w + left;
    int32_t* orow = out + (size_t)y * crop_w;
    if (!flip) {
      for (int x = 0; x < crop_w; ++x) orow[x] = row[x];
    } else {
      for (int x = 0; x < crop_w; ++x) orow[x] = row[crop_w - 1 - x];
    }
  }
}

// Batch entry points: arrays of per-item pointers/params; threaded.
void cgtpu_crop_flip_normalize_batch(const uint8_t** imgs, const int* hs,
                                     const int* ws, int c, const int* tops,
                                     const int* lefts, const uint8_t* flips,
                                     int crop_h, int crop_w, int batch,
                                     float* out) {
  const size_t item = (size_t)crop_h * crop_w * c;
  int n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > batch) n_threads = batch;
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < batch; i += n_threads) {
        crop_flip_normalize_one(imgs[i], hs[i], ws[i], c, tops[i], lefts[i],
                                flips[i], crop_h, crop_w, out + item * i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

void cgtpu_crop_flip_label_batch(const uint8_t** labs, const int* hs,
                                 const int* ws, const int* tops,
                                 const int* lefts, const uint8_t* flips,
                                 int crop_h, int crop_w, int batch,
                                 int32_t* out) {
  const size_t item = (size_t)crop_h * crop_w;
  for (int i = 0; i < batch; ++i) {
    crop_flip_label_one(labs[i], hs[i], ws[i], tops[i], lefts[i], flips[i],
                        crop_h, crop_w, out + item * i);
  }
}

// One-hot encode int32 labels (N,H,W) -> float32 (N,H,W,K); ignore -> zeros.
void cgtpu_one_hot(const int32_t* labels, int n, int k, int ignore_index,
                   float* out) {
  std::memset(out, 0, (size_t)n * k * sizeof(float));
  for (int i = 0; i < n; ++i) {
    int32_t v = labels[i];
    if (v != ignore_index && v >= 0 && v < k) out[(size_t)i * k + v] = 1.0f;
  }
}

int cgtpu_version() { return 1; }

}  // extern "C"
