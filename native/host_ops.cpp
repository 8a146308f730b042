// Native host-side runtime ops for stylemc_tpu.
//
// TPU-native counterpart of the reference's CUDA plugin layer
// (/root/reference/torch_utils/custom_ops.py builds device kernels; on TPU
// the device side is XLA/Pallas, so the native layer owns the *host* hot
// paths instead): box NMS, MTCNN crop/pad/resize/normalize batching, and
// image resize/normalize for the data loader. Exposed via a C ABI consumed
// through ctypes.
//
// Build: g++ -O3 -shared -fPIC (driven by stylemc_tpu/native/build.py with
// md5-digest incremental caching + file lock, mirroring custom_ops.py:46-124).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------- NMS
// Greedy non-maximum suppression (contract: MTCNN/box_utils.py:5-68).
// boxes: [n, 5] float32 rows (x1, y1, x2, y2, score).
// mode: 0 = union (IoU), 1 = min.
// out_keep: caller-allocated int32[n]; returns number of kept indices.
int nms(const float* boxes, int n, float overlap_threshold, int mode,
        int32_t* out_keep) {
  if (n <= 0) return 0;
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    return boxes[a * 5 + 4] < boxes[b * 5 + 4];  // ascending by score
  });
  std::vector<float> area(n);
  for (int i = 0; i < n; ++i) {
    const float* b = boxes + i * 5;
    area[i] = (b[2] - b[0] + 1.0f) * (b[3] - b[1] + 1.0f);
  }
  std::vector<char> alive(n, 1);
  int n_keep = 0;
  for (int oi = n - 1; oi >= 0; --oi) {
    int i = order[oi];
    if (!alive[i]) continue;
    out_keep[n_keep++] = i;
    const float* bi = boxes + i * 5;
    for (int oj = oi - 1; oj >= 0; --oj) {
      int j = order[oj];
      if (!alive[j]) continue;
      const float* bj = boxes + j * 5;
      float ix1 = std::max(bi[0], bj[0]);
      float iy1 = std::max(bi[1], bj[1]);
      float ix2 = std::min(bi[2], bj[2]);
      float iy2 = std::min(bi[3], bj[3]);
      float w = std::max(0.0f, ix2 - ix1 + 1.0f);
      float h = std::max(0.0f, iy2 - iy1 + 1.0f);
      float inter = w * h;
      float overlap = mode == 1
                          ? inter / std::min(area[i], area[j])
                          : inter / (area[i] + area[j] - inter);
      if (overlap > overlap_threshold) alive[j] = 0;
    }
  }
  return n_keep;
}

// ------------------------------------------------------------ bilinear resize
// uint8 HWC → uint8 HWC, PIL-compatible box positioning
// (half-pixel centers, no antialias — matches Image.BILINEAR upscale and is
// the MTCNN pyramid contract for the small scale factors involved).
static inline float sample_bilinear(const uint8_t* img, int h, int w, int c,
                                    float y, float x, int ch) {
  int x0 = (int)std::floor(x);
  int y0 = (int)std::floor(y);
  float fx = x - x0, fy = y - y0;
  int x1 = std::min(x0 + 1, w - 1);
  int y1 = std::min(y0 + 1, h - 1);
  x0 = std::max(x0, 0);
  y0 = std::max(y0, 0);
  float v00 = img[(y0 * w + x0) * c + ch];
  float v01 = img[(y0 * w + x1) * c + ch];
  float v10 = img[(y1 * w + x0) * c + ch];
  float v11 = img[(y1 * w + x1) * c + ch];
  return v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
         v10 * fy * (1 - fx) + v11 * fy * fx;
}

void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
  float sy = (float)sh / dh;
  float sx = (float)sw / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      for (int ch = 0; ch < c; ++ch) {
        float v = sample_bilinear(src, sh, sw, c, fy, fx, ch);
        dst[(y * dw + x) * c + ch] =
            (uint8_t)std::min(255.0f, std::max(0.0f, std::round(v)));
      }
    }
  }
}

// -------------------------------------------------- MTCNN crop-batch extract
// For each box: clip to the image, zero-pad the out-of-bounds region,
// bilinear-resize to size×size, emit CHW float normalized (x-127.5)/128
// (contract: MTCNN/box_utils.py:127-238). boxes: [n, >=4] float32.
void extract_image_boxes(const uint8_t* img, int h, int w, const float* boxes,
                         int n, int box_stride, int size, float* out) {
  std::vector<uint8_t> patch;
  std::vector<uint8_t> resized((size_t)size * size * 3);
  for (int i = 0; i < n; ++i) {
    const float* b = boxes + (size_t)i * box_stride;
    int x1 = (int)b[0], y1 = (int)b[1], x2 = (int)b[2], y2 = (int)b[3];
    int bw = x2 - x1 + 1, bh = y2 - y1 + 1;
    float* dst = out + (size_t)i * 3 * size * size;
    if (bw <= 0 || bh <= 0) {
      std::memset(dst, 0, sizeof(float) * 3 * size * size);
      continue;
    }
    patch.assign((size_t)bw * bh * 3, 0);
    int sx1 = std::max(x1, 0), sy1 = std::max(y1, 0);
    int sx2 = std::min(x2, w - 1), sy2 = std::min(y2, h - 1);
    for (int y = sy1; y <= sy2; ++y) {
      if (sx2 < sx1) break;
      std::memcpy(&patch[(((size_t)(y - y1)) * bw + (sx1 - x1)) * 3],
                  &img[((size_t)y * w + sx1) * 3],
                  (size_t)(sx2 - sx1 + 1) * 3);
    }
    resize_bilinear_u8(patch.data(), bh, bw, 3, resized.data(), size, size);
    // HWC u8 → CHW float, (x - 127.5) * 0.0078125
    for (int ch = 0; ch < 3; ++ch)
      for (int y = 0; y < size; ++y)
        for (int x = 0; x < size; ++x)
          dst[(ch * size + y) * size + x] =
              ((float)resized[((size_t)y * size + x) * 3 + ch] - 127.5f) *
              0.0078125f;
  }
}

// ------------------------------------------------- loader: u8 HWC → CHW norm
// (x/255 - 0.5) / 0.5 — the e4e EncodeTransforms contract.
void u8_to_chw_norm(const uint8_t* img, int h, int w, float* out) {
  const float inv = 1.0f / 255.0f;
  for (int ch = 0; ch < 3; ++ch)
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x)
        out[((size_t)ch * h + y) * w + x] =
            ((float)img[((size_t)y * w + x) * 3 + ch] * inv - 0.5f) * 2.0f;
}

int host_ops_abi_version() { return 1; }

}  // extern "C"
