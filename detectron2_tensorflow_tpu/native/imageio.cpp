// Native host-side image pipeline: JPEG decode + shortest-edge resize + pad.
//
// The reference has no native code (its pipeline is tf.data graph ops,
// /root/reference/lib/data/dataloader.py); this module is the production
// replacement for the cv2 decode path in data/coco.py — one fused pass from
// JPEG bytes to the padded float32 bucket tensor the model consumes,
// skipping the full-size intermediate, the BGR->RGB conversion pass and the
// separate pad copy. Called through ctypes (pybind11 is not in this image);
// every entry point is GIL-free C, so the existing Python reader pool
// parallelizes across cores.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 imageio.cpp -o imageio.so -ljpeg
//
// Bilinear resize follows the half-pixel convention in float math
// (cv2.INTER_LINEAR on uint8 uses 11-bit fixed point; outputs differ by at
// most 1 LSB — see tests/test_native_imageio.py).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG bytes to an RGB8 buffer. Returns 0 on success.
int decode_jpeg_rgb(const uint8_t* data, long len, std::vector<uint8_t>* out,
                    int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = static_cast<int>(cinfo.output_height);
  *w = static_cast<int>(cinfo.output_width);
  out->resize(static_cast<size_t>(*h) * *w * 3);
  const size_t stride = static_cast<size_t>(*w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Half-pixel bilinear RGB8 -> float32, row-separable with a precomputed
// x-weight table (the hot loop is then a fused 2-tap vertical blend).
void resize_bilinear_rgb(const uint8_t* src, int sh, int sw, float* dst,
                         int dh, int dw) {
  if (sh == dh && sw == dw) {
    const size_t n = static_cast<size_t>(sh) * sw * 3;
    for (size_t i = 0; i < n; ++i) dst[i] = static_cast<float>(src[i]);
    return;
  }
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> fx(dw);
  for (int x = 0; x < dw; ++x) {
    float c = (x + 0.5f) * sx - 0.5f;
    float fl = std::floor(c);
    fx[x] = c - fl;
    int xi = static_cast<int>(fl);
    x0[x] = std::clamp(xi, 0, sw - 1);
    x1[x] = std::clamp(xi + 1, 0, sw - 1);
  }
  std::vector<float> row0(static_cast<size_t>(dw) * 3),
      row1(static_cast<size_t>(dw) * 3);
  int cached_y0 = -2, cached_y1 = -2;
  auto hresize = [&](int sy_row, float* out_row) {
    const uint8_t* r = src + static_cast<size_t>(sy_row) * sw * 3;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* a = r + x0[x] * 3;
      const uint8_t* b = r + x1[x] * 3;
      const float f = fx[x];
      out_row[x * 3 + 0] = a[0] + (b[0] - a[0]) * f;
      out_row[x * 3 + 1] = a[1] + (b[1] - a[1]) * f;
      out_row[x * 3 + 2] = a[2] + (b[2] - a[2]) * f;
    }
  };
  for (int y = 0; y < dh; ++y) {
    float c = (y + 0.5f) * sy - 0.5f;
    float fl = std::floor(c);
    const float fy = c - fl;
    int yi = static_cast<int>(fl);
    const int y0 = std::clamp(yi, 0, sh - 1);
    const int y1 = std::clamp(yi + 1, 0, sh - 1);
    if (y0 != cached_y0) {
      if (y0 == cached_y1) {
        std::swap(row0, row1);
        cached_y0 = y0;
        cached_y1 = -2;
      } else {
        hresize(y0, row0.data());
        cached_y0 = y0;
      }
    }
    if (y1 != cached_y1) {
      hresize(y1, row1.data());
      cached_y1 = y1;
    }
    float* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int i = 0; i < dw * 3; ++i)
      out[i] = row0[i] + (row1[i] - row0[i]) * fy;
  }
}

}  // namespace

extern "C" {

int imgio_decode_resize_flip_pad(const uint8_t* data, long len, int min_size,
                                 int max_size, int flip, float* out, int bh,
                                 int bw, int* out_h, int* out_w);

// Castagnoli CRC-32 (TFRecord framing; data/tfrecord_codec.py). Table-driven;
// the pure-python fallback is ~1000x slower on MB-size payloads.
uint32_t imgio_crc32c(const uint8_t* data, long len) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t n = 0; n < 256; ++n) {
      uint32_t c = n;
      for (int k = 0; k < 8; ++k) c = (c >> 1) ^ ((c & 1) ? 0x82F63B78u : 0);
      table[n] = c;
    }
    init = true;
  }
  uint32_t crc = 0xFFFFFFFFu;
  for (long i = 0; i < len; ++i)
    crc = (crc >> 8) ^ table[(crc ^ data[i]) & 0xFFu];
  return crc ^ 0xFFFFFFFFu;
}

// Parse JPEG header only. Returns 0 and fills (h, w) on success.
int imgio_jpeg_info(const uint8_t* data, long len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Full-resolution decode into caller buffer out[h*w*3] (RGB, row-major).
int imgio_decode_jpeg(const uint8_t* data, long len, uint8_t* out,
                      long capacity) {
  std::vector<uint8_t> buf;
  int h, w;
  if (decode_jpeg_rgb(data, len, &buf, &h, &w) != 0) return -1;
  if (static_cast<long>(buf.size()) > capacity) return -2;
  std::memcpy(out, buf.data(), buf.size());
  return 0;
}

// Bilinear resize uint8 RGB -> float32 RGB (half-pixel centers).
void imgio_resize_bilinear(const uint8_t* src, int sh, int sw, float* dst,
                           int dh, int dw) {
  resize_bilinear_rgb(src, sh, sw, dst, dh, dw);
}

// Fused: decode + shortest-edge resize (short side -> min_size, long side
// capped at max_size, matching data/transforms.resize_shortest_edge and the
// reference transform.py:1170-1198) + write into the CALLER-ZEROED float32
// bucket buffer out[bh*bw*3]. Fills (out_h, out_w) with the resized size.
// Returns 0 ok, -1 bad jpeg, -2 resized image exceeds the bucket.
int imgio_decode_resize_pad(const uint8_t* data, long len, int min_size,
                            int max_size, float* out, int bh, int bw,
                            int* out_h, int* out_w) {
  return imgio_decode_resize_flip_pad(data, len, min_size, max_size, 0, out,
                                      bh, bw, out_h, out_w);
}

// Training variant of the fused decode: adds an optional horizontal mirror
// of the resized content region. Mirror-after-resize equals the python
// pipeline's flip-before-resize exactly (the half-pixel bilinear grid is
// mirror-symmetric), so transforms.run's augment->resize order is preserved
// while the heavy pixel work stays in one native pass.
int imgio_decode_resize_flip_pad(const uint8_t* data, long len, int min_size,
                                 int max_size, int flip, float* out, int bh,
                                 int bw, int* out_h, int* out_w) {
  std::vector<uint8_t> buf;
  int h, w;
  if (decode_jpeg_rgb(data, len, &buf, &h, &w) != 0) return -1;
  int nh = h, nw = w;
  if (min_size > 0) {
    float scale = static_cast<float>(min_size) / std::min(h, w);
    if (std::max(h, w) * scale > max_size)
      scale = static_cast<float>(max_size) / std::max(h, w);
    nh = static_cast<int>(std::lround(h * static_cast<double>(scale)));
    nw = static_cast<int>(std::lround(w * static_cast<double>(scale)));
  }
  if (nh > bh || nw > bw) return -2;
  *out_h = nh;
  *out_w = nw;
  if (nw == bw && !flip) {
    resize_bilinear_rgb(buf.data(), h, w, out, nh, nw);
  } else {
    // Resize into a tight buffer, then strided-copy into the padded rows
    // (per-row reversed when mirroring — only the [0:nh, 0:nw] content is
    // flipped, never the zero padding).
    std::vector<float> tight(static_cast<size_t>(nh) * nw * 3);
    resize_bilinear_rgb(buf.data(), h, w, tight.data(), nh, nw);
    for (int y = 0; y < nh; ++y) {
      const float* src_row = tight.data() + static_cast<size_t>(y) * nw * 3;
      float* dst_row = out + static_cast<size_t>(y) * bw * 3;
      if (!flip) {
        std::memcpy(dst_row, src_row,
                    static_cast<size_t>(nw) * 3 * sizeof(float));
      } else {
        for (int x = 0; x < nw; ++x) {
          const float* s = src_row + static_cast<size_t>(nw - 1 - x) * 3;
          dst_row[x * 3 + 0] = s[0];
          dst_row[x * 3 + 1] = s[1];
          dst_row[x * 3 + 2] = s[2];
        }
      }
    }
  }
  return 0;
}

// Batch variant: decode + resize + pad N JPEGs in parallel. Image i's bytes
// are blob[offsets[i] : offsets[i] + lens[i]]; its output slot is
// out[i * bh * bw * 3] (caller-zeroed). out_hw[i*2 + {0,1}] receives the
// resized (h, w); rcs[i] the per-image status (see imgio_decode_resize_pad).
// Returns 0 iff every image succeeded. Thread count is clamped to [1, n].
int imgio_decode_resize_pad_batch(const uint8_t* blob, const long* offsets,
                                  const long* lens, int n, int min_size,
                                  int max_size, float* out, int bh, int bw,
                                  int* out_hw, int* rcs, int nthreads) {
  nthreads = std::max(1, std::min(nthreads, n));
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      rcs[i] = imgio_decode_resize_pad(
          blob + offsets[i], lens[i], min_size, max_size,
          out + static_cast<size_t>(i) * bh * bw * 3, bh, bw,
          out_hw + 2 * i, out_hw + 2 * i + 1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < nthreads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  for (int i = 0; i < n; ++i)
    if (rcs[i] != 0) return rcs[i];
  return 0;
}

// Training batch: decode + per-image shortest-edge resize (min_sizes[i] —
// the train pipeline draws a random MIN_SIZE_TRAIN choice per sample) +
// optional horizontal flip (flips[i]) + pad, in parallel. Same blob/slot
// layout as imgio_decode_resize_pad_batch.
int imgio_train_image_batch(const uint8_t* blob, const long* offsets,
                            const long* lens, int n, const int* min_sizes,
                            int max_size, const uint8_t* flips, float* out,
                            int bh, int bw, int* out_hw, int* rcs,
                            int nthreads) {
  nthreads = std::max(1, std::min(nthreads, n));
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      rcs[i] = imgio_decode_resize_flip_pad(
          blob + offsets[i], lens[i], min_sizes[i], max_size, flips[i],
          out + static_cast<size_t>(i) * bh * bw * 3, bh, bw,
          out_hw + 2 * i, out_hw + 2 * i + 1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < nthreads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  for (int i = 0; i < n; ++i)
    if (rcs[i] != 0) return rcs[i];
  return 0;
}

// Fused mini-mask targets: for each instance, reproduce the python chain
//   cv2.resize(full_mask f32, (nw, nh))      [shortest-edge resize]
//   [, ::-1] if flip                         [horizontal mirror]
//   [y0:y1, x0:x1]                           [crop at the box, int coords]
//   cv2.resize(crop, (mini, mini))           [mini-mask target]
// (data/transforms.py resize_shortest_edge + make_mini_masks, reference
// transform.py:1245-1266) WITHOUT materializing the [nh, nw] resized mask:
// stage 1 evaluates the resized map only inside the crop window (bilinear
// restriction is exact), stage 2 resizes the window to [mini, mini]. The
// python path resizes EVERY full mask per sample — the single most
// expensive host op in training.
//
// masks: [n, h, w] uint8 (0/1); boxes: [n, 4] xyxy floats in the
// FLIPPED-resized frame (the caller flips box coordinates, matching
// transforms.flip_horizontal); out: [n, mini, mini] float32.
int imgio_mini_masks(const uint8_t* masks, int n, int h, int w, int nh,
                     int nw, int flip, const float* boxes, float* out,
                     int mini, int nthreads) {
  if (nh <= 0 || nw <= 0 || h <= 0 || w <= 0) return -1;
  const float sx = static_cast<float>(w) / nw;  // resized -> original
  const float sy = static_cast<float>(h) / nh;
  auto one = [&](int i) {
    const uint8_t* m = masks + static_cast<size_t>(i) * h * w;
    float* dst = out + static_cast<size_t>(i) * mini * mini;
    std::memset(dst, 0, static_cast<size_t>(mini) * mini * sizeof(float));
    const float* b = boxes + 4 * i;
    // exact make_mini_masks coordinate rules (incl. numpy slice clamping)
    int x0 = static_cast<int>(std::floor(b[0]));
    int y0 = static_cast<int>(std::floor(b[1]));
    int x1 = static_cast<int>(std::ceil(b[2]));
    int y1 = static_cast<int>(std::ceil(b[3]));
    x1 = std::max(x1, x0 + 1);
    y1 = std::max(y1, y0 + 1);
    x0 = std::max(x0, 0);
    y0 = std::max(y0, 0);
    x1 = std::min(x1, nw);
    y1 = std::min(y1, nh);
    const int cw = x1 - x0, ch = y1 - y0;
    if (cw <= 0 || ch <= 0) return;
    // Stage 1: resized-frame values on the crop window only. A flipped
    // frame's column x maps to unflipped column nw - 1 - x.
    std::vector<float> crop(static_cast<size_t>(ch) * cw);
    for (int y = 0; y < ch; ++y) {
      const float cy = (y0 + y + 0.5f) * sy - 0.5f;
      const float fly = std::floor(cy);
      const float fy = cy - fly;
      const int yi = static_cast<int>(fly);
      const int sy0 = std::clamp(yi, 0, h - 1);
      const int sy1 = std::clamp(yi + 1, 0, h - 1);
      const uint8_t* r0 = m + static_cast<size_t>(sy0) * w;
      const uint8_t* r1 = m + static_cast<size_t>(sy1) * w;
      for (int x = 0; x < cw; ++x) {
        const int rx = flip ? (nw - 1 - (x0 + x)) : (x0 + x);
        const float cx = (rx + 0.5f) * sx - 0.5f;
        const float flx = std::floor(cx);
        const float fx = cx - flx;
        const int xi = static_cast<int>(flx);
        const int sx0 = std::clamp(xi, 0, w - 1);
        const int sx1 = std::clamp(xi + 1, 0, w - 1);
        const float a = r0[sx0] + (r0[sx1] - r0[sx0]) * fx;
        const float c = r1[sx0] + (r1[sx1] - r1[sx0]) * fx;
        crop[static_cast<size_t>(y) * cw + x] = a + (c - a) * fy;
      }
    }
    // Stage 2: bilinear [ch, cw] -> [mini, mini].
    const float mx = static_cast<float>(cw) / mini;
    const float my = static_cast<float>(ch) / mini;
    for (int y = 0; y < mini; ++y) {
      const float cy = (y + 0.5f) * my - 0.5f;
      const float fly = std::floor(cy);
      const float fy = cy - fly;
      const int yi = static_cast<int>(fly);
      const int q0 = std::clamp(yi, 0, ch - 1);
      const int q1 = std::clamp(yi + 1, 0, ch - 1);
      const float* r0 = crop.data() + static_cast<size_t>(q0) * cw;
      const float* r1 = crop.data() + static_cast<size_t>(q1) * cw;
      for (int x = 0; x < mini; ++x) {
        const float cx = (x + 0.5f) * mx - 0.5f;
        const float flx = std::floor(cx);
        const float fx = cx - flx;
        const int xi = static_cast<int>(flx);
        const int p0 = std::clamp(xi, 0, cw - 1);
        const int p1 = std::clamp(xi + 1, 0, cw - 1);
        const float a = r0[p0] + (r0[p1] - r0[p0]) * fx;
        const float c = r1[p0] + (r1[p1] - r1[p0]) * fx;
        dst[static_cast<size_t>(y) * mini + x] = a + (c - a) * fy;
      }
    }
  };
  nthreads = std::max(1, std::min(nthreads, n));
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) one(i);
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < nthreads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
