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
  if (nw == bw) {
    resize_bilinear_rgb(buf.data(), h, w, out, nh, nw);
  } else {
    // Resize into a tight buffer, then strided-copy into the padded rows.
    std::vector<float> tight(static_cast<size_t>(nh) * nw * 3);
    resize_bilinear_rgb(buf.data(), h, w, tight.data(), nh, nw);
    for (int y = 0; y < nh; ++y)
      std::memcpy(out + static_cast<size_t>(y) * bw * 3,
                  tight.data() + static_cast<size_t>(y) * nw * 3,
                  static_cast<size_t>(nw) * 3 * sizeof(float));
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

}  // extern "C"
