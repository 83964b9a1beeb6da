// COCO run-length-encoding codec (column-major RLE, LEB-style compressed
// counts) — the host-side native runtime for mask evaluation and COCO
// result-file export.
//
// The reference depends on pycocotools' C maskApi for this (unavailable in
// this image); this is an independent implementation of the PUBLISHED
// format: runs are column-major (Fortran order), alternate 0s/1s starting
// with zeros, and the compressed string stores each count in 5-bit groups
// (bit 5 = continuation), delta-coded against count[i-2] from the third
// count on, offset by ASCII 48.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// mask [h*w] row-major uint8 -> counts (int64) written to out (capacity
// out_cap). Returns the number of counts, or -1 if out_cap is too small.
long long rle_encode_counts(const uint8_t* mask, long long h, long long w,
                            long long* out, long long out_cap) {
  long long n = 0;
  long long run = 0;
  uint8_t cur = 0;
  for (long long x = 0; x < w; ++x) {
    for (long long y = 0; y < h; ++y) {
      uint8_t v = mask[y * w + x] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        if (n >= out_cap) return -1;
        out[n++] = run;
        cur = v;
        run = 1;
      }
    }
  }
  if (n >= out_cap) return -1;
  out[n++] = run;
  return n;
}

// counts -> mask [h*w] row-major uint8 (caller zero-fills capacity h*w).
void rle_decode_counts(const long long* counts, long long n_counts,
                       long long h, long long w, uint8_t* mask) {
  long long pos = 0;  // column-major position
  uint8_t cur = 0;
  for (long long i = 0; i < n_counts; ++i) {
    for (long long k = 0; k < counts[i]; ++k) {
      if (pos >= h * w) return;
      if (cur) {
        long long x = pos / h, y = pos % h;
        mask[y * w + x] = 1;
      }
      ++pos;
    }
    cur ^= 1;
  }
}

// Compress counts to the COCO string (delta + 5-bit groups + 48 offset).
// Returns string length, or -1 if out_cap too small.
long long rle_compress(const long long* counts, long long n, char* out,
                       long long out_cap) {
  long long p = 0;
  for (long long i = 0; i < n; ++i) {
    long long x = counts[i];
    if (i > 2) x -= counts[i - 2];
    bool more = true;
    while (more) {
      long long c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      if (p >= out_cap) return -1;
      out[p++] = static_cast<char>(c + 48);
    }
  }
  return p;
}

// Decompress the COCO string back to counts. Returns count, -1 on overflow.
long long rle_decompress(const char* s, long long len, long long* out,
                         long long out_cap) {
  long long n = 0, p = 0;
  while (p < len) {
    long long x = 0;
    long long k = 0;
    bool more = true;
    while (more) {
      if (p >= len) return -1;
      long long c = s[p++] - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    if (n > 2) x += out[n - 2];
    if (n >= out_cap) return -1;
    out[n++] = x;
  }
  return n;
}

// Area (foreground pixels) of an RLE given its counts.
long long rle_area(const long long* counts, long long n) {
  long long a = 0;
  for (long long i = 1; i < n; i += 2) a += counts[i];
  return a;
}

// IoU between two RLEs from counts (merge-walk over runs; crowd semantics:
// union = area(dt) when is_crowd). No decode needed.
double rle_iou(const long long* a, long long na, const long long* b,
               long long nb, int iscrowd) {
  long long ia = 0, ib = 0;          // run indices
  long long ra = (na > 0) ? a[0] : 0;  // remaining in current run
  long long rb = (nb > 0) ? b[0] : 0;
  uint8_t va = 0, vb = 0;
  long long inter = 0, area_a = 0, area_b = 0;
  for (;;) {
    // skip exhausted (or zero-length) runs, flipping the run value
    while (ia < na && ra == 0) {
      ++ia;
      if (ia < na) { ra = a[ia]; va ^= 1; }
    }
    while (ib < nb && rb == 0) {
      ++ib;
      if (ib < nb) { rb = b[ib]; vb ^= 1; }
    }
    if (ia >= na || ib >= nb) break;
    long long step = ra < rb ? ra : rb;
    if (va && vb) inter += step;
    if (va) area_a += step;
    if (vb) area_b += step;
    ra -= step;
    rb -= step;
  }
  // tails (shapes should match; count remaining foreground gracefully)
  while (ia < na) {
    if (va) area_a += ra;
    ++ia;
    if (ia < na) { ra = a[ia]; va ^= 1; }
  }
  while (ib < nb) {
    if (vb) area_b += rb;
    ++ib;
    if (ib < nb) { rb = b[ib]; vb ^= 1; }
  }
  double uni = iscrowd ? static_cast<double>(area_a)
                       : static_cast<double>(area_a + area_b - inter);
  if (uni <= 0) return 0.0;
  return static_cast<double>(inter) / uni;
}

}  // extern "C"
