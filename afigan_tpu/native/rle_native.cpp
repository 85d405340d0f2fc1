// Native host-side kernels for COCO evaluation — C++ replacement for the
// pycocotools C extension the reference depends on (SURVEY §2.2 Eval;
// the TPU framework's eval loop is host-bound on RLE codec + IoU matrices
// for 5k images x 100 dets). Built at first import via g++ (build.py),
// bound through ctypes; afigan_tpu/evaluation/rle.py falls back to the
// pure-numpy implementations when the toolchain is unavailable.
//
// Format compatibility: identical to the pycocotools RLE contract —
// column-major runs starting with zeros, counts delta-coded (vs count[i-2])
// into base-32 varints offset by char '0' (48).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---- RLE encode: binary mask (row-major in memory, we walk column-major)
// returns number of counts written (or -1 if out_cap too small).
int rle_encode(const uint8_t* mask, int h, int w, int64_t* counts_out,
               int out_cap) {
  int n = 0;
  int64_t run = 0;
  uint8_t cur = 0;
  for (int x = 0; x < w; ++x) {
    for (int y = 0; y < h; ++y) {
      uint8_t v = mask[(int64_t)y * w + x] ? 1 : 0;
      if (v != cur) {
        if (n >= out_cap) return -1;
        counts_out[n++] = run;
        run = 0;
        cur = v;
      }
      ++run;
    }
  }
  if (n >= out_cap) return -1;
  counts_out[n++] = run;
  return n;
}

// ---- RLE decode into a row-major uint8 mask
void rle_decode(const int64_t* counts, int n, int h, int w, uint8_t* out) {
  memset(out, 0, (size_t)h * w);
  int64_t pos = 0;
  uint8_t val = 0;
  for (int i = 0; i < n; ++i) {
    if (val) {
      for (int64_t k = 0; k < counts[i]; ++k) {
        int64_t p = pos + k;
        int x = (int)(p / h);
        int y = (int)(p % h);
        if (x < w) out[(int64_t)y * w + x] = 1;
      }
    }
    pos += counts[i];
    val ^= 1;
  }
}

// ---- counts -> LEB-style base-32 string (pycocotools rleToString)
int rle_counts_to_string(const int64_t* counts, int n, char* out, int cap) {
  int m = 0;
  for (int i = 0; i < n; ++i) {
    int64_t x = counts[i];
    if (i > 2) x -= counts[i - 2];
    bool more = true;
    while (more) {
      int c = (int)(x & 0x1f);
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      if (m >= cap) return -1;
      out[m++] = (char)(c + 48);
    }
  }
  return m;
}

// ---- string -> counts
int rle_string_to_counts(const char* s, int len, int64_t* out, int cap) {
  int n = 0;
  int i = 0;
  while (i < len) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    int c = 0;
    while (more) {
      // a truncated varint (continuation bit set on the last char) must
      // be an error, not a silent read past len into the terminator
      if (i >= len) return -1;
      c = s[i] - 48;
      if (5 * k < 64) x |= (int64_t)(c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      // guard the sign-extension shift too (5*k >= 64 is UB)
      if (!more && (c & 0x10) && 5 * k < 64) x |= (int64_t)(-1) << (5 * k);
    }
    if (n > 2) x += out[n - 2];
    if (n >= cap) return -1;
    out[n++] = x;
  }
  return n;
}

// ---- pairwise IoU for xywh boxes, crowd-aware (COCOeval semantics)
void bbox_iou_matrix(const double* dt, int nd, const double* gt, int ng,
                     const uint8_t* iscrowd, double* out) {
  for (int j = 0; j < ng; ++j) {
    double gx1 = gt[j * 4], gy1 = gt[j * 4 + 1];
    double gx2 = gx1 + gt[j * 4 + 2], gy2 = gy1 + gt[j * 4 + 3];
    double ga = gt[j * 4 + 2] * gt[j * 4 + 3];
    for (int i = 0; i < nd; ++i) {
      double dx1 = dt[i * 4], dy1 = dt[i * 4 + 1];
      double dx2 = dx1 + dt[i * 4 + 2], dy2 = dy1 + dt[i * 4 + 3];
      double da = dt[i * 4 + 2] * dt[i * 4 + 3];
      double iw = (dx2 < gx2 ? dx2 : gx2) - (dx1 > gx1 ? dx1 : gx1);
      double ih = (dy2 < gy2 ? dy2 : gy2) - (dy1 > gy1 ? dy1 : gy1);
      double inter = (iw > 0 && ih > 0) ? iw * ih : 0.0;
      double uni = iscrowd[j] ? da : da + ga - inter;
      out[(int64_t)i * ng + j] = uni > 0 ? inter / uni : 0.0;
    }
  }
}

// ---- RLE mask IoU (decode-free: run intersection via merge walk)
// masks given as counts arrays; crowd-aware.
double rle_iou_single(const int64_t* a, int na, const int64_t* b, int nb,
                      int iscrowd) {
  // area of value-1 runs
  int64_t area_a = 0, area_b = 0;
  for (int i = 1; i < na; i += 2) area_a += a[i];
  for (int i = 1; i < nb; i += 2) area_b += b[i];
  // merge walk computing intersection of 1-runs
  int64_t inter = 0;
  int ia = 0, ib = 0;
  int64_t pa = a[0], pb = b[0];  // positions where current run ends
  uint8_t va = 0, vb = 0;
  int64_t pos = 0;
  while (ia < na && ib < nb) {
    int64_t next = pa < pb ? pa : pb;
    if (va && vb) inter += next - pos;
    pos = next;
    if (pa == next) {
      ++ia;
      va ^= 1;
      if (ia < na) pa += a[ia];
    }
    if (pb == next) {
      ++ib;
      vb ^= 1;
      if (ib < nb) pb += b[ib];
    }
  }
  double uni = iscrowd ? (double)area_a : (double)(area_a + area_b - inter);
  return uni > 0 ? (double)inter / uni : 0.0;
}

}  // extern "C"
