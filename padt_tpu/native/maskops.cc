// maskops: native COCO RLE codec + mask utilities.
//
// TPU-native replacement for pycocotools' C `_mask` extension (reference dep,
// SURVEY.md §2.3): the eval pipeline RLE-encodes thousands of predicted masks
// per run (`utils.py:262-266`) and the trainer decodes GT RLEs every step
// (`padt_sft_trainer.py:498`), so this path is worth native speed. Exposed to
// Python via ctypes (padt_tpu/native/__init__.py).
//
// Format: standard COCO compressed counts — column-major runs, first run is
// zeros, 5-bit groups with continuation bit, chars offset by 48, runs
// delta-coded against counts[i-2] from the third run on.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// mask (H*W, column-major flattening done here from row-major input) -> string.
// Returns string length, or -1 if out_cap too small.
int rle_encode(const uint8_t* mask, int h, int w, char* out, int out_cap) {
  std::vector<long> cnts;
  cnts.reserve(1024);
  uint8_t prev = 0;
  long run = 0;
  // column-major scan over row-major storage
  for (int x = 0; x < w; ++x) {
    const uint8_t* col = mask + x;
    for (int y = 0; y < h; ++y) {
      uint8_t v = col[(size_t)y * w] ? 1 : 0;
      if (v == prev) {
        ++run;
      } else {
        cnts.push_back(run);
        run = 1;
        prev = v;
      }
    }
  }
  cnts.push_back(run);
  // first run must describe zeros
  // (if mask starts with 1, the leading zero-run has length 0 — handled above
  //  because prev starts at 0 so a leading 1 pushes run=0 first)
  int p = 0;
  for (size_t i = 0; i < cnts.size(); ++i) {
    long x = cnts[i];
    if (i > 2) x -= cnts[i - 2];
    bool more = true;
    while (more) {
      char c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      c += 48;
      if (p >= out_cap) return -1;
      out[p++] = c;
    }
  }
  return p;
}

// string -> mask (row-major uint8 out, H*W). Returns 0 on success.
int rle_decode(const char* s, int n, int h, int w, uint8_t* out) {
  std::vector<long> cnts;
  cnts.reserve(1024);
  int i = 0;
  while (i < n) {
    long x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      long c = (long)s[i] - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      if (!more && (c & 0x10)) x |= -1L << (5 * k);
      if (i > n) return 1;
    }
    if (cnts.size() > 2) x += cnts[cnts.size() - 2];
    cnts.push_back(x);
  }
  std::memset(out, 0, (size_t)h * w);
  long pos = 0;  // column-major position
  uint8_t val = 0;
  for (size_t j = 0; j < cnts.size(); ++j) {
    long c = cnts[j];
    if (val) {
      for (long t = 0; t < c; ++t) {
        long pp = pos + t;
        if (pp >= (long)h * w) break;
        long y = pp % h, x = pp / h;
        out[y * w + x] = 1;
      }
    }
    pos += c;
    val ^= 1;
  }
  return 0;
}

// IoU between two decoded masks without materializing them: run-merge walk.
double rle_area(const char* s, int n) {
  std::vector<long> cnts;
  int i = 0;
  while (i < n) {
    long x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      long c = (long)s[i] - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      if (!more && (c & 0x10)) x |= -1L << (5 * k);
    }
    if (cnts.size() > 2) x += cnts[cnts.size() - 2];
    cnts.push_back(x);
  }
  double a = 0;
  for (size_t j = 1; j < cnts.size(); j += 2) a += (double)cnts[j];
  return a;
}

// Decode-free IoU between two compressed RLEs of equal size (column-major run
// walk, like pycocotools rleIou): intersection accumulated over merged runs.
// Returns -1.0 on malformed input. iscrowd!=0 -> intersection / area(a2)?? —
// pycocotools semantics: iscrowd uses det area (first arg = detection).
static bool parse_counts(const char* s, int n, std::vector<long>* out) {
  int i = 0;
  while (i < n) {
    long x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (i >= n) return false;
      long c = (long)s[i] - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      if (!more && (c & 0x10)) x |= -1L << (5 * k);
    }
    if (out->size() > 2) x += (*out)[out->size() - 2];
    out->push_back(x);
  }
  return true;
}

double rle_iou(const char* sa, int na, const char* sb, int nb, int iscrowd) {
  std::vector<long> a, b;
  if (!parse_counts(sa, na, &a) || !parse_counts(sb, nb, &b)) return -1.0;
  double area_a = 0, area_b = 0, inter = 0;
  for (size_t i = 1; i < a.size(); i += 2) area_a += (double)a[i];
  for (size_t i = 1; i < b.size(); i += 2) area_b += (double)b[i];
  // merged run walk
  size_t ia = 0, ib = 0;
  long ca = ia < a.size() ? a[0] : 0;  // remaining length of current run in a
  long cb = ib < b.size() ? b[0] : 0;
  bool va = false, vb = false;  // current run values (first run = zeros)
  while (ia < a.size() && ib < b.size()) {
    long step = ca < cb ? ca : cb;
    if (va && vb) inter += (double)step;
    ca -= step;
    cb -= step;
    if (ca == 0) {
      ++ia;
      if (ia < a.size()) ca = a[ia];
      va = !va;
    }
    if (cb == 0) {
      ++ib;
      if (ib < b.size()) cb = b[ib];
      vb = !vb;
    }
  }
  double den = iscrowd ? area_a : (area_a + area_b - inter);
  return den > 0 ? inter / den : 0.0;
}

}  // extern "C"
