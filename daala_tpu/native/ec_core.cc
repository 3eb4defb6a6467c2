// Native range-coder core for daala-tpu.
//
// C++ implementation of the Daala-compatible multisymbol range coder,
// written from this project's Python reference implementation
// (daala_tpu/entropy/ec.py) and validated byte-for-byte against it by
// differential fuzzing (tests/test_ec_native.py).  Behavioral parity
// target: src/entenc.c, src/entdec.c, src/entcode.c of the upstream
// reference (15-bit probabilities, carry-less pre-carry buffer, raw bits
// written backward from the stream end, reduced-overhead partition).
//
// Exposed as a flat extern "C" API consumed via ctypes (no pybind11 in
// this environment).  All handles are opaque pointers; buffers grow
// automatically.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kWindowSize = 32;
constexpr int kUintBits = 4;   // OD_EC_UINT_BITS
constexpr int kBitres = 3;     // OD_BITRES
constexpr int32_t kLotsOfBits = 0x4000;

inline int ilog_z(uint32_t x) { return x == 0 ? 0 : 32 - __builtin_clz(x); }

inline uint32_t subsatu(uint32_t a, uint32_t b) { return a - (a < b ? a : b); }

inline uint32_t partition_fn(uint32_t f, uint32_t d, uint32_t e) {
  uint32_t me = f < e ? f : e;
  uint32_t sd = subsatu(f, e) >> 1;
  return f + me + (sd < d ? sd : d);
}

// The uniform Q15 CDFs for sizes 2..16, installed from Python at startup
// (the normative table OD_UNIFORM_CDFS_Q15).
static int32_t g_uniform[16][17];
static bool g_uniform_set = false;

struct EcEnc {
  uint32_t low = 0;
  uint32_t rng = 0x8000;
  int32_t cnt = -9;
  std::vector<uint16_t> precarry;
  uint32_t end_window = 0;
  int32_t nend_bits = 0;
  std::vector<uint8_t> end_bytes;
  int32_t error = 0;

  void normalize(uint32_t l, uint32_t r) {
    int32_t c = cnt;
    int d = 16 - ilog_z(r);
    int32_t s = c + d;
    if (s >= 0) {
      c += 16;
      uint32_t m = (1u << c) - 1;
      if (s >= 8) {
        precarry.push_back((uint16_t)((l >> c) & 0xFFFF));
        l &= m;
        c -= 8;
        m >>= 8;
      }
      precarry.push_back((uint16_t)((l >> c) & 0xFFFF));
      s = c + d - 24;
      l &= m;
    }
    low = l << d;
    rng = (r << d) & 0xFFFF;
    cnt = s;
  }

  void encode(uint32_t fl, uint32_t fh, uint32_t ft) {
    uint32_t l = low, r = rng;
    int s = (r - ft >= ft) ? 1 : 0;
    ft <<= s; fl <<= s; fh <<= s;
    uint32_t d = r - ft;
    uint32_t e = subsatu(2 * d, ft);
    uint32_t u = partition_fn(fl, d, e);
    uint32_t v = partition_fn(fh, d, e);
    normalize(l + u, v - u);
  }

  void encode_q15(uint32_t fl, uint32_t fh) {
    uint32_t l = low, r = rng;
    uint32_t u = (fl * r) >> 15;
    uint32_t v = (fh * r) >> 15;
    normalize(l + u, v - u);
  }

  void encode_unscaled(uint32_t fl, uint32_t fh, uint32_t ft) {
    int s = 15 - ilog_z(ft - 1);
    encode(fl << s, fh << s, ft << s);
  }

  void encode_bool_q15(int val, uint32_t fz) {
    uint32_t r = rng;
    uint32_t v = (fz * r) >> 15;
    uint32_t l = low + (val ? v : 0);
    normalize(l, val ? r - v : v);
  }

  void encode_bits(uint32_t fl, int ftb) {
    uint32_t ew = end_window;
    int32_t ne = nend_bits;
    if (ne + ftb > kWindowSize) {
      while (ne >= 8) {
        end_bytes.push_back((uint8_t)(ew & 0xFF));
        ew >>= 8;
        ne -= 8;
      }
    }
    ew |= fl << ne;
    ne += ftb;
    end_window = ew;
    nend_bits = ne;
  }

  void encode_uint(uint32_t fl, uint32_t ft) {
    if (ft > (1u << kUintBits)) {
      ft--;
      int ftb = ilog_z(ft) - kUintBits;
      uint32_t ft1 = (ft >> ftb) + 1;
      uint32_t s = fl >> ftb;
      const int32_t *cdf = g_uniform[ft1];
      encode_q15(s > 0 ? (uint32_t)cdf[s - 1] : 0, (uint32_t)cdf[s]);
      encode_bits(fl & ((1u << ftb) - 1), ftb);
    } else {
      const int32_t *cdf = g_uniform[ft];
      encode_q15(fl > 0 ? (uint32_t)cdf[fl - 1] : 0, (uint32_t)cdf[fl]);
    }
  }

  void patch_initial_bits(uint32_t val, int nbits) {
    int shift = 8 - nbits;
    uint32_t mask = ((1u << nbits) - 1) << shift;
    if (!precarry.empty()) {
      precarry[0] = (uint16_t)((precarry[0] & ~mask) | (val << shift));
    } else if (9 + cnt + (rng == 0x8000 ? 1 : 0) > nbits) {
      low = (low & ~(mask << (16 + cnt))) | (val << (16 + cnt + shift));
    } else {
      error = -1;
    }
  }

  int tell() const {
    return (int)((precarry.size() + end_bytes.size()) * 8) + cnt +
           nend_bits + 10;
  }

  // done() writes into out (caller sizes it via done_size upper bound).
  int done(uint8_t *out) {
    uint32_t l = low, r = rng;
    int32_t c = cnt;
    int32_t s = 9;
    uint32_t m = 0x7FFF;
    uint32_t e = (l + m) & ~m;
    while ((e | m) >= l + r) {
      s++;
      m >>= 1;
      e = (l + m) & ~m;
    }
    s += c;
    std::vector<uint16_t> pc = precarry;
    if (s > 0) {
      uint32_t n = (1u << (c + 16)) - 1;
      do {
        pc.push_back((uint16_t)((e >> (c + 16)) & 0xFFFF));
        e &= n;
        s -= 8;
        c -= 8;
        n >>= 8;
      } while (s > 0);
    }
    uint32_t ew = end_window;
    int32_t ne = nend_bits;
    std::vector<uint8_t> eb = end_bytes;
    int32_t neg_s = -s;
    while (ne > neg_s) {
      eb.push_back((uint8_t)(ew & 0xFF));
      ew >>= 8;
      ne -= 8;
    }
    size_t np = pc.size();
    uint32_t carry = 0;
    for (size_t i = np; i-- > 0;) {
      uint32_t v = pc[i] + carry;
      out[i] = (uint8_t)(v & 0xFF);
      carry = v >> 8;
    }
    if (ne > 0 && np > 0) out[np - 1] |= (uint8_t)(ew & 0xFF);
    size_t pos = np;
    for (size_t i = eb.size(); i-- > 0;) out[pos++] = eb[i];
    return (int)pos;
  }
};

struct EcDec {
  const uint8_t *buf;
  int32_t len;
  int32_t bpos = 0;
  int32_t epos;
  uint32_t end_window = 0;
  int32_t nend_bits = 0;
  int32_t tell_offs;
  uint32_t dif = 0;
  uint32_t rng = 0x8000;
  int32_t cnt = -15;
  int32_t error = 0;

  EcDec(const uint8_t *b, int32_t n) : buf(b), len(n), epos(n) {
    tell_offs = 10 - (kWindowSize - 8);
    refill();
  }

  void refill() {
    int32_t s = kWindowSize - 9 - (cnt + 15);
    while (s >= 0 && bpos < len) {
      dif |= (uint32_t)buf[bpos] << s;
      cnt += 8;
      bpos++;
      s -= 8;
    }
    if (bpos >= len) {
      tell_offs += kLotsOfBits - cnt;
      cnt = kLotsOfBits;
    }
  }

  int normalize(uint32_t d, uint32_t r, int ret) {
    int dd = 16 - ilog_z(r);
    cnt -= dd;
    dif = d << dd;
    rng = r << dd;
    if (cnt < 0) refill();
    return ret;
  }

  int decode_bool_q15(uint32_t fz) {
    uint32_t d = dif, r = rng;
    uint32_t v = (fz * r) >> 15;
    uint32_t vw = v << (kWindowSize - 16);
    if (d >= vw) return normalize(d - vw, r - v, 1);
    return normalize(d, v, 0);
  }

  int decode_cdf_dyadic(const int32_t *cdf, int ftb) {
    uint32_t d = dif, r = rng;
    uint32_t c = d >> (kWindowSize - 16);
    uint32_t v = 0, u;
    int ret = -1;
    do {
      u = v;
      ret++;
      v = ((uint32_t)cdf[ret] * r) >> ftb;
    } while (v <= c);
    return normalize(d - (u << (kWindowSize - 16)), v - u, ret);
  }

  int decode_cdf(const int32_t *cdf, int n) {
    uint32_t d0 = dif, r = rng;
    uint32_t ft = (uint32_t)cdf[n - 1];
    int s = (r - ft >= ft) ? 1 : 0;
    ft <<= s;
    uint32_t d = r - ft;
    uint32_t c = d0 >> (kWindowSize - 16);
    // Signed intermediates: c - d and 2c + 1 - e can go negative and must
    // lose the max() (the Python reference uses arbitrary-precision ints).
    int64_t q = c >> 1;
    if ((int64_t)c - d > q) q = (int64_t)c - d;
    uint32_t e = subsatu(2 * d, ft);
    int64_t q2 = ((int64_t)2 * c + 1 - e);
    q2 = q2 >= 0 ? q2 / 3 : -((-q2 + 2) / 3);  // floor division
    if (q2 > q) q = q2;
    q >>= s;
    uint32_t fl = 0;
    int ret = 0;
    uint32_t fh = (uint32_t)cdf[0];
    while ((int64_t)fh <= q) {
      fl = fh;
      ret++;
      fh = (uint32_t)cdf[ret];
    }
    fl <<= s;
    fh <<= s;
    uint32_t u = partition_fn(fl, d, e);
    uint32_t v = partition_fn(fh, d, e);
    return normalize(d0 - (u << (kWindowSize - 16)), v - u, ret);
  }

  int decode_cdf_unscaled(const int32_t *cdf, int n) {
    uint32_t d0 = dif, r = rng;
    uint32_t ft = (uint32_t)cdf[n - 1];
    int s = 15 - ilog_z(ft - 1);
    ft <<= s;
    if (r - ft >= ft) {
      ft <<= 1;
      s++;
    }
    uint32_t d = r - ft;
    uint32_t c = d0 >> (kWindowSize - 16);
    int64_t q = c >> 1;
    if ((int64_t)c - d > q) q = (int64_t)c - d;
    uint32_t e = subsatu(2 * d, ft);
    int64_t q2 = ((int64_t)2 * c + 1 - e);
    q2 = q2 >= 0 ? q2 / 3 : -((-q2 + 2) / 3);
    if (q2 > q) q = q2;
    q >>= s;
    uint32_t fl = 0;
    int ret = 0;
    uint32_t fh = (uint32_t)cdf[0];
    while ((int64_t)fh <= q) {
      fl = fh;
      ret++;
      fh = (uint32_t)cdf[ret];
    }
    fl <<= s;
    fh <<= s;
    uint32_t u = partition_fn(fl, d, e);
    uint32_t v = partition_fn(fh, d, e);
    return normalize(d0 - (u << (kWindowSize - 16)), v - u, ret);
  }

  uint32_t decode_bits(int ftb) {
    uint32_t window = end_window;
    int32_t available = nend_bits;
    if (available < ftb) {
      while (available <= kWindowSize - 8) {
        if (epos <= 0) {
          tell_offs += kLotsOfBits - available;
          available = kLotsOfBits;
          break;
        }
        epos--;
        window |= (uint32_t)buf[epos] << available;
        available += 8;
      }
    }
    uint32_t ret = window & ((1u << ftb) - 1);
    window >>= ftb;
    available -= ftb;
    end_window = window;
    nend_bits = available;
    return ret;
  }

  uint32_t decode_uint(uint32_t ft) {
    if (ft > (1u << kUintBits)) {
      ft--;
      int ftb = ilog_z(ft) - kUintBits;
      uint32_t ft1 = (ft >> ftb) + 1;
      uint32_t t = (uint32_t)decode_cdf_dyadic(g_uniform[ft1], 15);
      t = (t << ftb) | decode_bits(ftb);
      if (t <= ft) return t;
      error = 1;
      return ft;
    }
    return (uint32_t)decode_cdf_dyadic(g_uniform[ft], 15);
  }

  int tell() const {
    return (int)((len - epos) + bpos) * 8 - cnt - nend_bits + tell_offs;
  }
};

int tell_frac_impl(int nbits_total, uint32_t rng) {
  int nbits = nbits_total << kBitres;
  int l = 0;
  for (int i = 0; i < kBitres; i++) {
    rng = (rng * rng) >> 15;
    int b = (int)(rng >> 16);
    l = (l << 1) | b;
    rng >>= b;
  }
  return nbits - l;
}

}  // namespace

extern "C" {

void ec_set_uniform_cdfs(const int32_t *flat) {
  int pos = 0;
  for (int n = 2; n <= 16; n++) {
    for (int i = 0; i < n; i++) g_uniform[n][i] = flat[pos++];
  }
  g_uniform_set = true;
}

// ---- encoder ----
void *ec_enc_new() { return new EcEnc(); }
void ec_enc_free(void *h) { delete (EcEnc *)h; }
void ec_enc_reset(void *h) { *(EcEnc *)h = EcEnc(); }
void ec_encode(void *h, int fl, int fh, int ft) {
  ((EcEnc *)h)->encode(fl, fh, ft);
}
void ec_encode_q15(void *h, int fl, int fh) {
  ((EcEnc *)h)->encode_q15(fl, fh);
}
void ec_encode_unscaled(void *h, int fl, int fh, int ft) {
  ((EcEnc *)h)->encode_unscaled(fl, fh, ft);
}
void ec_encode_bool_q15(void *h, int val, int fz) {
  ((EcEnc *)h)->encode_bool_q15(val, fz);
}
void ec_encode_cdf_q15(void *h, int s, const int32_t *cdf) {
  EcEnc *e = (EcEnc *)h;
  e->encode_q15(s > 0 ? (uint32_t)cdf[s - 1] : 0, (uint32_t)cdf[s]);
}
void ec_encode_cdf_unscaled(void *h, int s, const int32_t *cdf, int n) {
  EcEnc *e = (EcEnc *)h;
  e->encode_unscaled(s > 0 ? (uint32_t)cdf[s - 1] : 0, (uint32_t)cdf[s],
                     (uint32_t)cdf[n - 1]);
}
void ec_enc_uint(void *h, unsigned fl, unsigned ft) {
  ((EcEnc *)h)->encode_uint(fl, ft);
}
void ec_enc_bits(void *h, unsigned fl, int ftb) {
  ((EcEnc *)h)->encode_bits(fl, ftb);
}
void ec_enc_patch_initial_bits(void *h, unsigned val, int nbits) {
  ((EcEnc *)h)->patch_initial_bits(val, nbits);
}
int ec_enc_tell(void *h) { return ((EcEnc *)h)->tell(); }
int ec_enc_tell_frac(void *h) {
  EcEnc *e = (EcEnc *)h;
  return tell_frac_impl(e->tell(), e->rng);
}
int ec_enc_done_size(void *h) {
  EcEnc *e = (EcEnc *)h;
  return (int)(e->precarry.size() + e->end_bytes.size()) + 16;
}
int ec_enc_done(void *h, uint8_t *out) { return ((EcEnc *)h)->done(out); }
int ec_enc_error(void *h) { return ((EcEnc *)h)->error; }

// checkpoint: pack state into a caller buffer of 8 int64s.
void ec_enc_checkpoint(void *h, int64_t *cp) {
  EcEnc *e = (EcEnc *)h;
  cp[0] = e->low;
  cp[1] = e->rng;
  cp[2] = e->cnt;
  cp[3] = (int64_t)e->precarry.size();
  cp[4] = e->end_window;
  cp[5] = e->nend_bits;
  cp[6] = (int64_t)e->end_bytes.size();
  cp[7] = e->error;
}
void ec_enc_rollback(void *h, const int64_t *cp) {
  EcEnc *e = (EcEnc *)h;
  e->low = (uint32_t)cp[0];
  e->rng = (uint32_t)cp[1];
  e->cnt = (int32_t)cp[2];
  e->precarry.resize((size_t)cp[3]);
  e->end_window = (uint32_t)cp[4];
  e->nend_bits = (int32_t)cp[5];
  e->end_bytes.resize((size_t)cp[6]);
  e->error = (int32_t)cp[7];
}

// ---- decoder ----
void *ec_dec_new(const uint8_t *buf, int len) {
  // The decoder borrows the caller's buffer; the Python wrapper keeps the
  // bytes object alive for the decoder's lifetime.
  return new EcDec(buf, len);
}
void ec_dec_free(void *h) { delete (EcDec *)h; }
int ec_decode_bool_q15(void *h, int fz) {
  return ((EcDec *)h)->decode_bool_q15(fz);
}
int ec_decode_cdf_q15(void *h, const int32_t *cdf) {
  return ((EcDec *)h)->decode_cdf_dyadic(cdf, 15);
}
int ec_decode_cdf(void *h, const int32_t *cdf, int n) {
  return ((EcDec *)h)->decode_cdf(cdf, n);
}
int ec_decode_cdf_unscaled(void *h, const int32_t *cdf, int n) {
  return ((EcDec *)h)->decode_cdf_unscaled(cdf, n);
}
unsigned ec_dec_uint(void *h, unsigned ft) {
  return ((EcDec *)h)->decode_uint(ft);
}
unsigned ec_dec_bits(void *h, int ftb) { return ((EcDec *)h)->decode_bits(ftb); }
int ec_dec_tell(void *h) { return ((EcDec *)h)->tell(); }
int ec_dec_tell_frac(void *h) {
  EcDec *d = (EcDec *)h;
  return tell_frac_impl(d->tell(), d->rng);
}
int ec_dec_error(void *h) { return ((EcDec *)h)->error; }

int ec_tell_frac(int nbits_total, unsigned rng) {
  return tell_frac_impl(nbits_total, rng);
}

// ---- PVQ codeword coder -----------------------------------------------
// Recursive binary pulse-count splitting with adaptive CDFs; written from
// this project's Python implementation (daala_tpu/codec/pvq_codec.py:39-131,
// behavioral parity: src/laplace_encoder.c:38-80).  The rate entry point
// runs the whole measurement (scratch coder + scratch CDFs) in one call —
// this is the encoder's innermost RDO loop.

static void cdf_adapt_enc(EcEnc *e, int val, int32_t *cdf, int n,
                          int inc) {
  e->encode_unscaled(val > 0 ? (uint32_t)cdf[val - 1] : 0,
                     (uint32_t)cdf[val], (uint32_t)cdf[n - 1]);
  if (cdf[n - 1] + inc > 32767) {
    for (int i = 0; i < n; i++) cdf[i] = (cdf[i] >> 1) + i + 1;
  }
  for (int i = val; i < n; i++) cdf[i] += inc;
}

static inline int pvq_size_ctx(int n) {
  int logn = ilog_z((uint32_t)(n - 1));
  int odd = n & 1;
  return 2 * logn - 1 - odd - 7 * (n == 14);
}

static inline int pvq_k1_ctx(int n, int orig) {
  return orig ? 8 + 2 * (n > 8) + (n & 1) : pvq_size_ctx(n);
}

struct PvqCwCtx {
  int32_t *k1_cdf;     // 12 rows x 16
  int32_t *split_cdf;  // 98 rows x 8
  int32_t k1_inc, split_inc;
};

static void enc_pvq_split(EcEnc *e, PvqCwCtx *c, int count, int total,
                          int ctx) {
  if (total == 0) return;
  int shift = ilog_z((uint32_t)total) - 3;
  if (shift < 0) shift = 0;
  int rest = 0;
  if (shift) {
    rest = count & ((1 << shift) - 1);
    count >>= shift;
    total >>= shift;
  }
  int fctx = 7 * ctx + total - 1;
  cdf_adapt_enc(e, count, c->split_cdf + 8 * fctx, total + 1,
                c->split_inc);
  if (shift) e->encode_bits((uint32_t)rest, shift);
}

static void enc_band_splits(EcEnc *e, PvqCwCtx *c, const int32_t *y,
                            int n, int k, int level) {
  if (n <= 1 || k == 0) return;
  if (k == 1 && n <= 16) {
    int cdf_id = pvq_k1_ctx(n, level == 0);
    int pos = 0;
    while (!y[pos]) pos++;
    cdf_adapt_enc(e, pos, c->k1_cdf + 16 * cdf_id, n, c->k1_inc);
  } else {
    int mid = n >> 1;
    int cr = k;
    for (int i = 0; i < mid; i++) cr -= y[i] < 0 ? -y[i] : y[i];
    enc_pvq_split(e, c, cr, k, pvq_size_ctx(n));
    enc_band_splits(e, c, y, mid, k - cr, level + 1);
    enc_band_splits(e, c, y + mid, n - mid, cr, level + 1);
  }
}

void ec_pvq_codeword_encode(void *h, const int32_t *y, int n, int k,
                            int32_t *k1_cdf, int32_t *split_cdf,
                            int k1_inc, int split_inc) {
  EcEnc *e = (EcEnc *)h;
  PvqCwCtx c{k1_cdf, split_cdf, k1_inc, split_inc};
  enc_band_splits(e, &c, y, n, k, 0);
  for (int i = 0; i < n; i++) {
    if (y[i]) e->encode_bits(y[i] < 0 ? 1 : 0, 1);
  }
}

void ec_cdf_adapt_enc(void *h, int val, int32_t *cdf, int n, int inc) {
  cdf_adapt_enc((EcEnc *)h, val, cdf, n, inc);
}

static int cdf_adapt_dec(EcDec *d, int32_t *cdf, int n, int inc) {
  int val = d->decode_cdf_unscaled(cdf, n);
  if (cdf[n - 1] + inc > 32767) {
    for (int i = 0; i < n; i++) cdf[i] = (cdf[i] >> 1) + i + 1;
  }
  for (int i = val; i < n; i++) cdf[i] += inc;
  return val;
}

static int dec_pvq_split(EcDec *d, PvqCwCtx *c, int total, int ctx) {
  if (total == 0) return 0;
  int shift = ilog_z((uint32_t)total) - 3;
  if (shift < 0) shift = 0;
  int fctx = 7 * ctx + (total >> shift) - 1;
  int msbs = cdf_adapt_dec(d, c->split_cdf + 8 * fctx,
                           (total >> shift) + 1, c->split_inc);
  int count = shift ? (int)d->decode_bits(shift) : 0;
  count += msbs << shift;
  if (count > total) {
    count = total;
    d->error = 1;
  }
  return count;
}

static void dec_band_splits(EcDec *d, PvqCwCtx *c, int32_t *y, int n,
                            int k, int level) {
  if (n == 1) {
    y[0] = k;
    return;
  }
  if (k == 0) {
    for (int i = 0; i < n; i++) y[i] = 0;
    return;
  }
  if (k == 1 && n <= 16) {
    for (int i = 0; i < n; i++) y[i] = 0;
    int pos = cdf_adapt_dec(d, c->k1_cdf + 16 * pvq_k1_ctx(n, level == 0),
                            n, c->k1_inc);
    y[pos] = 1;
    return;
  }
  int mid = n >> 1;
  int cr = dec_pvq_split(d, c, k, pvq_size_ctx(n));
  dec_band_splits(d, c, y, mid, k - cr, level + 1);
  dec_band_splits(d, c, y + mid, n - mid, cr, level + 1);
}

int ec_cdf_adapt_dec(void *h, int32_t *cdf, int n, int inc) {
  return cdf_adapt_dec((EcDec *)h, cdf, n, inc);
}

void ec_pvq_codeword_decode(void *h, int32_t *y, int n, int k,
                            int32_t *k1_cdf, int32_t *split_cdf,
                            int k1_inc, int split_inc) {
  EcDec *d = (EcDec *)h;
  PvqCwCtx c{k1_cdf, split_cdf, k1_inc, split_inc};
  dec_band_splits(d, &c, y, n, k, 0);
  for (int i = 0; i < n; i++) {
    if (y[i] && d->decode_bits(1)) y[i] = -y[i];
  }
}

int ec_pvq_codeword_rate_q3(const int32_t *y, int n, int k,
                            const int32_t *k1_cdf,
                            const int32_t *split_cdf, int k1_inc,
                            int split_inc) {
  EcEnc e;
  int32_t k1[12 * 16];
  int32_t sp[98 * 8];
  std::memcpy(k1, k1_cdf, sizeof(k1));
  std::memcpy(sp, split_cdf, sizeof(sp));
  PvqCwCtx c{k1, sp, k1_inc, split_inc};
  int tell = tell_frac_impl(e.tell(), e.rng);
  enc_band_splits(&e, &c, y, n, k, 0);
  for (int i = 0; i < n; i++) {
    if (y[i]) e.encode_bits(y[i] < 0 ? 1 : 0, 1);
  }
  return tell_frac_impl(e.tell(), e.rng) - tell;
}

// ---- PVQ greedy pulse search ------------------------------------------
// Scalar port of the RDO pulse search (written from this project's
// Python implementation, daala_tpu/codec/pvq_codec.py
// pvq_search_rdo_double; behavioral parity: src/pvq_encoder.c:93-227).
// Plain double arithmetic in the reference's loop order so decisions
// match the C encoder bit for bit.

static const double kRsqrtTab[16] = {
    1.000000, 0.707107, 0.577350, 0.500000, 0.447214, 0.408248,
    0.377964, 0.353553, 0.333333, 0.316228, 0.301511, 0.288675,
    0.277350, 0.267261, 0.258199, 0.250000};

static inline double rsqrt_tab(int i) {
  if (i <= 16) return kRsqrtTab[i - 1];
  return 1.0 / __builtin_sqrt((double)i);
}

double ec_pvq_search_rdo_double(const double *xcoeff, int n, int k,
                                int32_t *ypulse, double g2,
                                double pvq_norm_lambda, int prev_k) {
  double x[1024];
  double xx = 0, xy = 0, yy = 0;
  int i, j;
  for (j = 0; j < n; j++) {
    x[j] = xcoeff[j] < 0 ? -xcoeff[j] : xcoeff[j];
    xx += x[j] * x[j];
  }
  double norm_1 = 1.0 / __builtin_sqrt(1e-30 + xx);
  double lambda = pvq_norm_lambda / (1e-30 + g2);
  i = 0;
  if (0 < prev_k && prev_k <= k) {
    for (j = 0; j < n; j++) {
      ypulse[j] = ypulse[j] < 0 ? -ypulse[j] : ypulse[j];
      xy += x[j] * ypulse[j];
      yy += (double)ypulse[j] * ypulse[j];
      i += ypulse[j];
    }
  } else if (k > 2) {
    double l1_norm = 0;
    for (j = 0; j < n; j++) l1_norm += x[j];
    double l1_inv = 1.0 / (l1_norm > 1e-100 ? l1_norm : 1e-100);
    for (j = 0; j < n; j++) {
      double tmp = k * x[j] * l1_inv;
      double fl = __builtin_floor(tmp);
      int v = (int)fl;
      if (v < 0) v = 0;
      ypulse[j] = v;
      xy += x[j] * ypulse[j];
      yy += (double)ypulse[j] * ypulse[j];
      i += ypulse[j];
    }
  } else {
    for (j = 0; j < n; j++) ypulse[j] = 0;
  }
  int rdo_pulses = 1 + k / 4;
  double delta_rate = 3.0 / n;
  double accel_rate = 0.0;
  if (k == 1) {
    if (n == 15) {
      accel_rate = -8.0 / n;
      delta_rate = 4.5 / n - accel_rate;
    } else if (n == 8) {
      accel_rate = 5.7 / n;
      delta_rate = 9.3 / n - accel_rate;
    }
  }
  while (i < k - rdo_pulses) {
    int pos = 0;
    double best_xy = -10.0, best_yy = 1.0;
    for (j = 0; j < n; j++) {
      double tmp_xy = xy + x[j];
      double tmp_yy = yy + 2 * ypulse[j] + 1;
      tmp_xy *= tmp_xy;
      if (j == 0 || tmp_xy * best_yy > best_xy * tmp_yy) {
        best_xy = tmp_xy;
        best_yy = tmp_yy;
        pos = j;
      }
    }
    xy += x[pos];
    yy += 2 * ypulse[pos] + 1;
    ypulse[pos]++;
    i++;
  }
  while (i < k) {
    double rst[4];
    for (int ii = 0; ii < 4; ii++) {
      rst[ii] = rsqrt_tab((int)yy + 2 * ii + 1);
    }
    int pos = 0;
    double best_cost = -1e5;
    for (j = 0; j < n; j++) {
      double tmp_xy = xy + x[j];
      int yj = ypulse[j];
      double tmp_yy = yj < 4 ? rst[yj]
                             : rsqrt_tab((int)yy + 2 * yj + 1);
      tmp_xy = 2 * tmp_xy * norm_1 * tmp_yy
               - lambda * j * (delta_rate + j * accel_rate);
      if (j == 0 || tmp_xy > best_cost) {
        best_cost = tmp_xy;
        pos = j;
      }
    }
    xy += x[pos];
    yy += 2 * ypulse[pos] + 1;
    ypulse[pos]++;
    i++;
  }
  for (j = 0; j < n; j++) {
    if (xcoeff[j] < 0) ypulse[j] = -ypulse[j];
  }
  return xy / (1e-100 + __builtin_sqrt(xx * yy));
}

}  // extern "C"
