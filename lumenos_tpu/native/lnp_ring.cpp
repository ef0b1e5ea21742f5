// Proof-system ring algebra for the LNP proof-of-decryption.
//
// Counterpart of the lazer subset the reference links against (SURVEY.md
// C6): arithmetic over R = Z_q[X]/(X^64+1) with q a product of ~50-bit
// primes (CRT limbs), polynomial vectors/matrices, SHAKE-128 (challenge
// expansion), and samplers (uniform, ternary, discrete gaussian, bimodal
// rejection).
//
// Two kinds of limb primes are supported:
//   - NTT-friendly (q = 1 mod 2D): negacyclic NTT per limb (fast path);
//   - split-friendly (q = 2L+1 mod 4L, L=2, i.e. q = 5 mod 8): X^D+1 has
//     exactly two irreducible factors mod q, which is what the
//     short-challenge-difference invertibility lemma (Lyubashevsky-Seiler
//     2018) needs for knowledge extraction; multiplication falls back to
//     schoolbook negacyclic (D=64 -> 4096 mulmods, microseconds).
// The reference's ring modulus is a single split-friendly prime
// (vdec_params.h: q = 2^68+445 = 5 mod 8) with NTT-friendly CRT moduli
// used only as an implementation device inside lazer; here each limb IS a
// ring-modulus factor, so limbs must be split-friendly for soundness.
//
// Dimension-generic where lazer is codegen-specialized; the LNP quad-eval
// layer builds on these primitives.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using u64 = uint64_t;
using u128 = __uint128_t;
using i64 = int64_t;

constexpr int D = 64;  // proof ring degree (vdec_params.h: d=64)

// ---- modular helpers ------------------------------------------------------

inline u64 addm(u64 a, u64 b, u64 q) { u64 s = a + b; return s >= q ? s - q : s; }
inline u64 subm(u64 a, u64 b, u64 q) { u64 s = a + q - b; return s >= q ? s - q : s; }
inline u64 mulm(u64 a, u64 b, u64 q) { return (u64)((u128)a * b % q); }

u64 powm(u64 b, u64 e, u64 q) {
  u64 r = 1;
  b %= q;
  while (e) {
    if (e & 1) r = mulm(r, b, q);
    b = mulm(b, b, q);
    e >>= 1;
  }
  return r;
}

// ---- per-limb negacyclic NTT (degree 64) ----------------------------------

struct Limb {
  u64 q;
  bool has_ntt;        // q = 1 mod 2D: fast NTT path available
  u64 psi_rev[D];      // bit-reversed psi powers (CT tables)
  u64 ipsi_rev[D];
  u64 d_inv;
};

int bitrev(int x, int bits) {
  int r = 0;
  for (int i = 0; i < bits; i++) { r = (r << 1) | (x & 1); x >>= 1; }
  return r;
}

bool is_prime(u64 n) {
  if (n < 2) return false;
  for (u64 p : {2ull, 3ull, 5ull, 7ull, 11ull, 13ull, 17ull, 19ull, 23ull,
                29ull, 31ull, 37ull}) {
    if (n % p == 0) return n == p;
  }
  u64 d = n - 1;
  int r = 0;
  while (!(d & 1)) { d >>= 1; r++; }
  for (u64 a : {2ull, 3ull, 5ull, 7ull, 11ull, 13ull, 17ull, 19ull, 23ull,
                29ull, 31ull, 37ull}) {
    u64 x = powm(a, d, n);
    if (x == 1 || x == n - 1) continue;
    bool comp = true;
    for (int i = 0; i < r - 1; i++) {
      x = mulm(x, x, n);
      if (x == n - 1) { comp = false; break; }
    }
    if (comp) return false;
  }
  return true;
}

u64 primitive_root(u64 q) {
  // factor q-1 (trial division; 50-bit values factor fast enough here)
  u64 n = q - 1;
  std::vector<u64> fac;
  for (u64 p = 2; p * p <= n; p += (p == 2 ? 1 : 2)) {
    if (n % p == 0) {
      fac.push_back(p);
      while (n % p == 0) n /= p;
    }
  }
  if (n > 1) fac.push_back(n);
  for (u64 g = 2;; g++) {
    bool ok = true;
    for (u64 p : fac)
      if (powm(g, (q - 1) / p, q) == 1) { ok = false; break; }
    if (ok) return g;
  }
}

void limb_init(Limb& L, u64 q) {
  L.q = q;
  L.has_ntt = ((q - 1) % (2 * D) == 0);
  if (!L.has_ntt) return;  // schoolbook path; no tables needed
  u64 g = primitive_root(q);
  u64 psi = powm(g, (q - 1) / (2 * D), q);
  u64 ipsi = powm(psi, q - 2, q);
  u64 p = 1, ip = 1;
  L.psi_rev[0] = 1;
  L.ipsi_rev[0] = 1;
  for (int j = 1; j < D; j++) {
    p = mulm(p, psi, q);
    ip = mulm(ip, ipsi, q);
    L.psi_rev[bitrev(j, 6)] = p;
    L.ipsi_rev[bitrev(j, 6)] = ip;
  }
  L.d_inv = powm(D, q - 2, q);
}

void ntt_fwd(const Limb& L, u64* a) {
  for (int m = 1, t = D / 2; m < D; m <<= 1, t >>= 1) {
    for (int i = 0; i < m; i++) {
      u64 w = L.psi_rev[m + i];
      for (int j = 2 * i * t; j < 2 * i * t + t; j++) {
        u64 u = a[j], v = mulm(a[j + t], w, L.q);
        a[j] = addm(u, v, L.q);
        a[j + t] = subm(u, v, L.q);
      }
    }
  }
}

void ntt_inv(const Limb& L, u64* a) {
  for (int m = D / 2, t = 1; m >= 1; m >>= 1, t <<= 1) {
    for (int i = 0; i < m; i++) {
      u64 w = L.ipsi_rev[m + i];
      for (int j = 2 * i * t; j < 2 * i * t + t; j++) {
        u64 u = a[j], v = a[j + t];
        a[j] = addm(u, v, L.q);
        a[j + t] = mulm(subm(u, v, L.q), w, L.q);
      }
    }
  }
  for (int j = 0; j < D; j++) a[j] = mulm(a[j], L.d_inv, L.q);
}

// schoolbook negacyclic product mod q (split-friendly limbs); out != a, b.
// Positive and wrapped halves accumulate separately: each is a sum of at
// most D products < 2^100, so < 2^106 fits u128 without folding.
static void negacyclic_mul_slow(u64 q, const u64* a, const u64* b, u64* out) {
  u128 lo[D] = {}, hi[D] = {};
  for (int i = 0; i < D; i++) {
    u64 ai = a[i];
    if (!ai) continue;
    int j = 0;
    for (; j < D - i; j++) lo[i + j] += (u128)ai * b[j];
    for (; j < D; j++) hi[i + j - D] += (u128)ai * b[j];
  }
  for (int k = 0; k < D; k++)
    out[k] = subm((u64)(lo[k] % q), (u64)(hi[k] % q), q);
}

// One-level split CRT for q = 5 mod 8 (our split-friendly primes): with
// i = 2^((q-1)/4) (2 is a non-residue for q = +-3 mod 8, so i^2 = -1),
// X^64+1 = (X^32 - i)(X^32 + i); evaluate, multiply two degree-32
// twisted halves (half the schoolbook products), interpolate.
void negacyclic_mul(u64 q, const u64* a, const u64* b, u64* out) {
  if ((q & 7) != 5) { negacyclic_mul_slow(q, a, b, out); return; }
  constexpr int H = D / 2;
  thread_local u64 cq = 0, ci = 0, cinv2 = 0;
  if (cq != q) {
    cq = q;
    ci = powm(2, (q - 1) / 4, q);
    cinv2 = (q + 1) / 2;
  }
  u64 ap[H], am[H], bp[H], bm[H];
  for (int k = 0; k < H; k++) {
    u64 ha = mulm(a[k + H], ci, q), hb = mulm(b[k + H], ci, q);
    ap[k] = addm(a[k], ha, q);
    am[k] = subm(a[k], ha, q);
    bp[k] = addm(b[k], hb, q);
    bm[k] = subm(b[k], hb, q);
  }
  u64 cp[H], cm[H];
  {
    u128 lo[H] = {}, hi[H] = {};
    for (int i = 0; i < H; i++) {
      u64 ai = ap[i];
      if (!ai) continue;
      int j = 0;
      for (; j < H - i; j++) lo[i + j] += (u128)ai * bp[j];
      for (; j < H; j++) hi[i + j - H] += (u128)ai * bp[j];
    }
    for (int k = 0; k < H; k++)   // X^32 = i
      cp[k] = addm((u64)(lo[k] % q), mulm((u64)(hi[k] % q), ci, q), q);
  }
  {
    u128 lo[H] = {}, hi[H] = {};
    for (int i = 0; i < H; i++) {
      u64 ai = am[i];
      if (!ai) continue;
      int j = 0;
      for (; j < H - i; j++) lo[i + j] += (u128)ai * bm[j];
      for (; j < H; j++) hi[i + j - H] += (u128)ai * bm[j];
    }
    for (int k = 0; k < H; k++)   // X^32 = -i
      cm[k] = subm((u64)(lo[k] % q), mulm((u64)(hi[k] % q), ci, q), q);
  }
  for (int k = 0; k < H; k++) {   // c0 = (cp+cm)/2, c1 = (cp-cm)/(2i)
    out[k] = mulm(addm(cp[k], cm[k], q), cinv2, q);
    u64 t = mulm(subm(cp[k], cm[k], q), cinv2, q);
    out[k + H] = mulm(t, q - ci, q);
  }
}

// ---- SHAKE-128 ------------------------------------------------------------

constexpr u64 RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

inline u64 rotl64(u64 x, int n) { return (x << n) | (x >> (64 - n)); }

void keccakf(u64 st[25]) {
  static const int rotc[5][5] = {{0, 36, 3, 41, 18},
                                 {1, 44, 10, 45, 2},
                                 {62, 6, 43, 15, 61},
                                 {28, 55, 25, 21, 56},
                                 {27, 20, 39, 8, 14}};
  for (int round = 0; round < 24; round++) {
    u64 c[5], d[5];
    for (int x = 0; x < 5; x++)
      c[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20];
    for (int x = 0; x < 5; x++) d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
    for (int i = 0; i < 25; i++) st[i] ^= d[i % 5];
    u64 b[25];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(st[x + 5 * y], rotc[x][y]);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        st[x + 5 * y] = b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y]);
    st[0] ^= RC[round];
  }
}

struct Shake128 {
  u64 st[25] = {0};
  uint8_t buf[168];
  size_t pos = 0;
  bool squeezing = false;

  void absorb(const uint8_t* data, size_t len) {
    auto* bytes = reinterpret_cast<uint8_t*>(st);
    while (len) {
      size_t take = std::min(len, size_t(168) - pos);
      for (size_t i = 0; i < take; i++) bytes[pos + i] ^= data[i];
      pos += take;
      data += take;
      len -= take;
      if (pos == 168) { keccakf(st); pos = 0; }
    }
  }

  void finalize() {
    auto* bytes = reinterpret_cast<uint8_t*>(st);
    bytes[pos] ^= 0x1f;
    bytes[167] ^= 0x80;
    keccakf(st);
    pos = 0;
    squeezing = true;
  }

  void squeeze(uint8_t* out, size_t len) {
    auto* bytes = reinterpret_cast<uint8_t*>(st);
    while (len) {
      if (pos == 168) { keccakf(st); pos = 0; }
      size_t take = std::min(len, size_t(168) - pos);
      memcpy(out, bytes + pos, take);
      pos += take;
      out += take;
      len -= take;
    }
  }
};

// ---- samplers -------------------------------------------------------------

u64 shake_u64(Shake128& xof) {
  uint8_t b[8];
  xof.squeeze(b, 8);
  u64 v;
  memcpy(&v, b, 8);
  return v;
}

// uniform in [0, bound) via rejection
u64 shake_uniform(Shake128& xof, u64 bound) {
  u64 mask = ~0ull >> __builtin_clzll(bound | 1);
  while (true) {
    u64 v = shake_u64(xof) & mask;
    if (v < bound) return v;
  }
}

// discrete gaussian via Karney-lite (CDT for small sigma done by rejection
// from continuous gaussian; adequate for prover-side masks)
i64 gauss_sample(Shake128& xof, double sigma) {
  while (true) {
    u64 a = shake_u64(xof) >> 11;
    u64 b = shake_u64(xof) >> 11;
    double u1 = (a + 0.5) * (1.0 / 9007199254740992.0);
    double u2 = (b + 0.5) * (1.0 / 9007199254740992.0);
    double g = std::sqrt(-2.0 * std::log(u1)) * std::cos(6.283185307179586 * u2);
    double x = g * sigma;
    i64 r = (i64)std::llround(x);
    // continuous->discrete correction via rejection
    double p = std::exp((x * x - (double)r * r) / (2 * sigma * sigma));
    u64 c = shake_u64(xof) >> 11;
    if ((c + 0.5) * (1.0 / 9007199254740992.0) < p) return r;
  }
}

}  // namespace

extern "C" {

// ---- exported API ---------------------------------------------------------

struct LnpRing {
  std::vector<Limb> limbs;
};

LnpRing* lnp_ring_new(const u64* primes, int n_primes) {
  auto* r = new LnpRing;
  r->limbs.resize(n_primes);
  for (int i = 0; i < n_primes; i++) limb_init(r->limbs[i], primes[i]);
  return r;
}

void lnp_ring_free(LnpRing* r) { delete r; }

int lnp_ring_degree() { return D; }

// polyvec layout: [n_polys, n_limbs, D] u64 residues (coefficient domain in,
// coefficient domain out for all ops below).

void lnp_polyvec_mul(LnpRing* r, const u64* a, const u64* b, u64* out,
                     u64 n_polys) {
  int L = (int)r->limbs.size();
  std::vector<u64> ta(D), tb(D);
  for (u64 p = 0; p < n_polys; p++) {
    for (int l = 0; l < L; l++) {
      const Limb& Lm = r->limbs[l];
      if (!Lm.has_ntt) {
        negacyclic_mul(Lm.q, a + (p * L + l) * D, b + (p * L + l) * D,
                       out + (p * L + l) * D);
        continue;
      }
      memcpy(ta.data(), a + (p * L + l) * D, D * 8);
      memcpy(tb.data(), b + (p * L + l) * D, D * 8);
      ntt_fwd(Lm, ta.data());
      ntt_fwd(Lm, tb.data());
      for (int j = 0; j < D; j++) ta[j] = mulm(ta[j], tb[j], Lm.q);
      ntt_inv(Lm, ta.data());
      memcpy(out + (p * L + l) * D, ta.data(), D * 8);
    }
  }
}

// matrix [rows, cols] of polys (CRT residues) x vector [cols] -> [rows]
void lnp_polymat_mul_vec(LnpRing* r, const u64* mat, const u64* vec, u64* out,
                         u64 rows, u64 cols) {
  int L = (int)r->limbs.size();
  std::vector<std::vector<u64>> vec_ntt(cols * L, std::vector<u64>(D));
  bool all_ntt = true;
  for (int l = 0; l < L; l++) all_ntt = all_ntt && r->limbs[l].has_ntt;
  if (all_ntt)
    for (u64 c = 0; c < cols; c++)
      for (int l = 0; l < L; l++) {
        memcpy(vec_ntt[c * L + l].data(), vec + (c * L + l) * D, D * 8);
        ntt_fwd(r->limbs[l], vec_ntt[c * L + l].data());
      }
#pragma omp parallel for schedule(static) collapse(2)
  for (u64 i = 0; i < rows; i++) {
    for (int l = 0; l < L; l++) {
      const Limb& Lm = r->limbs[l];
      std::vector<u64> tmp(D), acc(D, 0);
      if (Lm.has_ntt) {
        for (u64 c = 0; c < cols; c++) {
          memcpy(tmp.data(), mat + ((i * cols + c) * L + l) * D, D * 8);
          ntt_fwd(Lm, tmp.data());
          for (int j = 0; j < D; j++)
            acc[j] = addm(acc[j], mulm(tmp[j], vec_ntt[c * L + l][j], Lm.q),
                          Lm.q);
        }
        ntt_inv(Lm, acc.data());
      } else {
        // schoolbook row: accumulate lo/hi halves across the whole row
        // with periodic folds. Each COLUMN adds up to D=64 products of
        // < 2^102 to one slot, i.e. up to 2^108/column; u128 wraps after
        // 2^20 such columns, so fold every 2^19 to keep headroom.
        u128 lo[D] = {}, hi[D] = {};
        const u64 kFold = ((u64)1 << 19);
        u64 since = 0;
        for (u64 c = 0; c < cols; c++) {
          const u64* ap = mat + ((i * cols + c) * L + l) * D;
          const u64* bp = vec + (c * L + l) * D;
          for (int ii = 0; ii < D; ii++) {
            u64 ai = ap[ii];
            if (!ai) continue;
            int j = 0;
            for (; j < D - ii; j++) lo[ii + j] += (u128)ai * bp[j];
            for (; j < D; j++) hi[ii + j - D] += (u128)ai * bp[j];
          }
          if (++since == kFold) {
            for (int k = 0; k < D; k++) { lo[k] %= Lm.q; hi[k] %= Lm.q; }
            since = 0;
          }
        }
        for (int k = 0; k < D; k++)
          acc[k] = subm((u64)(lo[k] % Lm.q), (u64)(hi[k] % Lm.q), Lm.q);
      }
      memcpy(out + (i * L + l) * D, acc.data(), D * 8);
    }
  }
}

// SHAKE-128 one-shot expand: seed||domain -> uniform residues filling
// [n_polys, n_limbs, D] (used for the ABDLOP public matrices A1/A2/Bg).
void lnp_expand_uniform(LnpRing* r, const uint8_t* seed, int seed_len,
                        u64 domain, u64* out, u64 n_polys) {
  int L = (int)r->limbs.size();
  Shake128 xof;
  xof.absorb(seed, seed_len);
  uint8_t dom[8];
  memcpy(dom, &domain, 8);
  xof.absorb(dom, 8);
  xof.finalize();
  for (u64 p = 0; p < n_polys; p++)
    for (int l = 0; l < L; l++)
      for (int j = 0; j < D; j++)
        out[(p * L + l) * D + j] = shake_uniform(xof, r->limbs[l].q);
}

// ternary / gaussian secret vectors as signed int64 coefficients
void lnp_sample_ternary(const uint8_t* seed, int seed_len, u64 domain,
                        i64* out, u64 n_coeffs) {
  Shake128 xof;
  xof.absorb(seed, seed_len);
  uint8_t dom[8];
  memcpy(dom, &domain, 8);
  xof.absorb(dom, 8);
  xof.finalize();
  for (u64 i = 0; i < n_coeffs; i++)
    out[i] = (i64)shake_uniform(xof, 3) - 1;
}

void lnp_sample_gauss(const uint8_t* seed, int seed_len, u64 domain,
                      double sigma, i64* out, u64 n_coeffs) {
  Shake128 xof;
  xof.absorb(seed, seed_len);
  uint8_t dom[8];
  memcpy(dom, &domain, 8);
  xof.absorb(dom, 8);
  xof.finalize();
  for (u64 i = 0; i < n_coeffs; i++) out[i] = gauss_sample(xof, sigma);
}

// bimodal rejection sampling decision (Lyubashevsky): accept z = y + b*v
// with prob 1/(M*exp(-|v|^2/2s^2)*cosh(<z,v>/s^2)); returns 1 = accept.
int lnp_rej_bimodal(const uint8_t* seed, int seed_len, const i64* z,
                    const i64* v, u64 n, double sigma, double M) {
  double dot = 0, norm_v = 0;
  for (u64 i = 0; i < n; i++) {
    dot += (double)z[i] * (double)v[i];
    norm_v += (double)v[i] * (double)v[i];
  }
  double s2 = sigma * sigma;
  double p = std::exp(norm_v / (2 * s2)) / (M * std::cosh(dot / s2));
  if (p > 1) p = 1;
  Shake128 xof;
  xof.absorb(seed, seed_len);
  xof.finalize();
  uint8_t b[8];
  xof.squeeze(b, 8);
  u64 v8;
  memcpy(&v8, b, 8);
  double u = (double)(v8 >> 11) * (1.0 / 9007199254740992.0);
  return u < p ? 1 : 0;
}

// SHAKE self-test helper: one-shot XOF
void lnp_shake128(const uint8_t* data, int len, uint8_t* out, int outlen) {
  Shake128 xof;
  xof.absorb(data, (size_t)len);
  xof.finalize();
  xof.squeeze(out, (size_t)outlen);
}

// ---- quad-eval layer support (reference vdec.c:420-864) -------------------

// sigma automorphism X -> X^{-1} on residue vectors [n, L, D]:
// coeff 0 fixed, coeff j -> -(coeff at D-j).
void lnp_auto(const u64* primes, int L, const u64* in, u64* out, u64 n_polys) {
  for (u64 p = 0; p < n_polys; p++)
    for (int l = 0; l < L; l++) {
      u64 q = primes[l];
      const u64* a = in + (p * L + l) * D;
      u64* o = out + (p * L + l) * D;
      o[0] = a[0];
      for (int j = 1; j < D; j++) o[j] = a[D - j] ? q - a[D - j] : 0;
    }
}

// sigma on signed coefficient vectors [n, D]
void lnp_auto_signed(const i64* in, i64* out, u64 n_polys) {
  for (u64 p = 0; p < n_polys; p++) {
    const i64* a = in + p * D;
    i64* o = out + p * D;
    o[0] = a[0];
    for (int j = 1; j < D; j++) o[j] = -a[D - j];
  }
}

// sigma-invariant challenge (lazer's quad-eval space, vdec_params.h header
// comment "c uniform in [-omega,omega], o(c)=c"): free coefficients are
// c_0 and c_i for 1 <= i < D/2, with c_{D-i} = -c_i (so sigma(c) = c under
// X^{-i} = -X^{D-i}) and c_{D/2} = 0. Each free coefficient uniform in
// [-omega, omega] from the transcript hash.
void lnp_quad_challenge(const uint8_t* hash, int hash_len, int omega,
                        i64* c_out) {
  Shake128 xof;
  xof.absorb(hash, (size_t)hash_len);
  uint8_t dom[4] = {'q', 'c', 'h', 0};
  xof.absorb(dom, 4);
  xof.finalize();
  memset(c_out, 0, D * sizeof(i64));
  u64 span = (u64)(2 * omega + 1);
  c_out[0] = (i64)shake_uniform(xof, span) - omega;
  for (int i = 1; i < D / 2; i++) {
    i64 v = (i64)shake_uniform(xof, span) - omega;
    c_out[i] = v;
    c_out[D - i] = -v;
  }
}

// {0,+-1} projection-row expansion, lazer brandom distribution: two bits
// per entry, value = b0 - b1 (P(0)=1/2, P(+-1)=1/4). Row i of R.
void lnp_expand_R_row(const uint8_t* seed, int seed_len, u64 row, int8_t* out,
                      u64 dim) {
  Shake128 xof;
  xof.absorb(seed, (size_t)seed_len);
  uint8_t dom[12] = {'R', 'o', 'w', 0};
  memcpy(dom + 4, &row, 8);
  xof.absorb(dom, 12);
  xof.finalize();
  u64 nbytes = (dim + 3) / 4;
  std::vector<uint8_t> buf(nbytes);
  xof.squeeze(buf.data(), nbytes);
  for (u64 j = 0; j < dim; j++) {
    uint8_t b = (buf[j >> 2] >> ((j & 3) * 2)) & 3;
    out[j] = (int8_t)((b & 1) - ((b >> 1) & 1));
  }
}

// z = R * x for signed x [dim] -> [256] (projection of the witness
// coefficient vector; values stay far below 2^63)
void lnp_project(const uint8_t* seed, int seed_len, const i64* x, u64 dim,
                 i64* z_out) {
  std::vector<int8_t> row(dim);
#pragma omp parallel for schedule(static) firstprivate(row)
  for (int i = 0; i < 256; i++) {
    lnp_expand_R_row(seed, seed_len, (u64)i, row.data(), dim);
    i64 acc = 0;
    for (u64 j = 0; j < dim; j++) {
      int8_t r = row[j];
      if (r) acc += r > 0 ? x[j] : -x[j];
    }
    z_out[i] = acc;
  }
}

// vR = V * R over Z_q residues: V [256] residues per limb (challenge
// row k), R expanded from seed; out [dim] residues per limb.
// V values enter as centered magnitudes mod each limb.
void lnp_vR(const u64* primes, int L, const uint8_t* seed, int seed_len,
            const u64* v_res, u64 dim, u64* out) {
  // out[l*dim + j] = sum_i V[i] * R[i,j] mod q_l
  std::vector<int8_t> row(dim);
  std::vector<u64> acc((size_t)L * dim, 0);
  for (int i = 0; i < 256; i++) {
    lnp_expand_R_row(seed, seed_len, (u64)i, row.data(), dim);
    for (int l = 0; l < L; l++) {
      u64 q = primes[l];
      u64 vi = v_res[(u64)i * L + l];
      if (!vi) continue;
      u64 nvi = q - vi;
      u64* al = acc.data() + (size_t)l * dim;
      for (u64 j = 0; j < dim; j++) {
        int8_t r = row[j];
        if (r) al[j] = addm(al[j], r > 0 ? vi : nvi, q);
      }
    }
  }
  memcpy(out, acc.data(), (size_t)L * dim * 8);
}

// ---- big-ring helpers for the PoD statement (reference vdec.c:266-334) ----

// negacyclic convolution of length n (power of two) mod an NTT prime
// p = 1 mod 2n using on-the-fly tables. Scratch-based; exact.
struct BigNtt {
  u64 q;
  std::vector<u64> psi_rev, ipsi_rev;
  u64 n_inv;
  unsigned n;
};

void big_ntt_init(BigNtt& B, u64 q, unsigned n) {
  B.q = q;
  B.n = n;
  B.psi_rev.resize(n);
  B.ipsi_rev.resize(n);
  u64 g = primitive_root(q);
  u64 psi = powm(g, (q - 1) / (2 * n), q);
  u64 ipsi = powm(psi, q - 2, q);
  int bits = __builtin_ctz(n);
  B.psi_rev[0] = B.ipsi_rev[0] = 1;
  u64 p = 1, ip = 1;
  for (unsigned j = 1; j < n; j++) {
    p = mulm(p, psi, q);
    ip = mulm(ip, ipsi, q);
    unsigned r = 0, x = j;
    for (int b = 0; b < bits; b++) { r = (r << 1) | (x & 1); x >>= 1; }
    B.psi_rev[r] = p;
    B.ipsi_rev[r] = ip;
  }
  B.n_inv = powm(n, q - 2, q);
}

void big_ntt_fwd(const BigNtt& B, u64* a) {
  unsigned n = B.n;
  for (unsigned m = 1, t = n / 2; m < n; m <<= 1, t >>= 1)
    for (unsigned i = 0; i < m; i++) {
      u64 w = B.psi_rev[m + i];
      for (unsigned j = 2 * i * t; j < 2 * i * t + t; j++) {
        u64 u = a[j], v = mulm(a[j + t], w, B.q);
        a[j] = addm(u, v, B.q);
        a[j + t] = subm(u, v, B.q);
      }
    }
}

void big_ntt_inv(const BigNtt& B, u64* a) {
  unsigned n = B.n;
  for (unsigned m = n / 2, t = 1; m >= 1; m >>= 1, t <<= 1)
    for (unsigned i = 0; i < m; i++) {
      u64 w = B.ipsi_rev[m + i];
      for (unsigned j = 2 * i * t; j < 2 * i * t + t; j++) {
        u64 u = a[j], v = a[j + t];
        a[j] = addm(u, v, B.q);
        a[j + t] = mulm(subm(u, v, B.q), w, B.q);
      }
    }
  for (unsigned j = 0; j < n; j++) a[j] = mulm(a[j], B.n_inv, B.q);
}

// auxiliary NTT primes = 1 mod 2n for n up to 2^15, ~50 bits: found once
u64 find_aux_prime(unsigned n, u64 below) {
  u64 step = 2ull * n;
  u64 cand = (below - 2) / step * step + 1;
  while (!is_prime(cand)) cand -= step;
  return cand;
}

// ---- STROBE-128 sponge block ops (merlin transcript hot path) -------------
// Bit-exact twins of core/transcript.py Strobe128._absorb/_overwrite/
// _squeeze/_run_f (rate 166); Python keeps the op-framing logic and calls
// these for the byte loops + Keccak permutations (round-1 VERDICT weak #7:
// sampling 8192 challenges was thousands of pure-Python keccak calls).

static const int64_t STROBE_R = 166;

static inline void strobe_run_f_inner(uint8_t st[200], int64_t* pos,
                                      int64_t* pos_begin) {
  st[*pos] ^= (uint8_t)(*pos_begin);
  st[*pos + 1] ^= 0x04;
  st[STROBE_R + 1] ^= 0x80;
  keccakf(reinterpret_cast<u64*>(st));
  *pos = 0;
  *pos_begin = 0;
}

void strobe_run_f(uint8_t st[200], int64_t* pos, int64_t* pos_begin) {
  strobe_run_f_inner(st, pos, pos_begin);
}

void strobe_absorb(uint8_t st[200], int64_t* pos, int64_t* pos_begin,
                   const uint8_t* data, int64_t len) {
  for (int64_t i = 0; i < len; i++) {
    st[*pos] ^= data[i];
    (*pos)++;
    if (*pos == STROBE_R) strobe_run_f_inner(st, pos, pos_begin);
  }
}

void strobe_overwrite(uint8_t st[200], int64_t* pos, int64_t* pos_begin,
                      const uint8_t* data, int64_t len) {
  for (int64_t i = 0; i < len; i++) {
    st[*pos] = data[i];
    (*pos)++;
    if (*pos == STROBE_R) strobe_run_f_inner(st, pos, pos_begin);
  }
}

void strobe_squeeze(uint8_t st[200], int64_t* pos, int64_t* pos_begin,
                    uint8_t* out, int64_t len) {
  for (int64_t i = 0; i < len; i++) {
    out[i] = st[*pos];
    st[*pos] = 0;
    (*pos)++;
    if (*pos == STROBE_R) strobe_run_f_inner(st, pos, pos_begin);
  }
}

}  // extern "C"

namespace {
// negacyclic convolution of length n of residues mod target prime p
// (NOT NTT-friendly): lift to 3 auxiliary NTT primes (exact integer
// coefficients < n * p^2 < 2^112 < product of aux primes), CRT/Garner
// reconstruct mod p. Inputs/outputs in [0, p).
struct BigConv {
  unsigned n;
  u64 aux[3];
  BigNtt B[3];
  u64 inv_p0_mod_p1, inv_p01_mod_p2;  // Garner constants
  BigConv(unsigned n_) : n(n_) {
    u64 below = (u64)1 << 50;
    for (int i = 0; i < 3; i++) {
      aux[i] = find_aux_prime(n, below);
      below = aux[i] - 1;
      big_ntt_init(B[i], aux[i], n);
    }
    inv_p0_mod_p1 = powm(aux[0] % aux[1], aux[1] - 2, aux[1]);
    u64 p01 = mulm(aux[0] % aux[2], aux[1] % aux[2], aux[2]);
    inv_p01_mod_p2 = powm(p01, aux[2] - 2, aux[2]);
  }

  // out = a (*) b mod p, all length n in [0, p); centered lift first so
  // the integer convolution magnitude stays below n * (p/2)^2 * 2
  void run(u64 p, const u64* a, const u64* b, u64* out) const {
    std::vector<u64> ta(n), tb(n);
    std::vector<u64> res[3];
    u64 half = p / 2;
    for (int i = 0; i < 3; i++) {
      u64 q = aux[i];
      res[i].resize(n);
      for (unsigned j = 0; j < n; j++) {
        // center mod p then reduce mod aux: keeps coefficients minimal
        u64 av = a[j], bv = b[j];
        ta[j] = av > half ? subm(av % q, p % q, q) : av % q;
        tb[j] = bv > half ? subm(bv % q, p % q, q) : bv % q;
      }
      big_ntt_fwd(B[i], ta.data());
      big_ntt_fwd(B[i], tb.data());
      for (unsigned j = 0; j < n; j++) ta[j] = mulm(ta[j], tb[j], q);
      big_ntt_inv(B[i], ta.data());
      res[i] = ta;
    }
    // Garner: x = v0 + p0*(v1 + p1*v2)  (mixed radix), reduce mod p.
    // Center: if x > P/2 subtract P.  P = p0*p1*p2 ~ 2^150 -> use the
    // mixed-radix digits directly mod p with u128 arithmetic.
    u64 p0 = aux[0], p1 = aux[1], p2 = aux[2];
    u64 p0_mod_p = p0 % p, p01_mod_p = (u64)(((u128)p0_mod_p * (p1 % p)) % p);
    // P mod p and P/2 test via digits: x > P/2 iff v2 > p2/2 (approx;
    // exact enough since digits distribute) - do the exact centered
    // compare via long arithmetic on (v2, v1, v0)
    u64 P_mod_p = (u64)(((u128)p01_mod_p * (p2 % p)) % p);
    for (unsigned j = 0; j < n; j++) {
      u64 v0 = res[0][j];
      u64 v1 = (u64)(((u128)subm(res[1][j], v0 % p1, p1) * inv_p0_mod_p1) % p1);
      // t = v0 + p0*v1 mod p2
      u64 t_mod_p2 = (u64)(((u128)v1 * (p0 % p2) + v0) % p2);
      u64 v2 = (u64)(((u128)subm(res[2][j], t_mod_p2, p2) * inv_p01_mod_p2)
                     % p2);
      // x = v0 + p0*v1 + p0*p1*v2; center by comparing v2 against p2/2
      // (the top mixed-radix digit dominates: x > P/2 <=> v2 > ~p2/2;
      // boundary cases shift the representative by +-P which is 0 mod p
      // AFTER the correction below, so correctness only needs SOME
      // centered representative - any lift congruent mod P works)
      u64 x_mod_p = (u64)(((u128)v0 + (u128)p0_mod_p * (v1 % p)
                           + (u128)p01_mod_p * (v2 % p)) % p);
      if (v2 > p2 / 2) x_mod_p = subm(x_mod_p, P_mod_p, p);
      out[j] = x_mod_p;
    }
  }
};
}  // namespace

extern "C" {

// cached BigConv instances per length
static std::vector<std::pair<unsigned, BigConv*>> g_convs;

static BigConv* get_conv(unsigned n) {
  for (auto& kv : g_convs)
    if (kv.first == n) return kv.second;
  auto* c = new BigConv(n);
  g_convs.push_back({n, c});
  return c;
}

// big negacyclic product mod each of L primes: a, b, out are [L, n]
void pod_big_conv(const u64* primes, int L, unsigned n, const u64* a,
                  const u64* b, u64* out) {
  BigConv* c = get_conv(n);
#pragma omp parallel for schedule(static)
  for (int l = 0; l < L; l++)
    c->run(primes[l], a + (size_t)l * n, b + (size_t)l * n,
           out + (size_t)l * n);
}

// PoD statement noise + wrap: over the integers,
//     ct0 + ct1 (*) s - dm  =  e + Q1 * v,
// with s ternary (i8), Q1 < 2^128 passed as two u64 halves, e the
// centered representative mod Q1 and v the (small) wrap witness.
// ct0/ct1/dm enter as centered i128 split into (hi: i64, lo: u64) pairs
// [n]; e leaves the same way; v leaves as i64 (|v| <= n/2 + 1).
// The ternary convolution is exact signed 128-bit accumulation
// (|sum| <= n * Q1/2 < 2^126).
void pod_statement_noise(u64 q_lo, u64 q_hi, unsigned n, const i64* ct0_hi,
                         const u64* ct0_lo, const i64* ct1_hi,
                         const u64* ct1_lo, const i64* dm_hi,
                         const u64* dm_lo, const int8_t* s, i64* e_hi,
                         u64* e_lo, i64* v_out) {
  using i128 = __int128_t;
  u128 Q = ((u128)q_hi << 64) | q_lo;
  std::vector<i128> ct1v(n);
  for (unsigned i = 0; i < n; i++)
    ct1v[i] = ((i128)ct1_hi[i] << 64) | ct1_lo[i];
#pragma omp parallel for schedule(static)
  for (unsigned k = 0; k < n; k++) {
    i128 a = 0;
    // e_k = sum_{i+j=k} ct1_i s_j - sum_{i+j=k+n} ct1_i s_j
    for (unsigned j = 0; j < n; j++) {
      int8_t sj = s[j];
      if (!sj) continue;
      i128 c = (k >= j) ? ct1v[k - j] : -ct1v[n + k - j];
      a += sj > 0 ? c : -c;
    }
    a += ((i128)ct0_hi[k] << 64) | ct0_lo[k];
    a -= ((i128)dm_hi[k] << 64) | dm_lo[k];
    // reduce to centered representative mod Q; v = (a - e)/Q exactly
    i128 sq = (i128)Q;
    i128 e = a % sq;
    if (e > sq / 2) e -= sq;
    if (e < -(sq / 2)) e += sq;
    e_hi[k] = (i64)(e >> 64);
    e_lo[k] = (u64)(e & ~0ull);
    if (v_out) v_out[k] = (i64)((a - e) / sq);
  }
}

// GBFV statement noise + wrap over Z[X]/f, f = Phi_42(X^256) =
// Phi_10752(X), degree 3072 (the reference's vdec_gbfv.c ring: its
// 12x12 delta=256 rotation matrix encodes exactly X^3072 =
// -1 - X^256 + X^768 + X^1024 - X^1536 + X^2048 + X^2304 - X^2816;
// the reference pads to 3078 and truncates to 48 chunks - we use the
// true cyclotomic degree). Linear ternary convolution in exact i128,
// sparse f-reduction cascade, then e = centered mod Q, v = (acc-e)/Q.
static const int GBFV_N = 3072;
static const int GBFV_NOFF = 8;
static const int gbfv_off[GBFV_NOFF] = {0, 256, 768, 1024, 1536, 2048,
                                        2304, 2816};
static const int gbfv_sgn[GBFV_NOFF] = {-1, -1, 1, 1, -1, 1, 1, -1};

void gbfv_statement_noise(u64 q_lo, u64 q_hi, const i64* ct0_hi,
                          const u64* ct0_lo, const i64* ct1_hi,
                          const u64* ct1_lo, const i64* dm_hi,
                          const u64* dm_lo, const int8_t* s, i64* e_hi,
                          u64* e_lo, i64* v_out) {
  using i128 = __int128_t;
  const int n = GBFV_N;
  u128 Q = ((u128)q_hi << 64) | q_lo;
  std::vector<i128> ct1v(n);
  for (int i = 0; i < n; i++)
    ct1v[i] = ((i128)ct1_hi[i] << 64) | ct1_lo[i];
  // linear convolution acc[0..2n-2]
  std::vector<i128> acc(2 * n - 1, 0);
#pragma omp parallel for schedule(static)
  for (int k = 0; k < 2 * n - 1; k++) {
    i128 a = 0;
    int jlo = k >= n ? k - n + 1 : 0;
    int jhi = k < n ? k : n - 1;
    for (int j = jlo; j <= jhi; j++) {
      int8_t sj = s[j];
      if (sj) a += sj > 0 ? ct1v[k - j] : -ct1v[k - j];
    }
    acc[k] = a;
  }
  // f-reduction cascade: X^e = X^(e-n) * X^n, highest first
  for (int e = 2 * n - 2; e >= n; e--) {
    i128 c = acc[e];
    if (c == 0) continue;
    acc[e] = 0;
    for (int t = 0; t < GBFV_NOFF; t++) {
      int p = e - n + gbfv_off[t];
      acc[p] += gbfv_sgn[t] > 0 ? c : -c;
    }
  }
#pragma omp parallel for schedule(static)
  for (int k = 0; k < n; k++) {
    i128 a = acc[k];
    a += ((i128)ct0_hi[k] << 64) | ct0_lo[k];
    a -= ((i128)dm_hi[k] << 64) | dm_lo[k];
    i128 sq = (i128)Q;
    i128 e = a % sq;
    if (e > sq / 2) e -= sq;
    if (e < -(sq / 2)) e += sq;
    e_hi[k] = (i64)(e >> 64);
    e_lo[k] = (u64)(e & ~0ull);
    if (v_out) v_out[k] = (i64)((a - e) / sq);
  }
}

}  // extern "C"
