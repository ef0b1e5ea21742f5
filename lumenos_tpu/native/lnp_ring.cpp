// Proof-system ring algebra for the LNP proof-of-decryption.
//
// Counterpart of the lazer subset the reference links against (SURVEY.md
// C6): arithmetic over R = Z_q[X]/(X^64+1) with q a product of NTT-friendly
// ~50-bit primes (CRT limbs), negacyclic NTT per limb, polynomial
// vectors/matrices, SHAKE-128 (challenge expansion), and samplers
// (uniform, ternary, discrete gaussian, bimodal rejection).
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
  for (u64 c = 0; c < cols; c++)
    for (int l = 0; l < L; l++) {
      memcpy(vec_ntt[c * L + l].data(), vec + (c * L + l) * D, D * 8);
      ntt_fwd(r->limbs[l], vec_ntt[c * L + l].data());
    }
  std::vector<u64> tmp(D), acc(D);
  for (u64 i = 0; i < rows; i++) {
    for (int l = 0; l < L; l++) {
      const Limb& Lm = r->limbs[l];
      std::fill(acc.begin(), acc.end(), 0);
      for (u64 c = 0; c < cols; c++) {
        memcpy(tmp.data(), mat + ((i * cols + c) * L + l) * D, D * 8);
        ntt_fwd(Lm, tmp.data());
        for (int j = 0; j < D; j++)
          acc[j] = addm(acc[j], mulm(tmp[j], vec_ntt[c * L + l][j], Lm.q), Lm.q);
      }
      ntt_inv(Lm, acc.data());
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

}  // extern "C"
