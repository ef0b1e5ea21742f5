// ABDLOP commitments + opening proofs over the LNP proof ring.
//
// Counterpart of lazer's abdlop_* used by the reference PoD
// (vdec/c/src/vdec.c:213-214, SURVEY.md C6). Scheme (LNP22 section 4):
//
//   public:  A1 [n x m1], A2 [n x m2], B [l x m2]   (SHAKE-expanded)
//   witness: s1 [m1] (the "Ajtai" message, short), s2 [m2] ternary
//            m  [l]  (the "BDLOP" message)
//   commit:  tA = A1 s1 + A2 s2
//            tB = B  s2 + m
//   opening proof (Schnorr with rejection sampling):
//            w  = A1 y1 + A2 y2            (gaussian masks y1, y2)
//            c  = H(seed, tA, tB, w)       (sparse ternary challenge)
//            z1 = y1 + c s1,  z2 = y2 + c s2   (bimodal rejection)
//   verify:  A1 z1 + A2 z2 - c tA == w  and  ||z1||,||z2|| small
//
// Dimension-generic; coefficients as signed i64 (witness) and CRT residues
// (public/commitments). All hashing is SHAKE-128.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

// reuse internals from lnp_ring.cpp via C linkage
extern "C" {
struct LnpRing;
LnpRing* lnp_ring_new(const uint64_t*, int);
void lnp_ring_free(LnpRing*);
int lnp_ring_degree();
void lnp_polymat_mul_vec(LnpRing*, const uint64_t*, const uint64_t*, uint64_t*,
                         uint64_t, uint64_t);
void lnp_expand_uniform(LnpRing*, const uint8_t*, int, uint64_t, uint64_t*,
                        uint64_t);
void lnp_sample_gauss(const uint8_t*, int, uint64_t, double, int64_t*,
                      uint64_t);
void lnp_shake128(const uint8_t*, int, uint8_t*, int);
}

namespace {
using u64 = uint64_t;
using i64 = int64_t;
using u128 = __uint128_t;
constexpr int D = 64;

inline u64 addm(u64 a, u64 b, u64 q) { u64 s = a + b; return s >= q ? s - q : s; }
inline u64 subm(u64 a, u64 b, u64 q) { u64 s = a + q - b; return s >= q ? s - q : s; }
inline u64 mulm(u64 a, u64 b, u64 q) { return (u64)((u128)a * b % q); }
}  // namespace

extern "C" {

// signed coeffs [n_polys, D] -> residues [n_polys, L, D]
void abdlop_lift(const u64* primes, int L, const i64* coeffs, u64* out,
                 u64 n_polys) {
  for (u64 p = 0; p < n_polys; p++)
    for (int l = 0; l < L; l++) {
      u64 q = primes[l];
      for (int j = 0; j < D; j++) {
        i64 c = coeffs[p * D + j];
        i64 r = c % (i64)q;
        out[(p * (u64)L + l) * D + j] = (u64)(r < 0 ? r + (i64)q : r);
      }
    }
}

// sparse ternary challenge: omega nonzero +-1 coefficients of one ring
// element, derived from a transcript hash (lazer's challenge space with
// weight omega; vdec_params.h: omega = 8).
void abdlop_challenge(const uint8_t* hash, int hash_len, int omega,
                      i64* c_out) {
  memset(c_out, 0, D * sizeof(i64));
  // expand positions/signs from the hash
  std::vector<uint8_t> buf(4 * omega * 8);
  lnp_shake128(hash, hash_len, buf.data(), (int)buf.size());
  int placed = 0;
  size_t pos = 0;
  while (placed < omega && pos + 2 < buf.size()) {
    int idx = buf[pos] % D;
    int sign = (buf[pos + 1] & 1) ? 1 : -1;
    pos += 2;
    if (c_out[idx] == 0) {
      c_out[idx] = sign;
      placed++;
    }
  }
}

// polyvec addition over residues
void abdlop_add(const u64* primes, int L, const u64* a, const u64* b, u64* out,
                u64 n_polys) {
  for (u64 p = 0; p < n_polys; p++)
    for (int l = 0; l < L; l++) {
      u64 q = primes[l];
      for (int j = 0; j < D; j++) {
        u64 idx = (p * (u64)L + l) * D + j;
        out[idx] = addm(a[idx], b[idx], q);
      }
    }
}

void abdlop_sub(const u64* primes, int L, const u64* a, const u64* b, u64* out,
                u64 n_polys) {
  for (u64 p = 0; p < n_polys; p++)
    for (int l = 0; l < L; l++) {
      u64 q = primes[l];
      for (int j = 0; j < D; j++) {
        u64 idx = (p * (u64)L + l) * D + j;
        out[idx] = subm(a[idx], b[idx], q);
      }
    }
}

// z = y + c * s over signed coefficients (c sparse ternary, negacyclic)
void abdlop_mask_add(const i64* y, const i64* c, const i64* s, i64* z,
                     u64 n_polys) {
  for (u64 p = 0; p < n_polys; p++) {
    const i64* sp = s + p * D;
    i64* zp = z + p * D;
    const i64* yp = y + p * D;
    for (int j = 0; j < D; j++) zp[j] = yp[j];
    for (int i = 0; i < D; i++) {
      if (!c[i]) continue;
      i64 ci = c[i];
      for (int j = 0; j < D; j++) {
        int k = i + j;
        if (k < D)
          zp[k] += ci * sp[j];
        else
          zp[k - D] -= ci * sp[j];
      }
    }
  }
}

double abdlop_norm2(const i64* v, u64 n) {
  double s = 0;
  for (u64 i = 0; i < n; i++) s += (double)v[i] * (double)v[i];
  return std::sqrt(s);
}

i64 abdlop_norm_inf(const i64* v, u64 n) {
  i64 m = 0;
  for (u64 i = 0; i < n; i++) {
    i64 a = v[i] < 0 ? -v[i] : v[i];
    if (a > m) m = a;
  }
  return m;
}

}  // extern "C"
