// Native host-prep kernels for the TPU ECC runtime.
//
// The device does all field/group algebra; what remains on the host for the
// signing path is RFC 6979 nonce derivation — a chain of HMAC-SHA-256 calls
// per signature. Python's per-call hashlib/hmac glue costs ~100us/signature;
// this C++ batch kernel does the whole derivation in-process (~1-2us/sig,
// multithreaded over the batch), the moral equivalent of the reference
// stack's native rfc6979 crate (SURVEY §2.7).
//
// Scope: qlen == 256 bits, SHA-256, no extra data — covers secp256k1, P-256
// and the brainpool-256 twins; other curves fall back to the Python path.
//
// Build: tools-free, compiled on demand by tpu_ecc/native/__init__.py with
//   g++ -O3 -shared -fPIC -pthread fastcrypt.cpp -o fastcrypt.so

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- SHA-256
const uint32_t K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

inline uint32_t rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

struct Sha256 {
  uint32_t h[8];
  uint8_t buf[64];
  uint64_t total = 0;
  size_t off = 0;

  Sha256() { reset(); }

  void reset() {
    static const uint32_t init[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372,
                                     0xa54ff53a, 0x510e527f, 0x9b05688c,
                                     0x1f83d9ab, 0x5be0cd19};
    memcpy(h, init, sizeof(h));
    total = 0;
    off = 0;
  }

  void block(const uint8_t* p) {
    uint32_t w[64];
    for (int i = 0; i < 16; i++)
      w[i] = (uint32_t(p[4 * i]) << 24) | (uint32_t(p[4 * i + 1]) << 16) |
             (uint32_t(p[4 * i + 2]) << 8) | uint32_t(p[4 * i + 3]);
    for (int i = 16; i < 64; i++) {
      uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
      uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
      w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4], f = h[5],
             g = h[6], hh = h[7];
    for (int i = 0; i < 64; i++) {
      uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
      uint32_t ch = (e & f) ^ (~e & g);
      uint32_t t1 = hh + S1 + ch + K[i] + w[i];
      uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
      uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
      uint32_t t2 = S0 + maj;
      hh = g; g = f; f = e; e = d + t1;
      d = c; c = b; b = a; a = t1 + t2;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d;
    h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
  }

  void update(const uint8_t* p, size_t len) {
    total += len;
    if (off) {
      size_t take = 64 - off < len ? 64 - off : len;
      memcpy(buf + off, p, take);
      off += take;
      p += take;
      len -= take;
      if (off == 64) { block(buf); off = 0; }
    }
    while (len >= 64) { block(p); p += 64; len -= 64; }
    if (len) { memcpy(buf, p, len); off = len; }
  }

  void final(uint8_t out[32]) {
    uint64_t bits = total * 8;
    uint8_t pad = 0x80;
    update(&pad, 1);
    uint8_t z = 0;
    while (off != 56) update(&z, 1);
    uint8_t lb[8];
    for (int i = 0; i < 8; i++) lb[i] = uint8_t(bits >> (56 - 8 * i));
    update(lb, 8);
    for (int i = 0; i < 8; i++) {
      out[4 * i] = uint8_t(h[i] >> 24);
      out[4 * i + 1] = uint8_t(h[i] >> 16);
      out[4 * i + 2] = uint8_t(h[i] >> 8);
      out[4 * i + 3] = uint8_t(h[i]);
    }
  }
};

// HMAC-SHA-256 with key length <= 64 (RFC 6979 keys are 32 bytes).
struct Hmac {
  uint8_t kpad[64];

  void setkey(const uint8_t* key, size_t klen) {
    memset(kpad, 0, 64);
    memcpy(kpad, key, klen);
  }

  void mac(const uint8_t* const* parts, const size_t* lens, int nparts,
           uint8_t out[32]) {
    uint8_t pad[64];
    Sha256 inner;
    for (int i = 0; i < 64; i++) pad[i] = kpad[i] ^ 0x36;
    inner.update(pad, 64);
    for (int i = 0; i < nparts; i++) inner.update(parts[i], lens[i]);
    uint8_t ih[32];
    inner.final(ih);
    Sha256 outer;
    for (int i = 0; i < 64; i++) pad[i] = kpad[i] ^ 0x5c;
    outer.update(pad, 64);
    outer.update(ih, 32);
    outer.final(out);
  }
};

// big-endian fixed-width helpers (32 bytes)
inline int cmp32(const uint8_t* a, const uint8_t* b) { return memcmp(a, b, 32); }

inline void sub32(uint8_t* a, const uint8_t* b) {  // a -= b (a >= b)
  int borrow = 0;
  for (int i = 31; i >= 0; i--) {
    int v = int(a[i]) - int(b[i]) - borrow;
    borrow = v < 0;
    a[i] = uint8_t(v & 0xff);
  }
}

inline bool is_zero32(const uint8_t* a) {
  uint8_t acc = 0;
  for (int i = 0; i < 32; i++) acc |= a[i];
  return acc == 0;
}

void derive_one(const uint8_t* q, const uint8_t* x, const uint8_t* h1,
                uint8_t* out) {
  // seed = int2octets(x) || bits2octets(h1); qlen == hlen*8 == 256
  uint8_t seed[64];
  memcpy(seed, x, 32);
  memcpy(seed + 32, h1, 32);
  if (cmp32(seed + 32, q) >= 0) sub32(seed + 32, q);

  uint8_t V[32], Kk[32], tag;
  memset(V, 0x01, 32);
  memset(Kk, 0x00, 32);
  Hmac hm;

  const uint8_t* parts[3];
  size_t lens[3];

  // K = HMAC(K, V || 0x00 || seed); V = HMAC(K, V)
  hm.setkey(Kk, 32);
  tag = 0x00;
  parts[0] = V; lens[0] = 32;
  parts[1] = &tag; lens[1] = 1;
  parts[2] = seed; lens[2] = 64;
  hm.mac(parts, lens, 3, Kk);
  hm.setkey(Kk, 32);
  hm.mac(parts, lens, 1, V);
  // K = HMAC(K, V || 0x01 || seed); V = HMAC(K, V)
  tag = 0x01;
  hm.mac(parts, lens, 3, Kk);
  hm.setkey(Kk, 32);
  hm.mac(parts, lens, 1, V);

  for (;;) {
    hm.mac(parts, lens, 1, V);  // V = HMAC(K, V); T = V (qlen == hlen*8)
    if (!is_zero32(V) && cmp32(V, q) < 0) {
      memcpy(out, V, 32);
      return;
    }
    tag = 0x00;
    hm.mac(parts, lens, 2, Kk);  // K = HMAC(K, V || 0x00)
    hm.setkey(Kk, 32);
    hm.mac(parts, lens, 1, V);
  }
}

}  // namespace

extern "C" {

// out[b] = RFC6979 k for (q, x[b], h1[b]); all 32-byte big-endian rows.
void rfc6979_k_sha256_batch(const uint8_t* q, const uint8_t* x,
                            const uint8_t* h1, uint8_t* out, int32_t B) {
  int nt = int(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > 8) nt = 8;
  if (B < 64 || nt == 1) {
    for (int32_t b = 0; b < B; b++)
      derive_one(q, x + 32 * b, h1 + 32 * b, out + 32 * b);
    return;
  }
  std::vector<std::thread> ts;
  int32_t chunk = (B + nt - 1) / nt;
  for (int t = 0; t < nt; t++) {
    int32_t lo = t * chunk, hi = lo + chunk < B ? lo + chunk : B;
    if (lo >= hi) break;
    ts.emplace_back([=] {
      for (int32_t b = lo; b < hi; b++)
        derive_one(q, x + 32 * b, h1 + 32 * b, out + 32 * b);
    });
  }
  for (auto& t : ts) t.join();
}

// Batched SHA-256 over fixed-size messages (e.g. 32-byte prehash rows).
void sha256_batch(const uint8_t* msgs, int32_t msg_len, uint8_t* out,
                  int32_t B) {
  for (int32_t b = 0; b < B; b++) {
    Sha256 s;
    s.update(msgs + size_t(msg_len) * b, size_t(msg_len));
    s.final(out + 32 * b);
  }
}

}  // extern "C"
