// TEA-variant block decryption engine (native host hot path).
//
// Bit-exact C++ twin of tetraear_tpu/crypto/tea.py (which itself reproduces
// the reference tetraear/core/crypto.py:88-268 round arithmetic, including
// the mid-round sum decrement).  The decode orchestrator's brute-force loop
// tries ~34 keys x N blocks per frame (decoder.py:631-666); doing the
// Feistel rounds in C++ removes the dominant Python cost.  Scoring that
// depends on protocol parsing stays in Python; the cheap score components
// (printable count, byte diversity, header patterns) are provided here for
// optional prefiltering.
//
// Exported C ABI (ctypes):
//   tea1_decrypt_ecb(key10, data, n, out)        n % 8 == 0
//   tea2_decrypt_ecb(key16, data, n, out)        (TEA3/TEA4 alias TEA2)
//   tea_basic_score(data, n) -> int32            cheap score components
//   tea_bruteforce(keys, key_lens, num_keys, algs, data, n, out_plain,
//                  out_scores)                   all keys in one call

#include <cstdint>
#include <cstring>

namespace {

constexpr uint32_t kDelta = 0x9E3779B9u;

inline uint32_t load_be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline void store_be32(uint8_t* p, uint32_t v) {
    p[0] = uint8_t(v >> 24); p[1] = uint8_t(v >> 16);
    p[2] = uint8_t(v >> 8);  p[3] = uint8_t(v);
}

// The Python reference keeps `sum` as an unmasked big int.  Only the low 32
// bits of each additive/xor term reach the masked result, except the key
// *indices* (sum >> 11) & 3 and sum & 3, which read the true unmasked sum.
// sum = delta * (32 - r) fits in 40 bits; track it as uint64.
void tea1_decrypt_block(const uint8_t* key, const uint8_t* in, uint8_t* out) {
    uint32_t kw[5];
    for (int i = 0; i < 5; ++i)
        kw[i] = (uint32_t(key[2 * i]) << 8) | key[2 * i + 1];
    uint32_t v0 = load_be32(in), v1 = load_be32(in + 4);
    uint64_t sum = uint64_t(kDelta) * 32u;
    for (int r = 0; r < 32; ++r) {
        uint32_t s32 = uint32_t(sum);
        v1 -= (((v0 << 4) ^ (v0 >> 5) ^ s32) + v0) ^
              (kw[(sum >> 11) & 3] + s32);
        sum -= kDelta;
        s32 = uint32_t(sum);
        v0 -= (((v1 << 4) ^ (v1 >> 5) ^ s32) + v1) ^
              (kw[sum & 3] + s32);
    }
    store_be32(out, v0); store_be32(out + 4, v1);
}

void tea2_decrypt_block(const uint8_t* key, const uint8_t* in, uint8_t* out) {
    uint32_t k0 = load_be32(key), k1 = load_be32(key + 4);
    uint32_t k2 = load_be32(key + 8), k3 = load_be32(key + 12);
    uint32_t v0 = load_be32(in), v1 = load_be32(in + 4);
    uint64_t sum = uint64_t(kDelta) * 32u;
    for (int r = 0; r < 32; ++r) {
        uint32_t s32 = uint32_t(sum);
        v1 -= ((v0 << 4) + k2) ^ (v0 + s32) ^ ((v0 >> 5) + k3);
        sum -= kDelta;
        s32 = uint32_t(sum);
        v0 -= ((v1 << 4) + k0) ^ (v1 + s32) ^ ((v1 >> 5) + k1);
    }
    store_be32(out, v0); store_be32(out + 4, v1);
}

}  // namespace

extern "C" {

int tea1_decrypt_ecb(const uint8_t* key, const uint8_t* data, int n,
                     uint8_t* out) {
    if (n % 8 != 0) return -1;
    for (int i = 0; i < n; i += 8) tea1_decrypt_block(key, data + i, out + i);
    return 0;
}

int tea2_decrypt_ecb(const uint8_t* key, const uint8_t* data, int n,
                     uint8_t* out) {
    if (n % 8 != 0) return -1;
    for (int i = 0; i < n; i += 8) tea2_decrypt_block(key, data + i, out + i);
    return 0;
}

// Cheap score components of decoder.py:700-732: printable*2, diversity +30,
// all-zero/all-FF -50, header bonuses +10/+20, any-diversity +10.
int32_t tea_basic_score(const uint8_t* data, int n) {
    if (n <= 0) return 0;
    int32_t score = 0;
    int printable = 0;
    bool seen[256] = {false};
    int unique = 0;
    bool all_zero = true, all_ff = true;
    for (int i = 0; i < n; ++i) {
        uint8_t b = data[i];
        if (b >= 32 && b <= 126) ++printable;
        if (!seen[b]) { seen[b] = true; ++unique; }
        if (b != 0x00) all_zero = false;
        if (b != 0xFF) all_ff = false;
    }
    score += printable * 2;
    if (unique > n / 8) score += 30;
    if (all_zero) score -= 50;
    if (all_ff) score -= 50;
    if (n >= 4) {
        uint8_t f = data[0];
        if (f != 0x00 && f != 0xFF) score += 10;
        if (f == 0x01 || f == 0x02 || f == 0x03 || f == 0x04 ||
            f == 0x05 || f == 0x08 || f == 0x0A || f == 0x0C)
            score += 20;
    }
    if (unique > 1) score += 10;
    return score;
}

// Decrypt `data` with every key in one call.
//   keys:      concatenated key bytes
//   key_lens:  per-key byte length (10 -> TEA1 arithmetic, 16 -> TEA2)
//   algs:      per-key algorithm id (1..4); invalid lengths -> status 1
//   out_plain: num_keys * n bytes
//   out_status: 0 ok, 1 skipped (invalid key length for algorithm)
//   out_scores: basic score per key (0 where skipped)
int tea_bruteforce(const uint8_t* keys, const int32_t* key_lens,
                   int num_keys, const int32_t* algs,
                   const uint8_t* data, int n,
                   uint8_t* out_plain, int32_t* out_status,
                   int32_t* out_scores) {
    if (n % 8 != 0) return -1;
    int off = 0;
    for (int k = 0; k < num_keys; ++k) {
        const uint8_t* key = keys + off;
        int len = key_lens[k];
        off += len;
        uint8_t* out = out_plain + size_t(k) * n;
        int expected = (algs[k] == 1) ? 10 : 16;
        if (len != expected) {
            out_status[k] = 1;
            out_scores[k] = 0;
            std::memset(out, 0, n);
            continue;
        }
        if (algs[k] == 1)
            tea1_decrypt_ecb(key, data, n, out);
        else
            tea2_decrypt_ecb(key, data, n, out);
        out_status[k] = 0;
        out_scores[k] = tea_basic_score(out, n);
    }
    return 0;
}

}  // extern "C"
