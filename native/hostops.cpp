// Host-side hot loops for the kalign ingest path (ctypes ABI).
//
// The TPU tunnel moves ~10-35 MB/s, so reads cross it 2-bit packed; numpy's
// strided uint8 packing of a [B, L] code matrix measured ~40 ms per 100K
// reads (1 GB/s) — this memory-bound C loop does it at DRAM rate.
//
// Reference analog: the 2-bit packed CSeqTrans representation used
// throughout libkit4b (libkit4b/SeqTrans.cpp) — here it doubles as the
// wire format to the device.
#include <cstdint>
#include <cstring>

extern "C" {

// codes [B, L] row-major (values 0..7; >=4 means non-ACGT) ->
//   packed [B, ceil(L/4)] (2-bit, codes & 3)
//   nlist  [n_cap, 2] (read_idx, base_idx) of codes >= 4, pad = 2^30
// returns number of Ns found, or -1 if more than n_cap (caller falls back).
int64_t pack2bit_u8(const uint8_t* codes, int64_t B, int64_t L,
                    uint8_t* packed, int32_t* nlist, int64_t n_cap) {
    const int64_t L4 = (L + 3) / 4;
    int64_t nn = 0;
    for (int64_t r = 0; r < B; ++r) {
        const uint8_t* row = codes + r * L;
        uint8_t* out = packed + r * L4;
        int64_t i = 0;
        for (; i + 4 <= L; i += 4) {
            uint8_t c0 = row[i], c1 = row[i + 1], c2 = row[i + 2],
                    c3 = row[i + 3];
            out[i >> 2] = (uint8_t)((c0 & 3) | ((c1 & 3) << 2)
                                    | ((c2 & 3) << 4) | ((c3 & 3) << 6));
            // non-ACGT detection without a second pass
            if ((c0 | c1 | c2 | c3) >= 4) {
                for (int64_t j = i; j < i + 4; ++j) {
                    if (row[j] >= 4) {
                        if (nn >= n_cap) return -1;
                        nlist[2 * nn] = (int32_t)r;
                        nlist[2 * nn + 1] = (int32_t)j;
                        ++nn;
                    }
                }
            }
        }
        if (i < L) {
            uint8_t v = 0;
            for (int64_t j = i; j < L; ++j) {
                v |= (uint8_t)((row[j] & 3) << ((j - i) * 2));
                if (row[j] >= 4) {
                    if (nn >= n_cap) return -1;
                    nlist[2 * nn] = (int32_t)r;
                    nlist[2 * nn + 1] = (int32_t)j;
                    ++nn;
                }
            }
            out[i >> 2] = v;
        }
    }
    for (int64_t t = nn; t < n_cap; ++t) {
        nlist[2 * t] = 1 << 30;
        nlist[2 * t + 1] = 1 << 30;
    }
    return nn;
}

}  // extern "C"
