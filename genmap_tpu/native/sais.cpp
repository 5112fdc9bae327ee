// Clean-room SA-IS suffix array construction (induced sorting).
//
// Fills the role of the reference's vendored libdivsufsort
// (/root/reference/include/libdivsufsort/divsufsort.hpp, entry point used at
// /root/reference/src/seqan_libdivsufsort.h:96) with an independent
// implementation of the SA-IS algorithm (Nong, Zhang & Chan, DCC 2009).
//
// Contract: T[n-1] must be a unique smallest character (the caller appends a
// 0 terminal after shifting the alphabet up by one).  SA receives the suffix
// array of T.  Index type is int32 or int64 via the exported wrappers.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename C, typename I>
void sais_rec(const C* T, I* SA, I n, I K) {
    if (n == 0) return;
    if (n == 1) { SA[0] = 0; return; }

    // classify suffix types: 1 = S-type, 0 = L-type
    std::vector<uint8_t> t(n);
    t[n - 1] = 1;
    t[n - 2] = 0;  // T[n-2] > T[n-1] because the terminal is unique smallest
    for (I i = n - 2; i > 0; --i)
        t[i - 1] = (T[i - 1] < T[i] || (T[i - 1] == T[i] && t[i])) ? 1 : 0;

    auto is_lms = [&](I i) { return i > 0 && t[i] && !t[i - 1]; };

    std::vector<I> bkt(static_cast<size_t>(K) + 1);
    auto buckets = [&](bool end) {
        std::fill(bkt.begin(), bkt.end(), I(0));
        for (I i = 0; i < n; ++i) ++bkt[static_cast<size_t>(T[i])];
        I sum = 0;
        for (size_t c = 0; c <= static_cast<size_t>(K); ++c) {
            sum += bkt[c];
            bkt[c] = end ? sum : sum - bkt[c];
        }
    };

    const I EMPTY = static_cast<I>(-1);

    auto induce = [&]() {
        // induce L-types left-to-right, then S-types right-to-left
        buckets(false);
        for (I i = 0; i < n; ++i) {
            I j = SA[i];
            if (j != EMPTY && j > 0 && !t[j - 1])
                SA[bkt[static_cast<size_t>(T[j - 1])]++] = j - 1;
        }
        buckets(true);
        for (I i = n - 1;; --i) {
            I j = SA[i];
            if (j != EMPTY && j > 0 && t[j - 1])
                SA[--bkt[static_cast<size_t>(T[j - 1])]] = j - 1;
            if (i == 0) break;
        }
    };

    // ---- stage 1: sort the LMS substrings ------------------------------
    std::fill(SA, SA + n, EMPTY);
    buckets(true);
    for (I i = n - 1; i > 0; --i)
        if (is_lms(i)) SA[--bkt[static_cast<size_t>(T[i])]] = i;
    induce();

    // compact the now-sorted LMS positions to the front
    I n1 = 0;
    for (I i = 0; i < n; ++i)
        if (is_lms(SA[i])) SA[n1++] = SA[i];

    // ---- stage 2: name LMS substrings ----------------------------------
    std::fill(SA + n1, SA + n, EMPTY);
    I name = 0, prev = EMPTY;
    for (I i = 0; i < n1; ++i) {
        I pos = SA[i];
        bool diff = false;
        if (prev == EMPTY) {
            diff = true;
        } else {
            for (I d = 0;; ++d) {
                if (T[pos + d] != T[prev + d] || t[pos + d] != t[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) {
                    // both substrings ended (equal so far) iff both are LMS
                    diff = !(is_lms(pos + d) && is_lms(prev + d));
                    break;
                }
            }
        }
        if (diff) { ++name; prev = pos; }
        SA[n1 + pos / 2] = name - 1;
    }
    // compact names (text order of LMS positions) to the tail of SA
    for (I i = n - 1, j = n - 1;; --i) {
        if (SA[i] != EMPTY) SA[j--] = SA[i];
        if (i == n1) break;
    }

    // ---- stage 3: recurse if names are not unique ----------------------
    I* SA1 = SA;
    I* s1 = SA + n - n1;
    if (name < n1) {
        sais_rec<I, I>(s1, SA1, n1, name - 1);
    } else {
        for (I i = 0; i < n1; ++i) SA1[s1[i]] = i;
    }

    // map the recursion result back to LMS positions (in text order)
    // reuse s1 to store LMS positions
    {
        I j = 0;
        for (I i = 1; i < n; ++i)
            if (is_lms(i)) s1[j++] = i;
        for (I i = 0; i < n1; ++i) SA1[i] = s1[SA1[i]];
    }

    // ---- stage 4: final induced sort from sorted LMS suffixes ----------
    std::fill(SA + n1, SA + n, EMPTY);
    buckets(true);
    for (I i = n1 - 1;; --i) {
        I j = SA[i];
        SA[i] = EMPTY;
        SA[--bkt[static_cast<size_t>(T[j])]] = j;
        if (i == 0) break;
    }
    induce();
}

}  // namespace

extern "C" {

int genmap_sais_u8_i32(const uint8_t* T, int32_t* SA, int32_t n, int32_t K) {
    if (n <= 0 || K < 0) return -1;
    sais_rec<uint8_t, int32_t>(T, SA, n, K);
    return 0;
}

int genmap_sais_u8_i64(const uint8_t* T, int64_t* SA, int64_t n, int64_t K) {
    if (n <= 0 || K < 0) return -1;
    sais_rec<uint8_t, int64_t>(T, SA, n, K);
    return 0;
}

}  // extern "C"
