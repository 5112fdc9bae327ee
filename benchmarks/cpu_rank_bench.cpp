// CPU reference micro-benchmark for the vs_baseline denominator.
//
// The reference's hot loop is an FM-index LF step: two EPR prefix-rank
// queries on a bit-packed BWT (/root/reference/src/algo.hpp:211-214 via
// SeqAn's goDown/goRight, rank config /root/reference/src/common.hpp:38-49).
// This program measures that primitive directly: a cache-line-sized rank
// block layout (2-bit symbols + absolute counts, 64 symbols per 64-byte
// block like EPR dictionaries), random query positions over a
// genome-sized BWT, dependent chain (each query's position derived from the
// previous result, like real LF walks).  Multi-threaded scaling is measured
// so the 64-core GenMap estimate in BASELINE.md can be grounded in a
// measured per-core rate instead of a guess.
//
// Build: g++ -O3 -march=native -fopenmp -o cpu_rank_bench cpu_rank_bench.cpp
// Run:   ./cpu_rank_bench [n_mbp] [n_queries_millions]

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

using Clock = std::chrono::steady_clock;
static double secs(Clock::time_point a, Clock::time_point b) {
    return std::chrono::duration<double>(b - a).count();
}

// EPR-like block: 64 symbols of 2-bit codes (16 bytes) + 4 uint32 absolute
// counts + padding to one 64-byte cache line.
struct alignas(64) Block {
    uint64_t words[2];   // 64 x 2-bit symbols
    uint32_t abs[4];     // absolute counts of codes 0..3 at block start
    uint32_t pad[6];
};

int main(int argc, char** argv) {
    size_t n_mbp = argc > 1 ? atol(argv[1]) : 3100;       // hg38-sized default
    size_t queries_m = argc > 2 ? atol(argv[2]) : 20;
    size_t n = n_mbp * 1000000ull * 2;  // both strands, like a GenMap search space
    size_t nblocks = n / 64 + 1;

    std::vector<Block> blocks(nblocks);
    std::mt19937_64 rng(42);
    uint64_t counts[4] = {0, 0, 0, 0};
    for (size_t b = 0; b < nblocks; ++b) {
        for (int c = 0; c < 4; ++c) blocks[b].abs[c] = (uint32_t)counts[c];
        for (int w = 0; w < 2; ++w) {
            uint64_t word = rng();
            blocks[b].words[w] = word;
            for (int s = 0; s < 32; ++s) ++counts[(word >> (2 * s)) & 3];
        }
    }

    size_t total_q = queries_m * 1000000ull;
    int nthreads = 1;
#ifdef _OPENMP
    nthreads = omp_get_max_threads();
#endif
    auto t0 = Clock::now();
    uint64_t sink = 0;
#ifdef _OPENMP
#pragma omp parallel reduction(+ : sink)
#endif
    {
        uint64_t pos = 12345;
        uint64_t local = 0;
        size_t per_thread = total_q / (size_t)nthreads;
        for (size_t q = 0; q < per_thread; ++q) {
            // one rank query: block fetch + masked popcounts (EPR scheme)
            size_t blk = (pos >> 6) % nblocks;
            int off = pos & 63;
            const Block& B = blocks[blk];
            int c = (int)(pos & 3);
            // count symbols == c in the first `off` positions
            uint64_t m0 = B.words[0], m1 = B.words[1];
            uint64_t lo = (uint64_t)(c & 1) * 0xFFFFFFFFFFFFFFFFull;
            uint64_t hi = (uint64_t)((c >> 1) & 1) * 0xFFFFFFFFFFFFFFFFull;
            uint64_t eq0 = ~((m0 ^ lo) | ((m0 >> 1) ^ hi)) & 0x5555555555555555ull;
            uint64_t eq1 = ~((m1 ^ lo) | ((m1 >> 1) ^ hi)) & 0x5555555555555555ull;
            int w = off >> 5;
            uint64_t mask0 = w ? ~0ull : ((1ull << (2 * (off & 31))) - 1);
            uint64_t mask1 = w ? ((1ull << (2 * (off & 31))) - 1) : 0;
            uint64_t rank = B.abs[c] + __builtin_popcountll(eq0 & mask0) +
                            __builtin_popcountll(eq1 & mask1);
            // dependent chain: next position derived from the result
            pos = (rank * 2862933555777941757ull + 3037000493ull);
            local += rank;
        }
        sink += local;
    }
    auto t1 = Clock::now();
    double dt = secs(t0, t1);
    double per_thread_rate = (double)total_q / dt / nthreads;
    printf("{\"rank_queries_per_sec_total\": %.0f, \"threads\": %d, "
           "\"per_thread\": %.0f, \"ns_per_rank\": %.1f, \"sink\": %llu}\n",
           total_q / dt, nthreads, per_thread_rate, dt / total_q * 1e9 * nthreads,
           (unsigned long long)sink);
    return 0;
}
