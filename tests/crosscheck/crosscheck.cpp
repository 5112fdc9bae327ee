// Independent (20,1)-frequency cross-checker — the counterpart of the
// reference's bowtie harness (/root/reference/tests/bowtie-test.sh): an
// algorithmically unrelated implementation whose output is diffed against the
// engine's bedgraph.  Where bowtie seed-and-extends against its own index,
// this uses the same family of algorithm (pigeonhole seed-and-verify over a
// direct k-mer hash of the text) and none of the FM-index / search-scheme /
// TPU machinery under test.
//
//   usage: crosscheck <codes.bin> <K> <E> <out.bedgraph> <chrom_name>
//
// codes.bin: one byte per base, values 0..3 (single Dna4 sequence).
// K <= 32, E <= 2.  Counts occurrences of every K-mer (and of its reverse
// complement) in the sequence with up to E mismatches, saturating at 65535,
// and writes a frequency bedgraph: 0-based half-open runs, zeros suppressed.
//
// Pigeonhole over S = max(2, E+1) equal segments (K % S == 0): any
// occurrence with <= E mismatches matches at least one segment exactly;
// candidate positions come from exact segment lookups in a bucket-sorted
// table of all segment-mer values; full verification is a popcount on
// 2-bit packed words.  An occurrence found via several exact segments is
// counted once by requiring the looked-up segment to be the FIRST exactly
// matching segment.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

static inline int mismatches(uint64_t a, uint64_t b) {
    uint64_t x = a ^ b;
    x = (x | (x >> 1)) & 0x5555555555555555ULL;  // one bit per differing base
    return __builtin_popcountll(x);
}

int main(int argc, char** argv) {
    if (argc != 6) {
        std::fprintf(stderr, "usage: %s codes.bin K E out.bedgraph chrom\n", argv[0]);
        return 2;
    }
    const char* path = argv[1];
    const int K = std::atoi(argv[2]);
    const int E = std::atoi(argv[3]);
    const char* outpath = argv[4];
    const std::string chrom = argv[5];
    const int S = (E + 1) < 2 ? 2 : (E + 1);
    if (K < 4 || K > 32 || K % S != 0 || E < 0 || E > 2) {
        std::fprintf(stderr,
                     "need 4 <= K <= 32, K %% max(2,E+1) == 0, 0 <= E <= 2\n");
        return 2;
    }
    const int H = K / S;

    FILE* f = std::fopen(path, "rb");
    if (!f) { std::perror("codes.bin"); return 2; }
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> s(n);
    if (std::fread(s.data(), 1, n, f) != (size_t)n) { return 2; }
    std::fclose(f);

    const long nk = n - K + 1;
    if (nk <= 0) { std::fprintf(stderr, "sequence shorter than K\n"); return 2; }

    // packed K-mer value at every position (2 bits per base, base i at bits 2i)
    std::vector<uint64_t> kmer(nk);
    {
        uint64_t v = 0;
        for (int i = 0; i < K; ++i) v |= (uint64_t)s[i] << (2 * i);
        kmer[0] = v;
        const uint64_t mask = (K == 32) ? ~0ULL : ((1ULL << (2 * K)) - 1);
        for (long p = 1; p < nk; ++p) {
            v = (v >> 2) | ((uint64_t)s[p + K - 1] << (2 * (K - 1)));
            kmer[p] = v & mask;
        }
    }
    const uint64_t hmask = (1ULL << (2 * H)) - 1;

    // bucket-sort half-mer start positions by value, for both half offsets
    const long nh = n - H + 1;
    const uint32_t nbuckets = 1u << (2 * H > 30 ? 30 : 2 * H);
    if ((uint64_t)1 << (2 * H) > nbuckets) {
        std::fprintf(stderr, "K too large for bucket table\n");
        return 2;
    }
    std::vector<uint32_t> bucket_off(nbuckets + 1, 0);
    std::vector<uint32_t> half(nh);
    {
        uint64_t v = 0;
        for (int i = 0; i < H; ++i) v |= (uint64_t)s[i] << (2 * i);
        half[0] = (uint32_t)v;
        for (long p = 1; p < nh; ++p) {
            v = (v >> 2) | ((uint64_t)s[p + H - 1] << (2 * (H - 1)));
            half[p] = (uint32_t)(v & hmask);
        }
    }
    for (long p = 0; p < nh; ++p) bucket_off[half[p] + 1]++;
    for (uint32_t b = 0; b < nbuckets; ++b) bucket_off[b + 1] += bucket_off[b];
    std::vector<uint32_t> bucket_pos(nh);
    {
        std::vector<uint32_t> cur(bucket_off.begin(), bucket_off.end() - 1);
        for (long p = 0; p < nh; ++p) bucket_pos[cur[half[p]]++] = (uint32_t)p;
    }

    std::vector<uint32_t> freq(n, 0);
    std::vector<uint8_t> qs(K);
    for (long i = 0; i < nk; ++i) {
        // GenMap semantics: frequency = #occ(kmer) + #occ(rc(kmer)), the two
        // strand passes counted INDEPENDENTLY (a window within distance E of
        // both contributes twice — reference algo.hpp:284-308 runs two
        // searches into the same saturating accumulator).
        uint64_t count = 0;
        for (int strand = 0; strand < 2; ++strand) {
            uint64_t q;
            if (strand == 0) {
                q = kmer[i];
            } else {
                // reverse complement of the packed query
                q = 0;
                for (int j = 0; j < K; ++j) {
                    uint64_t c = (kmer[i] >> (2 * j)) & 3;
                    q |= (3 - c) << (2 * (K - 1 - j));
                }
            }
            for (int j = 0; j < S; ++j) {
                const uint64_t qseg = (q >> (2 * H * j)) & hmask;
                for (uint32_t t = bucket_off[qseg]; t < bucket_off[qseg + 1];
                     ++t) {
                    long p = (long)bucket_pos[t] - (long)H * j;
                    if (p < 0 || p > nk - 1) continue;
                    // count once: segment j must be the FIRST exact segment
                    bool first = true;
                    for (int k2 = 0; k2 < j && first; ++k2)
                        if (mismatches((kmer[p] >> (2 * H * k2)) & hmask,
                                       (q >> (2 * H * k2)) & hmask) == 0)
                            first = false;
                    if (!first) continue;
                    if (mismatches(kmer[p], q) <= E) count++;
                }
            }
        }
        freq[i] = count > 65535 ? 65535 : (uint32_t)count;
    }

    // bedgraph: 0-based half-open runs, zeros suppressed
    FILE* out = std::fopen(outpath, "wb");
    if (!out) { std::perror("out"); return 2; }
    long start = 0;
    for (long p = 1; p <= n; ++p) {
        if (p == n || freq[p] != freq[start]) {
            if (freq[start] != 0)
                std::fprintf(out, "%s\t%ld\t%ld\t%u\n", chrom.c_str(), start, p,
                             freq[start]);
            start = p;
        }
    }
    std::fclose(out);
    return 0;
}
