"""Measure the same-kmer dedup speedup on a repeat-heavy genome.

The reference skips recomputation for exact-duplicate k-mers
(/root/reference/src/algo.hpp:236-242, 389-396) — an inherently sequential
opportunistic trick.  The SPMD re-design (engine/mappability.py
_compute_with_dedup) classes k-mers up front (packed value for K <= 27,
zero-error SA interval otherwise) and searches only first-occurrence blocks.

This benchmark builds a mobile-element-style genome (exact copies of a long
element over random background — the regime the trick exists for), runs the
same (K, E) mapping with dedup on and off, verifies the frequency vectors are
identical, and prints the speedup.  Run on the TPU chip:

    python benchmarks/dedup_bench.py [K] [E]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_repeat_genome(
    n_background: int = 1_000_000,
    element_len: int = 50_000,
    copies: int = 60,
    seed: int = 7,
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    background = rng.integers(0, 4, size=n_background, dtype=np.uint8)
    element = rng.integers(0, 4, size=element_len, dtype=np.uint8)
    chunks = []
    bg_step = n_background // (copies + 1)
    for i in range(copies):
        chunks.append(background[i * bg_step : (i + 1) * bg_step])
        chunks.append(element)
    chunks.append(background[copies * bg_step :])
    return np.concatenate(chunks)


def main() -> None:
    from genmap_tpu.cache import enable_compile_cache
    from genmap_tpu.cli.map_cmd import default_overlap
    from genmap_tpu.engine.mappability import MappabilityEngine, SearchParams
    from genmap_tpu.hostmem import retain_heap
    from genmap_tpu.index.build import build_index
    from genmap_tpu.io.fasta import FastaFile

    enable_compile_cache()
    retain_heap()

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    genome = make_repeat_genome()
    ff = FastaFile(name="repeats.fa")
    ff.ids = ["chr1"]
    ff.seqs = [genome]
    data = build_index([ff], sampling=10)

    x = min(default_overlap(K, E), K - 1, K - E - 2)
    params = SearchParams(length=K, overlap=K - x, rev_compl=True)
    nkmers = len(genome) - K + 1
    print(f"# genome {len(genome):,} bp, ({K},{E}), {nkmers:,} kmers",
          file=sys.stderr)

    results = {}
    times = {}
    for dedup in (True, False):
        eng = MappabilityEngine(data, batch_blocks=4096, dedup=dedup)
        # warmup compile on a tiny slice-shaped call is pointless here (same
        # program); instead run once to compile, then time a second full run
        eng.compute_file(eng.layouts[0], params, errors=E, cap=65535)
        t0 = time.time()
        res = eng.compute_file(eng.layouts[0], params, errors=E, cap=65535)
        times[dedup] = time.time() - t0
        results[dedup] = res.c
        print(f"# dedup={dedup}: {times[dedup]:.2f}s "
              f"({nkmers / times[dedup]:,.0f} kmers/s)", file=sys.stderr)

    assert np.array_equal(results[True], results[False]), (
        "dedup changed results"
    )
    print(f"# speedup: {times[False] / times[True]:.2f}x (results identical)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
