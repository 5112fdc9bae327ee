"""Focused (100,2) engine end-to-end measurement with phase attribution.

Run on the TPU:  python benchmarks/engine_headline.py [genome_mb] [reps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from genmap_tpu.cache import enable_compile_cache
    from genmap_tpu.hostmem import retain_heap

    enable_compile_cache()
    retain_heap()

    from genmap_tpu.cli.map_cmd import default_overlap
    from genmap_tpu.engine.mappability import MappabilityEngine, SearchParams
    from genmap_tpu.index.build import build_index
    from genmap_tpu.io.fasta import FastaFile

    genome_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    K, errors = 100, 2

    rng = np.random.default_rng(0)
    n = genome_mb * 1_000_000
    ff = FastaFile(name="synthetic.fa")
    ff.ids = ["chr1"]
    ff.seqs = [rng.integers(0, 4, size=n, dtype=np.uint8)]
    data = build_index([ff], sampling=10)
    eng = MappabilityEngine(data, batch_blocks=16384)
    layout = eng.layouts[0]
    o = K - default_overlap(K, errors)
    params = SearchParams(length=K, overlap=o, rev_compl=True)
    nk = layout.length - K + 1

    for rep in range(reps):
        for k in eng.stats:
            eng.stats[k] = type(eng.stats[k])()
        t0 = time.time()
        eng.compute_file(layout, params, errors, 65535)
        dt = time.time() - t0
        st = dict(eng.stats)
        print(f"rep {rep}: {nk/dt:,.0f} kmers/s ({dt:.2f}s) "
              f"probe_skip {st['probe_skipped']} ovf {st['overflow_blocks']} "
              f"batches {st['batches']} dispatch {st['dispatch_s']:.2f} "
              f"fetch {st['fetch_s']:.2f} scatter {st['scatter_s']:.2f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
    os._exit(0)
