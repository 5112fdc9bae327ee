"""A/B: occupancy-calibrated pool schedules on branch-heavy configs (r4).

Measures engine end-to-end throughput at the branch-heavy configs of record
((20,1), (30,2), (101,2)) with calibration off vs on, on the real chip.

Run:  python benchmarks/branchy_ab.py [genome_mb] [corpus]
  corpus: "random" (default) or "genomelike" (benchmarks/corpus.py)
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
    from genmap_tpu.index.fmindex import FMIndexData
    from genmap_tpu.io.fasta import FastaFile

    genome_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    corpus = sys.argv[2] if len(sys.argv) > 2 else "random"
    configs = [(20, 1), (30, 2), (101, 2)]

    cache_dir = os.path.expanduser(
        f"~/.cache/genmap_tpu/bench_idx_{corpus}_{genome_mb}"
    )
    if os.path.isdir(cache_dir):
        data = FMIndexData.load(cache_dir)
        print(f"# loaded cached index {cache_dir}", file=sys.stderr)
    else:
        if corpus == "random":
            rng = np.random.default_rng(0)
            seq = rng.integers(0, 4, size=genome_mb * 1_000_000, dtype=np.uint8)
        else:
            from benchmarks.corpus import make_genomelike

            seq = make_genomelike(genome_mb * 1_000_000, seed=1)
        ff = FastaFile(name="synthetic.fa")
        ff.ids = ["chr1"]
        ff.seqs = [seq]
        t0 = time.time()
        data = build_index([ff], sampling=10)
        print(f"# index build: {time.time() - t0:.1f}s", file=sys.stderr)
        data.save(cache_dir)

    for mode in ("off", "on"):
        eng = MappabilityEngine(data, batch_blocks=16384)
        eng._calibrate_enabled = mode == "on"
        layout = eng.layouts[0]
        for Ks, Es in configs:
            xs = min(default_overlap(Ks, Es), Ks - 1, Ks - Es - 2)
            ps = SearchParams(length=Ks, overlap=Ks - xs, rev_compl=True)
            nk = layout.length - Ks + 1
            for rep in range(2):
                for k in eng.stats:
                    eng.stats[k] = type(eng.stats[k])()
                t0 = time.time()
                eng.compute_file(layout, ps, Es, 65535)
                dt = time.time() - t0
                st = eng.stats
                tk = eng._tuned_pools
                tuned_sum = [sum(p) for pp in tk.values() if isinstance(pp, list) for p in pp]
                print(
                    f"# cal={mode} ({Ks},{Es}) rep{rep}: {nk} kmers in {dt:.1f}s"
                    f" -> {nk/dt:,.0f} kmers/s [batches {st['batches']},"
                    f" dispatch {st['dispatch_s']:.1f}s fetch {st['fetch_s']:.1f}s"
                    f" scatter {st['scatter_s']:.1f}s ovf {st['overflow_blocks']}"
                    f" max_tier {st['max_tier']} dimer {st['dimer_tier']}"
                    f" tuned_sums {tuned_sum}]",
                    file=sys.stderr, flush=True,
                )


if __name__ == "__main__":
    main()
    os._exit(0)
