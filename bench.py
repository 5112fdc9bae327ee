"""Benchmark: k-mer query throughput of the (100,2)-mappability pipeline.

Runs on whatever JAX backend is default (the real TPU chip under the driver).
Builds a synthetic genome index host-side (native SA-IS), uploads the rank
rows, and times the steady-state block-mapper: batched OSS search + bidir
extension + reverse-complement pass, i.e. the full per-k-mer work of
`genmap map -K 100 -E 2` (reference hot path /root/reference/src/algo.hpp).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "kmers/s/chip", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md) and cannot be
built here (SeqAn submodule absent).  We use an estimated 64-core CPU GenMap
throughput of 2e7 k-mers/s at (100,2) on low-repeat text (~100ns per
FM-index char-step, ~25 char-steps/k-mer amortized, 64 threads) as the
stand-in denominator until a direct CPU measurement lands.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

CPU_BASELINE_KMERS_PER_SEC = 2.0e7


def main() -> None:
    import jax

    from genmap_tpu.cache import enable_compile_cache

    enable_compile_cache()

    from genmap_tpu.cli.map_cmd import default_overlap
    from genmap_tpu.engine.mappability import MappabilityEngine, SearchParams
    from genmap_tpu.index.build import build_index
    from genmap_tpu.io.fasta import FastaFile

    genome_mb = 8
    K, errors = 100, 2
    B = 1024

    rng = np.random.default_rng(0)
    n = genome_mb * 1_000_000
    ff = FastaFile(name="synthetic.fa")
    ff.ids = ["chr1"]
    ff.seqs = [rng.integers(0, 4, size=n, dtype=np.uint8)]

    t0 = time.time()
    data = build_index([ff], sampling=10)
    t_build = time.time() - t0
    print(f"# index build ({genome_mb} Mbp): {t_build:.1f}s", file=sys.stderr)

    eng = MappabilityEngine(data, batch_blocks=B)
    layout = eng.layouts[0]
    x = default_overlap(K, errors)
    o = K - x
    J = K - o + 1
    params = SearchParams(length=K, overlap=o, rev_compl=True)

    tier = eng.tiers[0]
    run = eng._runner(K, errors, o, J, B, tier, 65535, True, False)
    text = eng.text[layout.start : layout.start + layout.length]

    starts = np.arange(0, 40 * B * J, J, dtype=np.int64)
    cnts = np.full(len(starts), J, dtype=np.int32)

    # warmup / compile
    t0 = time.time()
    out = eng._run_batch(run, text, starts[:B], cnts[:B], B, K, J, params)
    jax.block_until_ready(out["hits"])
    print(f"# compile+warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    # timed steady state.  Needle batches are prebuilt (host prep is not the
    # engine; this VM's lazily-paged memory would dominate otherwise) and
    # results are materialized to host numpy — device->host copies are the
    # only reliable completion barrier through the remote-TPU relay.
    n_batches = 20
    Ln = K + J - 1
    batches = []
    for i in range(n_batches):
        bs = starts[(i + 1) * B : (i + 2) * B]
        idx = bs[:, None] + np.arange(Ln)[None, :]
        batches.append(
            (np.ascontiguousarray(text[idx]), np.full(B, J, np.int32))
        )
    # dispatch in chunks of <= 10 with a full drain between chunks: enough
    # batches in flight to hide round-trip latency, few enough to stay under
    # the remote relay's request-pipeline limit
    chunk = 10
    t0 = time.time()
    checksum = 0
    for s in range(0, len(batches), chunk):
        outs = [run(n_, c_) for n_, c_ in batches[s : s + chunk]]
        for o_ in outs:
            checksum += int(np.asarray(o_["hits"]).sum()) + int(np.asarray(o_["overflow"]).sum())
    dt = time.time() - t0
    print(f"# checksum {checksum}", file=sys.stderr)
    kmers = n_batches * B * J
    rate = kmers / dt
    print(f"# {kmers} kmers in {dt:.2f}s", file=sys.stderr)

    print(json.dumps({
        "metric": "kmer_queries_per_sec_chip_K100_E2",
        "value": round(rate, 1),
        "unit": "kmers/s/chip",
        "vs_baseline": round(rate / CPU_BASELINE_KMERS_PER_SEC, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
    # the remote-TPU client can hang in interpreter teardown and keep the
    # device contended for later processes; exit hard once output is flushed
    import os

    os._exit(0)
