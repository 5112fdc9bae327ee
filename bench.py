"""Benchmark: k-mer query throughput of the (100,2)-mappability pipeline.

Runs on whatever JAX backend is default (the real TPU chip under the driver).

Round-4 headline design (VERDICT r3 task 3): the headline is measured on a
GENOME-LIKE corpus (benchmarks/corpus.py: ~48% repeat-derived sequence with
Alu/L1-like family statistics), not uniform-random text — uniform text is
the best case for the unique-infix probe (skip fraction 1.0000 in r3).  The
steady-state rate is composed of IN-GRAPH measurements (one dispatch each,
insensitive to the tunneled dev-chip link):

    rate = kmers / (t_probe_scan(all blocks)
                    + t_full_pipeline(measured residual blocks))

where the residual blocks are exactly those the probe could not skip —
repeat-rich blocks, measured at their true (slower) rate rather than the
global average.  The REAL measured skip fraction is printed alongside.
Engine end-to-end wall times (host orchestration included) and the
reference configs of record are printed as secondary numbers.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "kmers/s/chip", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md) and cannot be
built here (SeqAn submodule absent).  The 2e7 kmers/s stand-in for 64-core
CPU GenMap at (100,2) is grounded by the measured CPU rank microbenchmark
(benchmarks/cpu_rank_bench.cpp, BASELINE.md): the implied value is
0.8-1.3e7, so 2e7 is conservative toward the CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CPU_BASELINE_KMERS_PER_SEC = 2.0e7
GENOME_MB = int(os.environ.get("GENMAP_BENCH_MB", "64"))
SEED = 1


def build_or_load(tag: str, make_seq):
    from genmap_tpu.index.build import build_index
    from genmap_tpu.index.fmindex import FMIndexData
    from genmap_tpu.io.fasta import FastaFile

    cache = os.path.expanduser(f"~/.cache/genmap_tpu/bench_idx_{tag}")
    if os.path.isdir(cache):
        try:
            data = FMIndexData.load(cache)
            print(f"# loaded cached index {cache}", file=sys.stderr)
            return data
        except Exception as e:
            print(f"# index cache unusable ({e!r}); rebuilding", file=sys.stderr)
    ff = FastaFile(name="synthetic.fa")
    ff.ids = ["chr1"]
    ff.seqs = [make_seq()]
    t0 = time.time()
    data = build_index([ff], sampling=10)
    print(f"# index build ({tag}): {time.time() - t0:.1f}s", file=sys.stderr)
    try:
        data.save(cache)
    except Exception as e:
        print(f"# index cache save failed ({e!r})", file=sys.stderr)
    return data


def main() -> None:
    import jax
    import jax.numpy as jnp

    from genmap_tpu.cache import enable_compile_cache
    from genmap_tpu.hostmem import retain_heap

    enable_compile_cache()
    retain_heap()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.corpus import make_genomelike
    from genmap_tpu.cli.map_cmd import default_overlap
    from genmap_tpu.engine.mappability import MappabilityEngine, SearchParams

    K, errors = 100, 2
    B = 16384
    NB = 10  # in-graph batches per timed dispatch

    try:
        from genmap_tpu.native.sais import ensure_native

        ensure_native()
        print("# SACA backend: native SA-IS", file=sys.stderr)
    except Exception as e:
        print(f"# SACA backend: NATIVE UNAVAILABLE ({e!r})", file=sys.stderr)

    n = GENOME_MB * 1_000_000
    data = build_or_load(
        f"genomelike_{GENOME_MB}", lambda: make_genomelike(n, seed=SEED)
    )

    eng = MappabilityEngine(data, batch_blocks=B)
    layout = eng.layouts[0]
    x = default_overlap(K, errors)
    o = K - x
    J = K - o + 1
    params_h = SearchParams(length=K, overlap=o, rev_compl=True)

    # ---- engine end-to-end first: this also runs the occupancy calibration,
    # so the steady-state programs below use the tuned pool schedules the
    # production path uses
    nk_h = layout.length - K + 1
    for rep in range(2):
        for k in eng.stats:
            eng.stats[k] = type(eng.stats[k])(0)
        t0 = time.time()
        eng.compute_file(layout, params_h, errors, 65535)
        dt = time.time() - t0
        st = eng.stats
        print(f"# engine (100,2) run {rep}: {nk_h} kmers end-to-end in "
              f"{dt:.2f}s ({nk_h/dt:,.0f} kmers/s) "
              f"[probe_skipped {st['probe_skipped']} blocks, "
              f"ovf {st['overflow_blocks']}, dispatch {st['dispatch_s']:.1f}s, "
              f"fetch {st['fetch_s']:.1f}s]", file=sys.stderr)

    import dataclasses
    import math

    tier0 = eng.tiers[0]
    # residual blocks run on the engine's residual tier — first EXACT tier
    # with a 4-slot extension frontier and the residual-calibrated infix
    # pools (probe residuals far-flag the fast tier and overflow a 1-slot
    # extension on genome-like text; measuring them at tier 0 would
    # undercount)
    tier_exact = dataclasses.replace(
        next(t for t in eng.tiers[1:] if t.exact and not t.dimer),
        f_extend=4,
        ext_exact=False,  # fast one-gather extension (engine residual tier)
    )
    pools_res = None
    for tk, tv in eng._tuned_pools.items():
        if tk[:3] == (K, errors, o) and isinstance(tv, list) and tk[-1] >= 1:
            pools_res = tv[0]
    run = eng._runner(0, K, errors, o, J, B, tier_exact, 65535, True, False,
                      pools=pools_res)
    # probe with the engine's scan cut (mass==1 at any prefix proves the
    # block; see engine/mappability.py)
    n_tot = data.parts[0].n_total
    cut = math.ceil(math.log(2 * n_tot, 4)) + eng._probe_cut_slack
    cut = cut if o - cut >= 6 else None
    prun = eng._probe_runner(0, K, errors, o, J, B, tier0, 65535, True,
                             mode="bits", probe_cut=cut)

    # NB+1 batches of adjacent-k-mer block starts (+1 = warmup); needles are
    # extracted on device from the packed text, so only uint32 starts cross
    # the host->device link.  Starts wrap modulo the genome.
    Ln = K + J - 1
    nk = layout.length
    starts_all = (
        np.arange(0, (NB + 1) * B * J, J, dtype=np.int64) % (nk - Ln)
    ).astype(np.uint32).reshape(NB + 1, B)
    cnts_all = np.full((NB + 1, B), J, dtype=np.int32)
    limit = np.uint32(nk)
    kmers = NB * B * J

    d_starts = jax.device_put(starts_all[1:])
    d_cnts = jax.device_put(cnts_all[1:])

    # ---- probe scan over ALL blocks (in-graph), real skip fraction --------
    def many_probe(starts, cnts):
        def step(acc, x):
            st, ct = x
            out = prun(st, ct, limit)
            return acc + out["skip_bits"].astype(jnp.uint64).sum(), out["skip_bits"]

        acc, bits = jax.lax.scan(step, jnp.uint64(0), (starts, cnts))
        return acc, bits

    probe_jit = jax.jit(many_probe)
    t0 = time.time()
    _, bits = probe_jit(d_starts, d_cnts)
    bits = np.asarray(bits)
    print(f"# probe compile+warmup: {time.time() - t0:.1f}s", file=sys.stderr)
    skip_blocks = np.unpackbits(
        np.ascontiguousarray(bits).view(np.uint8)
    ).sum()
    skip_frac = float(skip_blocks / (NB * B))
    t_probe = float("inf")
    for rep in range(3):
        t0 = time.time()
        jax.block_until_ready(probe_jit(d_starts, d_cnts)[1])
        t_probe = min(t_probe, time.time() - t0)
    print(f"# probe scan: {NB * B} blocks in {t_probe:.2f}s, "
          f"skip {skip_frac:.4f}", file=sys.stderr)

    # ---- full pipeline on the RESIDUAL blocks (the probe's non-skips) -----
    skip_bool = np.zeros(NB * B, bool)
    for i in range(NB):
        skip_bool[i * B : (i + 1) * B] = (
            (bits[i, :, None] >> np.arange(32, dtype=np.uint32)) & 1
        ).astype(bool).ravel()
    res_starts = starts_all[1:].ravel()[~skip_bool]
    n_res = len(res_starts)
    if n_res == 0:
        t_res = 0.0
        rate_res = float("inf")
    else:
        NBr = max(1, -(-n_res // B))
        pad = NBr * B - n_res
        res_all = np.concatenate(
            [res_starts, np.zeros(pad, np.uint32)]
        ).reshape(NBr, B)
        res_cnts = np.full((NBr, B), J, np.int32)

        def many_full(starts, cnts):
            def step(acc, x):
                st, ct = x
                out = run(st, ct, limit)
                return (
                    acc + out["hits"].sum(dtype=jnp.uint32)
                    + out["overflow"].sum(dtype=jnp.uint32),
                    None,
                )

            acc, _ = jax.lax.scan(step, jnp.uint32(0), (starts, cnts))
            return acc

        full_jit = jax.jit(many_full)
        dr = jax.device_put(res_all)
        dc = jax.device_put(res_cnts)
        t0 = time.time()
        w = int(full_jit(dr, dc))
        print(f"# residual compile+warmup: {time.time() - t0:.1f}s "
              f"(checksum {w})", file=sys.stderr)
        t_res = float("inf")
        for rep in range(3):
            t0 = time.time()
            int(full_jit(dr, dc))
            t_res = min(t_res, time.time() - t0)
        t_res *= n_res / (NBr * B)  # padded share
        rate_res = n_res * J / max(t_res, 1e-9)
        print(f"# residual exact tier: {n_res} blocks ({n_res * J} kmers) "
              f"in {t_res:.2f}s -> {rate_res:,.0f} kmers/s", file=sys.stderr)

    t_eff = t_probe + t_res
    rate = kmers / t_eff
    print(f"# HEADLINE genomelike-{GENOME_MB}Mbp (100,2): {kmers} kmers in "
          f"{t_eff:.2f}s (probe {t_probe:.2f}s + residual {t_res:.2f}s, "
          f"skip {skip_frac:.4f}) -> {rate:,.0f} kmers/s/chip",
          file=sys.stderr)

    # ---- reference configs of record, end-to-end --------------------------
    # (/root/reference/benchmarks/bench.sh:35-43 runs (5,0), (6,0), (101,0..4)
    # on GRCh38; tests/bowtie-test.sh uses (20,1); chr21 (30,2) is the
    # BASELINE.md branch-heavy north star)
    if os.environ.get("GENMAP_BENCH_CONFIGS", "1") != "0":
        # each config maps an 8M-kmer slice of the corpus (full-genome
        # sweeps at 64 Mbp blow the bench budget; the slice keeps the
        # 64 Mbp index's search depth and repeat statistics)
        nslice = min(8_000_000, layout.length - 101)
        for Ks, Es in [(5, 0), (6, 0), (20, 1), (30, 2), (101, 0), (101, 1),
                       (101, 2), (101, 3), (101, 4)]:
            try:
                xs = min(default_overlap(Ks, Es), Ks - 1, Ks - Es - 2)
                ps = SearchParams(length=Ks, overlap=Ks - xs, rev_compl=True)
                best = float("inf")
                for rep in range(2):
                    for k in eng.stats:
                        eng.stats[k] = type(eng.stats[k])(0)
                    t0 = time.time()
                    eng.compute_file(layout, ps, Es, 65535,
                                     intervals=[(0, nslice)])
                    dt = time.time() - t0
                    best = min(best, dt)
                    st = dict(eng.stats)
                nkc = nslice
                print(f"# config ({Ks},{Es}): {nkc} kmers end-to-end in "
                      f"{best:.1f}s warm -> {nkc / best:,.0f} kmers/s "
                      f"[{st['batches']} batches, dispatch {st['dispatch_s']:.1f}s, "
                      f"fetch {st['fetch_s']:.1f}s, scatter {st['scatter_s']:.1f}s, "
                      f"ovf {st['overflow_blocks']}, max_tier {st['max_tier']}]",
                      file=sys.stderr)
            except Exception as e:
                print(f"# config ({Ks},{Es}): FAILED {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "kmer_queries_per_sec_chip_K100_E2_genomelike",
        "value": round(rate, 1),
        "unit": "kmers/s/chip",
        "vs_baseline": round(rate / CPU_BASELINE_KMERS_PER_SEC, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
    # the remote-TPU client can hang in interpreter teardown and keep the
    # device contended for later processes; exit hard once output is flushed
    os._exit(0)
