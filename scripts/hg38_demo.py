"""hg38-scale end-to-end demo: build a 3.1 Gbp index, map a chr21-sized
selection at (30,2), and differential-check planted k-mers.

This exercises the north-star configuration class (BASELINE.md): a genome
whose both-strand symbol count (6.2e9) exceeds uint32, forcing the
multi-part FMD index (2 parts), with:

  * planted-k-mer differential checks — 50 random 30-mers are planted with
    known numbers of exact / 1-mismatch / 2-mismatch copies; at K=30 a
    random Hamming<=2 collision over 6.2e9 positions has probability ~2e-5
    (ball ~3.9e3 of 4^30 strings), so each planted position's
    (30,2)-frequency is known exactly
  * overlap invariance — a sampled slice is recomputed with -xo forced to a
    different overlap and must agree byte-for-byte
  * chr21-scale wig/bedgraph write timing

Usage: python scripts/hg38_demo.py [--gbp 3.1] [--out /root/scratch/hg38]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# hg38 chromosome lengths (Mbp, GRCh38 primary assembly, rounded)
HG38_MBP = [248.9, 242.2, 198.3, 190.2, 181.5, 170.8, 159.3, 145.1, 138.4,
            133.8, 135.1, 133.3, 114.4, 107.0, 102.0, 90.3, 83.3, 80.4,
            58.6, 64.4, 46.7, 50.8, 156.0, 57.2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbp", type=float, default=3.1)
    ap.add_argument("--out", default="/root/scratch/hg38")
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--errors", type=int, default=2)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--batch-blocks", type=int, default=16384)
    args = ap.parse_args()

    from genmap_tpu.cache import enable_compile_cache
    from genmap_tpu.hostmem import retain_heap

    enable_compile_cache()
    retain_heap()

    from genmap_tpu.engine.mappability import MappabilityEngine, SearchParams
    from genmap_tpu.index.build import build_index
    from genmap_tpu.index.fmindex import FMIndexData
    from genmap_tpu.io.fasta import FastaFile

    total = int(args.gbp * 1e9)
    scale = total / (sum(HG38_MBP) * 1e6)
    lens = [int(m * 1e6 * scale) for m in HG38_MBP]
    K, E = args.k, args.errors
    rng = np.random.default_rng(42)

    # ---- generate genome + plant k-mers --------------------------------
    t0 = time.time()
    seqs = [rng.integers(0, 4, size=ln, dtype=np.uint8) for ln in lens]
    print(f"[gen] {sum(lens)/1e9:.2f} Gbp random genome in {time.time()-t0:.0f}s",
          flush=True)

    planted = []  # (kmer, [(chrom, pos)] exact, n1, n2)
    t0 = time.time()
    for i in range(50):
        w = rng.integers(0, 4, size=K, dtype=np.uint8)
        n0 = int(rng.integers(1, 5))
        n1 = int(rng.integers(0, 4))
        n2 = int(rng.integers(0, 4))
        exact_sites = []

        def plant(variant):
            ci = int(rng.integers(0, len(seqs)))
            p = int(rng.integers(0, len(seqs[ci]) - K))
            seqs[ci][p : p + K] = variant
            return ci, p

        for _ in range(n0):
            exact_sites.append(plant(w))
        for _ in range(n1):
            v = w.copy()
            j = int(rng.integers(0, K))
            v[j] = (v[j] + 1 + rng.integers(0, 3)) % 4
            plant(v)
        for _ in range(n2):
            v = w.copy()
            j1, j2 = rng.choice(K, size=2, replace=False)
            v[j1] = (v[j1] + 1 + rng.integers(0, 3)) % 4
            v[j2] = (v[j2] + 1 + rng.integers(0, 3)) % 4
            plant(v)
        planted.append((w, exact_sites, n0 + n1 + n2))
    print(f"[gen] planted 50 k-mer families in {time.time()-t0:.0f}s", flush=True)

    # ---- build or load the index ---------------------------------------
    os.makedirs(args.out, exist_ok=True)
    idx_dir = os.path.join(args.out, "idx")
    if args.skip_build and os.path.exists(os.path.join(idx_dir, "meta.json")):
        data = FMIndexData.load(idx_dir, mmap=True)
        print(f"[index] loaded {idx_dir} ({len(data.parts)} parts)", flush=True)
    else:
        ff = FastaFile(name="hg38_synth.fa")
        ff.ids = [f"chr{i+1}" for i in range(len(seqs))]
        ff.seqs = seqs
        t0 = time.time()
        data = build_index([ff], sampling=10, workers=2,
                           spill_dir=os.path.join(args.out, "spill"))
        t_build = time.time() - t0
        print(f"[index] built {len(data.parts)} parts in {t_build:.0f}s "
              f"({sum(lens)/1e6/t_build:.2f} Mbp/s)", flush=True)
        t0 = time.time()
        data.save(idx_dir)
        print(f"[index] saved in {time.time()-t0:.0f}s", flush=True)

    part_info = [
        {"n_total": p.n_total, "seq_off": p.seq_off, "nseq": p.nseq_part}
        for p in data.parts
    ]
    print(f"[index] parts: {part_info}", flush=True)
    assert len(data.parts) >= 2, "hg38-scale genome must split into >= 2 parts"

    # ---- map a chr21-sized selection at (30,2) -------------------------
    from genmap_tpu.cli.map_cmd import default_overlap

    eng = MappabilityEngine(data, batch_blocks=args.batch_blocks, light=True)
    layout = eng.layouts[0]
    # "chr21" of the synthetic genome: sequence index 20
    chr21 = 20
    c21_begin = int(layout.cum_lens[chr21])
    c21_end = int(layout.cum_lens[chr21 + 1])
    x = min(default_overlap(K, E), K - 1, K - E - 2)
    params = SearchParams(length=K, overlap=K - x, rev_compl=True)
    t0 = time.time()
    res = eng.compute_file(layout, params, E, 65535,
                           intervals=[(c21_begin, c21_end - K + 1)])
    t_map = time.time() - t0
    nk = c21_end - K + 1 - c21_begin
    print(f"[map] chr21 slice ({nk/1e6:.1f}M kmers) at ({K},{E}) in "
          f"{t_map:.0f}s -> {nk/t_map:,.0f} kmers/s", flush=True)

    # ---- planted-kmer differential check -------------------------------
    errors = 0
    checked = 0
    for w, exact_sites, expect in planted:
        for ci, p in exact_sites:
            gp = int(layout.cum_lens[ci]) + p
            got = int(res.c[gp]) if c21_begin <= gp < c21_end - K + 1 else None
            if got is None:
                continue
            checked += 1
            if got != expect:
                errors += 1
                print(f"[diff] MISMATCH chr{ci+1}:{p} got {got} expect {expect}")
    print(f"[diff] planted-site spot-check: {checked} sites in selection, "
          f"{errors} mismatches", flush=True)

    # planted sites outside the selection: verify via a tiny targeted map
    t0 = time.time()
    tgt = []
    for w, exact_sites, expect in planted:
        ci, p = exact_sites[0]
        gp = int(layout.cum_lens[ci]) + p
        tgt.append((gp, expect))
    iv = [(gp, gp + 1) for gp, _ in tgt]
    res2 = eng.compute_file(layout, params, E, 65535, intervals=iv)
    diff2 = sum(int(res2.c[gp]) != exp for gp, exp in tgt)
    print(f"[diff] all-50-families targeted check: {diff2} mismatches "
          f"({time.time()-t0:.0f}s)", flush=True)

    # ---- overlap invariance on a slice ---------------------------------
    sl = [(c21_begin, c21_begin + 200_000)]
    pa = SearchParams(length=K, overlap=params.overlap, rev_compl=True)
    pb = SearchParams(length=K, overlap=max(params.overlap - 3, E + 2),
                      rev_compl=True)
    ra = eng.compute_file(layout, pa, E, 65535, intervals=sl)
    rb = eng.compute_file(layout, pb, E, 65535, intervals=sl)
    inv_ok = bool((ra.c == rb.c).all())
    print(f"[diff] overlap invariance (o={pa.overlap} vs {pb.overlap}): "
          f"{'OK' if inv_ok else 'MISMATCH'}", flush=True)

    # ---- writer timing at chr21 scale ----------------------------------
    from genmap_tpu.io.writers import save_bedgraph, save_wig

    cslice = res.c[c21_begin:c21_end]
    t0 = time.time()
    save_wig(cslice, os.path.join(args.out, "chr21"), ["chr21"],
             np.asarray([len(cslice)]), True)
    t_wig = time.time() - t0
    t0 = time.time()
    save_bedgraph(cslice, os.path.join(args.out, "chr21"), ["chr21"],
                  np.asarray([len(cslice)]), True, True)
    t_bg = time.time() - t0
    print(f"[write] chr21-scale wig {t_wig:.1f}s, bedgraph {t_bg:.1f}s", flush=True)

    summary = {
        "genome_bp": sum(lens),
        "parts": part_info,
        "map_kmers_per_sec": nk / t_map,
        "planted_mismatches": errors + diff2,
        "overlap_invariant": inv_ok,
        "wig_secs": t_wig,
        "bedgraph_secs": t_bg,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("[done]", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
