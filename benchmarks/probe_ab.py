"""A/B: unique-infix probe scan on the mono vs dimer rank path (r4).

The (100,2) headline is probe-dominated; the probe is an infix-only search,
so the dimer table halves its gathers IF the fused-step overhead doesn't
eat the win at the probe's narrow (pool ~4-8) frontiers.  Measures the
in-graph probe scan rate for both paths on the bench corpus.

Run on the TPU:  python benchmarks/probe_ab.py [genome_mb] [corpus]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from genmap_tpu.cache import enable_compile_cache
    from genmap_tpu.hostmem import retain_heap

    enable_compile_cache()
    retain_heap()

    from genmap_tpu.cli.map_cmd import default_overlap
    from genmap_tpu.engine.mappability import MappabilityEngine
    from genmap_tpu.index.fmindex import FMIndexData

    genome_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    corpus = sys.argv[2] if len(sys.argv) > 2 else "genomelike"
    cache = os.path.expanduser(
        f"~/.cache/genmap_tpu/bench_idx_{corpus}_{genome_mb}"
    )
    data = FMIndexData.load(cache)
    eng = MappabilityEngine(data, batch_blocks=16384)
    layout = eng.layouts[0]

    K, errors = 100, 2
    x = default_overlap(K, errors)
    o = K - x
    J = K - o + 1
    B, NB = 16384, 10
    Ln = K + J - 1
    nk = layout.length
    starts_all = (
        np.arange(0, (NB + 1) * B * J, J, dtype=np.int64) % (nk - Ln)
    ).astype(np.uint32).reshape(NB + 1, B)
    cnts_all = np.full((NB + 1, B), J, dtype=np.int32)
    limit = np.uint32(nk)
    d_starts = jax.device_put(starts_all[1:])
    d_cnts = jax.device_put(cnts_all[1:])

    for label in ("mono", "dimer"):
        tier = eng.tiers[0]
        if label == "dimer":
            if not eng._dimer_forced_ok:
                print("# dimer rows unavailable; skipping", file=sys.stderr)
                continue
            tier = dataclasses.replace(tier, dimer=True)
        prun = eng._probe_runner(0, K, errors, o, J, B, tier, 65535, True,
                                 mode="bits")

        def many_probe(starts, cnts, prun=prun):
            def step(acc, xx):
                st, ct = xx
                out = prun(st, ct, limit)
                return acc + out["skip_bits"].astype(jnp.uint32).sum(), out["skip_bits"]

            acc, bits = jax.lax.scan(step, jnp.uint32(0), (starts, cnts))
            return acc, bits

        pj = jax.jit(many_probe)
        t0 = time.time()
        _, bits = pj(d_starts, d_cnts)
        bits = np.asarray(bits)
        print(f"# {label} probe compile+warmup {time.time()-t0:.1f}s",
              file=sys.stderr)
        skip = np.unpackbits(np.ascontiguousarray(bits).view(np.uint8)).sum()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(pj(d_starts, d_cnts)[1])
            best = min(best, time.time() - t0)
        print(f"# {label} probe: {NB*B*J} kmers in {best:.2f}s "
              f"({NB*B*J/best:,.0f} kmers/s), skip {skip/(NB*B):.4f}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
