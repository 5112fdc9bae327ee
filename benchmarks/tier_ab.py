"""A/B: mono tier vs dimer tier raw-runner throughput at (100,2).

Measures the steady-state block mapper (the BENCH headline path) for both
tier-0 gather modes at several batch sizes — isolates the dimer redesign's
effect from compile noise and the end-to-end engine loop.

Run on the TPU:  python benchmarks/tier_ab.py [genome_mb]
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
    from genmap_tpu.index.build import build_index
    from genmap_tpu.io.fasta import FastaFile
    from genmap_tpu.search.engine import DEFAULT_TIERS

    genome_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    K, errors = 100, 2

    rng = np.random.default_rng(0)
    n = genome_mb * 1_000_000
    ff = FastaFile(name="synthetic.fa")
    ff.ids = ["chr1"]
    ff.seqs = [rng.integers(0, 4, size=n, dtype=np.uint8)]
    data = build_index([ff], sampling=10)
    eng = MappabilityEngine(data, batch_blocks=1024)
    layout = eng.layouts[0]
    x = default_overlap(K, errors)
    o = K - x
    J = K - o + 1
    Ln = K + J - 1
    limit = np.uint32(layout.length)

    for B in (16384, 49152):
        for dimer in (False, True):
            tier = dataclasses.replace(DEFAULT_TIERS[0], dimer=dimer)
            run = eng._runner(0, K, errors, o, J, B, tier, 65535, True, False)
            NB = 6
            starts_all = (
                np.arange(0, (NB) * B * J, J, dtype=np.int64)
                % (layout.length - Ln)
            ).astype(np.uint32).reshape(NB, B)
            cnts = np.full((NB, B), J, dtype=np.int32)

            def many(starts, cnts):
                def step(acc, xx):
                    st, ct = xx
                    out = run(st, ct, limit)
                    return (
                        acc + out["hits"].sum(dtype=jnp.uint32)
                        + out["overflow"].sum(dtype=jnp.uint32),
                        None,
                    )

                acc, _ = jax.lax.scan(step, jnp.uint32(0), (starts, cnts))
                return acc

            mj = jax.jit(many)
            ds, dc = jax.device_put(starts_all), jax.device_put(cnts)
            t0 = time.time()
            w = int(mj(ds, dc))
            comp = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                mj(ds, dc).block_until_ready()
                best = min(best, time.time() - t0)
            kmers = NB * B * J
            print(
                f"B={B} dimer={int(dimer)}: {kmers/best:,.0f} kmers/s "
                f"(best {best:.3f}s, compile+warm {comp:.0f}s, checksum {w})",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
    os._exit(0)
