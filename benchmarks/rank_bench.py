"""Microbenchmarks for the hot kernels: rank-row extension, locate, mapper.

Replaces the reference's stubbed google-benchmark binary
(/root/reference/benchmarks/bench.cpp) with real measurements of our hot
ops on the current JAX backend.  Run: python benchmarks/rank_bench.py
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from genmap_tpu.cache import enable_compile_cache

    enable_compile_cache()

    from genmap_tpu.cli.map_cmd import default_overlap
    from genmap_tpu.index.build import build_index
    from genmap_tpu.io.fasta import FastaFile
    from genmap_tpu.ops.rank import DeviceIndex, DeviceText, extend_all, locate
    from genmap_tpu.search.engine import DEFAULT_TIERS, make_block_mapper

    rng = np.random.default_rng(0)
    ff = FastaFile(name="bench.fa")
    ff.ids = ["chr"]
    ff.seqs = [rng.integers(0, 4, size=2_000_000, dtype=np.uint8)]
    data = build_index([ff], sampling=10)
    index = DeviceIndex.from_host(data)
    dtext = DeviceText.from_host(data)
    n = index.n_total

    def timeit(name, fn, *args, iters=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        print(f"{name:40s} {dt * 1e3:9.2f} ms")
        return dt

    N = 1 << 20
    mlo = jnp.asarray(rng.integers(0, n - 8, size=N).astype(np.uint32))
    size = jnp.full((N,), 4, jnp.uint32)
    olo = jnp.asarray(rng.integers(0, n - 8, size=N).astype(np.uint32))
    ext = jax.jit(extend_all, static_argnames=("right",))
    dt = timeit(f"extend_all left  [{N} states]", lambda: ext(index, right=False, mlo=mlo, size=size, olo=olo))
    print(f"{'':40s} {dt / N * 1e9:9.1f} ns/state")
    dt = timeit(f"extend_all right [{N} states]", lambda: ext(index, right=True, mlo=mlo, size=size, olo=olo))

    M = 1 << 16
    rows = jnp.asarray(rng.integers(0, n, size=M).astype(np.uint32))
    val = jnp.ones((M,), bool)
    loc = jax.jit(locate)
    dt = timeit(f"locate           [{M} rows]", lambda: loc(index, rows, val))
    print(f"{'':40s} {dt / M * 1e9:9.1f} ns/row")

    K, errors = 100, 2
    o = K - default_overlap(K, errors)
    J = K - o + 1
    B = 1024
    for name, tier in (("fast", DEFAULT_TIERS[0]), ("exact", DEFAULT_TIERS[1])):
        run = make_block_mapper(
            index, dtext, K=K, errors=errors, overlap=o, J=J, B=B,
            tier=tier, cap=65535, rev_compl=True,
        )
        Ln = K + J - 1
        starts = ((np.arange(B) * J) % (data.text_len - Ln)).astype(np.uint32)
        cnt = np.full(B, J, np.int32)
        limit = np.uint32(data.text_len)
        dt = timeit(
            f"block mapper {name} [{B}x{J} kmers]", lambda: run(starts, cnt, limit)
        )
        print(f"{'':40s} {B * J / dt:9.0f} kmers/s")


if __name__ == "__main__":
    main()
