"""Microbenchmark: where does a lockstep search step spend its time?

Decomposes the engine's per-step cost on the real chip into
  * the rank-row gather (the HBM random-row fetch)
  * the occ popcount arithmetic (VPU)
  * candidate fan-out + compaction (VPU)
and measures a SIMULATED dimer-table step (4-bit fields, 16 candidate
dimers) against two mono steps — the go/no-go data for the 2-chars-per-step
redesign (halves gathered rows, multiplies occ VPU work).

Run on the TPU:  python benchmarks/step_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from genmap_tpu.cache import enable_compile_cache
    from genmap_tpu.hostmem import retain_heap

    enable_compile_cache()
    retain_heap()

    from genmap_tpu.index.build import build_index
    from genmap_tpu.io.fasta import FastaFile
    from genmap_tpu.ops import rank as R

    _U32 = jnp.uint32

    rng = np.random.default_rng(0)
    n = 8_000_000
    ff = FastaFile(name="synthetic.fa")
    ff.ids = ["chr1"]
    ff.seqs = [rng.integers(0, 4, size=n, dtype=np.uint8)]
    data = build_index([ff], sampling=10)
    index = R.DeviceIndex.from_part(data, data.parts[0], light=True)
    n_total = index.n_total
    print(f"# index ready, n_total={n_total}", file=sys.stderr)

    B = 16384
    T = 50

    def rand_states(F):
        lo = rng.integers(0, n_total - 600, size=(B, F)).astype(np.uint32)
        sz = rng.integers(1, 60, size=(B, F)).astype(np.uint32)
        return jnp.asarray(lo), jnp.asarray(sz)

    # ---- A: dependent chain of fast one-gather extends, F slots, no compact
    def chain_fast(F):
        lo0, sz0 = rand_states(F)

        @jax.jit
        def run(lo, sz):
            def body(carry, _):
                lo, sz = carry
                nm, ns, no, far = R.extend_core_fast(index, lo, sz, lo)
                # keep candidate 0, remix to a pseudo-random next row
                lo2 = (nm[..., 0] + ns[..., 1]) % _U32(n_total - 600)
                sz2 = jnp.maximum(ns[..., 2] % _U32(60), _U32(1))
                return (lo2, sz2), None

            (lo, sz), _ = jax.lax.scan(body, (lo, sz), None, length=T)
            return lo.sum() + sz.sum()

        dt = timeit(run, lo0, sz0)
        rows = B * F * T
        print(f"A fast-extend chain F={F}: {dt*1e3/T:8.3f} ms/step  "
              f"{dt/rows*1e9:6.2f} ns/row", file=sys.stderr)
        return dt

    for F in (1, 4, 16, 52):
        chain_fast(F)

    # ---- B: pure dependent gather chain (no occ arithmetic)
    def chain_gather(F, width):
        tbl = index.fwd_blocks[:, :width]
        nb = tbl.shape[0]
        lo0, _ = rand_states(F)

        @jax.jit
        def run(lo):
            def body(lo, _):
                rows = jnp.take(tbl, (lo >> _U32(9)).astype(jnp.int32), axis=0)
                nxt = (rows[..., 0] + rows[..., 1] + lo) % _U32(n_total - 600)
                return nxt, None

            lo, _ = jax.lax.scan(body, lo, None, length=T)
            return lo.sum()

        dt = timeit(run, lo0)
        rows = B * F * T
        print(f"B gather-only chain F={F} w={width}: {dt*1e3/T:8.3f} ms/step  "
              f"{dt/rows*1e9:6.2f} ns/row", file=sys.stderr)

    for F in (1, 4, 52):
        chain_gather(F, index.fwd_blocks.shape[1])
    chain_gather(4, 52)  # narrow rows: is cost really width-independent?

    # ---- C: infix-shaped step with candidate fan-out + compaction
    from genmap_tpu.search.engine import _compact

    def chain_compact(F):
        lo0, sz0 = rand_states(F)

        @jax.jit
        def run(lo, sz):
            def body(carry, _):
                lo, sz = carry
                nm, ns, no, far = R.extend_core_fast(index, lo, sz, lo)
                A = nm.shape[-1]
                v = (ns > 0) & (ns < 50)
                arrs = tuple(
                    a.reshape(B, F * A) for a in (nm, ns, no)
                )
                (lo2, sz2, _), valid, of = _compact(arrs, v.reshape(B, F * A), F)
                lo2 = lo2 % _U32(n_total - 600)
                sz2 = jnp.maximum(sz2 % _U32(60), _U32(1))
                return (lo2, sz2), None

            (lo, sz), _ = jax.lax.scan(body, (lo, sz), None, length=T)
            return lo.sum() + sz.sum()

        dt = timeit(run, lo0, sz0)
        rows = B * F * T
        print(f"C fast-extend+compact F={F}: {dt*1e3/T:8.3f} ms/step  "
              f"{dt/rows*1e9:6.2f} ns/row", file=sys.stderr)

    for F in (4, 16):
        chain_compact(F)

    # ---- D: simulated DIMER step: gather a 192-word row (64 code words of
    # 4-bit fields + counts), compute all 16 candidate prefix counts at both
    # bounds via bit-plane eq-popcounts, suffix sums, pick one candidate.
    DW = 2 * (64 + 15 + 1 + 16)  # paired dimer sub-rows (4-bit codes)
    nb2 = n_total // 512 + 2
    dim_tbl = jnp.asarray(
        rng.integers(0, 2**32, size=(nb2, DW), dtype=np.uint64).astype(np.uint32)
    )

    def occ16(sub, p):
        """All-16 dimer prefix counts at p from a 512-symbol sub-row."""
        off = (p & _U32(511)).astype(jnp.int32)
        # per-word 4-bit-field masks selecting fields < off
        nf = jnp.clip(off[..., None] - 8 * jnp.arange(64, dtype=jnp.int32), 0, 8)
        sh = jnp.minimum(4 * nf, 31).astype(_U32)
        fmask = jnp.where(nf >= 8, _U32(0xFFFFFFFF), (_U32(1) << sh) - _U32(1))
        w = sub[..., :64] & fmask
        # bit planes of the 4-bit fields
        m1 = _U32(0x11111111)
        b0 = w & m1
        b1 = (w >> _U32(1)) & m1
        b2 = (w >> _U32(2)) & m1
        b3 = (w >> _U32(3)) & m1
        outs = []
        for d in range(16):
            x = (b0 if d & 1 else b0 ^ m1)
            x &= (b1 if d & 2 else b1 ^ m1)
            x &= (b2 if d & 4 else b2 ^ m1)
            x &= (b3 if d & 8 else b3 ^ m1)
            x &= fmask
            outs.append(jax.lax.population_count(x).sum(axis=-1, dtype=_U32))
        cnt = jnp.stack(outs, axis=-1)  # [..., 16]
        base = sub[..., 64:79]
        zero = jnp.zeros_like(base[..., :1])
        return cnt + jnp.concatenate([zero, base], axis=-1)[..., :16]

    def chain_dimer(F):
        lo0, sz0 = rand_states(F)

        @jax.jit
        def run(lo, sz):
            def body(carry, _):
                lo, sz = carry
                q = (lo >> _U32(9)).astype(jnp.int32) % (nb2 - 1)
                rows = jnp.take(dim_tbl, q, axis=0)
                hw = DW // 2
                occ_lo = occ16(rows[..., :hw], lo)
                hi = lo + sz
                half = ((hi >> _U32(9)).astype(jnp.int32) - q) > 0
                sub_hi = jnp.where(half[..., None], rows[..., hw:], rows[..., :hw])
                occ_hi = occ16(sub_hi, hi)
                slice_cnt = occ_hi - occ_lo  # [B, F, 16]
                # suffix sums for the FMD companion offsets
                comp = jnp.cumsum(slice_cnt[..., ::-1], axis=-1)[..., ::-1]
                nm = occ_lo + comp  # stand-in arithmetic
                lo2 = (nm[..., 0] + slice_cnt[..., 5]) % _U32(n_total - 600)
                sz2 = jnp.maximum(nm[..., 9] % _U32(60), _U32(1))
                return (lo2, sz2), None

            (lo, sz), _ = jax.lax.scan(body, (lo, sz), None, length=T)
            return lo.sum() + sz.sum()

        dt = timeit(run, lo0, sz0)
        rows = B * F * T
        print(f"D dimer step F={F}: {dt*1e3/T:8.3f} ms/step  "
              f"{dt/rows*1e9:6.2f} ns/row  (compare vs 2x line A)",
              file=sys.stderr)

    for F in (1, 4, 52):
        chain_dimer(F)


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
