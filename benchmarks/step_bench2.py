"""Follow-up microbenchmark: the LEAN dimer-row design vs two mono steps.

step_bench.py measured a naive dimer step (16 eq-popcounts over 64 field
words) at ~1.45x the cost of TWO mono steps — a loss.  This benchmarks the
lean layout: 128-symbol sub-blocks, 16 cumulative le counts + per-16-symbol
uint8 deltas (d-MAJOR), so the in-block popcount window is 2 words and each
of the 16 thresholds costs ~10 VPU ops.  Paired row = 128 words = 512 B.

v2 lesson: dynamic indexing along the minor (lane) axis — take_along_axis —
lowers catastrophically on TPU (~600 ns/row).  All dynamic word selection
here is ONE-HOT masked sums; per-threshold byte extraction is static thanks
to the d-major delta layout.

Run on the TPU:  python benchmarks/step_bench2.py
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

    _U32 = jnp.uint32
    _I32 = jnp.int32
    rng = np.random.default_rng(0)

    n_total = 16_000_002
    B = 16384
    T = 50

    nb = n_total // 128 + 2
    tbl = jnp.asarray(
        rng.integers(0, 2**32, size=(nb, 128), dtype=np.uint64).astype(np.uint32)
    )

    M1 = np.uint32(0x11111111)

    def dimer_occ(sub, p):
        """Lean occ: 16 dimer les + 4 mono les at p from a 64-word sub-row.

        All dynamic selection is one-hot over the word axis."""
        off = (p & _U32(127)).astype(_I32)
        d = off >> 4  # 16-symbol boundary index 0..7
        tail = off & 15

        # --- tail field words: one-hot select pair (w[2d], w[2d+1]) ----------
        dh = d[..., None] == jnp.arange(8, dtype=_I32)  # [..., 8]
        dhu = dh.astype(_U32)
        fields = sub[..., 0:16].reshape(sub.shape[:-1] + (8, 2))
        w0 = (fields[..., 0] * dhu).sum(axis=-1, dtype=_U32)
        w1 = (fields[..., 1] * dhu).sum(axis=-1, dtype=_U32)

        # --- delta words: one-hot select 4-word group for d (d=0 -> zeros) --
        gh = (d[..., None] - 1) == jnp.arange(7, dtype=_I32)  # [..., 7]
        ghu = gh.astype(_U32)
        dwords = sub[..., 32:60].reshape(sub.shape[:-1] + (7, 4))
        dsel = (dwords * ghu[..., None]).sum(axis=-2, dtype=_U32)  # [..., 4]
        # static byte extraction: threshold t -> word t>>2, byte t&3
        dbytes = jnp.stack(
            [(dsel[..., t >> 2] >> _U32(8 * (t & 3))) & _U32(0xFF) for t in range(16)],
            axis=-1,
        )  # [..., 16]

        # --- in-tail le popcounts over the 2 field words ---------------------
        nf0 = jnp.clip(tail, 0, 8)
        nf1 = jnp.clip(tail - 8, 0, 8)

        def pmask(nf):
            sh = jnp.minimum(4 * nf, 31).astype(_U32)
            return jnp.where(nf >= 8, _U32(0xFFFFFFFF), (_U32(1) << sh) - _U32(1))

        m0, m1_ = pmask(nf0), pmask(nf1)

        def nib_masks(w):
            b0 = w & M1
            b1 = (w >> _U32(1)) & M1
            b2 = (w >> _U32(2)) & M1
            b3 = (w >> _U32(3)) & M1
            eq_hi = [(b3 ^ M1) & (b2 ^ M1), (b3 ^ M1) & b2, b3 & (b2 ^ M1), b3 & b2]
            le_lo = [(b1 ^ M1) & (b0 ^ M1)]
            le_lo.append(le_lo[0] | ((b1 ^ M1) & b0))
            le_lo.append(le_lo[1] | (b1 & (b0 ^ M1)))
            le_hi = [eq_hi[0]]
            le_hi.append(le_hi[0] | eq_hi[1])
            le_hi.append(le_hi[1] | eq_hi[2])
            return eq_hi, le_lo, le_hi

        eqA, loA, lhA = nib_masks(w0)
        eqB, loB, lhB = nib_masks(w1)

        pc = jax.lax.population_count
        tails = []
        for t in range(16):
            A, Bc = t >> 2, t & 3
            if Bc == 3:
                if A == 3:
                    g0, g1 = M1 * jnp.ones_like(w0), M1 * jnp.ones_like(w1)
                else:
                    g0, g1 = lhA[A], lhB[A]
            else:
                ltA = lhA[A - 1] if A > 0 else jnp.zeros_like(w0)
                ltB = lhB[A - 1] if A > 0 else jnp.zeros_like(w1)
                g0 = ltA | (eqA[A] & loA[Bc])
                g1 = ltB | (eqB[A] & loB[Bc])
            tails.append(pc(g0 & m0) + pc(g1 & m1_))
        tails = jnp.stack(tails, axis=-1)  # [..., 16]

        L = sub[..., 16:32] + dbytes + tails
        mono_cum = jnp.concatenate(
            [sub[..., 60:61] & _U32(0x7FFFFFFF), sub[..., 61:64]], axis=-1
        )
        inblk = (dbytes + tails)[..., 3::4]  # thresholds 3,7,11,15
        Lm = mono_cum + inblk
        flag = (sub[..., 60] >> _U32(31)) > 0
        return L, Lm, flag

    def rand_states(F):
        lo = rng.integers(0, n_total - 600, size=(B, F)).astype(np.uint32)
        sz = rng.integers(1, 60, size=(B, F)).astype(np.uint32)
        return jnp.asarray(lo), jnp.asarray(sz)

    def chain_dimer_lean(F):
        lo0, sz0 = rand_states(F)

        @jax.jit
        def run(lo, sz):
            def body(carry, _):
                lo, sz = carry
                q = (lo >> _U32(7)).astype(_I32) % (nb - 1)
                rows = jnp.take(tbl, q, axis=0)
                L_lo, Lm_lo, f0 = dimer_occ(rows[..., :64], lo)
                hi = lo + sz
                half = ((hi >> _U32(7)).astype(_I32) - q) > 0
                sub_hi = jnp.where(half[..., None], rows[..., 64:], rows[..., :64])
                L_hi, Lm_hi, f1 = dimer_occ(sub_hi, hi)
                S = L_hi - L_lo
                occ2_lo = jnp.diff(L_lo, axis=-1, prepend=L_lo[..., :1] * 0)
                nsize = jnp.diff(S, axis=-1, prepend=S[..., :1] * 0)
                nolo = lo[..., None] + (S[..., 15:16] - S)
                nmlo = occ2_lo + nolo  # stand-in for + C2
                lo2 = (nmlo[..., 3] + nsize[..., 9] + Lm_lo[..., 1]) % _U32(
                    n_total - 600
                )
                sz2 = jnp.maximum(nolo[..., 5] % _U32(60), _U32(1))
                return (lo2, sz2), None

            (lo, sz), _ = jax.lax.scan(body, (lo, sz), None, length=T)
            return lo.sum() + sz.sum()

        dt = timeit(run, lo0, sz0)
        rows = B * F * T
        print(f"LEAN dimer step F={F}: {dt*1e3/T:8.3f} ms/step  "
              f"{dt/rows*1e9:6.2f} ns/row  (beats 2x mono if < ~20)",
              file=sys.stderr)

    for F in (1, 4, 16, 52):
        chain_dimer_lean(F)


if __name__ == "__main__":
    main()
    os._exit(0)
