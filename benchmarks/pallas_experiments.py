"""Pallas kernel experiments for the hot rank-row gather — and why the
production engine uses XLA's native gather instead.

The (k,e)-search engine's cost is purely the number of gathered rank rows
(see NOTES.md: ~5-8 ns per row, independent of row width up to ~512 B).
That made the gather the obvious Pallas target.  Three kernel designs were
evaluated against the XLA gather engine on the real chip; run this file to
reproduce.  Findings (TPU v5e via remote relay, 2026-08):

1. XLA `jnp.take` row gather (production path): ~130-200 Mrows/s inside a
   scan — the dedicated gather engine streams random rows at ~5-8 ns/row.
2. Multi-row slice gather (`lax.gather` with slice_sizes=(2, W)) — would
   let one descriptor fetch both halves of a paired row without storing
   pairs: ~0.7 Mq/s, ~200x SLOWER (XLA lowers multi-row slices to a serial
   loop on TPU).  This is why paired rows are materialized at build time
   (index/fmindex.py wide_rows) instead.
3. VMEM-resident table + in-kernel `jnp.take`/`take_along_axis`
   (Mosaic dynamic_gather): unsupported for table-shaped operands — shape
   mismatch error or internal compiler error.  Mosaic's gather is a
   same-shape per-lane shuffle, not a row lookup.
4. This file's kernel: manual per-row DMA from an HBM table into VMEM,
   ~CHUNK descriptors in flight.  Compiles and is correct, but the scalar
   core issues one DMA descriptor per row: measured 0.2 Mrows/s vs the
   gather engine's ~40 Mrows/s on the same 512 B rows (~200x slower; ~5.6 us
   per issue+wait round).  DMA shines for large contiguous/blocked
   transfers, not 100-500 B random rows.

Toolchain notes for this remote-compile stack: `pl.run_scoped` and VMEM
scratch buffers with fewer than 128 lanes crash the Mosaic pass with an
opaque INTERNAL error — use `scratch_shapes` and 128-lane rows.

Conclusion: feeding the XLA gather engine fewer, wider rows (paired
512-symbol rank rows + the one-gather fast path) is the TPU-native answer;
a hand-written kernel cannot beat dedicated gather hardware at its own
access pattern.  Kept here as a benchmark and as the scaffold to revisit if
a future toolchain exposes vector gathers in Mosaic.
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from genmap_tpu.cache import enable_compile_cache

    enable_compile_cache()

    rng = np.random.default_rng(0)
    NR, W = 31_250, 128  # ~16 MB table, 512 B rows (the paired-row width class)
    table = jnp.asarray(
        rng.integers(0, 2**30, size=(NR, W), dtype=np.int64).astype(np.int32)
    )
    N = 1 << 17
    CHUNK = 128  # rows DMA'd per wave (descriptors in flight)
    STEPS = 8
    idx0 = jnp.asarray(rng.integers(0, NR, size=N).astype(np.int32))
    # the DMA kernel measures descriptor issue rate; a smaller N (whole index
    # vector in SMEM) is enough to see it
    ND = 1 << 12
    idx_d = jnp.asarray(rng.integers(0, NR, size=ND).astype(np.int32))

    # ---- 1. XLA gather engine (the production path), dependent chain -----
    @jax.jit
    def xla_chain(idx):
        def body(c, _):
            rows = jnp.take(table, c, axis=0)
            return (rows.sum(axis=-1, dtype=jnp.int32) % NR), None

        c, _ = jax.lax.scan(body, idx, None, length=STEPS)
        return c.sum(dtype=jnp.int32)

    # ---- 4. Pallas: chunked per-row DMA ---------------------------------
    def dma_kernel(idx_ref, table_hbm, out_ref, buf, sem):
        def chunk(ci, acc):
            def start_row(r, _):
                pltpu.make_async_copy(
                    table_hbm.at[pl.ds(idx_ref[ci * CHUNK + r], 1), :],
                    buf.at[pl.ds(r, 1), :],
                    sem.at[r],
                ).start()
                return 0

            jax.lax.fori_loop(0, CHUNK, start_row, 0)

            def wait_row(r, _):
                pltpu.make_async_copy(
                    table_hbm.at[pl.ds(idx_ref[ci * CHUNK + r], 1), :],
                    buf.at[pl.ds(r, 1), :],
                    sem.at[r],
                ).wait()
                return 0

            jax.lax.fori_loop(0, CHUNK, wait_row, 0)
            return acc + buf[...].sum(dtype=jnp.int32)

        out_ref[0, 0] = jax.lax.fori_loop(0, ND // CHUNK, chunk, jnp.int32(0))

    @jax.jit
    def pallas_dma_sum(idx):
        return pl.pallas_call(
            dma_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((CHUNK, W), jnp.int32),
                pltpu.SemaphoreType.DMA((CHUNK,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, table)[0, 0]

    for name, fn, arg, rows in (
        ("xla gather engine (8-step chain)", xla_chain, idx0, N * STEPS),
        ("pallas row-DMA (1 pass)         ", pallas_dma_sum, idx_d, ND),
    ):
        try:
            r = int(fn(arg))
            best = 9e9
            for _ in range(3):
                t0 = time.time()
                int(fn(arg))
                best = min(best, time.time() - t0)
            print(f"{name}: {best*1e3:9.2f} ms  {rows/best/1e6:7.1f} Mrows/s  "
                  f"(checksum {r})")
        except Exception as e:  # keep the comparison running on toolchain gaps
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
