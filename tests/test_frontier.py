"""Unit tests for the frontier machinery: compaction paths, pool schedule,
interval seed tables."""

import numpy as np
import pytest


def test_compact_sort_path_matches_onehot_semantics():
    """The sort-based large-frontier compaction must pack exactly the valid
    states in order, with the same overflow flags as the one-hot path."""
    from genmap_tpu.search.engine import _compact

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    for B, M, F in ((7, 40, 8), (5, 600, 64), (3, 2048, 256)):
        arrays = tuple(
            jnp.asarray(rng.integers(0, 2**31, size=(B, M)).astype(np.uint32))
            for _ in range(3)
        ) + (jnp.asarray(rng.integers(0, 3, size=(B, M)).astype(np.int32)),)
        valid = jnp.asarray(rng.random((B, M)) < 0.3)
        outs, ov, of = _compact(arrays, valid, F)
        o0, ov, of = np.asarray(outs[0]), np.asarray(ov), np.asarray(of)
        for b in range(B):
            vidx = np.nonzero(np.asarray(valid)[b])[0]
            nv = len(vidx)
            assert of[b] == (nv > F)
            k = min(nv, F)
            np.testing.assert_array_equal(
                o0[b][:k], np.asarray(arrays[0])[b][vidx[:k]]
            )
            assert ov[b].sum() == k


def test_pool_schedule_shapes():
    """(100,2)-class configs keep minimal pools; short-infix configs like
    (20,1) get wider pools over the branch window."""
    from genmap_tpu.cli.map_cmd import default_overlap
    from genmap_tpu.search.engine import infix_pool_schedule
    from genmap_tpu.search.schemes import plans_for

    K, E = 100, 2
    o = K - default_overlap(K, E)
    pools_big = infix_pool_schedule(plans_for(E, o), K - o, 16_000_000, 1.0)
    assert pools_big.max() <= 16 and pools_big.min() >= 2

    K, E = 20, 1
    o = K - min(default_overlap(K, E), K - 1, K - E - 2)
    pools_small = infix_pool_schedule(plans_for(E, o), K - o, 16_000_000, 1.0)
    assert pools_small.max() >= 16  # branch window needs real capacity
    assert pools_small[0] <= 4  # exact region stays minimal

    # escalation scale widens every step
    pools_s8 = infix_pool_schedule(plans_for(E, o), K - o, 16_000_000, 8.0)
    assert (pools_s8 >= pools_small).all() and pools_s8.max() > pools_small.max()


@pytest.mark.parametrize("with_n", [False, True])
def test_seed_tables_match_backward_search(with_n):
    """Seed-table entries must equal the interval found by explicit
    character-by-character backward search."""
    import jax.numpy as jnp

    from genmap_tpu.alphabet import encode_seq
    from genmap_tpu.index.build import build_index
    from genmap_tpu.io.fasta import FastaFile
    from genmap_tpu.ops.rank import (
        DeviceIndex,
        extend_all,
        seed_level_offset,
    )

    rng = np.random.default_rng(5)
    alpha = "ACGTN" if with_n else "ACGT"
    ff = FastaFile(name="g.fa")
    ff.ids = ["s1", "s2"]
    ff.seqs = [
        encode_seq("".join(rng.choice(list(alpha), size=400))) for _ in range(2)
    ]
    data = build_index([ff], sampling=3)
    index = DeviceIndex.from_host(data)
    assert index.has_seed

    for t in (1, 3, index.seed_t0):
        off = seed_level_offset(t)
        for _ in range(5):
            w = rng.integers(0, 4, size=t)
            code = 0
            for c in w:
                code = code * 4 + int(c)
            # explicit backward search of w
            mlo = jnp.asarray([np.uint32(0)])
            size = jnp.asarray([np.uint32(index.n_total)])
            olo = jnp.asarray([np.uint32(0)])
            for ch in w[::-1]:
                nm, ns, no = extend_all(index, False, mlo, size, olo)
                mlo, size, olo = nm[:, ch], ns[:, ch], no[:, ch]
            assert int(index.seed_mlo[off + code]) == int(mlo[0])
            assert int(index.seed_size[off + code]) == int(size[0])
