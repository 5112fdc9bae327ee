"""Dimer (2-symbols-per-gather) rank path: builder + device ops.

Validates against brute force on the suffix array:
  * build_dimer_rows cumulative/delta/tail counts (via _dimer_occ on device)
  * C2[c2*4+c1] equals the SA start of the interval of "c1 c2"
  * one dimer extension step == two mono extension steps (Dna4 and Dna5),
    on states whose windows are unflagged; flagged windows must raise `far`
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from genmap_tpu.index.build import build_index  # noqa: E402
from genmap_tpu.io.fasta import FastaFile  # noqa: E402
from genmap_tpu.ops.rank import (  # noqa: E402
    DeviceIndex,
    _dimer_occ,
    extend_all,
    extend_dimer,
    extend_dimer_fast,
)


def _mk(seed=0, n=9000, nseq=3, with_n=False):
    rng = np.random.default_rng(seed)
    ff = FastaFile(name="t.fa")
    ff.ids = [f"chr{i}" for i in range(nseq)]
    ff.seqs = []
    for i in range(nseq):
        s = rng.integers(0, 4, size=n // nseq, dtype=np.uint8)
        if with_n:
            # sparse N, like real genomes (dense N flags every sub-block and
            # the whole dimer path escalates - nothing left to check)
            s[rng.integers(0, len(s), size=2)] = 4
        ff.seqs.append(s)
    data = build_index([ff], sampling=4)
    return data, rng


def _brute_tables(data):
    """Brute-force (bwt, bwt2, valid flags) from the part's reconstruction."""
    from genmap_tpu.alphabet import revcomp_codes
    from genmap_tpu.index.build import _make_ctext
    from genmap_tpu.index.suffix import suffix_array

    part = data.parts[0]
    seqs = []
    pos = 0
    for ln in data.seq_lens:
        seqs.append(data.decode_slice(pos, int(ln)))
        pos += int(ln)
    all_seqs = seqs + [revcomp_codes(s) for s in seqs]
    ctext = _make_ctext(all_seqs)
    sa = suffix_array(ctext)
    n = len(ctext)
    prev = (sa.astype(np.int64) - 1) % n
    prev2 = (sa.astype(np.int64) - 2) % n
    b1 = ctext[prev]
    b2 = ctext[prev2]
    return ctext, sa, b1, b2, part


@pytest.mark.parametrize("with_n", [False, True])
def test_dimer_occ_against_bruteforce(with_n):
    data, rng = _mk(seed=1, with_n=with_n)
    ctext, sa, b1, b2, part = _brute_tables(data)
    n = len(ctext)
    assert part.dimer is not None

    valid = (b1 >= 1) & (b1 <= 4) & (b2 >= 1) & (b2 <= 4)
    code = np.where(valid, (b1 - 1) * 4 + (b2 - 1), 0)
    mono_real = (b1 >= 1) & (b1 <= 4)
    blk_bad = np.zeros(n // 128 + 1, dtype=bool)
    bad = ~valid
    np.logical_or.reduceat(
        np.concatenate([bad, np.zeros((n // 128 + 1) * 128 - n, bool)]),
        np.arange(0, (n // 128 + 1) * 128, 128),
        out=blk_bad,
    )

    ps = np.sort(rng.integers(0, n + 1, size=200).astype(np.uint32))
    dim = jnp.asarray(np.vstack([part.dimer, np.zeros((1, 64), np.uint32)]))
    q = (ps >> 7).astype(np.int32)
    sub = jnp.take(dim, q, axis=0)
    L, Lm, flag = jax.jit(_dimer_occ)(sub, jnp.asarray(ps))
    L, Lm, flag = np.asarray(L), np.asarray(Lm), np.asarray(flag)

    n_checked = 0
    for i, p in enumerate(ps):
        p = int(p)
        want_flag = bool(blk_bad[p >> 7])
        assert flag[i] == want_flag
        if want_flag:
            continue  # flagged sub-blocks escalate; counts are unreliable
        n_checked += 1
        for t in range(16):
            want = int((valid[:p] & (code[:p] <= t)).sum())
            assert L[i, t] == want, (p, t)
        for y in range(4):
            want = int((mono_real[:p] & (b1[:p] - 1 <= y)).sum())
            assert (Lm[i, y] & 0x7FFFFFFF) == want, (p, y)
    assert n_checked >= len(ps) // 2


@pytest.mark.parametrize("with_n", [False, True])
def test_dimer_step_equals_two_mono_steps(with_n):
    data, rng = _mk(seed=2, with_n=with_n)
    index = DeviceIndex.from_part(data, data.parts[0])
    assert index.has_dimer
    n = index.n_total

    # start states: intervals of random short patterns via mono search
    text = data.decode_text()
    B = 64
    plen = 6
    starts = rng.integers(0, len(text) - plen - 2, size=B)
    pats = np.stack([text[s : s + plen] for s in starts])

    def interval_of(pat):
        mlo = jnp.zeros(1, jnp.uint32)
        size = jnp.full(1, jnp.uint32(n))
        olo = jnp.zeros(1, jnp.uint32)
        for ch in pat[::-1]:
            nm, ns, no = extend_all(index, False, mlo, size, olo)
            c = int(ch)
            if c >= 4:
                return None
            mlo, size, olo = nm[:, c], ns[:, c], no[:, c]
            if int(size[0]) == 0:
                return None
        return int(mlo[0]), int(size[0]), int(olo[0])

    states = []
    exts = []
    for b in range(B):
        iv = interval_of(pats[b])
        if iv is None or iv[1] == 0:
            continue
        states.append(iv)
        exts.append(
            (int(text[starts[b] - 1]) if starts[b] >= 1 else 0,
             int(text[starts[b] - 2]) if starts[b] >= 2 else 0)
        )
    assert len(states) >= 16
    mlo = jnp.asarray([s[0] for s in states], jnp.uint32)
    size = jnp.asarray([s[1] for s in states], jnp.uint32)
    olo = jnp.asarray([s[2] for s in states], jnp.uint32)

    # reference: two mono left-extensions by (c2 then c1) for ALL 16 combos
    nm1, ns1, no1 = jax.jit(lambda a, b, c: extend_all(index, False, a, b, c))(
        mlo, size, olo
    )
    ref_mlo = np.zeros((len(states), 16), np.uint32)
    ref_size = np.zeros((len(states), 16), np.uint32)
    ref_olo = np.zeros((len(states), 16), np.uint32)
    for c2 in range(4):
        nm2, ns2, no2 = jax.jit(
            lambda a, b, c: extend_all(index, False, a, b, c)
        )(nm1[:, c2], ns1[:, c2], no1[:, c2])
        for c1 in range(4):
            code = c2 * 4 + c1
            ref_mlo[:, code] = np.asarray(nm2[:, c1])
            ref_size[:, code] = np.asarray(ns2[:, c1])
            ref_olo[:, code] = np.asarray(no2[:, c1])

    for fn in (extend_dimer, extend_dimer_fast):
        dres, mres, far = jax.jit(lambda a, b, c, f=fn: f(index, a, b, c))(
            mlo, size, olo
        )
        d_mlo, d_size, d_olo = (np.asarray(x) for x in dres)
        m_mlo, m_size, m_olo = (np.asarray(x) for x in mres)
        far = np.asarray(far)
        checked = 0
        for i in range(len(states)):
            if far[i]:
                continue
            checked += 1
            np.testing.assert_array_equal(d_size[i], ref_size[i])
            nz = ref_size[i] > 0
            np.testing.assert_array_equal(d_mlo[i][nz], ref_mlo[i][nz])
            np.testing.assert_array_equal(d_olo[i][nz], ref_olo[i][nz])
            # mono results: one left step
            np.testing.assert_array_equal(
                m_size[i], np.asarray(ns1[i][: m_size.shape[1]])
            )
            mz = m_size[i] > 0
            np.testing.assert_array_equal(
                m_mlo[i][mz], np.asarray(nm1[i][: m_size.shape[1]])[mz]
            )
            np.testing.assert_array_equal(
                m_olo[i][mz], np.asarray(no1[i][: m_size.shape[1]])[mz]
            )
        assert checked >= len(states) // 2, f"{fn.__name__}: too many far"


def test_c2_is_dimer_interval_start():
    data, _ = _mk(seed=3)
    ctext, sa, b1, b2, part = _brute_tables(data)
    n = len(ctext)
    suff_first = ctext[sa]
    second = ctext[(sa.astype(np.int64) + 1) % n]
    for c1 in range(4):
        for c2 in range(4):
            starts_with = (suff_first == c1 + 1) & (second == c2 + 1) & (
                sa.astype(np.int64) + 1 < n
            )
            rows = np.nonzero(starts_with)[0]
            want = int(rows.min()) if len(rows) else None
            got = int(part.C2[c2 * 4 + c1])
            if want is not None:
                assert got == want, (c1, c2)


def test_flagged_subblocks_raise_far():
    # a tiny genome: nearly every sub-block contains a sentinel-adjacent row
    data, _ = _mk(seed=4, n=120, nseq=3)
    index = DeviceIndex.from_part(data, data.parts[0])
    n = index.n_total
    mlo = jnp.zeros(4, jnp.uint32)
    size = jnp.full(4, jnp.uint32(min(n, 100)))
    _, _, far = jax.jit(lambda a, b, c: extend_dimer(index, a, b, c))(
        mlo, size, jnp.zeros(4, jnp.uint32)
    )
    assert bool(np.asarray(far).all())
