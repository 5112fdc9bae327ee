"""Rank/LF ops vs a naive numpy reference, plus backward-search consistency."""

import numpy as np
import pytest

from genmap_tpu.alphabet import encode_seq
from genmap_tpu.index.build import _bwt_of, _make_ctext, build_index
from genmap_tpu.io.fasta import FastaFile


def _mk(seqs_strs, sampling=3):
    ff = FastaFile(name="genome.fa")
    ff.ids = [f"seq{i}" for i in range(len(seqs_strs))]
    ff.seqs = [encode_seq(s) for s in seqs_strs]
    return build_index([ff], sampling=sampling)


def _jit_extend():
    import jax

    from genmap_tpu.ops.rank import extend_all

    return jax.jit(extend_all, static_argnames=("right",))


_EXT = None


def _ext(index, right, mlo, size, olo):
    global _EXT
    if _EXT is None:
        _EXT = _jit_extend()
    return _EXT(index, right=right, mlo=mlo, size=size, olo=olo)


def _naive_occ(bwt, sbits, p, c):
    return int(((bwt[:p] == c) & ~sbits[:p]).sum())


def _naive_smaller(bwt, sbits, p, c):
    return int((sbits[:p]).sum() + ((bwt[:p] < c) & ~sbits[:p]).sum())


@pytest.mark.parametrize("seed", [0, 7])
@pytest.mark.parametrize("with_n", [False, True])
def test_extend_all_matches_naive(seed, with_n):
    import jax.numpy as jnp

    from genmap_tpu.ops.rank import DeviceIndex, extend_all

    rng = np.random.default_rng(seed)
    alpha = "ACGTN" if with_n else "ACGT"
    seqs = [
        "".join(rng.choice(list(alpha), size=rng.integers(5, 200)))
        for _ in range(3)
    ]
    data = _mk(seqs)
    index = DeviceIndex.from_host(data)

    # naive BWT for the fwd direction (the index covers both strands)
    from genmap_tpu.alphabet import revcomp_codes
    codes = [encode_seq(s) for s in seqs]
    ctext = _make_ctext(codes + [revcomp_codes(s) for s in codes])
    _, bwt, sbits = _bwt_of(ctext)
    n = len(ctext)

    ps = rng.integers(0, n + 1, size=64).astype(np.uint32)
    sizes = rng.integers(0, 5, size=64).astype(np.uint32)
    sizes = np.minimum(sizes, n - ps).astype(np.uint32)
    olo = rng.integers(0, n, size=64).astype(np.uint32)

    nmlo, nsize, nolo = _ext(index, False, jnp.asarray(ps), jnp.asarray(sizes), jnp.asarray(olo))
    nmlo, nsize, nolo = np.asarray(nmlo), np.asarray(nsize), np.asarray(nolo)
    A = 5 if with_n else 4
    comp = [3, 2, 1, 0, 4]
    assert nmlo.shape == (64, A)
    for i in range(64):
        p, sz = int(ps[i]), int(sizes[i])
        occ_sl = [
            _naive_occ(bwt, sbits, p + sz, c) - _naive_occ(bwt, sbits, p, c)
            for c in range(5)
        ]
        sent_sl = int(sbits[p : p + sz].sum())
        for c in range(A):
            occ_lo = _naive_occ(bwt, sbits, p, c)
            occ_hi = _naive_occ(bwt, sbits, p + sz, c)
            assert nmlo[i, c] == int(data.parts[0].C[c]) + occ_lo, (i, c)
            assert nsize[i, c] == occ_hi - occ_lo, (i, c)
            # FMD companion update: the companion interval of rc(pattern)
            # shifts by the sentinel hits plus the slice counts of chars
            # whose complement sorts before comp(c) on the appended side
            off = sent_sl + sum(occ_sl[e] for e in range(4) if comp[e] < comp[c])
            assert nolo[i, c] == int(olo[i]) + off, (i, c)


def _backward_search(index, data, pattern):
    """Search a pattern via repeated left-extension; return (flo, size)."""
    import jax.numpy as jnp

    from genmap_tpu.ops.rank import extend_all

    flo = np.uint32(0)
    rlo = np.uint32(0)
    size = np.uint32(data.parts[0].n_total)
    for ch in pattern[::-1]:
        nmlo, nsize, nolo = _ext(
            index, False, jnp.asarray([flo]), jnp.asarray([size]), jnp.asarray([rlo])
        )
        flo = np.asarray(nmlo)[0, ch]
        size = np.asarray(nsize)[0, ch]
        rlo = np.asarray(nolo)[0, ch]
    return int(flo), int(size), int(rlo)


@pytest.mark.parametrize("seed", [0, 3])
def test_backward_search_counts(seed):
    from genmap_tpu.ops.rank import DeviceIndex

    rng = np.random.default_rng(seed)
    seqs = ["".join(rng.choice(list("ACGT"), size=150)) for _ in range(2)]
    data = _mk(seqs)
    index = DeviceIndex.from_host(data)

    for _ in range(20):
        k = int(rng.integers(1, 8))
        s = int(rng.integers(0, 2))
        i = int(rng.integers(0, 150 - k))
        pat = encode_seq(seqs[s][i : i + k])
        _, size, _ = _backward_search(index, data, list(pat))
        patt = "".join("ACGT"[c] for c in pat)
        comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
        rc = "".join(comp[ch] for ch in reversed(patt))
        expected = 0
        for seq in seqs:
            for hay in (seq,):
                for j in range(len(hay) - k + 1):
                    expected += hay[j : j + k] == patt
                    expected += hay[j : j + k] == rc
        assert size == expected, (patt, size, expected)


@pytest.mark.parametrize("seed", [0, 5])
def test_forward_search_matches_backward(seed):
    """Right-extension (FMD on the rc interval) must give the same counts."""
    import jax.numpy as jnp

    from genmap_tpu.ops.rank import DeviceIndex, extend_all

    rng = np.random.default_rng(seed)
    seqs = ["".join(rng.choice(list("ACGTN"), size=100)) for _ in range(2)]
    data = _mk(seqs)
    index = DeviceIndex.from_host(data)

    for _ in range(20):
        k = int(rng.integers(1, 7))
        s = int(rng.integers(0, 2))
        i = int(rng.integers(0, 100 - k))
        pat = list(encode_seq(seqs[s][i : i + k]))
        flo_b, size_b, _ = _backward_search(index, data, pat)
        # forward: extend right one char at a time
        flo = np.uint32(0)
        rlo = np.uint32(0)
        size = np.uint32(data.parts[0].n_total)
        for ch in pat:
            nmlo, nsize, nolo = _ext(
                index, True, jnp.asarray([rlo]), jnp.asarray([size]), jnp.asarray([flo])
            )
            rlo = np.asarray(nmlo)[0, ch]
            size = np.asarray(nsize)[0, ch]
            flo = np.asarray(nolo)[0, ch]
        assert int(size) == size_b
        assert int(flo) == flo_b


def test_locate_roundtrip():
    import jax.numpy as jnp

    from genmap_tpu.ops.rank import DeviceIndex, locate

    rng = np.random.default_rng(11)
    seqs = ["".join(rng.choice(list("ACGT"), size=80)) for _ in range(3)]
    data = _mk(seqs, sampling=4)
    index = DeviceIndex.from_host(data)

    # locate every unique 6-mer occurrence and verify against the text
    for _ in range(15):
        s = int(rng.integers(0, 3))
        i = int(rng.integers(0, 80 - 6))
        pat = list(encode_seq(seqs[s][i : i + 6]))
        flo, size, _ = _backward_search(index, data, pat)
        rows = np.arange(flo, flo + size, dtype=np.uint32)
        i1, i2 = locate(index, jnp.asarray(rows), jnp.ones(len(rows), bool))
        i1, i2 = np.asarray(i1), np.asarray(i2)
        got = sorted(zip(i1.tolist(), i2.tolist()))
        patt = "".join("ACGT"[c] for c in pat)
        comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
        rcseqs = ["".join(comp[ch] for ch in reversed(seq)) for seq in seqs]
        expected = sorted(
            (sq, j)
            for sq, seq in enumerate(seqs + rcseqs)
            for j in range(len(seq) - 5)
            if seq[j : j + 6] == patt
        )
        assert got == expected


def test_extract_needles_matches_host():
    """On-device needle extraction must equal host-side window slicing."""
    import jax.numpy as jnp

    from genmap_tpu.ops.rank import DeviceText, extract_needles

    rng = np.random.default_rng(21)
    alpha = "ACGTN"
    seqs = ["".join(rng.choice(list(alpha), size=333))]
    data = _mk(seqs)
    dtext = DeviceText.from_host(data)
    text = data.decode_text()

    Ln = 17
    starts = rng.integers(0, len(text), size=64).astype(np.uint32)
    limit = np.uint32(len(text) - 5)  # pretend the file ends early
    got = np.asarray(extract_needles(dtext, jnp.asarray(starts), Ln, limit))
    for i, s in enumerate(starts):
        idx = int(s) + np.arange(Ln)
        exp = np.where(idx < int(limit), text[np.minimum(idx, len(text) - 1)], 0)
        np.testing.assert_array_equal(got[i], exp.astype(np.uint8), err_msg=str(s))
