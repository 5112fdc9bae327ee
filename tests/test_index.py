import numpy as np
import pytest

from genmap_tpu.alphabet import encode_seq
from genmap_tpu.index.build import _make_ctext, build_index
from genmap_tpu.index.fmindex import FMIndexData
from genmap_tpu.index.suffix import suffix_array_numpy
from genmap_tpu.io.fasta import FastaFile


def naive_sa(t: np.ndarray) -> np.ndarray:
    return np.array(sorted(range(len(t)), key=lambda i: t[i:].tobytes()), dtype=np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("alpha", [4, 6])
def test_suffix_array_matches_naive(seed, alpha):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, alpha, size=rng.integers(1, 300), dtype=np.uint8)
    np.testing.assert_array_equal(suffix_array_numpy(t), naive_sa(t))


def _mk_files(seqs_strs, name="genome.fa"):
    ff = FastaFile(name=name)
    ff.ids = [f"seq{i}" for i in range(len(seqs_strs))]
    ff.seqs = [encode_seq(s) for s in seqs_strs]
    return [ff]


def test_build_index_basic():
    data = build_index(_mk_files(["ACGTACGT", "TTTT"]), sampling=3)
    assert data.alphabet_size == 4
    assert len(data.parts) == 1
    part = data.parts[0]
    # both strands are indexed: 4 sequences, 24 bases, 4 sentinels
    assert part.n_total == 2 * (8 + 4) + 4
    # C: 4 sentinels; counts over both strands (rc adds ACGTACGT + AAAA):
    # A 2+2+4=8, C 2+2=4, G 2+2=4, T 6+2=8
    assert list(part.C) == [4, 12, 16, 20, 28, 28]
    np.testing.assert_array_equal(data.decode_text(), encode_seq("ACGTACGTTTTT"))


def test_build_index_dna5_and_roundtrip(tmp_path):
    data = build_index(_mk_files(["ACGNNACG", "TNT"]), sampling=2)
    assert data.alphabet_size == 5
    np.testing.assert_array_equal(data.decode_text(), encode_seq("ACGNNACGTNT"))
    data.save(str(tmp_path / "idx"))
    d2 = FMIndexData.load(str(tmp_path / "idx"))
    np.testing.assert_array_equal(d2.parts[0].fwd.blocks, data.parts[0].fwd.blocks)
    np.testing.assert_array_equal(d2.parts[0].sa_i1, data.parts[0].sa_i1)
    np.testing.assert_array_equal(d2.decode_text(), data.decode_text())
    assert d2.seq_names == ["seq0", "seq1"]
    assert list(d2.seq_lens) == [8, 3]


def test_decode_slice_matches_full_decode():
    # odd offsets/lengths across word (16) and N-bit word (32) boundaries
    rng = np.random.default_rng(5)
    seq = rng.integers(0, 5, size=211, dtype=np.uint8)
    s = "".join("ACGTN"[v] for v in seq)
    data = build_index(_mk_files([s]), sampling=3)
    full = data.decode_text()
    for start, length in [(0, 211), (1, 16), (15, 3), (16, 32), (17, 33),
                          (31, 64), (63, 100), (200, 50), (210, 1), (211, 5)]:
        np.testing.assert_array_equal(
            data.decode_slice(start, length), full[start : start + length],
            err_msg=f"slice ({start}, {length})",
        )


def test_ctext_layout():
    ct = _make_ctext([encode_seq("ACG"), encode_seq("TN")])
    assert list(ct) == [1, 2, 3, 0, 4, 5, 0]


def test_build_index_multipart_roundtrip(tmp_path):
    """Small part limit forces a split; parts must cover all sequences and
    survive persistence."""
    seqs = ["ACGTACGTAC", "TTGACTGA", "GGGCATCA", "ATAT"]
    data = build_index(_mk_files(seqs), sampling=2, max_part_symbols=30)
    assert len(data.parts) >= 2
    assert sum(p.nseq_part for p in data.parts) == len(seqs)
    offs = [p.seq_off for p in data.parts]
    assert offs == sorted(offs) and offs[0] == 0
    for p in data.parts:
        assert p.n_total <= 30
    data.save(str(tmp_path / "idx"))
    d2 = FMIndexData.load(str(tmp_path / "idx"))
    assert len(d2.parts) == len(data.parts)
    for a, b in zip(d2.parts, data.parts):
        np.testing.assert_array_equal(a.fwd.blocks, b.fwd.blocks)
        np.testing.assert_array_equal(a.C, b.C)
        assert (a.seq_off, a.nseq_part) == (b.seq_off, b.nseq_part)
