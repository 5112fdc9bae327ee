import numpy as np

from genmap_tpu.alphabet import decode_seq, encode_seq, revcomp_codes
from genmap_tpu.io.fasta import read_fasta


def test_encode_decode():
    codes = encode_seq("ACGTNacgtnUuRY")
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 3, 3, 4, 4]
    assert decode_seq(np.array([0, 1, 2, 3, 4], np.uint8)) == "ACGTN"


def test_revcomp():
    assert decode_seq(revcomp_codes(encode_seq("ACGTN"))) == "NACGT"


def test_read_fasta(tmp_path):
    p = tmp_path / "g.fa"
    p.write_text(">seq1 description here\nACGT\nACGT\n>seq2\n\n>seq3\nNNNT\n")
    ff = read_fasta(str(p))
    # seq2 is empty and skipped; ids truncated at whitespace (still unique)
    assert ff.ids == ["seq1", "seq3"]
    assert decode_seq(ff.seqs[0]) == "ACGTACGT"
    assert decode_seq(ff.seqs[1]) == "NNNT"


def test_read_fasta_duplicate_short_ids(tmp_path):
    p = tmp_path / "g.fa"
    p.write_text(">s x\nAC\n>s y\nGT\n")
    ff = read_fasta(str(p))
    assert ff.ids == ["s x", "s y"]
