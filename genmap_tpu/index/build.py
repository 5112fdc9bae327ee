"""Host-side index construction.

Pipeline (capability-equivalent to /root/reference/src/seqan_libdivsufsort.h:35-240
and /root/reference/src/indexing.hpp:73-148, re-designed around numpy bulk ops):

    encode text with per-sequence sentinels (ord+1, sentinel=0)
    -> suffix array (native SA-IS or numpy doubling)
    -> BWT + sentinel bitvector
    -> text-order sampled SA + indicator bitvector      (fwd only)
    -> TPU rank rows (see index/fmindex.py)
    repeat with every sequence reversed for the reverse index (BWT only)
"""

from __future__ import annotations

import numpy as np

from genmap_tpu.index.fmindex import COL_SBITS, COL_SCNT, FMIndexData, build_rank_rows
from genmap_tpu.index.suffix import suffix_array
from genmap_tpu.io.fasta import FastaFile


def _make_ctext(seqs: list[np.ndarray]) -> np.ndarray:
    """Concatenate code arrays with ord+1 encoding and sentinel 0 after each."""
    total = sum(len(s) for s in seqs) + len(seqs)
    ctext = np.empty(total, dtype=np.uint8)
    pos = 0
    for s in seqs:
        ctext[pos : pos + len(s)] = s + 1
        pos += len(s)
        ctext[pos] = 0
        pos += 1
    return ctext


def _bwt_of(ctext: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Suffix array -> (sa, bwt codes 0..4, sentinel bits)."""
    sa = suffix_array(ctext)
    n = len(ctext)
    prev = np.where(sa > 0, sa - 1, n - 1)
    bwt_c = ctext[prev]
    sbits = bwt_c == 0
    bwt = np.where(sbits, 0, bwt_c - 1).astype(np.uint8)
    return sa, bwt, sbits


def _pack_text(seqs: list[np.ndarray], has_n: bool) -> tuple[np.ndarray, np.ndarray, int]:
    codes = np.concatenate(seqs) if seqs else np.empty(0, dtype=np.uint8)
    n = len(codes)
    npad = (-n) % 16
    c2 = np.concatenate([np.where(codes >= 4, 0, codes), np.zeros(npad, np.uint8)])
    c2 = c2.astype(np.uint64).reshape(-1, 16)
    words = (c2 << (2 * np.arange(16, dtype=np.uint64))[None, :]).sum(axis=-1)
    words = words.astype(np.uint32)
    if has_n:
        bpad = (-n) % 32
        nb = np.concatenate([(codes == 4), np.zeros(bpad, bool)]).astype(np.uint64)
        nb = nb.reshape(-1, 32)
        nwords = (nb << np.arange(32, dtype=np.uint64)[None, :]).sum(axis=-1)
        nwords = nwords.astype(np.uint32)
    else:
        nwords = np.empty(0, dtype=np.uint32)
    return words, nwords, n


def build_index(
    fasta_files: list[FastaFile], sampling: int = 10, directory: bool = False
) -> FMIndexData:
    """Build a bidirectional FM-index over all sequences of all files.

    TPU-first design choice (diverges from the reference's layout, not its
    semantics): the index covers BOTH strands — every input sequence is
    followed by the reverse complements of all sequences, appended as extra
    sequences in the same order.  One search then counts forward and
    reverse-complement occurrences in a single SA interval (occ_{rc(T)}(w) ==
    occ_T(rc(w))), replacing the reference's second search pass over
    reverse-complemented needles (algo.hpp:284-305).  A strand bitvector over
    SA rows (rank rows in `strand_blocks`) recovers forward-only counts for
    --no-reverse-complement and per-strand CSV splitting.
    """
    from genmap_tpu.alphabet import revcomp_codes

    seqs: list[np.ndarray] = []
    seq_files: list[str] = []
    seq_names: list[str] = []
    for ff in fasta_files:
        for rid, s in zip(ff.ids, ff.seqs):
            seqs.append(np.asarray(s, dtype=np.uint8))
            seq_files.append(ff.name)
            seq_names.append(rid)
    if not seqs:
        raise ValueError("There is no non-empty sequence in the fasta file(s).")

    seq_lens = np.array([len(s) for s in seqs], dtype=np.uint64)
    nseq = len(seqs)

    all_seqs = seqs + [revcomp_codes(s) for s in seqs]
    all_lens = np.concatenate([seq_lens, seq_lens])
    nseq_all = 2 * nseq
    n_total = int(all_lens.sum()) + nseq_all
    if n_total >= 2**32:
        raise NotImplementedError(
            "inputs >= 2 Gbp (both strands + sentinels) need 64-bit rank rows;"
            " not built yet"
        )

    has_n = any(bool((s == 4).any()) for s in seqs)
    alphabet_size = 5 if has_n else 4

    # ---- forward index -----------------------------------------------------
    ctext = _make_ctext(all_seqs)
    sa, bwt, sbits = _bwt_of(ctext)

    # sampled SA in text order (i2 % sampling == 0), skip sentinel rows
    starts = np.zeros(nseq_all + 1, dtype=np.int64)  # ctext start of each sequence
    starts[1:] = np.cumsum(all_lens.astype(np.int64) + 1)
    i1 = np.searchsorted(starts, sa, side="right") - 1
    i2 = sa - starts[i1]
    is_sent = i2 == all_lens.astype(np.int64)[np.minimum(i1, nseq_all - 1)]
    ind = (~is_sent) & (i2 % sampling == 0)
    sa_i1 = i1[ind].astype(np.uint32)
    sa_i2 = i2[ind].astype(np.uint32)

    fwd = build_rank_rows(bwt, sbits, has_n, ind)

    # strand bitvector over SA rows: row points into the rc half
    strand_bits = i1 >= nseq
    strand_blocks = build_rank_rows(
        np.zeros(len(strand_bits), np.uint8), strand_bits, False, None
    ).blocks[:, [COL_SCNT] + list(range(COL_SBITS, COL_SBITS + 4))]

    # C array over real symbols, sentinels smallest
    counts = np.zeros(5, dtype=np.uint64)
    real = ~sbits
    for c in range(5):
        counts[c] = int(((bwt == c) & real).sum())
    C = np.zeros(6, dtype=np.uint64)
    C[0] = nseq_all
    np.cumsum(counts, out=C[1:])
    C[1:] += nseq_all
    assert C[5] == n_total

    # ---- reverse index (each sequence reversed; BWT only) ------------------
    ctext_rev = _make_ctext([s[::-1] for s in all_seqs])
    _, bwt_r, sbits_r = _bwt_of(ctext_rev)
    rev = build_rank_rows(bwt_r, sbits_r, has_n, None)

    text_words, text_nwords, text_len = _pack_text(seqs, has_n)

    return FMIndexData(
        alphabet_size=alphabet_size,
        sampling=sampling,
        directory=directory,
        fwd=fwd,
        rev=rev,
        C=C,
        sa_i1=sa_i1,
        sa_i2=sa_i2,
        strand_blocks=strand_blocks.copy(),
        seq_files=seq_files,
        seq_names=seq_names,
        seq_lens=seq_lens,
        text_words=text_words,
        text_nwords=text_nwords,
        text_len=text_len,
    )
