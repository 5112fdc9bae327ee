"""Bidirectional FM-index, laid out for TPU rank queries.

Design (TPU-first, not a port of SeqAn's EPR dictionaries — see SURVEY.md §7):

The BWT of the sentinel-separated concatenated text is stored as *rank rows*:
one row of uint32 per 128 BWT symbols that contains everything a rank query at
any position inside the block needs, so a batched rank/LF step is ONE row
gather per query position plus vectorized popcounts:

    cols  0..7   eight uint32 words of 2-bit symbol codes (16 symbols/word);
                 N (code 4) and sentinels are stored as code 0 in the words
                 and marked in separate bitvectors
    cols  8..10  absolute counts at block start of fields <=0, <=1, <=2
                 (raw 2-bit field values)
    col   11     absolute sentinel count at block start
    cols 12..15  sentinel bitvector for the block (4 x 32 bits)
    [Dna5 only]
    col   16     absolute N count at block start
    cols 17..20  N bitvector
    [fwd index only — suffix-array sampling indicator]
    col   next   absolute indicator count at block start
    cols  +1..+4 indicator bitvector

True per-character prefix counts are recovered by subtracting sentinel/N
counts from the raw field counts (N never collides: it is the *last* symbol in
the order A<C<G<T<N, so `smaller-than` counts for bidirectional synchronisation
never need N-specific prefix ranks).

This mirrors the *capability* of SeqAn's Levels/EPR prefix-rank dictionaries
(reference config /root/reference/src/common.hpp:38-49) with a layout chosen
for TPU row gathers instead of cache lines.

The suffix array is sampled in text order (i2 % sampling == 0), skipping
sentinel positions, with an indicator bitvector over SA rows — the same
sampling scheme as /root/reference/src/seqan_libdivsufsort.h:106-147.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

BLOCK = 128  # symbols per rank row
WORDS = BLOCK // 16  # 2-bit words per row
BITWORDS = BLOCK // 32  # bitvector words per row

# column offsets
COL_WORDS = 0
COL_LE = 8
COL_SCNT = 11
COL_SBITS = 12
_BASE_COLS = 16


def _ncols(has_n: bool, has_ind: bool) -> int:
    return _BASE_COLS + 5 * int(has_n) + 5 * int(has_ind)


def _col_ncnt(has_n: bool) -> int:
    return _BASE_COLS  # valid only when has_n


def _col_icnt(has_n: bool) -> int:
    return _BASE_COLS + 5 * int(has_n)


@dataclass
class RankRows:
    """Rank rows for one BWT direction."""

    blocks: np.ndarray  # [nblocks, ncols] uint32
    has_n: bool
    has_ind: bool
    length: int  # number of BWT symbols (= text length incl. sentinels)

    @property
    def ncols(self) -> int:
        return _ncols(self.has_n, self.has_ind)


def _pack_words(codes2: np.ndarray, nblocks: int) -> np.ndarray:
    """Pack 2-bit codes [nblocks*BLOCK] into uint32 words [nblocks, WORDS]."""
    c = codes2.astype(np.uint64).reshape(nblocks, WORDS, 16)
    shifts = (2 * np.arange(16, dtype=np.uint64))[None, None, :]
    return (c << shifts).sum(axis=-1).astype(np.uint32)


def _pack_bits(bits: np.ndarray, nblocks: int) -> np.ndarray:
    """Pack bool bits [nblocks*BLOCK] into uint32 words [nblocks, BITWORDS]."""
    b = bits.astype(np.uint64).reshape(nblocks, BITWORDS, 32)
    shifts = np.arange(32, dtype=np.uint64)[None, None, :]
    return (b << shifts).sum(axis=-1).astype(np.uint32)


def _abs_counts(per_block: np.ndarray) -> np.ndarray:
    """Exclusive cumulative sum over blocks -> absolute count at block start."""
    out = np.zeros_like(per_block, dtype=np.uint64)
    np.cumsum(per_block[:-1], axis=0, out=out[1:]) if per_block.ndim == 1 else None
    if per_block.ndim == 1:
        return out.astype(np.uint32)
    out = np.zeros(per_block.shape, dtype=np.uint64)
    out[1:] = np.cumsum(per_block[:-1], axis=0)
    return out.astype(np.uint32)


def build_rank_rows(
    bwt: np.ndarray, sbits: np.ndarray, has_n: bool, ind: np.ndarray | None
) -> RankRows:
    """Build rank rows from BWT codes (0..4), sentinel bits, optional indicator bits.

    `bwt[i]` is the real symbol code at BWT position i (value irrelevant where
    `sbits[i]` is set).  `ind`, if given, is the SA-sampling indicator.
    """
    n = int(len(bwt))
    has_ind = ind is not None
    nblocks = n // BLOCK + 1  # always one extra row so queries at p == n work
    pad = nblocks * BLOCK - n

    bwt_p = np.concatenate([bwt, np.zeros(pad, dtype=bwt.dtype)])
    sbits_p = np.concatenate([sbits, np.zeros(pad, dtype=bool)])
    nbits_p = (bwt_p == 4) & ~sbits_p if has_n else None

    codes2 = np.where((bwt_p >= 4) | sbits_p, 0, bwt_p).astype(np.uint8)

    ncols = _ncols(has_n, has_ind)
    blocks = np.zeros((nblocks, ncols), dtype=np.uint32)
    blocks[:, COL_WORDS : COL_WORDS + WORDS] = _pack_words(codes2, nblocks)

    c2 = codes2.reshape(nblocks, BLOCK)
    for k in range(3):
        per_block = (c2 <= k).sum(axis=1).astype(np.uint64)
        blocks[:, COL_LE + k] = _abs_counts(per_block)

    sb = sbits_p.reshape(nblocks, BLOCK)
    blocks[:, COL_SCNT] = _abs_counts(sb.sum(axis=1).astype(np.uint64))
    blocks[:, COL_SBITS : COL_SBITS + BITWORDS] = _pack_bits(sbits_p, nblocks)

    if has_n:
        cn = _col_ncnt(has_n)
        nb = nbits_p.reshape(nblocks, BLOCK)
        blocks[:, cn] = _abs_counts(nb.sum(axis=1).astype(np.uint64))
        blocks[:, cn + 1 : cn + 1 + BITWORDS] = _pack_bits(nbits_p, nblocks)

    if has_ind:
        ci = _col_icnt(has_n)
        ind_p = np.concatenate([ind.astype(bool), np.zeros(pad, dtype=bool)])
        ib = ind_p.reshape(nblocks, BLOCK)
        blocks[:, ci] = _abs_counts(ib.sum(axis=1).astype(np.uint64))
        blocks[:, ci + 1 : ci + 1 + BITWORDS] = _pack_bits(ind_p, nblocks)

    return RankRows(blocks=blocks, has_n=has_n, has_ind=has_ind, length=n)


@dataclass
class FMIndexData:
    """Host-side bidirectional FM-index + metadata (device upload happens later).

    Equivalent capability to the reference's persisted index directory
    (.txt/.sa/.lf/.rev.lf fibres + index.info + index.ids,
    /root/reference/src/genmap_helper.hpp:71-127) in a TPU-friendly layout.
    """

    alphabet_size: int  # 4 or 5
    sampling: int
    directory: bool  # was the index built from a fasta directory?
    fwd: RankRows
    rev: RankRows
    C: np.ndarray  # [6] uint64: C[c] = nseq_all + #chars < c ; C[5] = n_total
    sa_i1: np.ndarray  # sampled SA values, sequence number (uint32)
    sa_i2: np.ndarray  # sampled SA values, sequence position (uint32)
    # rank rows of the strand bitvector over SA rows (rc-half suffixes):
    # [nblocks, 5] uint32 = absolute count + 4 bitvector words per 128 rows
    strand_blocks: np.ndarray
    # directory information: per INPUT sequence (the rc half is implicit)
    seq_files: list[str]  # source fasta file name per sequence
    seq_names: list[str]
    seq_lens: np.ndarray  # uint64
    # packed concatenated text (no sentinels): 2-bit words + N bitmask words
    text_words: np.ndarray  # uint32
    text_nwords: np.ndarray  # uint32 (empty for Dna4)
    text_len: int

    @property
    def has_n(self) -> bool:
        return self.alphabet_size == 5

    @property
    def nseq(self) -> int:
        return len(self.seq_names)

    @property
    def n_total(self) -> int:
        return int(self.C[5])

    # ---- text access -------------------------------------------------------

    def decode_text(self) -> np.ndarray:
        """Decode the packed concatenated text to uint8 codes 0..4."""
        nw = len(self.text_words)
        shifts = 2 * np.arange(16, dtype=np.uint32)
        codes = (
            (self.text_words[:, None] >> shifts[None, :]) & np.uint32(3)
        ).astype(np.uint8).reshape(nw * 16)[: self.text_len]
        if self.has_n and len(self.text_nwords):
            bshifts = np.arange(32, dtype=np.uint32)
            nbits = (
                (self.text_nwords[:, None] >> bshifts[None, :]) & np.uint32(1)
            ).astype(bool).reshape(-1)[: self.text_len]
            codes = np.where(nbits, np.uint8(4), codes)
        return codes

    # ---- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        meta = {
            "format_version": 2,  # v2: both-strand text, strand rank rows
            "alphabet_size": self.alphabet_size,
            "sampling_rate": self.sampling,
            "fasta_directory": self.directory,
            "text_len": self.text_len,
            "fwd_length": self.fwd.length,
            "rev_length": self.rev.length,
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        # .ids equivalent: fastaFile;length;chromName per sequence
        # (reference format: src/indexing.hpp:268-274)
        with open(os.path.join(path, "index.ids"), "w") as f:
            for fn, ln, nm in zip(self.seq_files, self.seq_lens, self.seq_names):
                f.write(f"{fn};{int(ln)};{nm}\n")
        np.save(os.path.join(path, "fwd_blocks.npy"), self.fwd.blocks)
        np.save(os.path.join(path, "rev_blocks.npy"), self.rev.blocks)
        np.save(os.path.join(path, "C.npy"), self.C)
        np.save(os.path.join(path, "sa_i1.npy"), self.sa_i1)
        np.save(os.path.join(path, "sa_i2.npy"), self.sa_i2)
        np.save(os.path.join(path, "strand_blocks.npy"), self.strand_blocks)
        np.save(os.path.join(path, "text_words.npy"), self.text_words)
        np.save(os.path.join(path, "text_nwords.npy"), self.text_nwords)

    @staticmethod
    def load(path: str, mmap: bool = False) -> "FMIndexData":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        if meta.get("format_version") != 2:
            raise ValueError(
                f"unsupported index format_version {meta.get('format_version')};"
                " rebuild the index with this version of genmap-tpu"
            )
        mm = "r" if mmap else None
        seq_files, seq_names, seq_lens = [], [], []
        with open(os.path.join(path, "index.ids")) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                first = line.find(";")
                second = line.find(";", first + 1)
                seq_files.append(line[:first])
                seq_lens.append(int(line[first + 1 : second]))
                seq_names.append(line[second + 1 :])
        has_n = meta["alphabet_size"] == 5
        fwd = RankRows(
            blocks=np.load(os.path.join(path, "fwd_blocks.npy"), mmap_mode=mm),
            has_n=has_n,
            has_ind=True,
            length=meta["fwd_length"],
        )
        rev = RankRows(
            blocks=np.load(os.path.join(path, "rev_blocks.npy"), mmap_mode=mm),
            has_n=has_n,
            has_ind=False,
            length=meta["rev_length"],
        )
        return FMIndexData(
            alphabet_size=meta["alphabet_size"],
            sampling=meta["sampling_rate"],
            directory=meta["fasta_directory"],
            fwd=fwd,
            rev=rev,
            C=np.load(os.path.join(path, "C.npy")),
            sa_i1=np.load(os.path.join(path, "sa_i1.npy"), mmap_mode=mm),
            sa_i2=np.load(os.path.join(path, "sa_i2.npy"), mmap_mode=mm),
            strand_blocks=np.load(os.path.join(path, "strand_blocks.npy"), mmap_mode=mm),
            seq_files=seq_files,
            seq_names=seq_names,
            seq_lens=np.asarray(seq_lens, dtype=np.uint64),
            text_words=np.load(os.path.join(path, "text_words.npy"), mmap_mode=mm),
            text_nwords=np.load(os.path.join(path, "text_nwords.npy"), mmap_mode=mm),
            text_len=meta["text_len"],
        )
