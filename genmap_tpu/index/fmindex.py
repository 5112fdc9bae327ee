"""Bidirectional FMD-index, laid out for TPU rank queries.

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

The suffix-array sampling indicator lives in a SEPARATE small table
(`IndexPart.ind_blocks`): it is only read by `locate`, and keeping it out of
the main rows cuts ~20-25% off the bytes every hot-path rank gather moves.

True per-character prefix counts are recovered by subtracting sentinel/N
counts from the raw field counts (N never collides: it is the *last* symbol in
the order A<C<G<T<N, so `smaller-than` counts for bidirectional synchronisation
never need N-specific prefix ranks).

Because the text always contains BOTH strands, bidirectional search needs only
this ONE table (the FMD trick, cf. Heng Li's fermi FMD-index): appending char
c on the right of a pattern P equals prepending comp(c) to rc(P), whose
interval lives in the same BWT.  The reference instead keeps a second BWT of
the reversed text (/root/reference/src/genmap_helper.hpp:88-95); dropping it
halves index memory and construction work.

Genomes whose both-strand symbol count would exceed uint32 range are split
into PARTS: groups of whole input sequences, each with its own FMD table over
its sequences + their reverse complements.  Occurrence counts are exact under
this split (matches never cross sequence boundaries), so per-part counts
simply add up — this is also the multi-chip sharding axis (one part per
device group, merged with psum).  The reference instead dispatches to wider
integer types (/root/reference/src/indexing.hpp:151-170).

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

# chunk size (in BLOCK-aligned symbols) for bounded-memory construction
_CHUNK = 64 * 1024 * 1024


def _ncols(has_n: bool) -> int:
    return _BASE_COLS + 5 * int(has_n)


def _col_ncnt(has_n: bool) -> int:
    return _BASE_COLS  # valid only when has_n


@dataclass
class RankRows:
    """Rank rows for one BWT."""

    blocks: np.ndarray  # [nblocks, ncols] uint32
    has_n: bool
    length: int  # number of BWT symbols (= text length incl. sentinels)

    @property
    def ncols(self) -> int:
        return _ncols(self.has_n)


def _pack_words(codes2: np.ndarray, nblocks: int) -> np.ndarray:
    """Pack 2-bit codes [nblocks*BLOCK] into uint32 words [nblocks, WORDS]."""
    c = codes2.astype(np.uint32).reshape(nblocks, WORDS, 16)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, None, :]
    out = c << shifts
    return np.bitwise_or.reduce(out, axis=-1)


def _pack_bits(bits: np.ndarray, nblocks: int) -> np.ndarray:
    """Pack bool bits [nblocks*BLOCK] into uint32 words [nblocks, BITWORDS]."""
    b = bits.astype(np.uint32).reshape(nblocks, BITWORDS, 32)
    shifts = np.arange(32, dtype=np.uint32)[None, None, :]
    return np.bitwise_or.reduce(b << shifts, axis=-1)


def _exclusive_cumsum_into(per_block: np.ndarray, out: np.ndarray) -> None:
    """out[i] = sum(per_block[:i]) as uint32 (counts fit by construction)."""
    acc = np.cumsum(per_block, dtype=np.uint64)
    out[0] = 0
    out[1:] = acc[:-1].astype(np.uint32)


def build_rank_rows(bwt: np.ndarray, sbits: np.ndarray, has_n: bool) -> RankRows:
    """Build rank rows from BWT codes (0..4) and sentinel bits.

    `bwt[i]` is the real symbol code at BWT position i (value irrelevant where
    `sbits[i]` is set).  Processes the input in bounded chunks so
    multi-gigabase BWTs don't blow up host memory with full-length
    temporaries.
    """
    n = int(len(bwt))
    nblocks = n // BLOCK + 1  # always one extra row so queries at p == n work

    ncols = _ncols(has_n)
    blocks = np.zeros((nblocks, ncols), dtype=np.uint32)
    # per-block counts, accumulated chunk by chunk, cumsum'd at the end
    le_pb = np.zeros((3, nblocks), dtype=np.uint32)
    s_pb = np.zeros(nblocks, dtype=np.uint32)
    n_pb = np.zeros(nblocks, dtype=np.uint32) if has_n else None

    cn = _col_ncnt(has_n)
    for c0 in range(0, nblocks * BLOCK, _CHUNK):
        c1 = min(c0 + _CHUNK, nblocks * BLOCK)
        b0, b1 = c0 // BLOCK, c1 // BLOCK
        m = c1 - c0
        bwt_p = np.zeros(m, dtype=np.uint8)
        sbits_p = np.zeros(m, dtype=bool)
        take = max(0, min(c1, n) - c0)
        if take:
            bwt_p[:take] = bwt[c0 : c0 + take]
            sbits_p[:take] = sbits[c0 : c0 + take]
        nb = b1 - b0

        codes2 = np.where((bwt_p >= 4) | sbits_p, 0, bwt_p).astype(np.uint8)
        blocks[b0:b1, COL_WORDS : COL_WORDS + WORDS] = _pack_words(codes2, nb)
        c2 = codes2.reshape(nb, BLOCK)
        for k in range(3):
            le_pb[k, b0:b1] = (c2 <= k).sum(axis=1, dtype=np.uint32)

        sb = sbits_p.reshape(nb, BLOCK)
        s_pb[b0:b1] = sb.sum(axis=1, dtype=np.uint32)
        blocks[b0:b1, COL_SBITS : COL_SBITS + BITWORDS] = _pack_bits(sbits_p, nb)

        if has_n:
            nbits_p = (bwt_p == 4) & ~sbits_p
            n_pb[b0:b1] = nbits_p.reshape(nb, BLOCK).sum(axis=1, dtype=np.uint32)
            blocks[b0:b1, cn + 1 : cn + 1 + BITWORDS] = _pack_bits(nbits_p, nb)

    for k in range(3):
        _exclusive_cumsum_into(le_pb[k], blocks[:, COL_LE + k])
    _exclusive_cumsum_into(s_pb, blocks[:, COL_SCNT])
    if has_n:
        _exclusive_cumsum_into(n_pb, blocks[:, cn])

    return RankRows(blocks=blocks, has_n=has_n, length=n)


@dataclass
class IndexPart:
    """One FMD sub-index over a contiguous group of input sequences.

    Covers input sequences [seq_off, seq_off + nseq_part) plus their reverse
    complements (local sequence ids nseq_part..2*nseq_part-1 in the same
    order).
    """

    fwd: RankRows
    C: np.ndarray  # [6] uint64: C[c] = 2*nseq_part + #chars < c ; C[5] = n_total
    sa_i1: np.ndarray  # sampled SA values, local sequence number (uint32)
    sa_i2: np.ndarray  # sampled SA values, sequence position (uint32)
    # rank rows of the strand bitvector over SA rows (rc-half suffixes):
    # [nblocks, 5] uint32 = absolute count + 4 bitvector words per 128 rows
    strand_blocks: np.ndarray
    # rank rows of the SA-sampling indicator bitvector (same [nblocks, 5]
    # layout); only `locate` reads these
    ind_blocks: np.ndarray
    seq_off: int
    nseq_part: int

    @property
    def n_total(self) -> int:
        return int(self.C[5])


@dataclass
class FMIndexData:
    """Host-side FMD-index (one or more parts) + metadata.

    Equivalent capability to the reference's persisted index directory
    (.txt/.sa/.lf/.rev.lf fibres + index.info + index.ids,
    /root/reference/src/genmap_helper.hpp:71-127) in a TPU-friendly layout.
    """

    alphabet_size: int  # 4 or 5
    sampling: int
    directory: bool  # was the index built from a fasta directory?
    parts: list  # list[IndexPart]
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
            "format_version": 3,  # v3: FMD (single BWT), sub-index parts
            "alphabet_size": self.alphabet_size,
            "sampling_rate": self.sampling,
            "fasta_directory": self.directory,
            "text_len": self.text_len,
            "parts": [
                {
                    "length": p.fwd.length,
                    "seq_off": p.seq_off,
                    "nseq_part": p.nseq_part,
                }
                for p in self.parts
            ],
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        # .ids equivalent: fastaFile;length;chromName per sequence
        # (reference format: src/indexing.hpp:268-274)
        with open(os.path.join(path, "index.ids"), "w") as f:
            for fn, ln, nm in zip(self.seq_files, self.seq_lens, self.seq_names):
                f.write(f"{fn};{int(ln)};{nm}\n")
        for i, p in enumerate(self.parts):
            np.save(os.path.join(path, f"p{i}_blocks.npy"), p.fwd.blocks)
            np.save(os.path.join(path, f"p{i}_C.npy"), p.C)
            np.save(os.path.join(path, f"p{i}_sa_i1.npy"), p.sa_i1)
            np.save(os.path.join(path, f"p{i}_sa_i2.npy"), p.sa_i2)
            np.save(os.path.join(path, f"p{i}_strand.npy"), p.strand_blocks)
            np.save(os.path.join(path, f"p{i}_ind.npy"), p.ind_blocks)
        np.save(os.path.join(path, "text_words.npy"), self.text_words)
        np.save(os.path.join(path, "text_nwords.npy"), self.text_nwords)

    @staticmethod
    def load(path: str, mmap: bool = False) -> "FMIndexData":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        if meta.get("format_version") != 3:
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
        parts = []
        for i, pm in enumerate(meta["parts"]):
            fwd = RankRows(
                blocks=np.load(os.path.join(path, f"p{i}_blocks.npy"), mmap_mode=mm),
                has_n=has_n,
                length=pm["length"],
            )
            parts.append(
                IndexPart(
                    fwd=fwd,
                    C=np.load(os.path.join(path, f"p{i}_C.npy")),
                    sa_i1=np.load(os.path.join(path, f"p{i}_sa_i1.npy"), mmap_mode=mm),
                    sa_i2=np.load(os.path.join(path, f"p{i}_sa_i2.npy"), mmap_mode=mm),
                    strand_blocks=np.load(
                        os.path.join(path, f"p{i}_strand.npy"), mmap_mode=mm
                    ),
                    ind_blocks=np.load(
                        os.path.join(path, f"p{i}_ind.npy"), mmap_mode=mm
                    ),
                    seq_off=pm["seq_off"],
                    nseq_part=pm["nseq_part"],
                )
            )
        return FMIndexData(
            alphabet_size=meta["alphabet_size"],
            sampling=meta["sampling_rate"],
            directory=meta["fasta_directory"],
            parts=parts,
            seq_files=seq_files,
            seq_names=seq_names,
            seq_lens=np.asarray(seq_lens, dtype=np.uint64),
            text_words=np.load(os.path.join(path, "text_words.npy"), mmap_mode=mm),
            text_nwords=np.load(os.path.join(path, "text_nwords.npy"), mmap_mode=mm),
            text_len=meta["text_len"],
        )
