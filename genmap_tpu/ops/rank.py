"""Batched FM-index rank / LF primitives.

Every rank query gathers ONE paired rank row (see index/fmindex.py layout)
and finishes with vectorized popcounts on the VPU — this is the TPU-native
equivalent of the constant-time EPR prefix-rank queries the reference gets
from SeqAn (config /root/reference/src/common.hpp:38-49; hot call sites
/root/reference/src/algo.hpp and find2_index_approx.hpp via goDown/goRight).

The layout follows a measured property of the TPU gather engine: random row
gathers cost ~5-7 ns PER ROW independent of row width up to ~512 bytes
(NOTES.md).  A paired row covers 1024 BWT symbols, so:

  * `extend_core_fast` — ONE gather per search state (at sub-row lo>>9)
    serves the rank queries at BOTH interval bounds whenever the interval
    fits the gathered 1024-symbol window (always true for size <= 512).
    States whose interval is wider return a `far` flag; the search engine
    escalates those blocks to an exact tier.
  * `extend_core` — the exact path: one gather per bound (each using the
    first half of its paired row); used for the large-interval steps at the
    start of a search and for escalation tiers.

Bidirectional search uses the FMD scheme over the single both-strand BWT
(see index/fmindex.py): a pattern P is tracked as the interval pair
(I(P), I(rc(P))) in the SAME index.  Left-extension by c is a plain LF step
on I(P); right-extension by c is a left-extension of I(rc(P)) by comp(c).
The companion interval's offset update uses the strand symmetry
occ(rc(P)·d) = occ(comp(d)·P), which turns into suffix sums of the per-char
slice counts — no second index and no extra gathers.  This replaces the
two-table bidirectional iterator of the reference (SeqAn's
BidirectionalIndex, /root/reference/src/common.hpp:51-52).

All functions are shape-polymorphic over a leading batch shape and jit/vmap
friendly.  Positions, interval bounds and counts are uint32; each index part
is capped below 2^32 symbols (multi-part indexes cover larger genomes).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from genmap_tpu.index.fmindex import (
    BVWORDS,
    D_CUM,
    D_DELTA,
    D_MONO,
    D_WIDTH,
    SUBBITS,
    SUBWORDS,
    S_LE,
    S_SBITS,
    S_SCNT,
    S_WORDS,
    FMIndexData,
    IndexPart,
    _col_ncnt,
    sub_width,
    wide_rows,
)

_U32 = jnp.uint32
_I32 = jnp.int32
_MASK55 = np.uint32(0x55555555)
_FULL = np.uint32(0xFFFFFFFF)

# complement permutation over candidate characters (N is self-complementary)
_COMP4 = np.array([3, 2, 1, 0], dtype=np.int32)
_COMP5 = np.array([3, 2, 1, 0, 4], dtype=np.int32)


# Max seeded prefix length; tables hold all levels 0..t0 where t0 is chosen
# per index part (seed_depth): deeper tables each replace one rank-gather
# round of EVERY plan's infix scan (the probe's hot loop), and the size is
# sum 4^t ~ (4/3)·4^t0 entries x 8 B — t0=12 is ~179 MB per part, paying for
# itself at genome scale; small parts stop where their intervals are empty
# anyway (and where the table build would dwarf the part).
SEED_T0 = 12


def seed_depth(n_total: int, t0_max: int = SEED_T0) -> int:
    """Seed-table depth for a part of n_total (both-strand) symbols."""
    import math

    return max(1, min(t0_max, math.ceil(math.log(max(2, n_total), 4))))


def seed_level_offset(t: int) -> int:
    """Start of the level-t block in the concatenated seed tables: levels are
    stored back to back, level t holding 4^t entries in big-endian code
    order (code(w) = sum w_i * 4^(t-1-i))."""
    return (4**t - 1) // 3


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DeviceIndex:
    """Device-resident FMD-index part (paired rank rows)."""

    fwd_blocks: jax.Array  # [nb, 2*sub_width] uint32 paired rows
    C: jax.Array  # [6] uint32
    sa_i1: jax.Array  # sampled SA values
    sa_i2: jax.Array
    strand_blocks: jax.Array  # [nb128, 5] uint32: rc-strand ranks over SA rows
    ind_blocks: jax.Array  # [nb128, 5] uint32: SA-sampling indicator ranks
    # interval seed tables over all ACGT strings of length 0..SEED_T0
    # (levels concatenated, see seed_level_offset); length-1 array = disabled
    seed_mlo: jax.Array
    seed_size: jax.Array
    # dimer rank rows (paired [nb, 2*D_WIDTH]) + C2[16]; length-1 = disabled
    dimer_blocks: jax.Array
    C2: jax.Array
    has_n: bool = field(metadata={"static": True})
    sampling: int = field(metadata={"static": True})
    n_total: int = field(metadata={"static": True})
    # depth of the attached seed tables (0 = disabled); static so the search
    # engine's seeded-prefix length is a trace-time constant
    seed_t0: int = field(default=0, metadata={"static": True})

    @property
    def has_seed(self) -> bool:
        return self.seed_mlo.shape[0] > 1

    @property
    def has_dimer(self) -> bool:
        return self.dimer_blocks.shape[0] > 1

    @property
    def nchars(self) -> int:
        return 5 if self.has_n else 4

    @staticmethod
    def from_part(
        data: FMIndexData, part: IndexPart, light: bool = False
    ) -> "DeviceIndex":
        """Upload one part.  `light=True` skips the sampled-SA values and the
        sampling-indicator rank rows — several GB at hg38 scale that only
        `locate` (CSV / exclude-pseudo) reads."""
        index = DeviceIndex(
            fwd_blocks=jnp.asarray(wide_rows(np.asarray(part.fwd.blocks))),
            C=jnp.asarray(part.C.astype(np.uint32)),
            sa_i1=jnp.zeros(1, _U32) if light else jnp.asarray(part.sa_i1),
            sa_i2=jnp.zeros(1, _U32) if light else jnp.asarray(part.sa_i2),
            strand_blocks=jnp.asarray(part.strand_blocks),
            ind_blocks=jnp.zeros((1, 5), _U32)
            if light
            else jnp.asarray(part.ind_blocks),
            seed_mlo=jnp.zeros(1, _U32),
            seed_size=jnp.zeros(1, _U32),
            dimer_blocks=jnp.asarray(wide_rows(np.asarray(part.dimer)))
            if part.dimer is not None
            else jnp.zeros((1, 2 * D_WIDTH), _U32),
            C2=jnp.asarray(part.C2)
            if part.C2 is not None
            else jnp.zeros(16, _U32),
            has_n=data.has_n,
            sampling=data.sampling,
            n_total=part.n_total,
        )
        return with_seed_tables(index)

    @staticmethod
    def from_host(data: FMIndexData) -> "DeviceIndex":
        """Single-part convenience constructor."""
        assert len(data.parts) == 1, "use from_part for multi-part indexes"
        return DeviceIndex.from_part(data, data.parts[0])


def _field_masks(off: jax.Array) -> jax.Array:
    """Per-word 2-bit-field masks selecting fields < off.  off: [...] int32."""
    nf = jnp.clip(off[..., None] - 16 * jnp.arange(SUBWORDS, dtype=_I32), 0, 16)
    sh = jnp.minimum(2 * nf, 31).astype(_U32)
    return jnp.where(nf >= 16, _FULL, (_U32(1) << sh) - _U32(1))


def _bit_masks(off: jax.Array, words: int) -> jax.Array:
    """Per-word bit masks selecting bits < off."""
    nb = jnp.clip(off[..., None] - 32 * jnp.arange(words, dtype=_I32), 0, 32)
    sh = jnp.minimum(nb, 31).astype(_U32)
    return jnp.where(nb >= 32, _FULL, (_U32(1) << sh) - _U32(1))


def _popcount_sum(x: jax.Array) -> jax.Array:
    return jax.lax.population_count(x).sum(axis=-1, dtype=_U32)


def _occ_sub(sub: jax.Array, p: jax.Array, has_n: bool) -> tuple[jax.Array, jax.Array]:
    """Per-character occurrence counts + sentinel count at position p.

    `sub` must be the 512-symbol sub-row covering p (its block start at
    (p >> 9) << 9).  Returns (occ [..., A], sent [...]), both uint32:
      occ[c] = #{i < p : BWT[i] == c},  sent = #{i < p : BWT[i] sentinel}.
    """
    off = (p & _U32(511)).astype(_I32)
    fmask = _field_masks(off)
    w = sub[..., S_WORDS : S_WORDS + SUBWORDS]
    hi = w >> _U32(1)
    le0 = _popcount_sum(~(w | hi) & _MASK55 & fmask)
    le1 = _popcount_sum(~hi & _MASK55 & fmask)
    le2 = _popcount_sum(~(hi & w) & _MASK55 & fmask)

    bmask = _bit_masks(off, SUBBITS)
    sent = sub[..., S_SCNT] + _popcount_sum(
        sub[..., S_SBITS : S_SBITS + SUBBITS] & bmask
    )
    if has_n:
        cn = _col_ncnt(has_n)
        ncnt = sub[..., cn] + _popcount_sum(sub[..., cn + 1 : cn + 1 + SUBBITS] & bmask)
    else:
        ncnt = jnp.zeros_like(sent)

    le0 = sub[..., S_LE + 0] + le0 - sent - ncnt
    le1 = sub[..., S_LE + 1] + le1 - sent - ncnt
    le2 = sub[..., S_LE + 2] + le2 - sent - ncnt
    le3 = p - sent - ncnt
    occ = [le0, le1 - le0, le2 - le1, le3 - le2]
    if has_n:
        occ.append(ncnt)
    return jnp.stack(occ, axis=-1), sent


def _half_sub(rows: jax.Array, q: jax.Array, p: jax.Array, subw: int) -> jax.Array:
    """Select the sub-row of a gathered paired row that covers position p.

    Correct iff (p >> 9) - q <= 1 (the caller's `far` contract)."""
    half = ((p >> _U32(9)).astype(_I32) - q) > 0
    return jnp.where(half[..., None], rows[..., subw:], rows[..., :subw])


def _fmd_tail(
    index: "DeviceIndex",
    occ_lo: jax.Array,
    occ_hi: jax.Array,
    sent_lo: jax.Array,
    sent_hi: jax.Array,
    olo: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Shared FMD extension arithmetic from the two bounds' counts."""
    occ_sl = occ_hi - occ_lo  # per-char counts in the slice [..., A]
    sent_sl = sent_hi - sent_lo
    A = occ_lo.shape[-1]

    new_mlo = index.C[:A] + occ_lo
    new_size = occ_sl

    # companion offsets: suffix sums of real-char slice counts
    o2 = occ_sl[..., 3]
    o1 = o2 + occ_sl[..., 2]
    o0 = o1 + occ_sl[..., 1]
    offs = [o0, o1, o2, jnp.zeros_like(o2)]
    if A == 5:
        offs.append(o0 + occ_sl[..., 0])
    new_olo = olo[..., None] + sent_sl[..., None] + jnp.stack(offs, axis=-1)
    return new_mlo, new_size, new_olo


def extend_core(
    index: DeviceIndex,
    mlo: jax.Array,
    size: jax.Array,
    olo: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Direction-agnostic FMD extension core, EXACT for any interval size.

    Gathers one paired row per bound (first half used).  Returns
    per-DESCENDED-char results; a right extension is obtained by feeding the
    rc-side interval as `mlo` and permuting the candidate axis by complement
    (see extend_all).
    """
    p = jnp.stack([mlo, mlo + size])  # one fused gather for both bounds
    q = (p >> _U32(9)).astype(_I32)
    rows = jnp.take(index.fwd_blocks, q, axis=0)
    subw = sub_width(index.has_n)
    occ, sent = _occ_sub(rows[..., :subw], p, index.has_n)
    return _fmd_tail(index, occ[0], occ[1], sent[0], sent[1], olo)


def extend_core_fast(
    index: DeviceIndex,
    mlo: jax.Array,
    size: jax.Array,
    olo: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One-gather FMD extension: exact iff the interval fits the gathered
    1024-symbol window (always for size <= 512).

    Returns (new_mlo, new_size, new_olo, far): `far` marks states whose
    results are NOT valid (interval too wide for the window) — the caller
    must discard them and escalate (search/engine.py tier escalation).
    """
    q = (mlo >> _U32(9)).astype(_I32)
    rows = jnp.take(index.fwd_blocks, q, axis=0)
    subw = sub_width(index.has_n)
    hi = mlo + size
    far = ((hi >> _U32(9)).astype(_I32) - q) > 1
    occ_lo, sent_lo = _occ_sub(rows[..., :subw], mlo, index.has_n)
    occ_hi, sent_hi = _occ_sub(_half_sub(rows, q, hi, subw), hi, index.has_n)
    nmlo, nsize, nolo = _fmd_tail(index, occ_lo, occ_hi, sent_lo, sent_hi, olo)
    return nmlo, nsize, nolo, far


def extend_all(
    index: DeviceIndex,
    right: bool,
    mlo: jax.Array,
    size: jax.Array,
    olo: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Bidirectional FMD extension by EVERY candidate character at once.

    The state is the interval pair in the single both-strand index: `mlo` is
    the interval being LF-stepped (I(P) for left extension, I(rc(P)) for
    right extension — the caller swaps), `olo` the companion's start.

    Left extension of X by char d: I(dX) = C[d] + occ(d, lo..hi); the
    companion I(rc(dX)) = I(rc(X)·comp(d)) starts at
        olo + sent_slice + sum_{e real, e < comp(d)} occ(rc(X)e)
    where occ(rc(X)e) = occ(comp(e)·X) = slice count of comp(e) — i.e. a
    suffix sum of the slice's per-char counts (the sent term counts sequences
    ending with rc(X), equivalently starting with X: sentinel hits in the
    slice).  Right extension by candidate c is the same computation with the
    roles swapped and the candidate axis permuted by complement.

    Returns (new_mlo, new_size, new_olo), each [..., A], where slot c is the
    result of appending candidate character c to the pattern on the requested
    side.
    """
    new_mlo, new_size, new_olo = extend_core(index, mlo, size, olo)
    if right:
        A = new_mlo.shape[-1]
        perm = jnp.asarray(_COMP5 if A == 5 else _COMP4)
        new_mlo = new_mlo[..., perm]
        new_size = new_size[..., perm]
        new_olo = new_olo[..., perm]
    return new_mlo, new_size, new_olo


def comp_perm(A: int) -> np.ndarray:
    """Complement permutation over the candidate-character axis."""
    return _COMP5 if A == 5 else _COMP4


def with_seed_tables(index: DeviceIndex, t0: int | None = None) -> DeviceIndex:
    """Attach interval seed tables: the FMD interval of EVERY ACGT string of
    length 0..t0, levels concatenated (seed_level_offset).

    Every optimal search scheme starts with an exact block, so the first
    few steps of every block's infix search descend a single exact path —
    a pure function of the needle window.  Seeding replaces those steps
    (and their rank-row gathers) with one table lookup per plan
    (search/engine.py).  Only (lo, size) are stored: the companion offset
    of w is seed_mlo[code(rc(w))] by strand symmetry.  Built on device in
    O(4^t0) extension states; depth defaults to seed_depth(n) — up to 12
    levels (~179 MB per part) at genome scale, where each level deletes a
    dependent-gather round from every block's infix scan.
    """
    import dataclasses

    n = index.n_total
    if t0 is None:
        t0 = seed_depth(n)

    @jax.jit
    def build(index):
        mlo = jnp.zeros(1, _U32)
        size = jnp.full(1, jnp.uint32(n))
        mlo_parts, size_parts = [mlo], [size]
        for t in range(t0):
            # companion offsets are not tracked (olo output unused)
            nm, ns, _ = extend_all(
                index, False, mlo, size, jnp.zeros_like(mlo)
            )
            # prepending char c: code(c.w) = c*4^t + code(w) -> c-major order
            mlo = nm[:, :4].T.reshape(-1)
            size = ns[:, :4].T.reshape(-1)
            mlo_parts.append(mlo)
            size_parts.append(size)
        return jnp.concatenate(mlo_parts), jnp.concatenate(size_parts)

    seed_mlo, seed_size = build(index)
    return dataclasses.replace(
        index, seed_mlo=seed_mlo, seed_size=seed_size, seed_t0=t0
    )


# ---------------------------------------------------------------------------
# Dimer (2-symbols-per-gather) rank path.  Layout: index/fmindex.py
# build_dimer_rows.  Candidate axis convention: code = c2*4 + c1 for the
# prepended dimer c1c2 (c2 adjacent to the current pattern).
# ---------------------------------------------------------------------------

_M1 = np.uint32(0x11111111)


def _dimer_occ(sub: jax.Array, p: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """All-threshold counts at position p from its covering 64-word sub-row.

    Returns (L [..., 16], Lm [..., 4], flag [...]):
      L[t]  = #rows < p with a valid dimer code <= t
      Lm[y] = #rows < p with a real ACGT BWT char <= y
      flag  = sub-block contains a sentinel/N-adjacent row (query must
              escalate; counts are then unreliable for FMD purposes)

    Leading axes are free; `sub` must cover p (same 128-symbol sub-block).
    All dynamic word selection is one-hot (minor-axis take_along_axis lowers
    catastrophically on TPU — measured ~600 ns/row).
    """
    off = (p & _U32(127)).astype(_I32)
    d = off >> 4  # 16-symbol boundary index 0..7
    tail = off & 15

    # tail field words: one-hot select the pair (w[2d], w[2d+1])
    dhu = (d[..., None] == jnp.arange(8, dtype=_I32)).astype(_U32)
    fields = sub[..., 0:16].reshape(sub.shape[:-1] + (8, 2))
    w0 = (fields[..., 0] * dhu).sum(axis=-1, dtype=_U32)
    w1 = (fields[..., 1] * dhu).sum(axis=-1, dtype=_U32)

    # delta bytes: one-hot select the 4-word group of d (d=0 -> zeros),
    # then static byte extraction via bitcast
    ghu = ((d[..., None] - 1) == jnp.arange(7, dtype=_I32)).astype(_U32)
    dwords = sub[..., D_DELTA : D_DELTA + 28].reshape(sub.shape[:-1] + (7, 4))
    dsel = (dwords * ghu[..., None]).sum(axis=-2, dtype=_U32)  # [..., 4]
    dbytes = jnp.stack(
        [(dsel >> _U32(8 * k)) & _U32(0xFF) for k in range(4)], axis=-1
    ).reshape(dsel.shape[:-1] + (16,))  # [..., 16] byte t = delta of thresh t

    # in-tail counts: nibble eq products of (hi2, lo2) over the 2 words
    nf0 = jnp.clip(tail, 0, 8)
    nf1 = jnp.clip(tail - 8, 0, 8)

    def pmask(nf):
        sh = jnp.minimum(4 * nf, 31).astype(_U32)
        return jnp.where(nf >= 8, _FULL, (_U32(1) << sh) - _U32(1))

    w = jnp.stack([w0 & pmask(nf0), w1 & pmask(nf1)], axis=-1)  # [..., 2]
    b0 = w & _M1
    b1 = (w >> _U32(1)) & _M1
    b2 = (w >> _U32(2)) & _M1
    b3 = (w >> _U32(3)) & _M1
    n3, n2, n1, n0 = b3 ^ _M1, b2 ^ _M1, b1 ^ _M1, b0 ^ _M1
    eq_hi = (n3 & n2, n3 & b2, b3 & n2, b3 & b2)
    eq_lo = (n1 & n0, n1 & b0, b1 & n0, b1 & b0)
    pc = jax.lax.population_count
    # masked-out fields have value 0 -> they land in eq(0,0); subtract the
    # masked-field count from threshold counts by masking the eq product
    # (pmask already zeroes them: a zeroed field matches eq(0,0) though!).
    # Fix: count eq(0,0) within the mask only.
    fmask = jnp.stack([pmask(nf0), pmask(nf1)], axis=-1) & _M1
    cnts = []
    for a in range(4):
        for b in range(4):
            g = eq_hi[a] & eq_lo[b]
            if a == 0 and b == 0:
                g = g & fmask
            cnts.append(pc(g).sum(axis=-1, dtype=_U32))
    cnt = jnp.stack(cnts, axis=-1)  # [..., 16] per-code tail counts
    tails = jnp.cumsum(cnt, axis=-1, dtype=_U32)

    inblk = dbytes + tails
    L = sub[..., D_CUM : D_CUM + 16] + inblk
    mono_cum = jnp.concatenate(
        [sub[..., D_MONO : D_MONO + 1] & _U32(0x7FFFFFFF),
         sub[..., D_MONO + 1 : D_MONO + 4]],
        axis=-1,
    )
    Lm = mono_cum + inblk[..., 3::4]  # thresholds 3, 7, 11, 15
    flag = (sub[..., D_MONO] >> _U32(31)) > 0
    return L, Lm, flag


def _dimer_tail(
    index: DeviceIndex,
    L_lo: jax.Array,
    L_hi: jax.Array,
    Lm_lo: jax.Array,
    Lm_hi: jax.Array,
    olo: jax.Array,
    with_mono: bool = True,
) -> tuple:
    """FMD results from the two bounds' threshold counts.

    Dimer candidates (axis 16, code = c2*4 + c1, prepended dimer c1c2):
      new_mlo[code] = C2[code] + (L_code - L_{code-1})(lo)
      new_size      = slice of the same diff
      new_olo[code] = olo + (L_15 - L_code)(slice)
    Mono candidates (axis 4; prepended char y):
      new_mlo_m[y] = C[y] + (Lm_y - Lm_{y-1})(lo)
      new_olo_m[y] = olo + (Lm_3 - Lm_y)(slice)
    Valid ONLY for unflagged sub-blocks (no sentinel/N-adjacent rows in the
    queried windows): the sentinel and N correction terms vanish there.
    """
    S = L_hi - L_lo
    z16 = L_lo[..., :1] * _U32(0)
    occ2_lo = jnp.diff(L_lo, axis=-1, prepend=z16)
    d_mlo = index.C2 + occ2_lo
    d_size = jnp.diff(S, axis=-1, prepend=z16)
    d_olo = olo[..., None] + (S[..., 15:16] - S)
    if not with_mono:
        return (d_mlo, d_size, d_olo), None

    Sm = Lm_hi - Lm_lo
    zm = Lm_lo[..., :1] * _U32(0)
    occm_lo = jnp.diff(Lm_lo, axis=-1, prepend=zm)
    m_mlo = index.C[:4] + occm_lo
    m_size = jnp.diff(Sm, axis=-1, prepend=zm)
    m_olo = olo[..., None] + (Sm[..., 3:4] - Sm)
    if index.has_n:
        # candidate N: impossible in unflagged windows -> size 0
        zn = m_size[..., :1] * _U32(0)
        m_mlo = jnp.concatenate([m_mlo, zn], axis=-1)
        m_size = jnp.concatenate([m_size, zn], axis=-1)
        m_olo = jnp.concatenate([m_olo, zn], axis=-1)
    return (d_mlo, d_size, d_olo), (m_mlo, m_size, m_olo)


def extend_dimer_fast(
    index: DeviceIndex,
    mlo: jax.Array,
    size: jax.Array,
    olo: jax.Array,
    with_mono: bool = True,
) -> tuple:
    """One-gather dimer + mono extension from the paired dimer row.

    Returns ((d_mlo, d_size, d_olo) [..., 16], (m_mlo, m_size, m_olo)
    [..., A] or None, far): `far` marks states whose results are invalid —
    interval wider than the 256-symbol window, or a flagged sub-block
    touched; the caller escalates those blocks to a mono tier.  Both bounds'
    occ runs share one stacked computation (HLO op count, not element count,
    dominates step cost at engine frontier widths)."""
    q = (mlo >> _U32(7)).astype(_I32)
    rows = jnp.take(index.dimer_blocks, q, axis=0)
    hi = mlo + size
    far = ((hi >> _U32(7)).astype(_I32) - q) > 1
    half = ((hi >> _U32(7)).astype(_I32) - q) > 0
    sub_hi = jnp.where(half[..., None], rows[..., D_WIDTH:], rows[..., :D_WIDTH])
    sub = jnp.stack([rows[..., :D_WIDTH], sub_hi])
    p = jnp.stack([mlo, hi])
    L, Lm, f = _dimer_occ(sub, p)
    dres, mres = _dimer_tail(index, L[0], L[1], Lm[0], Lm[1], olo,
                             with_mono=with_mono)
    return dres, mres, far | f[0] | f[1]


def extend_dimer(
    index: DeviceIndex,
    mlo: jax.Array,
    size: jax.Array,
    olo: jax.Array,
    with_mono: bool = True,
) -> tuple:
    """Two-gather dimer + mono extension, exact for ANY interval width.

    A wide slice can span sub-blocks whose flags the two bound gathers never
    see, and any sentinel/N-adjacent row INSIDE the slice breaks the olo
    formulas (its E0 / one-char-end / N terms were dropped).  Those rows are
    exactly the ones missing from L_15, so `size != L_15(slice)` detects them
    in O(1) and escalates (`far`) — no interior gathers needed.  (The fast
    path's window is <= 2 sub-blocks, both flag-checked, so it needs no such
    term.)"""
    p = jnp.stack([mlo, mlo + size])
    q = (p >> _U32(7)).astype(_I32)
    rows = jnp.take(index.dimer_blocks, q, axis=0)
    L, Lm, f = _dimer_occ(rows[..., :D_WIDTH], p)
    dres, mres = _dimer_tail(index, L[0], L[1], Lm[0], Lm[1], olo,
                             with_mono=with_mono)
    invalid_in_slice = (L[1][..., 15] - L[0][..., 15]) != size
    return dres, mres, f[0] | f[1] | invalid_in_slice


def _bitvec_count(rows: jax.Array, col: int, bmask: jax.Array) -> jax.Array:
    """Absolute count of a 128-symbol (count, bits[4]) bitvector row."""
    return rows[..., col] + _popcount_sum(rows[..., col + 1 : col + 1 + BVWORDS] & bmask)


def rc_strand_count(index: DeviceIndex, p: jax.Array) -> jax.Array:
    """#SA rows in [0, p) whose suffix starts in the reverse-complement half.

    Used to split an interval's occurrence count by strand: forward-strand
    occurrences of [lo, lo+size) = size - (rc(lo+size) - rc(lo)).
    """
    rows = jnp.take(index.strand_blocks, (p >> _U32(7)).astype(_I32), axis=0)
    bmask = _bit_masks((p & _U32(127)).astype(_I32), BVWORDS)
    return _bitvec_count(rows, 0, bmask)


def bwt_char(sub: jax.Array, p: jax.Array, has_n: bool) -> tuple[jax.Array, jax.Array]:
    """Read (code, is_sentinel) of BWT position p from its covering sub-row."""
    off = (p & _U32(511)).astype(_I32)
    widx = off >> 4
    wsh = ((off & 15) * 2).astype(_U32)
    words = sub[..., S_WORDS : S_WORDS + SUBWORDS]
    word = jnp.take_along_axis(words, widx[..., None], axis=-1)[..., 0]
    code = (word >> wsh) & _U32(3)
    bidx = off >> 5
    bsh = (off & 31).astype(_U32)
    sbit = (
        jnp.take_along_axis(
            sub[..., S_SBITS : S_SBITS + SUBBITS], bidx[..., None], axis=-1
        )[..., 0]
        >> bsh
    ) & _U32(1)
    if has_n:
        cn = _col_ncnt(has_n)
        nbit = (
            jnp.take_along_axis(
                sub[..., cn + 1 : cn + 1 + SUBBITS], bidx[..., None], axis=-1
            )[..., 0]
            >> bsh
        ) & _U32(1)
        code = jnp.where(nbit == 1, _U32(4), code)
    return code, sbit


def locate(index: DeviceIndex, pos: jax.Array, valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Resolve SA rows to (seq_no, seq_pos) via LF walks to a sampled row.

    Equivalent to SeqAn's getOccurrences on the sampled compressed SA
    (sampling scheme of /root/reference/src/seqan_libdivsufsort.h:106-147).
    Walk length is bounded by the sampling rate.  `valid` masks garbage rows.
    Sequence numbers are part-local (caller maps to global ids).  The
    indicator bits live in their own small table (index.ind_blocks) so the
    hot-path rank gathers never move them.
    """
    has_n = index.has_n
    subw = sub_width(has_n)

    def body(_, carry):
        p, steps, done = carry
        rows = jnp.take(index.fwd_blocks, (p >> _U32(9)).astype(_I32), axis=0)
        sub = rows[..., :subw]
        irows = jnp.take(index.ind_blocks, (p >> _U32(7)).astype(_I32), axis=0)
        off = (p & _U32(127)).astype(_I32)
        bidx = off >> 5
        bsh = (off & 31).astype(_U32)
        ibit = (
            jnp.take_along_axis(
                irows[..., 1 : 1 + BVWORDS], bidx[..., None], axis=-1
            )[..., 0]
            >> bsh
        ) & _U32(1)
        now_done = (ibit == 1) & ~done
        # LF step for not-done rows
        code, _sbit = bwt_char(sub, p, has_n)
        occ, _sent = _occ_sub(sub, p, has_n)
        occ_c = jnp.take_along_axis(occ, code.astype(_I32)[..., None], axis=-1)[..., 0]
        p_next = jnp.take(index.C, code.astype(_I32)) + occ_c
        p2 = jnp.where(done | now_done, p, p_next)
        steps2 = jnp.where(done | now_done, steps, steps + 1)
        return p2, steps2, done | now_done

    steps0 = jnp.zeros_like(pos)
    done0 = ~valid
    p_f, steps_f, _ = jax.lax.fori_loop(0, index.sampling, body, (pos, steps0, done0))

    # final: p_f has its indicator bit set (for valid rows); rank -> value idx
    irows = jnp.take(index.ind_blocks, (p_f >> _U32(7)).astype(_I32), axis=0)
    off = (p_f & _U32(127)).astype(_I32)
    bmask = _bit_masks(off, BVWORDS)
    irank = _bitvec_count(irows, 0, bmask)
    vidx = jnp.where(valid, irank, 0).astype(_I32)
    i1 = jnp.take(index.sa_i1, vidx)
    i2 = jnp.take(index.sa_i2, vidx) + steps_f
    return i1, i2


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DeviceText:
    """Device-resident 2-bit packed concatenated text (+ N mask).

    Needle windows are extracted ON DEVICE from block start positions, so a
    batch dispatch ships B uint32 starts instead of B x (K+J-1) needle bytes
    — host->device traffic drops ~100x, which matters both through the
    tunneled dev chip and on real pods (the reference reads needles from its
    in-memory text for free; this is the device-resident equivalent).
    """

    words: jax.Array  # [nw] uint32, 16 x 2-bit codes per word
    nwords: jax.Array  # [nnw] uint32 N-bit mask (empty for Dna4)
    limit: int = field(metadata={"static": True})  # total bases

    @property
    def has_n(self) -> bool:
        return self.nwords.shape[0] > 0

    @staticmethod
    def from_host(data: FMIndexData) -> "DeviceText":
        return DeviceText(
            words=jnp.asarray(np.asarray(data.text_words)),
            nwords=jnp.asarray(np.asarray(data.text_nwords)),
            limit=data.text_len,
        )


def extract_needles(text: DeviceText, starts: jax.Array, Ln: int, limit) -> jax.Array:
    """[B, Ln] uint8 needle windows; positions >= `limit` read as code 0.

    `starts` are GLOBAL base positions (uint32); `limit` is the exclusive
    end of the current fasta file's bases (traced scalar) — k-mers running
    past it are masked exactly like the host-side extraction did.

    Gathers whole 16-symbol words per block (Ln/16 + 1 word rows instead of
    Ln single elements — the gather engine charges per gathered row, so this
    is ~16x cheaper) and unpacks the window with VPU shifts.
    """
    B = starts.shape[0]
    nw = (Ln + 15) // 16 + 1  # enough words to cover Ln symbols at any phase
    w0 = (starts >> _U32(4)).astype(_I32)  # first word index per block
    widx = w0[:, None] + jnp.arange(nw, dtype=_I32)[None, :]
    nwords_text = text.words.shape[0]
    widx = jnp.minimum(widx, nwords_text - 1)
    words = jnp.take(text.words, widx, axis=0)  # [B, nw]

    pos = starts[:, None].astype(_U32) + jnp.arange(Ln, dtype=_U32)[None, :]
    valid = pos < limit
    pc = jnp.minimum(pos, jnp.asarray(text.limit - 1, _U32))
    rel = (pc >> _U32(4)).astype(_I32) - w0[:, None]  # word slot of each char
    w = jnp.take_along_axis(words, rel, axis=-1)
    code = (w >> ((pc & _U32(15)) * _U32(2))) & _U32(3)
    if text.has_n:
        nb = (Ln + 31) // 32 + 1
        b0 = (starts >> _U32(5)).astype(_I32)
        bidx = b0[:, None] + jnp.arange(nb, dtype=_I32)[None, :]
        bidx = jnp.minimum(bidx, text.nwords.shape[0] - 1)
        nws = jnp.take(text.nwords, bidx, axis=0)  # [B, nb]
        brel = (pc >> _U32(5)).astype(_I32) - b0[:, None]
        nw_ = jnp.take_along_axis(nws, brel, axis=-1)
        nbit = (nw_ >> (pc & _U32(31))) & _U32(1)
        code = jnp.where(nbit == 1, _U32(4), code)
    return jnp.where(valid, code, 0).astype(jnp.uint8)
