"""Lockstep tensorized (k,e)-search over blocks of adjacent k-mers.

TPU-native re-design of the reference's per-block recursion
(/root/reference/src/algo.hpp:221-403 + find2_index_approx.hpp:377-428):

  * a batch of B blocks is processed at once; each block contributes one
    common overlap infix that is searched with every optimal search scheme
  * search states (bidirectional SA intervals + error count) live in a fixed
    capacity frontier tensor [B, F]; every step extends ALL states by ALL
    candidate characters at once (one rank-row gather pair per state, the
    candidate fan-out is free), prunes by the scheme's (l, u) bounds and empty
    intervals, and compacts the frontier (prefix-sum scatter / argmax select)
  * surviving infix matches are then extended bidirectionally to every k-mer
    window of the block (the adjacent-k-mer reuse trick of algo.hpp:26-218),
    again as a lockstep frontier over [B, J kmers, F states]
  * frontier overflows are flagged per block and re-run at a higher capacity
    tier by the host — semantics stay exact, capacity only affects speed

Counting semantics proved equivalent to the reference's enumeration: each
distinct length-K string within Hamming distance <= e of a window is visited
exactly once (OSS partition over the infix x unique extension), and saturating
addition of interval sizes is order-independent.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from genmap_tpu.ops.rank import DeviceIndex
from genmap_tpu.search.schemes import plans_for

_U32 = jnp.uint32
_I32 = jnp.int32


@dataclass(frozen=True)
class Tier:
    """Frontier capacities (infix search, collected survivors, extension) and
    the gather mode.

    `exact=False` uses the one-gather-per-state fast rank path
    (ops/rank.py extend_core_fast), which is exact only for intervals that
    fit the gathered 1024-symbol window; wider intervals flag the block and
    it re-runs on the next (exact) tier.  `dimer=True` consumes TWO pattern
    characters per gather from the dimer rank rows (ops/rank.py
    extend_dimer*); blocks touching a flagged (sentinel/N-adjacent)
    sub-block escalate to the next mono tier.  Capacity and gather mode only
    affect speed, never results."""

    f_search: int
    f_collect: int
    f_extend: int
    exact: bool = True
    dimer: bool = False
    # extension-phase exactness override (None = follow `exact`).  Probe
    # residual cohorts run an exact infix but a FAST one-gather extension:
    # extension intervals are bounded by the block's survivor mass (tiny),
    # so the fast window almost always fits and rows halve.
    ext_exact: bool | None = None


DEFAULT_TIERS = (
    Tier(4, 4, 1, exact=False),
    Tier(4, 4, 1),
    Tier(32, 64, 8),
    Tier(256, 512, 64),
    Tier(2048, 4096, 512),
    Tier(16384, 32768, 4096),
)


# pool sizes are not restricted to powers of two: the gather engine charges
# per ROW, so a [B, 3] frontier really is 25% cheaper than [B, 4].  The fine
# rungs (2/3/6) are only safe where the survivor count has low variance
# (branch estimate ~0); branchy steps keep power-of-two headroom — rung 6
# where 8 was due overflowed ~11% of (20,1) blocks.
_POOL_LADDER = (2, 3, 4, 6, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096,
                8192, 16384)
_POOL_LADDER_COARSE = (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096,
                       8192, 16384)


def _quant4(v: float, cap: int = 16384, ladder=_POOL_LADDER) -> int:
    for q in ladder:
        if q >= v or q >= cap:
            return min(q, cap)
    return cap


def infix_pool_schedule(plans, infix_off, n_total, scale: float = 1.0):
    """Static per-step infix pool sizes.

    The lockstep frontier's live-state count is predictable: branch states
    exist only where a scheme's u-bound allows errors, their number is
    bounded by the error-placement combinatorics, and a branch pattern of
    length t survives (size > 0) with probability ~min(1, 2n/4^t).  Sizing
    the pool per STEP from this estimate (x2 safety, quantized to powers of
    4) instead of using one flat capacity is what makes short-infix configs
    like (20,1) or (30,2) — where every block's frontier legitimately peaks
    at tens to hundreds of states mid-search — run in one pass instead of
    escalating through the whole tier ladder.  Capacity still only affects
    speed: actual overflow beyond the schedule escalates as before.
    """
    import math

    pos_s, right_s, u_s, lreq_s = _plan_schedule(plans, infix_off)
    T, P = u_s.shape
    h = np.zeros(P, np.int64)
    pools = np.zeros(T, np.int64)
    for t in range(T):
        q = min(1.0, 2.0 * float(n_total) / 4.0 ** (t + 1))
        branch = 0.0
        for p in range(P):
            if u_s[t, p] > 0:
                h[p] += 1
            b = sum(
                math.comb(int(h[p]), j) * 3**j for j in range(int(u_s[t, p]) + 1)
            )
            branch += (b - 1) * q  # branches decay with presence; the
            # on-genome state of each plan always survives (the +P below)
        # NOTE: a floor tracking 0-error-primary deaths (pool = alive
        # primaries only) was tried and reverted: the branch term
        # underestimates PERSISTENT on-genome mismatch survivors at high e,
        # and the missing +P+1 headroom exploded tier escalations 10-40x on
        # (20,1)/(30,2)/(101,4).  A floor of 3 for P=2 likewise overflowed
        # ~11% of (20,1) blocks — short infixes keep genuine neighbors
        # around.  e>0 keeps the historical minimum of 4; only exact search
        # (P=1, no neighbors possible) drops to pool 2.
        floor = _quant4(P + 1) if P == 1 else max(4, _quant4(P + 1))
        ladder = _POOL_LADDER if branch <= 0.2 else _POOL_LADDER_COARSE
        pools[t] = max(
            floor, _quant4((P + 1 + 2.0 * branch) * scale, ladder=ladder)
        )
    return pools


def exact_prefix_steps(n_total: int, target: int = 64) -> int:
    """Number of initial infix steps run on the exact two-gather path in a
    fast tier: search states start at interval size n_total and shrink ~4x
    per consumed character, so after ceil(log4(n/target)) steps a typical
    interval is ~target — comfortably inside the one-gather window (512
    usable symbols for mono rows -> target 64; 128 for dimer rows -> target
    16).  Repeat-heavy blocks that stay wide longer are caught by the `far`
    flag and escalate to an exact tier."""
    import math

    n = max(int(n_total), 1)
    return max(0, math.ceil(math.log(n / target, 4))) if n > target else 0


def probe_thresholds(plans, infix_off, cut=None) -> np.ndarray:
    """Per-plan mass thresholds for the unique-infix probe's skip test.

    thr[p] = 1 for plans whose cumulative l-bound is still 0 after `cut`
    consumed chars (the self-match survives there), else 0 (any surviving
    row is a genuine second occurrence).  `cut=None` means the full scan.
    """
    _pos, _right, _u, lreq_s = _plan_schedule(plans, infix_off)
    T = lreq_s.shape[0]
    t = T if cut is None else max(1, min(T, int(cut)))
    return (lreq_s[:t].max(axis=0) == 0).astype(np.uint32)


def _compact(arrays, valid, F):
    """Keep (up to) F valid states; returns (arrays, valid, overflowed).

    Order-free compaction (hit order never matters: counts are saturating
    sums).  Two regimes:
      * small frontiers: prefix-sum ranks + one-hot masked SUMS — dense VPU
        work, O(M*F) per state row (scatter lowers serially on TPU)
      * large frontiers (the (30,2)-class pool schedules): the one-hot
        product is quadratic in pool size, so a stable multi-operand sort
        on the validity key packs valid states instead, O(M log^2 M)
    """
    M = valid.shape[-1]
    nvalid = valid.sum(axis=-1, dtype=_I32)
    # the one-hot product is O(M*F) per state row — with the dimer path's
    # x16 candidate fan-out it loses to the sort well below the mono
    # crossover (measured r4: F=16/M=256 one-hot cost tier-0 (20,1) ~30%)
    if F >= 64 or M >= 256:
        key = (~valid).astype(jnp.uint8)
        sorted_ops = jax.lax.sort(
            (key,) + tuple(a for a in arrays), dimension=-1, is_stable=True,
            num_keys=1,
        )
        out = tuple(a[..., :F] for a in sorted_ops[1:])
        out_valid = jnp.arange(F, dtype=_I32) < nvalid[..., None]
        return out, out_valid, nvalid > F
    if F == 1:
        # select the first valid candidate via a one-hot sum
        first = jnp.argmax(valid, axis=-1)
        onehot = jax.nn.one_hot(first, M, dtype=_U32) * valid.any(
            axis=-1, keepdims=True
        ).astype(_U32)
        out = tuple(
            (a.astype(_U32) * onehot).sum(axis=-1, dtype=_U32)[..., None].astype(a.dtype)
            for a in arrays
        )
        return out, valid.any(axis=-1, keepdims=True), nvalid > 1
    idx = jnp.cumsum(valid, axis=-1, dtype=_I32) - 1
    dest = jnp.where(valid, idx, M + 1)  # [..., M] rank of each valid entry
    # one-hot [..., F, M]: slot s takes the candidate ranked s
    onehot = (dest[..., None, :] == jnp.arange(F, dtype=_I32)[:, None]).astype(_U32)
    out = tuple(
        (a.astype(_U32)[..., None, :] * onehot).sum(axis=-1, dtype=_U32).astype(a.dtype)
        for a in arrays
    )
    out_valid = jnp.arange(F, dtype=_I32) < nvalid[..., None]
    overflow = nvalid > F
    return out, out_valid, overflow


def _candidate_step_dir(
    index, rightv, flo, rlo, size, err, valid, nch, e_or_u, lreq, exact=True
):
    """Mixed-direction candidate step: `rightv` is a per-state bool (or
    broadcastable) choosing the extension side.

    Both directions read the SAME FMD table (ops/rank.py), so one row gather
    serves every state regardless of direction — this is what lets left- and
    right-moving lanes run in the same lockstep step (balanced schedules cut
    the step count ~2-3x; each step's cost is gather-count-bound).

    With exact=False the one-gather fast rank path is used; states whose
    interval exceeds the gathered window are reported in the returned `far`
    mask (their candidates are invalidated — the caller escalates the block).
    """
    from genmap_tpu.ops.rank import comp_perm, extend_core, extend_core_fast

    mlo = jnp.where(rightv, rlo, flo)
    olo = jnp.where(rightv, flo, rlo)
    if exact:
        nmlo, nsize, nolo = extend_core(index, mlo, size, olo)
        far = jnp.zeros(valid.shape, bool)
    else:
        nmlo, nsize, nolo, far = extend_core_fast(index, mlo, size, olo)
        far = far & valid
    A = nmlo.shape[-1]
    perm = jnp.asarray(comp_perm(A))
    rb = rightv[..., None]
    nflo = jnp.where(rb, nolo[..., perm], nmlo)
    nrlo = jnp.where(rb, nmlo[..., perm], nolo)
    nsz = jnp.where(rb, nsize[..., perm], nsize)
    cand = jnp.arange(A, dtype=_U32)
    cshape = (1,) * (nch.ndim) + (A,)
    delta = (cand.reshape(cshape) != nch[..., None]) | (nch[..., None] == 4)
    err2 = err[..., None] + delta.astype(_I32)
    valid2 = (
        valid[..., None]
        & (err2 <= e_or_u)
        & (err2 >= lreq)
        & (nsz > 0)
        & ~far[..., None]
    )
    return nflo, nrlo, nsz, err2, valid2, far


def _candidate_step_fused(
    index, rightv, consume, flo, rlo, size, err, valid, nchA, nchB,
    u_mid, u_end, l_mid, l_end, exact=False, with_mono=True, with_pass=True,
):
    """Mixed-direction 1-or-2-character candidate step on the DIMER table.

    `consume` (per state, broadcastable): 2 = dimer step consuming needle
    chars (nchA then nchB), 1 = mono step consuming nchA, 0 = passthrough.
    All modes share the step's single dimer-row gather (mono les are the
    thresholds 3,7,11,15 of the same row).  `u_mid`/`l_mid` are the
    cumulative error bounds after the FIRST consumed char — they matter when
    an optimal-search-scheme block boundary falls between the two fused
    chars (enforcing them only at the pair end would break the scheme's
    disjoint-error-pattern partition).  For plain extension both pairs are
    (errors, errors) / (0, 0) and the mid check is implied.

    Returns (nflo, nrlo, nsize, err2, valid2, far) with a 16-wide candidate
    axis; mono candidates occupy slots 0..A-1, passthrough slot 0.  `far`
    marks states whose gather window was too narrow or flagged — their
    candidates are invalidated and the caller escalates the block to a mono
    tier.

    `with_mono`/`with_pass` are STATIC per scan segment: step wall time is
    dominated by HLO op count at engine frontier widths, so all-dimer steps
    (the common case) must not pay for the mono/passthrough branches.
    """
    from genmap_tpu.ops.rank import comp_perm, extend_dimer, extend_dimer_fast

    mlo = jnp.where(rightv, rlo, flo)
    olo = jnp.where(rightv, flo, rlo)
    if exact:
        dres, mres, far = extend_dimer(index, mlo, size, olo, with_mono=with_mono)
    else:
        dres, mres, far = extend_dimer_fast(index, mlo, size, olo,
                                            with_mono=with_mono)
    far = far & valid
    if with_pass:
        far = far & (consume > 0)
    d_mlo, d_size, d_olo = dres
    rb = rightv[..., None]

    # --- dimer candidates: table code t = c2*4 + c1 (prepended dimer c1c2).
    # Consumed needle chars: left step consumes (first=c2, second=c1);
    # right step appends (d1, d2) = (comp(c2), comp(c1)).
    codes = np.arange(16)
    c2v, c1v = codes >> 2, codes & 3
    firstL = jnp.asarray(c2v, _I32)
    secondL = jnp.asarray(c1v, _I32)
    first = jnp.where(rb, 3 - firstL, firstL)
    second = jnp.where(rb, 3 - secondL, secondL)
    dA = (first != nchA[..., None].astype(_I32)) | (nchA[..., None] >= 4)
    dB = (second != nchB[..., None].astype(_I32)) | (nchB[..., None] >= 4)
    err_mid = err[..., None] + dA.astype(_I32)
    err_d = err_mid + dB.astype(_I32)
    ok_d = (
        (err_mid <= u_mid)
        & (err_mid >= l_mid)
        & (err_d <= u_end)
        & (err_d >= l_end)
        & (d_size > 0)
    )
    d_flo = jnp.where(rb, d_olo, d_mlo)
    d_rlo = jnp.where(rb, d_mlo, d_olo)

    if not with_mono and not with_pass:
        valid2 = valid[..., None] & ok_d & ~far[..., None]
        return d_flo, d_rlo, d_size, err_d, valid2, far

    cons = consume[..., None]  # broadcast over the candidate axis
    nflo, nrlo, nsize, err2, ok = d_flo, d_rlo, d_size, err_d, ok_d

    if with_mono:
        # mono candidates (slots 0..A-1): axis = consumed char; right steps
        # read the comp-permuted table results (same as the mono path).
        m_mlo, m_size, m_olo = mres
        A = m_mlo.shape[-1]
        perm = jnp.asarray(comp_perm(A))
        mm = jnp.where(rb, m_mlo[..., perm], m_mlo)
        ms = jnp.where(rb, m_size[..., perm], m_size)
        mo = jnp.where(rb, m_olo[..., perm], m_olo)
        candm = jnp.arange(A, dtype=_I32)
        dAm = (candm != nchA[..., None].astype(_I32)) | (nchA[..., None] >= 4)
        err_m = err[..., None] + dAm.astype(_I32)
        ok_m = (err_m <= u_end) & (err_m >= l_end) & (ms > 0)
        m_flo = jnp.where(rb, mo, mm)
        m_rlo = jnp.where(rb, mm, mo)

        def pad16(x, fill):
            padshape = x.shape[:-1] + (16 - A,)
            return jnp.concatenate(
                [x, jnp.full(padshape, fill, x.dtype)], axis=-1
            )

        nflo = jnp.where(cons == 2, nflo, pad16(m_flo, 0))
        nrlo = jnp.where(cons == 2, nrlo, pad16(m_rlo, 0))
        nsize = jnp.where(cons == 2, nsize, pad16(ms, 0))
        err2 = jnp.where(cons == 2, err2, pad16(err_m, 0))
        ok = jnp.where(cons == 2, ok, pad16(ok_m, False))

    if with_pass:
        c0 = jnp.arange(16) == 0
        nflo = jnp.where(cons == 0, flo[..., None], nflo)
        nrlo = jnp.where(cons == 0, rlo[..., None], nrlo)
        nsize = jnp.where(cons == 0, size[..., None], nsize)
        err2 = jnp.where(cons == 0, err[..., None], err2)
        ok = jnp.where(cons == 0, c0, ok)

    valid2 = valid[..., None] & ok & ~far[..., None]
    return nflo, nrlo, nsize, err2, valid2, far


def _flatten2(x):
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


def _plan_schedule(plans, infix_off):
    """Stack all plans' step lists into [T, P] schedule arrays.

    Every optimal-search-scheme plan consumes exactly the needle length, so
    T equals the infix length with no padding; all plans advance in lockstep
    within ONE scan (they are independent chains — running them as lanes of
    the same step hides each other's gather latency instead of serializing
    three scans back to back).
    """
    T = plans[0].n_steps
    P = len(plans)
    pos = np.zeros((T, P), np.int32)
    right = np.zeros((T, P), bool)
    u = np.zeros((T, P), np.int32)
    lreq = np.zeros((T, P), np.int32)
    for p, plan in enumerate(plans):
        t = 0
        for seg in plan.segments:
            n = len(seg.pos)
            pos[t : t + n, p] = seg.pos + infix_off
            right[t : t + n, p] = seg.right
            u[t : t + n, p] = seg.u
            lreq[t : t + n, p] = seg.lreq
            t += n
        assert t == T
    return pos, right, u, lreq


def _plan_schedule_fused(plans, infix_off, t0: int):
    """Fuse each plan's char steps [t0:] into 1- or 2-char dimer steps.

    Two consecutive chars fuse iff the plan consumes them in the same
    direction (segments are maximal same-direction runs, so only segment
    boundaries force single steps).  Plans finish after different fused-step
    counts; shorter plans pad with consume=0 (passthrough).  Returns arrays
    [Tf, P]: consume, right, posA, posB, u_mid, u_end, l_mid, l_end, and
    charidx (chars consumed before the step; == T for pad steps).
    """
    pos_s, right_s, u_s, lreq_s = _plan_schedule(plans, infix_off)
    T, P = u_s.shape
    per_plan = []
    for p in range(P):
        steps = []
        i = t0
        while i < T:
            if i + 1 < T and right_s[i, p] == right_s[i + 1, p]:
                steps.append(
                    (2, right_s[i, p], pos_s[i, p], pos_s[i + 1, p],
                     u_s[i, p], u_s[i + 1, p], lreq_s[i, p], lreq_s[i + 1, p], i)
                )
                i += 2
            else:
                steps.append(
                    (1, right_s[i, p], pos_s[i, p], pos_s[i, p],
                     u_s[i, p], u_s[i, p], lreq_s[i, p], lreq_s[i, p], i)
                )
                i += 1
        per_plan.append(steps)
    Tf = max(len(s) for s in per_plan) if per_plan else 0
    out = np.zeros((9, Tf, P), np.int32)
    out[8] = T  # charidx of pad steps
    for p, steps in enumerate(per_plan):
        for t, s in enumerate(steps):
            out[:, t, p] = s
    return out


def extension_extra_estimate(plans, infix_off, n_total) -> float:
    """Expected count of non-primary infix survivors (error-branch patterns
    of the full infix still present in the genome).  When this is
    non-negligible — short infixes relative to log4(n), e.g. (20,1) or small
    (K,e) — the extension frontier routinely holds 2+ states and tier 0
    should start at f_extend=4 instead of overflowing ~10-30% of blocks."""
    import math

    _pos, _right, u_s, _lreq = _plan_schedule(plans, infix_off)
    T, P = u_s.shape
    q = min(1.0, 2.0 * float(n_total) / 4.0**T)
    extra = 0.0
    for p in range(P):
        h = int((u_s[:, p] > 0).sum())
        b = sum(math.comb(h, j) * 3**j for j in range(int(u_s[T - 1, p]) + 1))
        extra += (b - 1) * q
    return extra


def _search_infix(index, plans, infix_off, needles, B, tier: Tier, n_total,
                  exact_steps, n_static, probe=False, pools=None,
                  with_occ=False, stop_at=None):  # probe: reserved
    """All search schemes over one flat per-block state POOL.

    Every state carries its plan id; per-step plan attributes (needle
    position, direction, error bounds) are selected per state with a small
    one-hot product over the P plans (pure VPU work, no gathers).  Pooling
    matters because the gather engine charges per state SLOT: measured at
    (100,2) the per-plan frontiers held ~1 valid state each, so a pool of
    max(f_search, P+1) slots gathers ~2-3x fewer rows than P separate
    f_search-slot frontiers.  Pool overflow escalates the block to a
    roomier tier, exactly like any other capacity overflow.

    On a fast (non-exact) tier the first `exact_steps` steps — where every
    state's interval is still wide — run on the exact two-gather rank path;
    the remaining steps use the one-gather fast path, flagging still-wide
    states for escalation.

    `pools` overrides the static per-step pool schedule (the engine passes
    occupancy-CALIBRATED pools measured on a first batch — the static
    estimate over-provisions 3-5x on branch-heavy configs, see
    benchmarks/occupancy_probe.py).  `with_occ` additionally returns the
    per-step count of valid candidate states per block ([T, B] uint16,
    counted BEFORE capacity clamping — the calibration signal).

    Returns (survivors, ovf_cap, ovf_far[, occ]): capacity overflow and
    fast-path far-flags are reported separately so the engine can escalate
    far-only blocks to the same-size exact tier and capacity overflows
    straight to a wider tier."""
    P = len(plans)
    pos_s, right_s, u_s, lreq_s = _plan_schedule(plans, infix_off)
    T = len(pos_s)
    if stop_at is not None:
        # truncated scan (the probe's early cut): survivor MASS can only
        # shrink as chars are consumed, so mass == 1 at any prefix already
        # proves the block's k-mers are all frequency 1 (the sandwich
        # argument of the unique-infix probe); stopping at ~log4(2n)+slack
        # chars trades a few extra residual blocks for scanning a fraction
        # of the steps
        T = max(1, min(T, int(stop_at)))
    S = T if tier.exact else min(T, exact_steps)
    if pools is None:
        pools = infix_pool_schedule(plans, infix_off, n_static,
                                    tier.f_search / 4.0)
    pools = np.asarray(pools, np.int64)

    # seeded prefix: every OSS plan starts with an exact (u==0) block, so
    # the first t_seed steps descend a single deterministic path per plan —
    # replaced by one interval-table lookup per plan (ops/rank.py
    # with_seed_tables) instead of t_seed rounds of rank-row gathers
    from genmap_tpu.ops.rank import seed_level_offset

    t_seed = 0
    if index.has_seed:
        t_seed = min(index.seed_t0, T)
        while t_seed > 0 and u_s[:t_seed].max() > 0:
            t_seed -= 1
    S = max(S, t_seed)
    Fp = int(pools[t_seed]) if t_seed < T else int(pools[-1])

    slot_plan = jnp.arange(Fp, dtype=_I32) % P
    plan = jnp.broadcast_to(slot_plan, (B, Fp))
    err = jnp.zeros((B, Fp), _I32)
    ovf_cap = jnp.zeros((B,), bool)
    ovf_far = jnp.zeros((B,), bool)
    if t_seed > 0:
        off = seed_level_offset(t_seed)
        pw = (4 ** np.arange(t_seed - 1, -1, -1, dtype=np.int64)).astype(np.uint32)
        mlos, sizes, olos, valids = [], [], [], []
        for p in range(P):
            a_p = int(pos_s[:t_seed, p].min())
            w = needles[:, a_p : a_p + t_seed].astype(_U32)  # [B, t_seed]
            okw = (w < 4).all(axis=-1)
            code = (jnp.minimum(w, 3) * jnp.asarray(pw)).sum(axis=-1)
            rc_code = ((_U32(3) - jnp.minimum(w, 3)) * jnp.asarray(pw[::-1])).sum(
                axis=-1
            )
            mlos.append(jnp.take(index.seed_mlo, (off + code).astype(_I32)))
            sizes.append(jnp.take(index.seed_size, (off + code).astype(_I32)))
            olos.append(jnp.take(index.seed_mlo, (off + rc_code).astype(_I32)))
            valids.append(okw)
        pad = Fp - P
        z = jnp.zeros((B, pad), _U32)

        def _col(parts, padv):
            return jnp.concatenate([jnp.stack(parts, axis=-1), padv], axis=-1)

        flo = _col(mlos, z)
        rlo = _col(olos, z)
        size = _col(sizes, z)
        valid = _col([v & (s > 0) for v, s in zip(valids, sizes)],
                     jnp.zeros((B, pad), bool))
    else:
        flo = jnp.zeros((B, Fp), _U32)
        rlo = jnp.zeros((B, Fp), _U32)
        size = jnp.where(jnp.arange(Fp) < P, _U32(n_total), _U32(0)) * jnp.ones(
            (B, 1), _U32
        )
        valid = jnp.broadcast_to(jnp.arange(Fp) < P, (B, Fp))

    pids = jnp.arange(P, dtype=_I32)

    def body_for(exact, F):
        def body(carry, x):
            flo, rlo, size, err, plan, valid, ovf_cap, ovf_far = carry
            pos, rightv, u, lreq = x  # [P] each
            nch_cands = needles[:, pos].astype(_U32)  # [B, P]
            ph = plan[..., None] == pids  # [B, F, P]
            phu = ph.astype(_U32)
            rv = (ph & rightv).any(axis=-1)
            u_st = (ph * u).sum(axis=-1)
            lreq_st = (ph * lreq).sum(axis=-1)
            nch = (phu * nch_cands[:, None, :]).sum(axis=-1)
            nflo, nrlo, nsize, err2, valid2, far = _candidate_step_dir(
                index, rv, flo, rlo, size, err, valid, nch,
                u_st[..., None], lreq_st[..., None], exact=exact,
            )
            A = nflo.shape[-1]
            plan_c = jnp.broadcast_to(plan[..., None], plan.shape + (A,))
            # (err, plan) ride one packed operand: compaction cost scales
            # with the operand count (sort passes / one-hot products)
            ep = (err2.astype(_U32) << _U32(4)) | plan_c.astype(_U32)
            arrays = tuple(_flatten2(a) for a in (nflo, nrlo, nsize, ep))
            v = _flatten2(valid2)
            occ_t = v.sum(axis=-1, dtype=_I32) if with_occ else None
            (flo, rlo, size, ep), valid, of = _compact(arrays, v, F)
            err = (ep >> _U32(4)).astype(_I32)
            plan = (ep & _U32(15)).astype(_I32)
            ovf_cap = ovf_cap | of
            ovf_far = ovf_far | far.any(axis=-1)
            return (flo, rlo, size, err, plan, valid, ovf_cap, ovf_far), occ_t

        return body

    def resize(carry, Fnew, Fold):
        if Fnew == Fold:
            return carry
        flo, rlo, size, err, plan, valid, ovf_cap, ovf_far = carry
        if Fnew > Fold:
            pad = Fnew - Fold

            def up(a):
                z = jnp.zeros(a.shape[:-1] + (pad,), a.dtype)
                return jnp.concatenate([a, z], axis=-1)

            return (up(flo), up(rlo), up(size), up(err), up(plan),
                    up(valid), ovf_cap, ovf_far)
        ep = (err.astype(_U32) << _U32(4)) | plan.astype(_U32)
        (flo, rlo, size, ep), valid, of = _compact(
            (flo, rlo, size, ep), valid, Fnew
        )
        err = (ep >> _U32(4)).astype(_I32)
        plan = (ep & _U32(15)).astype(_I32)
        return (flo, rlo, size, err, plan, valid, ovf_cap | of, ovf_far)

    carry = (flo, rlo, size, err, plan, valid, ovf_cap, ovf_far)
    occs = []
    if with_occ and t_seed > 0:
        occ0 = carry[5].sum(axis=-1, dtype=_I32)  # valid count after seed
        occs.append(jnp.broadcast_to(occ0, (t_seed, B)))
    Fcur = Fp
    t = t_seed
    while t < T:
        Fph = int(pools[t])
        hi = t
        while hi < T and int(pools[hi]) == Fph and ((hi < S) == (t < S)):
            hi += 1
        carry = resize(carry, Fph, Fcur)
        Fcur = Fph
        xs = (
            jnp.asarray(pos_s[t:hi]),
            jnp.asarray(right_s[t:hi]),
            jnp.asarray(u_s[t:hi]),
            jnp.asarray(lreq_s[t:hi]),
        )
        carry, ys = jax.lax.scan(body_for(t < S, Fph), carry, xs)
        if with_occ:
            occs.append(ys)
        t = hi
    flo, rlo, size, err, plan, valid, ovf_cap, ovf_far = carry
    out = ((flo, rlo, size, err, valid, plan), ovf_cap, ovf_far)
    if with_occ:
        occ = jnp.concatenate(occs, axis=0) if occs else jnp.zeros((0, B), _I32)
        occ = jnp.clip(occ, 0, 65535).astype(jnp.uint16)
        return out + (occ,)
    return out


def _search_infix_dimer(index, plans, infix_off, needles, B, tier: Tier,
                        n_total, exact_steps, n_static, probe=False,
                        pools=None, with_occ=False, stop_at=None):
    """Pooled infix search on the dimer table: ~half the gathers of the mono
    path.  Structure mirrors _search_infix (seeded prefix, per-step pool
    schedule, plan-id-carrying pooled states); steps consume 1 or 2 chars per
    the fused plan schedule, and the first fused steps whose chars fall in
    the exact prefix use the two-gather exact dimer path (wide intervals).

    `pools`/`with_occ`/split overflow flags: see _search_infix.  Pools are
    given in CHAR space (per-fused-step pools take the max over each step's
    consumed span); the occupancy output is mapped back to char space the
    same way, so the engine's calibration is gather-mode-agnostic."""
    P = len(plans)
    pos_s, right_s, u_s, lreq_s = _plan_schedule(plans, infix_off)
    T = len(pos_s)
    if pools is None:
        pools = infix_pool_schedule(plans, infix_off, n_static,
                                    tier.f_search / 4.0)
    pools = np.asarray(pools, np.int64)

    from genmap_tpu.ops.rank import seed_level_offset

    t_seed = 0
    if index.has_seed:
        t_seed = min(index.seed_t0, T)
        while t_seed > 0 and u_s[:t_seed].max() > 0:
            t_seed -= 1
    Fp = int(pools[t_seed]) if t_seed < T else int(pools[-1])

    slot_plan = jnp.arange(Fp, dtype=_I32) % P
    plan = jnp.broadcast_to(slot_plan, (B, Fp))
    err = jnp.zeros((B, Fp), _I32)
    ovf_cap = jnp.zeros((B,), bool)
    ovf_far = jnp.zeros((B,), bool)
    if t_seed > 0:
        off = seed_level_offset(t_seed)
        pw = (4 ** np.arange(t_seed - 1, -1, -1, dtype=np.int64)).astype(np.uint32)
        mlos, sizes, olos, valids = [], [], [], []
        for p in range(P):
            a_p = int(pos_s[:t_seed, p].min())
            w = needles[:, a_p : a_p + t_seed].astype(_U32)
            okw = (w < 4).all(axis=-1)
            code = (jnp.minimum(w, 3) * jnp.asarray(pw)).sum(axis=-1)
            rc_code = ((_U32(3) - jnp.minimum(w, 3)) * jnp.asarray(pw[::-1])).sum(
                axis=-1
            )
            mlos.append(jnp.take(index.seed_mlo, (off + code).astype(_I32)))
            sizes.append(jnp.take(index.seed_size, (off + code).astype(_I32)))
            olos.append(jnp.take(index.seed_mlo, (off + rc_code).astype(_I32)))
            valids.append(okw)
        pad = Fp - P
        z = jnp.zeros((B, pad), _U32)

        def _col(parts, padv):
            return jnp.concatenate([jnp.stack(parts, axis=-1), padv], axis=-1)

        flo = _col(mlos, z)
        rlo = _col(olos, z)
        size = _col(sizes, z)
        valid = _col([v & (s > 0) for v, s in zip(valids, sizes)],
                     jnp.zeros((B, pad), bool))
    else:
        flo = jnp.zeros((B, Fp), _U32)
        rlo = jnp.zeros((B, Fp), _U32)
        size = jnp.where(jnp.arange(Fp) < P, _U32(n_total), _U32(0)) * jnp.ones(
            (B, 1), _U32
        )
        valid = jnp.broadcast_to(jnp.arange(Fp) < P, (B, Fp))

    sched = _plan_schedule_fused(plans, infix_off, t_seed)
    Tf = sched.shape[1]
    if stop_at is not None:
        # truncate so NO plan consumes a char index >= the cut: the probe's
        # thresholds are computed from lreq_s[:cut] only, and a fused 2-char
        # step straddling the cut (charidx == cut-1, consume == 2) would
        # apply the lreq bound AT the cut — if a plan's l-bound ramps 0->1
        # exactly there, the extra consumed char kills the self-match while
        # the threshold still budgets 1 for it, silently skipping a block
        # with a genuine second occurrence.  Per plan: steps entirely past
        # the cut become passthrough; straddling 2-char steps become mono
        # steps consuming only their first char (exactly matching the mono
        # path's T = min(T, stop_at) semantics).
        cut = int(stop_at)
        sched = sched.copy()
        for p in range(len(plans)):
            for t in range(Tf):
                ci, co = int(sched[8, t, p]), int(sched[0, t, p])
                if co == 0 or ci + co <= cut:
                    continue
                if ci >= cut:
                    sched[0, t, p] = 0  # passthrough
                    sched[8, t, p] = T  # pad-step charidx sentinel
                else:  # straddle: consume the first char only
                    sched[0, t, p] = 1
                    sched[3, t, p] = sched[2, t, p]  # posB = posA
                    sched[5, t, p] = sched[4, t, p]  # u_end = u_mid
                    sched[7, t, p] = sched[6, t, p]  # l_end = l_mid
        keep = [
            t for t in range(Tf)
            if any(int(sched[0, t, p]) > 0 for p in range(len(plans)))
        ]
        Tf = (max(keep) + 1) if keep else 0
        sched = sched[:, :Tf]
    pids = jnp.arange(P, dtype=_I32)
    # per-fused-step pool size: widest over the plans' char positions
    charidx = sched[8]  # [Tf, P]
    # fused step t's pool: the max over its consumed char span — the entering
    # carry holds the PREVIOUS step's end-char survivors, so shrinking
    # straight to the end-char pool would skip a decay stage and compact a
    # still-large population into too few slots (measured: 83% of blocks
    # overflowed at (36,2) with end-char-only pools vs ~5% on the mono path)
    consume_s = sched[0]  # [Tf, P]
    pools_f = np.array(
        [
            max(
                int(
                    pools[
                        min(int(c), T - 1) : min(int(c) + max(1, int(k)), T)
                    ].max()
                )
                if int(c) < T
                else int(pools[T - 1])
                for c, k in zip(charidx[t], consume_s[t])
            )
            for t in range(Tf)
        ],
        np.int64,
    ) if Tf else np.zeros(0, np.int64)
    # exact (two-gather) fused steps: any active plan char in the exact
    # prefix; an exact TIER runs every step on the exact dimer path
    ex_lim = T if tier.exact else min(exact_steps, T)
    exact_f = np.array(
        [bool((charidx[t] < ex_lim).any()) for t in range(Tf)]
    ) if Tf else np.zeros(0, bool)

    def body_for(exact, F, with_mono, with_pass):
        def body(carry, x):
            flo, rlo, size, err, plan, valid, ovf_cap, ovf_far = carry
            consume, rightv, posA, posB, u_mid, u_end, l_mid, l_end = x  # [P]
            nchA_c = needles[:, posA].astype(_U32)  # [B, P]
            nchB_c = needles[:, posB].astype(_U32)
            ph = plan[..., None] == pids  # [B, F, P]
            phu = ph.astype(_U32)
            rv = (ph & (rightv > 0)).any(axis=-1)
            cons = (ph * consume).sum(axis=-1)
            um = (ph * u_mid).sum(axis=-1)
            ue = (ph * u_end).sum(axis=-1)
            lm = (ph * l_mid).sum(axis=-1)
            le = (ph * l_end).sum(axis=-1)
            nchA = (phu * nchA_c[:, None, :]).sum(axis=-1)
            nchB = (phu * nchB_c[:, None, :]).sum(axis=-1)
            nflo, nrlo, nsize, err2, valid2, far = _candidate_step_fused(
                index, rv, cons, flo, rlo, size, err, valid, nchA, nchB,
                um[..., None], ue[..., None], lm[..., None], le[..., None],
                exact=exact, with_mono=with_mono, with_pass=with_pass,
            )
            A = nflo.shape[-1]
            plan_c = jnp.broadcast_to(plan[..., None], plan.shape + (A,))
            # (err, plan) ride one packed operand: compaction cost scales
            # with the operand count (sort passes / one-hot products)
            ep = (err2.astype(_U32) << _U32(4)) | plan_c.astype(_U32)
            arrays = tuple(_flatten2(a) for a in (nflo, nrlo, nsize, ep))
            v = _flatten2(valid2)
            occ_t = v.sum(axis=-1, dtype=_I32) if with_occ else None
            (flo, rlo, size, ep), valid, of = _compact(arrays, v, F)
            err = (ep >> _U32(4)).astype(_I32)
            plan = (ep & _U32(15)).astype(_I32)
            ovf_cap = ovf_cap | of
            ovf_far = ovf_far | far.any(axis=-1)
            return (flo, rlo, size, err, plan, valid, ovf_cap, ovf_far), occ_t

        return body

    def resize(carry, Fnew, Fold):
        if Fnew == Fold:
            return carry
        flo, rlo, size, err, plan, valid, ovf_cap, ovf_far = carry
        if Fnew > Fold:
            pad = Fnew - Fold

            def up(a):
                z = jnp.zeros(a.shape[:-1] + (pad,), a.dtype)
                return jnp.concatenate([a, z], axis=-1)

            return (up(flo), up(rlo), up(size), up(err), up(plan),
                    up(valid), ovf_cap, ovf_far)
        ep = (err.astype(_U32) << _U32(4)) | plan.astype(_U32)
        (flo, rlo, size, ep), valid, of = _compact(
            (flo, rlo, size, ep), valid, Fnew
        )
        err = (ep >> _U32(4)).astype(_I32)
        plan = (ep & _U32(15)).astype(_I32)
        return (flo, rlo, size, err, plan, valid, ovf_cap | of, ovf_far)

    # step kinds (STATIC per scan segment): whether any plan does a 1-char
    # step / pads this step — all-dimer segments skip those branches entirely
    kind = [
        (bool((consume_s[t] == 1).any()), bool((consume_s[t] == 0).any()))
        for t in range(Tf)
    ]

    carry = (flo, rlo, size, err, plan, valid, ovf_cap, ovf_far)
    occs_f = []
    if with_occ:
        occ0 = carry[5].sum(axis=-1, dtype=_I32)
        occs_f.append(jnp.broadcast_to(occ0, (1, B)))  # post-seed state
    Fcur = Fp
    t = 0
    while t < Tf:
        Fph = int(pools_f[t])
        hi = t
        while (
            hi < Tf
            and int(pools_f[hi]) == Fph
            and exact_f[hi] == exact_f[t]
            and kind[hi] == kind[t]
        ):
            hi += 1
        carry = resize(carry, Fph, Fcur)
        Fcur = Fph
        xs = tuple(jnp.asarray(sched[k, t:hi]) for k in range(8))
        carry, ys = jax.lax.scan(
            body_for(bool(exact_f[t]), Fph, kind[t][0], kind[t][1]), carry, xs
        )
        if with_occ:
            occs_f.append(ys)
        t = hi
    flo, rlo, size, err, plan, valid, ovf_cap, ovf_far = carry
    out = ((flo, rlo, size, err, valid, plan), ovf_cap, ovf_far)
    if with_occ:
        # map fused-step counts back to CHAR space: char c takes the max over
        # the seed row (index 0) and every fused step whose consumed span
        # covers c for any plan — the exact inverse of the pools_f derivation,
        # so calibrated pools stay consistent across gather modes
        occ_f = jnp.concatenate(occs_f, axis=0)  # [1 + Tf, B]
        rows = []
        for c in range(T):
            cover = [0] if c < t_seed else []
            for t in range(Tf):
                for p in range(P):
                    c0, k = int(charidx[t, p]), int(consume_s[t, p])
                    if k > 0 and c0 <= c < c0 + k:
                        cover.append(t + 1)
            if not cover:
                cover = [0]
            r = occ_f[cover[0]]
            for i in cover[1:]:
                r = jnp.maximum(r, occ_f[i])
            rows.append(r)
        occ = jnp.clip(jnp.stack(rows, axis=0), 0, 65535).astype(jnp.uint16)
        return out + (occ,)
    return out


def _ext_phase(index, state, needles, pos_arr, right_arr, act_arr, Fe, errors,
               exact, with_occ=False):
    """One mixed-direction extension scan over a [B, M, Fe] frontier.

    pos_arr / right_arr / act_arr: [T, M] static needle position, direction
    and activity per (step, slot).  Slots may move in different directions in
    the same step (one shared gather, see _candidate_step_dir); inactive
    slots pass through.  `with_occ` returns (state, occ[B]): the max over
    steps and nodes of the per-(block, node) candidate count (the extension
    pool-schedule calibration signal).
    """
    if len(pos_arr) == 0:
        return (state, jnp.zeros(state[0].shape[0], _I32)) if with_occ else state
    xs = (
        jnp.asarray(pos_arr, _I32),
        jnp.asarray(right_arr),
        jnp.asarray(act_arr),
    )

    def body(carry, x):
        *st, occ = carry
        flo, rlo, size, err, valid, ovf_cap, ovf_far = st
        pos, rightv, act = x  # [M] each
        nch = needles[:, pos].astype(_U32)[:, :, None]  # [B, M, 1]
        nflo, nrlo, nsize, err2, valid2, far = _candidate_step_dir(
            index, rightv[None, :, None], flo, rlo, size, err, valid, nch,
            errors, 0, exact=exact,
        )
        A = nflo.shape[-1]
        actb = act[None, :, None, None]
        c0 = (jnp.arange(A) == 0).reshape(1, 1, 1, A)
        # inactive slots pass their states through candidate slot 0
        nflo = jnp.where(actb, nflo, flo[..., None])
        nrlo = jnp.where(actb, nrlo, rlo[..., None])
        nsize = jnp.where(actb, nsize, size[..., None])
        err2 = jnp.where(actb, err2, err[..., None])
        valid2 = jnp.where(actb, valid2, valid[..., None] & c0)
        arrays = tuple(_flatten2(a) for a in (nflo, nrlo, nsize, err2))
        v = _flatten2(valid2)
        if with_occ:
            occ = jnp.maximum(occ, v.sum(axis=-1, dtype=_I32).max(axis=-1))
        (flo, rlo, size, err), valid, of = _compact(arrays, v, Fe)
        ovf_cap = ovf_cap | of.any(axis=-1)
        ovf_far = ovf_far | (far & act[None, :, None]).any(axis=(-2, -1))
        return (flo, rlo, size, err, valid, ovf_cap, ovf_far, occ), None

    occ0 = jnp.zeros(state[0].shape[0], _I32)
    carry, _ = jax.lax.scan(body, tuple(state) + (occ0,), xs)
    state, occ = carry[:-1], carry[-1]
    return (state, occ) if with_occ else state


def _balanced_schedule(n_right, n_left, pos_right, pos_left):
    """[T, M] (pos, right, act) arrays: slot m does its n_right[m] right
    steps then its n_left[m] left steps, all slots in lockstep.

    pos_right[m][t] / pos_left[m][t] give the needle position of slot m's
    t-th step in that direction.  The per-slot totals are (near-)equal by
    construction of the k-mer block geometry, so the merged timeline is
    ~half the length of a right-phase-then-left-phase schedule.
    """
    M = len(n_right)
    T = int(max(int(n_right[m] + n_left[m]) for m in range(M)) if M else 0)
    pos = np.zeros((T, M), np.int32)
    right = np.zeros((T, M), bool)
    act = np.zeros((T, M), bool)
    for m in range(M):
        nr, nl = int(n_right[m]), int(n_left[m])
        for t in range(nr):
            pos[t, m] = pos_right[m][t]
            right[t, m] = True
            act[t, m] = True
        for t in range(nl):
            pos[nr + t, m] = pos_left[m][t]
            act[nr + t, m] = True
    return pos, right, act


def _balanced_schedule_fused(n_right, n_left, pos_right, pos_left):
    """Fused analog of _balanced_schedule: [T, M] (consume, right, posA, posB).

    Each slot's right run then left run, chars fused pairwise within a run
    (runs are same-direction by construction); odd runs end with one
    single-char step.  Slots pad with consume=0 (passthrough).
    """
    M = len(n_right)
    per_slot = []
    for m in range(M):
        steps = []
        for is_right, run, posl in (
            (True, int(n_right[m]), pos_right[m]),
            (False, int(n_left[m]), pos_left[m]),
        ):
            i = 0
            while i < run:
                if i + 1 < run:
                    steps.append((2, is_right, posl[i], posl[i + 1]))
                    i += 2
                else:
                    steps.append((1, is_right, posl[i], posl[i]))
                    i += 1
        per_slot.append(steps)
    T = max((len(s) for s in per_slot), default=0)
    out = np.zeros((4, T, M), np.int32)
    for m, steps in enumerate(per_slot):
        for t, s in enumerate(steps):
            out[0, t, m] = s[0]
            out[1, t, m] = int(s[1])
            out[2, t, m] = s[2]
            out[3, t, m] = s[3]
    return out


def _ext_phase_fused(index, state, needles, sched, Fe, errors, exact,
                     with_occ=False):
    """One mixed-direction fused extension scan over a [B, M, Fe] frontier.

    sched: [4, T, M] (consume, right, posA, posB) static arrays; slots with
    consume=0 pass through (built into _candidate_step_fused).  The
    extension's error bound is a single cumulative cap, so the fused step's
    mid-bound check is implied (errors only accumulate).  `with_occ`: see
    _ext_phase."""
    if sched.shape[1] == 0:
        return (state, jnp.zeros(state[0].shape[0], _I32)) if with_occ else state
    zero = jnp.zeros((), _I32)

    def body_for(with_mono, with_pass):
        def body(carry, x):
            *st, occ = carry
            flo, rlo, size, err, valid, ovf_cap, ovf_far = st
            consume, rightv, posA, posB = x  # [M] each
            nchA = needles[:, posA].astype(_U32)[:, :, None]  # [B, M, 1]
            nchB = needles[:, posB].astype(_U32)[:, :, None]
            nflo, nrlo, nsize, err2, valid2, far = _candidate_step_fused(
                index, (rightv > 0)[None, :, None], consume[None, :, None],
                flo, rlo, size, err, valid, nchA, nchB,
                errors, errors, zero, zero, exact=exact,
                with_mono=with_mono, with_pass=with_pass,
            )
            arrays = tuple(_flatten2(a) for a in (nflo, nrlo, nsize, err2))
            v = _flatten2(valid2)
            if with_occ:
                occ = jnp.maximum(
                    occ, v.sum(axis=-1, dtype=_I32).max(axis=-1)
                )
            (flo, rlo, size, err), valid, of = _compact(arrays, v, Fe)
            ovf_cap = ovf_cap | of.any(axis=-1)
            ovf_far = ovf_far | far.any(axis=(-2, -1))
            return (flo, rlo, size, err, valid, ovf_cap, ovf_far, occ), None

        return body

    T = sched.shape[1]
    kind = [
        (bool((sched[0, t] == 1).any()), bool((sched[0, t] == 0).any()))
        for t in range(T)
    ]
    occ0 = jnp.zeros(state[0].shape[0], _I32)
    carry = tuple(state) + (occ0,)
    t = 0
    while t < T:
        hi = t
        while hi < T and kind[hi] == kind[t]:
            hi += 1
        xs = tuple(jnp.asarray(sched[k, t:hi]) for k in range(4))
        carry, _ = jax.lax.scan(body_for(kind[t][0], kind[t][1]), carry, xs)
        t = hi
    state, occ = carry[:-1], carry[-1]
    return (state, occ) if with_occ else state


def _tree_levels(J: int, K: int) -> list:
    """Binary doubling-split plan over the k-mer range [0, J).

    Returns a list of levels; each level is (pmap, n_right, n_left,
    pos_right, pos_left) describing how every child slot derives from its
    parent (pmap) and which needle chars it consumes in each direction.
    A node covering k-mers [a, b) holds the needle span [b-1, a+K) — the
    longest span common to all its k-mers; splitting at m = (a+b)//2 extends
    the left child [a, m) LEFTWARD by b-m chars (positions b-2 .. m-1) and
    the right child [m, b) RIGHTWARD by m-a chars (positions a+K .. m+K-1).
    Size-1 nodes pass through unchanged so the final leaf order is 0..J-1."""
    levels = []
    nodes = [(0, J)]
    while any(b - a > 1 for a, b in nodes):
        pmap, children = [], []
        n_right, n_left, pos_right, pos_left = [], [], [], []
        for i, (a, b) in enumerate(nodes):
            if b - a == 1:
                pmap.append(i)
                children.append((a, b))
                n_right.append(0)
                n_left.append(0)
                pos_right.append([])
                pos_left.append([])
            else:
                m = (a + b) // 2
                pmap.append(i)
                children.append((a, m))
                n_right.append(0)
                n_left.append(b - m)
                pos_right.append([])
                pos_left.append([b - 2 - t for t in range(b - m)])
                pmap.append(i)
                children.append((m, b))
                n_right.append(m - a)
                n_left.append(0)
                pos_right.append([a + K + t for t in range(m - a)])
                pos_left.append([])
        levels.append(
            (np.asarray(pmap, np.int32), n_right, n_left, pos_right, pos_left)
        )
        nodes = children
    assert nodes == [(j, j + 1) for j in range(J)]
    return levels


def _extend_to_kmers(index, survivors, needles, B, J, K, tier: Tier, errors,
                     fe_sched=None, with_occ=False):
    """Extend infix survivors to every k-mer window of each block.

    k-mer j covers needle positions [j, j+K); the infix covers [J-1, K).
    The lockstep counterpart of the reference's doubling extension
    (algo.hpp:26-218) is a binary tree over the k-mer range (_tree_levels):
    each level doubles the node count while halving the per-node char count,
    so total extension gathers are ~2·log2(J) per k-mer instead of the
    ~4·sqrt(J) of a flat two-level grouping — and left- and right-moving
    slots share each step's single row gather (_candidate_step_dir).

    `fe_sched` (optional, [n_levels + 1] ints) sets a PER-LEVEL frontier
    width (index 0 = the root compaction): per-node state demand shrinks as
    nodes cover fewer k-mers and more consumed chars, so a measured decay
    schedule gathers a fraction of a flat f_extend's rows.  Exceeding a
    level's width sets the capacity-overflow flag exactly like a flat
    frontier (the engine re-runs the extension at a wider rung).  `with_occ`
    additionally returns the per-level maximum of per-(block, node)
    candidate counts ([B, n_levels + 1] — the calibration signal)."""
    ext_exact = tier.exact if tier.ext_exact is None else tier.ext_exact
    Fe = tier.f_extend
    levels = _tree_levels(J, K)
    if fe_sched is None:
        fe_sched = [Fe] * (len(levels) + 1)
    assert len(fe_sched) == len(levels) + 1
    s_flo, s_rlo, s_size, s_err, s_valid = survivors[:5]
    ovf0 = jnp.zeros((B,), bool)
    occs = []

    # compact survivors into the root slots (node covering [0, J))
    F0 = int(fe_sched[0])
    arrays = (s_flo, s_rlo, s_size, s_err)
    if with_occ:
        occs.append(s_valid.sum(axis=-1, dtype=_I32))
    (r_flo, r_rlo, r_size, r_err), r_valid, of = _compact(arrays, s_valid, F0)
    ovf0 = ovf0 | of

    state = (
        r_flo[:, None, :], r_rlo[:, None, :], r_size[:, None, :],
        r_err[:, None, :], r_valid[:, None, :], ovf0,
        jnp.zeros((B,), bool),
    )

    for li, (pmap, n_right, n_left, pos_right, pos_left) in enumerate(levels):
        Fl = int(fe_sched[li + 1])
        flo, rlo, size, err, valid, ovf_cap, ovf_far = state
        jm = jnp.asarray(pmap)
        state = tuple(
            jnp.take(a, jm, axis=1) for a in (flo, rlo, size, err, valid)
        ) + (ovf_cap, ovf_far)
        if Fl != state[0].shape[-1]:
            # level resize: shrink by compaction (demand decays down the
            # tree), grow by zero-padding
            flo, rlo, size, err, valid, ovf_cap, ovf_far = state
            Fo = flo.shape[-1]
            if Fl > Fo:
                def up(a):
                    z = jnp.zeros(a.shape[:-1] + (Fl - Fo,), a.dtype)
                    return jnp.concatenate([a, z], axis=-1)

                state = (up(flo), up(rlo), up(size), up(err), up(valid),
                         ovf_cap, ovf_far)
            else:
                (flo, rlo, size, err), valid2, of = _compact(
                    (flo, rlo, size, err), valid, Fl
                )
                state = (flo, rlo, size, err, valid2,
                         ovf_cap | of.any(axis=-1), ovf_far)
        occ_l = None
        if tier.dimer:
            sched = _balanced_schedule_fused(n_right, n_left, pos_right, pos_left)
            if sched.shape[1]:
                # honor tier.exact: a forced exact dimer tier must use the
                # two-gather dimer path so wide intervals compute instead of
                # far-flagging with no tier left to escalate to
                res = _ext_phase_fused(index, state, needles, sched, Fl,
                                       errors, exact=ext_exact,
                                       with_occ=with_occ)
                state, occ_l = res if with_occ else (res, None)
        else:
            pos, right, act = _balanced_schedule(n_right, n_left, pos_right, pos_left)
            if len(pos):
                res = _ext_phase(index, state, needles, pos, right, act, Fl,
                                 errors, ext_exact, with_occ=with_occ)
                state, occ_l = res if with_occ else (res, None)
        if with_occ:
            if occ_l is None:  # stepless level: demand = carried states
                occ_l = state[4].sum(axis=-1, dtype=_I32).max(axis=-1)
            occs.append(occ_l)

    flo, rlo, size, err, valid, ovf_cap, ovf_far = state
    out = ((flo, rlo, size, err, valid), ovf_cap, ovf_far)
    if with_occ:
        occ = jnp.clip(jnp.stack(occs, axis=1), 0, 65535).astype(jnp.uint16)
        return out + (occ,)
    return out


def block_mapper_impl(
    index, needles, cnt, n_total, *, plans, infix_off, J, K, tier, errors,
    cap, rev_compl, with_states, exact_steps=64, n_static=None,
    probe_only=False, with_exact=False, pools=None, with_occ=False,
    probe_cut=None, collect_only=False,
):
    """One batch of the block mapper (shared by the single-part, data-sharded
    and part-sharded paths; `n_total` may be a traced scalar under the
    part-sharded mesh — `exact_steps` and `n_static` (the largest part size,
    used for the static pool schedule) must then be computed host-side).

    `pools` (optional) replaces the static infix pool schedule with
    occupancy-calibrated per-step capacities; `with_occ` adds the measured
    per-block per-step candidate counts to the output (the calibration
    input, see MappabilityEngine._execute_blocks)."""
    from genmap_tpu.ops.rank import rc_strand_count

    Bl = needles.shape[0]  # local batch (per shard under shard_map)
    infix_fn = _search_infix_dimer if tier.dimer else _search_infix
    infix_out = infix_fn(
        index, plans, infix_off, needles, Bl, tier, n_total, exact_steps,
        n_static if n_static is not None else n_total, probe=probe_only,
        pools=pools, with_occ=with_occ,
        stop_at=probe_cut if probe_only else None,
    )
    survivors, cap1, far1 = infix_out[:3]
    occ = infix_out[3] if with_occ else None
    ovf1 = cap1 | far1
    if probe_only:
        # unique-infix short-circuit probe with PER-PLAN masses.  Sound at
        # any scan prefix (the probe cut): every occurrence W of the
        # infix's <=e neighborhood survives in the plan of its error
        # pattern (the full pattern obeys that plan's l/u bounds at every
        # step), and the self-match survives in exactly the plans whose
        # cumulative l-bound is still 0 at the cut.  So if every
        # self-carrying plan has mass <= 1 and every other plan has mass 0,
        # the self-match is the only occurrence and every k-mer frequency
        # is exactly 1 (count sandwiched between the self-match and the
        # neighborhood mass); the whole extension phase is skipped.  Blocks
        # whose window contains an N (such k-mers match nothing, not even
        # themselves) or that overflow are not skippable.  Summing per-plan
        # masses over index parts preserves the argument (the self-match
        # lives in one part; any other part's surviving row is a real
        # second occurrence).
        s_flo, s_rlo, s_size, s_err, s_valid, s_plan = survivors
        P_n = len(plans)
        pm = (s_plan[..., None] == jnp.arange(P_n, dtype=_I32)) & s_valid[..., None]
        mass_p = jnp.where(pm, s_size[..., None], _U32(0)).sum(
            axis=-2, dtype=_U32
        )  # [B, P]
        thr = jnp.asarray(
            probe_thresholds(
                plans, infix_off,
                probe_cut if probe_cut is not None else None,
            ),
            _U32,
        )
        if index.has_n:
            nwin = (needles == 4).any(axis=-1)
        else:
            nwin = jnp.zeros((Bl,), bool)
        if probe_only == "bits":
            # single-part fast path: decide on device and ship one PACKED
            # bitmap — the tunneled device link is bandwidth-starved
            # (~4 MB/s measured), so per-block uint32 outputs dominated the
            # probe wall time
            skip = (mass_p <= thr).all(axis=-1) & ~ovf1 & ~nwin
            sb = skip.reshape(-1, 32).astype(_U32)
            bits = (sb << jnp.arange(32, dtype=_U32)).sum(axis=-1, dtype=_U32)
            return dict(skip_bits=bits)
        return dict(mass_p=mass_p, nwin=nwin, overflow=ovf1)
    if collect_only:
        # SPLIT-PIPELINE phase A: pack the infix survivors to the front of
        # their (final-pool-width) slots and return the state tensors
        # (device-resident).  The engine fetches only `surv` and routes each
        # block to a phase-B extension program sized to its MEASURED
        # survivor rung instead of the tier's worst case; extension
        # overflows re-run only the extension at the next rung with the
        # same device-resident states.  Packing at native width loses
        # nothing: the survivor count is bounded by the final pool.
        s_flo, s_rlo, s_size, s_err, s_valid = survivors[:5]
        surv = jnp.clip(
            s_valid.sum(axis=-1, dtype=_I32), 0, 65535
        ).astype(jnp.uint16)
        (c_flo, c_rlo, c_size, c_err), c_valid, _of = _compact(
            (s_flo, s_rlo, s_size, s_err), s_valid, s_flo.shape[-1]
        )
        return dict(
            flo=c_flo, rlo=c_rlo, size=c_size, err=c_err, valid=c_valid,
            surv=surv, overflow=ovf1, overflow_cap=cap1,
        )
    states, cap2, far2 = _extend_to_kmers(index, survivors, needles, Bl, J, K,
                                          tier, errors)
    out = _count_tail(index, states, cnt, J, cap, rev_compl,
                      with_states=with_states, with_exact=with_exact)
    out["overflow"] = out["overflow"] | ovf1 | cap2 | far2
    # capacity overflow reported separately: the engine escalates these
    # straight to a wider tier (a same-size exact tier would re-overflow)
    # while far-only blocks go to the next exact tier
    out["overflow_cap"] = out["overflow_cap"] | cap1 | cap2
    if with_occ:
        out["occ"] = occ.T  # [B, T] for batch-axis sharding
        # infix survivor count: the extension frontier's demand (the root
        # node holds all survivors; splits never exceed it) — calibrates
        # the cohort's f_extend
        out["surv"] = jnp.clip(
            survivors[4].sum(axis=-1, dtype=_I32), 0, 65535
        ).astype(jnp.uint16)
    return out


def _count_tail(index, states, cnt, J, cap, rev_compl, with_states=False,
                with_exact=False):
    """Frequency counts (and CSV/exact outputs) from final extension states."""
    from genmap_tpu.ops.rank import rc_strand_count

    flo, rlo, size, err, valid = states

    # the index covers both strands; size counts fwd + rc occurrences.
    # forward-only sizes (for -nc and for exact-duplicate detection) come
    # from the strand rank rows.
    need_fwd = (not rev_compl) or with_states or with_exact
    if need_fwd:
        rc_in = rc_strand_count(index, flo + size) - rc_strand_count(index, flo)
        fwd_size = size - rc_in
    counting = size if rev_compl else fwd_size
    contrib = jnp.where(valid, jnp.minimum(counting, _U32(cap)), _U32(0))
    hits = jnp.minimum(contrib.sum(axis=-1, dtype=_U32), _U32(cap))

    valid_j = jnp.arange(J, dtype=_I32)[None, :] < cnt[:, None]
    # uint16 suffices (cap <= 65535 always) and the device link is the
    # bottleneck for result fetches
    out = dict(
        hits=jnp.where(valid_j, hits, 0).astype(jnp.uint16),
        overflow=jnp.zeros(hits.shape[:-1], bool),
        overflow_cap=jnp.zeros(hits.shape[:-1], bool),
    )
    if with_exact or with_states:
        exact_mask = valid & (err == 0)
        exact_total = jnp.where(exact_mask, size, 0).sum(axis=-1, dtype=_U32)
        exact_flo = jnp.where(exact_mask, flo, 0).sum(axis=-1, dtype=_U32)
        exact_fwd = (
            jnp.where(exact_mask, fwd_size, 0).sum(axis=-1, dtype=_U32)
            if need_fwd
            else exact_total
        )
        out["exact_size"] = jnp.where(valid_j, exact_fwd, 0)
        out["exact_size_total"] = jnp.where(valid_j, exact_total, 0)
        out["exact_flo"] = exact_flo
    if with_states:
        out["states"] = (flo, size, err, valid)
    return out


def make_block_mapper(
    index: DeviceIndex,
    dtext,
    *,
    K: int,
    errors: int,
    overlap: int,
    J: int,
    B: int,
    tier: Tier,
    cap: int,
    rev_compl: bool,
    with_states: bool = False,
    mesh=None,
    probe_only=False,
    with_exact: bool = False,
    pools=None,
    with_occ: bool = False,
    probe_cut=None,
    collect_only: bool = False,
):
    """Build the jitted batch mapper for one configuration.

    Input per batch: starts [B] uint32 global base positions, cnt [B] int32 =
    number of valid k-mers per block, limit (traced scalar) = exclusive end
    of the current file's bases.  Needle windows are extracted on device from
    the packed text (`dtext`, ops/rank.py DeviceText) — a dispatch ships only
    the starts.  The index holds both strands, so a single pass
    yields the combined fwd+rc frequency (reference: two passes,
    algo.hpp:284-308); rev_compl=False subtracts rc-strand occurrences via
    the strand rank rows.

    Output: dict with hits [B, J] uint32 (clamped to cap), exact_size
    (forward-strand zero-error occurrence count, for the same-kmer
    duplication logic, algo.hpp:389-396), exact_size_total / exact_flo (the
    zero-error interval over both strands), overflow [B] bool, and, when
    with_states, the final extension state tensors for CSV location listing.
    """
    o = overlap
    assert o == K - J + 1
    if not 0 < cap <= 65535:
        raise ValueError(
            f"cap must be in [1, 65535] (uint16 result path), got {cap}"
        )
    plans = plans_for(errors, o)
    infix_off = K - o
    n_total = index.n_total
    if tier.dimer:
        assert index.has_dimer, "dimer tier on an index without dimer rows"
    ex_steps = exact_prefix_steps(n_total, 16 if tier.dimer else 64)

    from genmap_tpu.ops.rank import extract_needles

    Ln = K + J - 1

    def run_impl(index, dtext, starts, cnt, limit):
        needles = extract_needles(dtext, starts, Ln, limit)
        return block_mapper_impl(
            index, needles, cnt, n_total, plans=plans, infix_off=infix_off,
            J=J, K=K, tier=tier, errors=errors, cap=cap, rev_compl=rev_compl,
            with_states=with_states, exact_steps=ex_steps,
            probe_only=probe_only, with_exact=with_exact, pools=pools,
            with_occ=with_occ, probe_cut=probe_cut, collect_only=collect_only,
        )

    def _attach_warm(run, run_jit, batch_sharding=None):
        """`run.warm()` AOT-compiles the program without executing it — the
        engine overlaps escalation-tier compiles with tier-0 execution
        (remote TPU compiles cost minutes cold, NOTES.md).

        `run.run_jit` / `run.index` / `run.dtext` expose the underlying
        jitted impl and its array arguments: a caller embedding the mapper
        inside an OUTER jit (bench.py's in-graph scan loops) must pass the
        index as runtime arguments — calling `run` under a trace bakes the
        multi-GB rank tables into the program as literals, which the remote
        compile service rejects (HTTP 413) at genome scale."""

        def warm():
            st = jax.ShapeDtypeStruct((B,), jnp.uint32,
                                      sharding=batch_sharding)
            ct = jax.ShapeDtypeStruct((B,), jnp.int32,
                                      sharding=batch_sharding)
            lim = jax.ShapeDtypeStruct((), jnp.uint32)
            run_jit.lower(index, dtext, st, ct, lim).compile()

        run.warm = warm
        run.run_jit = run_jit
        run.index = index
        run.dtext = dtext
        return run

    if mesh is None:
        run_jit = jax.jit(run_impl)

        def run(starts, cnt, limit):
            return run_jit(index, dtext, starts, cnt, limit)

        return _attach_warm(run, run_jit)

    # sharded execution: per-shard local programs via shard_map (the SPMD
    # partitioner otherwise inserts all-gathers around the compaction
    # scatters); the index and text are replicated, blocks split along 'data'
    from jax.sharding import NamedSharding, PartitionSpec as P

    smapped = jax.shard_map(
        run_impl,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P()),
        out_specs=P("data"),
        check_vma=False,  # scan carries start as replicated zeros
    )
    run_jit = jax.jit(smapped)

    def run(starts, cnt, limit):
        return run_jit(index, dtext, starts, cnt, limit)

    return _attach_warm(run, run_jit, NamedSharding(mesh, P("data")))


def make_extender(
    index: DeviceIndex,
    dtext,
    *,
    K: int,
    errors: int,
    overlap: int,
    J: int,
    B: int,
    Fe: int,
    cap: int,
    rev_compl: bool,
    exact: bool,
    dimer: bool = False,
    fe_sched=None,
    with_occ: bool = False,
):
    """Phase-B program of the split pipeline: extend device-resident infix
    survivor states to every k-mer window, sized to an Fe RUNG.

    The engine fetches only each block's survivor count from the phase-A
    collector, buckets blocks into power-of-4 Fe rungs, gathers their state
    tensors ON DEVICE into a rung batch, and runs this program — so
    extension work scales with each block's measured demand instead of a
    whole cohort padding to its worst member, and an extension overflow
    re-runs ONLY the extension at the next rung (the infix never repeats).
    Escalation semantics stay exact: rung capacity (like tier capacity)
    only affects speed.

    `exact=False` uses the one-gather fast rank path; far-flagged blocks
    re-run on the exact variant at the same rung.  `fe_sched` applies a
    measured per-LEVEL frontier schedule (demand decays down the doubling
    tree); `with_occ` returns the per-level demand maxima that calibrate
    it."""
    tier = Tier(4, max(4, Fe), Fe, exact=exact, dimer=dimer,
                ext_exact=exact)
    Ln = K + J - 1
    if fe_sched is not None:
        fe_sched = tuple(int(x) for x in fe_sched)

    from genmap_tpu.ops.rank import extract_needles

    def run_impl(index, dtext, starts, cnt, limit, flo, rlo, size, err, valid):
        needles = extract_needles(dtext, starts, Ln, limit)
        ext = _extend_to_kmers(
            index, (flo, rlo, size, err, valid), needles, B, J, K, tier,
            errors, fe_sched=fe_sched, with_occ=with_occ,
        )
        states, cap2, far2 = ext[:3]
        out = _count_tail(index, states, cnt, J, cap, rev_compl)
        out["overflow"] = out["overflow"] | cap2 | far2
        out["overflow_cap"] = out["overflow_cap"] | cap2
        if with_occ:
            out["ext_occ"] = ext[3]
        return out

    run_jit = jax.jit(run_impl)

    def run(starts, cnt, limit, states):
        flo, rlo, size, err, valid = states
        return run_jit(index, dtext, starts, cnt, limit, flo, rlo, size, err,
                       valid)

    run.run_jit = run_jit
    run.index = index
    run.dtext = dtext
    return run
