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

from genmap_tpu.ops.rank import DeviceIndex, extend_all
from genmap_tpu.search.schemes import plans_for

_U32 = jnp.uint32
_I32 = jnp.int32


@dataclass(frozen=True)
class Tier:
    """Frontier capacities: infix search, collected survivors, extension."""

    f_search: int
    f_collect: int
    f_extend: int


DEFAULT_TIERS = (
    Tier(4, 4, 1),
    Tier(8, 8, 4),
    Tier(32, 64, 32),
    Tier(256, 512, 256),
    Tier(2048, 4096, 2048),
    Tier(16384, 32768, 16384),
)


def _compact(arrays, valid, F):
    """Keep (up to) F valid states; returns (arrays, valid, overflowed).

    Order-free compaction (hit order never matters: counts are saturating
    sums) via prefix-sum ranks and one-hot masked SUMS — all dense VPU work.
    Scatter (round 1) and sort/top_k lower to serialized/slow TPU code;
    the [..., F, M] one-hot products stay small because F and M are small.
    """
    M = valid.shape[-1]
    nvalid = valid.sum(axis=-1, dtype=_I32)
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


def _candidate_step(index, right, flo, rlo, size, err, valid, nch, e_or_u, lreq):
    """Extend every state by every candidate char; return [..., A] candidates.

    nch broadcasts against the state batch shape; e_or_u/lreq are the error
    bounds after this step (scalars or broadcastable).
    """
    mlo = rlo if right else flo
    olo = flo if right else rlo
    nmlo, nsize, nolo = extend_all(index, right, mlo, size, olo)
    A = nmlo.shape[-1]
    cand = jnp.arange(A, dtype=_U32)
    cshape = (1,) * (nch.ndim) + (A,)
    delta = (cand.reshape(cshape) != nch[..., None]) | (nch[..., None] == 4)
    err2 = err[..., None] + delta.astype(_I32)
    valid2 = valid[..., None] & (err2 <= e_or_u) & (err2 >= lreq) & (nsize > 0)
    nflo = nolo if right else nmlo
    nrlo = nmlo if right else nolo
    return nflo, nrlo, nsize, err2, valid2


def _candidate_step_dir(index, rightv, flo, rlo, size, err, valid, nch, e_or_u, lreq):
    """Mixed-direction candidate step: `rightv` is a per-state bool (or
    broadcastable) choosing the extension side.

    Both directions read the SAME FMD table (ops/rank.py), so one row gather
    serves every state regardless of direction — this is what lets left- and
    right-moving lanes run in the same lockstep step (balanced schedules cut
    the step count ~2-3x; each step's cost is gather-latency-bound).
    """
    from genmap_tpu.ops.rank import comp_perm, extend_core

    mlo = jnp.where(rightv, rlo, flo)
    olo = jnp.where(rightv, flo, rlo)
    nmlo, nsize, nolo = extend_core(index, mlo, size, olo)
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
    valid2 = valid[..., None] & (err2 <= e_or_u) & (err2 >= lreq) & (nsz > 0)
    return nflo, nrlo, nsz, err2, valid2


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


def _search_infix(index, plans, infix_off, needles, B, tier: Tier, n_total):
    """All search schemes in one lockstep scan; survivors in [B, f_collect]."""
    F = tier.f_search
    P = len(plans)
    pos_s, right_s, u_s, lreq_s = _plan_schedule(plans, infix_off)

    flo = jnp.zeros((B, P, F), _U32)
    rlo = jnp.zeros((B, P, F), _U32)
    size = jnp.zeros((B, P, F), _U32).at[:, :, 0].set(_U32(n_total))
    err = jnp.zeros((B, P, F), _I32)
    valid = jnp.zeros((B, P, F), bool).at[:, :, 0].set(True)
    ovf = jnp.zeros((B,), bool)

    xs = (
        jnp.asarray(pos_s),
        jnp.asarray(right_s),
        jnp.asarray(u_s),
        jnp.asarray(lreq_s),
    )

    def body(carry, x):
        flo, rlo, size, err, valid, ovf = carry
        pos, rightv, u, lreq = x  # [P] each
        nch = needles[:, pos].astype(_U32)  # [B, P]
        nflo, nrlo, nsize, err2, valid2 = _candidate_step_dir(
            index,
            rightv[:, None],
            flo,
            rlo,
            size,
            err,
            valid,
            nch[:, :, None],
            u[:, None, None],
            lreq[:, None, None],
        )
        arrays = tuple(_flatten2(a) for a in (nflo, nrlo, nsize, err2))
        v = _flatten2(valid2)
        (flo, rlo, size, err), valid, of = _compact(arrays, v, F)
        return (flo, rlo, size, err, valid, ovf | of.any(axis=-1)), None

    (flo, rlo, size, err, valid, ovf), _ = jax.lax.scan(
        body, (flo, rlo, size, err, valid, ovf), xs
    )

    # merge plan lanes into the collection frontier
    Fc = tier.f_collect
    arrays = tuple(a.reshape(B, P * F) for a in (flo, rlo, size, err))
    (c_flo, c_rlo, c_size, c_err), c_valid, of2 = _compact(
        arrays, valid.reshape(B, P * F), Fc
    )
    ovf = ovf | of2
    return (c_flo, c_rlo, c_size, c_err, c_valid), ovf


def _ext_phase(index, state, needles, pos_arr, right_arr, act_arr, Fe, errors):
    """One mixed-direction extension scan over a [B, M, Fe] frontier.

    pos_arr / right_arr / act_arr: [T, M] static needle position, direction
    and activity per (step, slot).  Slots may move in different directions in
    the same step (one shared gather, see _candidate_step_dir); inactive
    slots pass through.
    """
    flo, rlo, size, err, valid, ovf = state
    if len(pos_arr) == 0:
        return state
    xs = (
        jnp.asarray(pos_arr, _I32),
        jnp.asarray(right_arr),
        jnp.asarray(act_arr),
    )

    def body(carry, x):
        flo, rlo, size, err, valid, ovf = carry
        pos, rightv, act = x  # [M] each
        nch = needles[:, pos].astype(_U32)[:, :, None]  # [B, M, 1]
        nflo, nrlo, nsize, err2, valid2 = _candidate_step_dir(
            index, rightv[None, :, None], flo, rlo, size, err, valid, nch,
            errors, 0,
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
        (flo, rlo, size, err), valid, of = _compact(arrays, v, Fe)
        return (flo, rlo, size, err, valid, ovf | of.any(axis=-1)), None

    state, _ = jax.lax.scan(body, state, xs)
    return state


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


def _extend_to_kmers(index, survivors, needles, B, J, K, tier: Tier, errors,
                     group: int | None = None):
    """Extend infix survivors to every k-mer window of each block.

    k-mer j covers needle positions [j, j+K); the infix covers [J-1, K).
    A two-level hierarchy shares extension work between adjacent k-mers —
    the lockstep counterpart of the reference's doubling extension
    (algo.hpp:26-218): first extend the infix state to the common span of
    each GROUP of g adjacent k-mers ([chi-1, clo+K) for group [clo, chi)),
    then from each group state to the individual windows.  Each phase runs
    right- and left-moving slots in the same balanced scan.
    """
    Fe = tier.f_extend
    s_flo, s_rlo, s_size, s_err, s_valid = survivors
    ovf0 = jnp.zeros((B,), bool)

    # compact survivors into Fe slots (root frontier)
    arrays = (s_flo, s_rlo, s_size, s_err)
    (r_flo, r_rlo, r_size, r_err), r_valid, of = _compact(arrays, s_valid, Fe)
    ovf0 = ovf0 | of

    if group is None:
        group = max(1, int(np.sqrt(J)))
    g = min(group, J)
    G = -(-J // g)
    gi = np.arange(G)
    clo_g, chi_g = gi * g, np.minimum(gi * g + g, J)

    def broadcast_m(a, M):
        return jnp.broadcast_to(a[:, None, :], (B, M, Fe))

    if G > 1:
        state = (
            broadcast_m(r_flo, G), broadcast_m(r_rlo, G), broadcast_m(r_size, G),
            broadcast_m(r_err, G), broadcast_m(r_valid, G), ovf0,
        )
        # group gi: right chars K .. clo+K-1, left chars J-2 down to chi-1
        pos, right, act = _balanced_schedule(
            clo_g,
            J - chi_g,
            [[K + t for t in range(int(c))] for c in clo_g],
            [[J - 2 - t for t in range(int(J - ch))] for ch in chi_g],
        )
        state = _ext_phase(index, state, needles, pos, right, act, Fe, errors)
        flo, rlo, size, err, valid, ovf = state
        jmap = jnp.asarray(np.arange(J) // g, dtype=_I32)
        state = tuple(jnp.take(a, jmap, axis=1) for a in (flo, rlo, size, err, valid))
        state = state + (ovf,)
    else:
        state = (
            broadcast_m(r_flo, J), broadcast_m(r_rlo, J), broadcast_m(r_size, J),
            broadcast_m(r_err, J), broadcast_m(r_valid, J), ovf0,
        )

    jj = np.arange(J)
    clo_j, chi_j = (jj // g) * g, np.minimum((jj // g) * g + g, J)
    # kmer j: right chars clo_j+K .. j+K-1, left chars chi_j-2 down to j
    pos, right, act = _balanced_schedule(
        jj - clo_j,
        chi_j - 1 - jj,
        [[int(c) + K + t for t in range(int(n))] for c, n in zip(clo_j, jj - clo_j)],
        [[int(ch) - 2 - t for t in range(int(n))] for ch, n in zip(chi_j, chi_j - 1 - jj)],
    )
    if len(pos):
        state = _ext_phase(index, state, needles, pos, right, act, Fe, errors)

    flo, rlo, size, err, valid, ovf = state
    return (flo, rlo, size, err, valid), ovf


def block_mapper_impl(
    index, needles, cnt, n_total, *, plans, infix_off, J, K, tier, errors,
    cap, rev_compl, with_states,
):
    """One batch of the block mapper (shared by the single-part, data-sharded
    and part-sharded paths; `n_total` may be a traced scalar under the
    part-sharded mesh)."""
    from genmap_tpu.ops.rank import rc_strand_count

    Bl = needles.shape[0]  # local batch (per shard under shard_map)
    survivors, ovf1 = _search_infix(index, plans, infix_off, needles, Bl, tier, n_total)
    states, ovf2 = _extend_to_kmers(index, survivors, needles, Bl, J, K, tier, errors)
    flo, rlo, size, err, valid = states
    ovf = ovf1 | ovf2

    # the index covers both strands; size counts fwd + rc occurrences.
    # forward-only sizes (for -nc and for exact-duplicate detection) come
    # from the strand rank rows.
    need_fwd = (not rev_compl) or with_states
    if need_fwd:
        rc_in = rc_strand_count(index, flo + size) - rc_strand_count(index, flo)
        fwd_size = size - rc_in
    counting = size if rev_compl else fwd_size
    contrib = jnp.where(valid, jnp.minimum(counting, _U32(cap)), _U32(0))
    hits = jnp.minimum(contrib.sum(axis=-1, dtype=_U32), _U32(cap))

    exact_mask = valid & (err == 0)
    exact_total = jnp.where(exact_mask, size, 0).sum(axis=-1, dtype=_U32)
    exact_flo = jnp.where(exact_mask, flo, 0).sum(axis=-1, dtype=_U32)
    exact_fwd = (
        jnp.where(exact_mask, fwd_size, 0).sum(axis=-1, dtype=_U32)
        if need_fwd
        else exact_total
    )

    valid_j = jnp.arange(J, dtype=_I32)[None, :] < cnt[:, None]
    out = dict(
        hits=jnp.where(valid_j, hits, 0),
        exact_size=jnp.where(valid_j, exact_fwd, 0),
        exact_size_total=jnp.where(valid_j, exact_total, 0),
        exact_flo=exact_flo,
        overflow=ovf,
    )
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
    plans = plans_for(errors, o)
    infix_off = K - o
    n_total = index.n_total

    from genmap_tpu.ops.rank import extract_needles

    Ln = K + J - 1

    def run_impl(index, dtext, starts, cnt, limit):
        needles = extract_needles(dtext, starts, Ln, limit)
        return block_mapper_impl(
            index, needles, cnt, n_total, plans=plans, infix_off=infix_off,
            J=J, K=K, tier=tier, errors=errors, cap=cap, rev_compl=rev_compl,
            with_states=with_states,
        )

    if mesh is None:
        run_jit = jax.jit(run_impl)

        def run(starts, cnt, limit):
            return run_jit(index, dtext, starts, cnt, limit)

        return run

    # sharded execution: per-shard local programs via shard_map (the SPMD
    # partitioner otherwise inserts all-gathers around the compaction
    # scatters); the index and text are replicated, blocks split along 'data'
    from jax.sharding import PartitionSpec as P

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

    return run
