"""Occupancy-calibrated pool schedules (round 4): equality + plumbing.

The calibration pass measures per-step frontier occupancy on a first batch
and tightens the tier-0 pool schedule; blocks that overflow the tightened
pools must escalate and still produce exact results.  A/B against the
uncalibrated engine on a repeat-rich genome (worst case for tight pools).
"""

import numpy as np
import pytest

from genmap_tpu.engine.mappability import MappabilityEngine, SearchParams
from genmap_tpu.index.build import build_index
from genmap_tpu.io.fasta import FastaFile


def _mk_data(seed=11, n=60_000, repeats=True):
    rng = np.random.default_rng(seed)
    if repeats:
        core = rng.integers(0, 4, size=n // 10, dtype=np.uint8)
        parts, tot = [], 0
        while tot < n:
            if rng.random() < 0.5:
                s = rng.integers(0, max(1, len(core) - 600))
                seg = core[s : s + rng.integers(100, 600)].copy()
                idx = rng.integers(0, len(seg), max(1, len(seg) // 80))
                seg[idx] = rng.integers(0, 4, len(idx))
            else:
                seg = rng.integers(0, 4, size=rng.integers(100, 600),
                                   dtype=np.uint8)
            parts.append(seg)
            tot += len(seg)
        seq = np.concatenate(parts)[:n].astype(np.uint8)
    else:
        seq = rng.integers(0, 4, size=n, dtype=np.uint8)
    ff = FastaFile(name="g.fa")
    ff.ids = ["c1"]
    ff.seqs = [seq]
    return build_index([ff], sampling=5)


@pytest.mark.parametrize(
    "ke", [(18, 1, 15), pytest.param((24, 2, 21), marks=pytest.mark.slow)]
)
def test_calibrated_matches_uncalibrated(ke):
    K, e, o = ke
    data = _mk_data()
    params = SearchParams(length=K, overlap=o, rev_compl=True)

    ref = MappabilityEngine(data, batch_blocks=256)
    ref._calibrate_enabled = False
    res_ref = ref.compute_file(ref.layouts[0], params, errors=e, cap=65535)

    eng = MappabilityEngine(data, batch_blocks=256)
    eng._cal_batch = 96  # small sample -> plenty of pending left over
    res = eng.compute_file(eng.layouts[0], params, errors=e, cap=65535)
    tuned_keys = [k for k in eng._tuned_pools if k[:3] == (K, e, o)]
    assert tuned_keys, "calibration did not run"
    tuned, fe = eng._tuned_pools[tuned_keys[0]]
    np.testing.assert_array_equal(res.c, res_ref.c)

    # tuned pools must never exceed the next tier's scale (8x static) and a
    # rerun reuses the cached calibration (no second calibration batch).  A
    # "static" entry means calibration ran but no pool change was adopted.
    from genmap_tpu.search.engine import infix_pool_schedule
    from genmap_tpu.search.schemes import plans_for

    if isinstance(tuned, list):
        for pi, tp in enumerate(tuned):
            base8 = infix_pool_schedule(
                plans_for(e, o), K - o, data.parts[pi].n_total, 8.0
            )
            base1 = infix_pool_schedule(
                plans_for(e, o), K - o, data.parts[pi].n_total, 1.0
            )
            assert all(a <= max(b, c) for a, b, c in zip(tp, base1, base8))
    if fe is not None:
        assert 2 <= fe <= 8 * 16384
    res2 = eng.compute_file(eng.layouts[0], params, errors=e, cap=65535)
    np.testing.assert_array_equal(res2.c, res_ref.c)


# ---------------------------------------------------------------------------
# Escalation routing behavior (VERDICT r4 task 8): the tier router must send
# far-flagged blocks to the NEXT tier (a same-capacity exact program
# suffices) and capacity overflows to a tier whose capacities are actually
# LARGER than the overflowed program — a deliberate routing bug must fail
# these, not just the (much slower) equality sweeps.
# ---------------------------------------------------------------------------


def _routed_run(data, K, e, o, **eng_kw):
    params = SearchParams(length=K, overlap=o, rev_compl=True)
    eng = MappabilityEngine(data, batch_blocks=256, dedup=False, **eng_kw)
    eng._record_tier_sel = True
    res = eng.compute_file(eng.layouts[0], params, errors=e, cap=65535)
    return eng, res


def test_far_routes_to_next_tier_and_cap_skips_same_size():
    from genmap_tpu.search.engine import infix_pool_schedule
    from genmap_tpu.search.schemes import plans_for

    # heavy exact repeats: fast-tier windows miss (far) AND branchy blocks
    # overflow the tier-0/1 pool capacities (cap)
    data = _mk_data(seed=23, n=60_000, repeats=True)
    K, e, o = 20, 1, 17
    eng, _ = _routed_run(data, K, e, o)
    routes = eng.stats.get("routes", [])
    assert routes, "expected escalations on repeat-rich text"
    plans = plans_for(e, o)
    n_max = max(p.n_total for p in data.parts)

    def caps(i, tiers):
        t = tiers[i]
        pools = infix_pool_schedule(plans, K - o, n_max, t.f_search / 4.0)
        return (int(pools.sum()), t.f_extend, t.f_collect)

    from genmap_tpu.search.engine import DEFAULT_TIERS

    for src, dst, kind, n in routes:
        assert n > 0
        if kind == "far":
            # far-only: same capacities, exact gathers -> literally the next
            # tier (the r3 double-escalation anomaly routed these further)
            assert dst == src + 1 or dst is None
        else:
            # capacity overflow: destination must be strictly larger in at
            # least one capacity than some static same-size intermediate —
            # i.e. never a tier with identical static capacities
            assert dst is None or dst > src
            if dst is not None:
                c_src, c_dst = caps(src, DEFAULT_TIERS), caps(dst, DEFAULT_TIERS)
                assert any(a > b for a, b in zip(c_dst, c_src)), (
                    f"cap overflow routed {src}->{dst} with no larger capacity"
                )


@pytest.mark.slow
def test_final_tier_calibration_never_tightens():
    """ADVICE r4 (high): a single-tier ladder is its own final tier, so
    calibration there must not adopt tightened pools or a smaller f_extend —
    blocks that fit the static schedule must never be pushed into an
    unresolvable overflow."""
    from genmap_tpu.search.engine import Tier

    data = _mk_data(seed=31, n=60_000, repeats=True)
    K, e, o = 20, 1, 17
    only = (Tier(256, 512, 64, exact=True),)
    eng, res = _routed_run(data, K, e, o, tiers=only)
    ref = MappabilityEngine(data, batch_blocks=256, dedup=False, tiers=only)
    ref._calibrate_enabled = False
    params = SearchParams(length=K, overlap=o, rev_compl=True)
    res_ref = ref.compute_file(ref.layouts[0], params, errors=e, cap=65535)
    np.testing.assert_array_equal(res.c, res_ref.c)
    for key, (tuned, fe) in eng._tuned_pools.items():
        if key[:3] != (K, e, o):
            continue
        assert tuned == "static", "final tier adopted tightened pools"
        assert fe is None or fe >= 64, "final tier adopted a smaller f_extend"
