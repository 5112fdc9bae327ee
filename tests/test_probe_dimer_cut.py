"""Dimer probe with a scan cut must consume EXACTLY the chars below the cut.

ADVICE r4 (high): the fused dimer schedule used to keep 2-char steps that
straddle the cut (charidx == cut-1, consume == 2), applying a plan's lreq
bound at char index `cut` — while probe_thresholds() budgets the self-match
survival from lreq_s[:cut] only.  With an OSS plan whose l-bound ramps
mid-segment (e=2 plans do), the extra consumed char can kill the self-match
and let a block with one genuine second occurrence be skipped with its
frequency silently written as 1.

The unit test pins the fix directly: per-plan survivor MASS of the dimer
infix scan at every interesting cut (all lreq-transition chars ±1) must
equal the mono scan's at the same cut — the mono path consumes exactly
`cut` chars by construction.  The engine test runs the dimer probe with a
cut against a probe-disabled engine on repeat-planted text.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from genmap_tpu.engine.mappability import (  # noqa: E402
    MappabilityEngine,
    SearchParams,
)
from genmap_tpu.index.build import build_index  # noqa: E402
from genmap_tpu.io.fasta import FastaFile  # noqa: E402
from genmap_tpu.ops.rank import DeviceIndex  # noqa: E402
from genmap_tpu.search.engine import (  # noqa: E402
    Tier,
    _plan_schedule,
    _search_infix,
    _search_infix_dimer,
)
from genmap_tpu.search.schemes import plans_for  # noqa: E402


def _mk_data(seed=7, n=60_000):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 4, size=n, dtype=np.uint8)
    # planted repeat family: many blocks carry exactly a handful of genuine
    # second occurrences (the probe must never skip those)
    s[n // 2 : n // 2 + 4000] = np.tile(s[1000:1400], 10)
    ff = FastaFile(name="g.fa")
    ff.ids = ["chr0"]
    ff.seqs = [s]
    return build_index([ff], sampling=5), s


def _plan_mass(survivors, P):
    flo, rlo, size, err, valid, plan = survivors
    size = np.asarray(size).astype(np.uint64)
    valid = np.asarray(valid)
    plan = np.asarray(plan)
    return np.stack(
        [
            np.where(valid & (plan == p), size, 0).sum(axis=-1)
            for p in range(P)
        ],
        axis=-1,
    )


def test_dimer_cut_mass_equals_mono_at_transitions():
    K, e, o = 64, 2, 33
    data, s = _mk_data()
    assert data.parts[0].dimer is not None
    index = DeviceIndex.from_part(data, data.parts[0])
    plans = plans_for(e, o)
    infix_off = K - o
    _pos, _right, _u, lreq_s = _plan_schedule(plans, infix_off)
    T = lreq_s.shape[0]
    # every char where any plan's cumulative l-bound steps up, plus
    # neighbors: the straddle bug lives exactly at these transitions
    trans = {
        t
        for t in range(1, T)
        if (lreq_s[t] > lreq_s[:t].max(axis=0)).any()
    }
    cuts = sorted(
        c
        for t in trans
        for c in (t - 1, t, t + 1)
        if index.seed_t0 < c < T  # engine cuts always exceed the seeded prefix
    )
    assert cuts, "expected lreq transitions for e=2 plans"

    B = 64
    rng = np.random.default_rng(1)
    n_tot = data.parts[0].n_total
    Ln = K  # infix scan only reads chars [infix_off, K)
    starts = np.concatenate(
        [
            rng.integers(0, len(s) - Ln, size=B - 16),
            # blocks inside the repeat region: genuine second occurrences
            rng.integers(len(s) // 2, len(s) // 2 + 3000, size=16),
        ]
    )
    needles = jnp.asarray(
        s[starts[:, None] + np.arange(Ln)[None, :]], jnp.uint8
    )
    tier_m = Tier(64, 64, 4, exact=True, dimer=False)
    tier_d = Tier(64, 64, 4, exact=True, dimer=True)
    P = len(plans)
    for cut in cuts:
        surv_m, capm, farm = jax.jit(
            lambda nd, c=cut: _search_infix(
                index, plans, infix_off, nd, B, tier_m, n_tot, 64, n_tot,
                stop_at=c,
            )
        )(needles)
        surv_d, capd, fard = jax.jit(
            lambda nd, c=cut: _search_infix_dimer(
                index, plans, infix_off, nd, B, tier_d, n_tot, 64, n_tot,
                stop_at=c,
            )
        )(needles)
        assert not np.asarray(capm).any() and not np.asarray(farm).any()
        assert not np.asarray(capd).any()
        # dimer far flags are legitimate (wide intervals touching
        # sentinel-adjacent sub-blocks escalate to mono in the engine);
        # compare masses on the non-flagged blocks only
        ok = ~np.asarray(fard)
        assert ok.sum() >= B - 8
        np.testing.assert_array_equal(
            _plan_mass(surv_d, P)[ok], _plan_mass(surv_m, P)[ok],
            err_msg=f"cut={cut}",
        )


@pytest.mark.slow
def test_engine_dimer_probe_cut_matches_no_probe():
    K, e, o = 64, 2, 33
    data, _ = _mk_data(seed=11, n=100_000)
    params = SearchParams(length=K, overlap=o, rev_compl=True)
    eng_p = MappabilityEngine(data, batch_blocks=512, dedup=False,
                              dimer_tier=True)
    eng_p._probe_cut_slack = 3  # cut lands amid the e=2 lreq ramps
    eng_f = MappabilityEngine(data, batch_blocks=512, dedup=False,
                              dimer_tier=True)
    eng_f._probe_enabled = False
    rp = eng_p.compute_file(eng_p.layouts[0], params, e, 65535)
    rf = eng_f.compute_file(eng_f.layouts[0], params, e, 65535)
    assert eng_p.stats["probe_skipped"] > 0
    np.testing.assert_array_equal(rp.c, rf.c)
