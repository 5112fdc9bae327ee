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
