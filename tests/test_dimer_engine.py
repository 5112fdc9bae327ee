"""End-to-end equality: dimer-tier engine vs mono-tier engine.

The mono engine is differentially validated against the brute-force oracle
(tests/test_engine_differential.py) on small genomes; the dimer tier only
activates on genomes whose flagged-sub-block fraction is tiny, so it is
validated here against the mono engine on a larger genome (equality of the
full frequency vector is as strong as the oracle check, at a size the
oracle could never afford).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from genmap_tpu.engine.mappability import (  # noqa: E402
    MappabilityEngine,
    SearchParams,
)
from genmap_tpu.index.build import build_index  # noqa: E402
from genmap_tpu.io.fasta import FastaFile  # noqa: E402


def _mk_data(seed=0, n=200_000, with_n=False, repeats=False, nseq=1):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 4, size=n, dtype=np.uint8)
    if repeats:
        unit = rng.integers(0, 4, size=37, dtype=np.uint8)
        for off in range(0, n // 3, 4000):
            s[off : off + len(unit) * 3] = np.tile(unit, 3)
        s[n // 2 : n // 2 + 5000] = np.tile(s[1000:1100], 50)  # exact dup region
    if with_n:
        s[rng.integers(0, n, size=5)] = 4
    ff = FastaFile(name="g.fa")
    ff.ids = [f"chr{i}" for i in range(nseq)]
    ff.seqs = [s[i * n // nseq : (i + 1) * n // nseq] for i in range(nseq)]
    return build_index([ff], sampling=5)


@pytest.mark.parametrize(
    "K,e,o,with_n,repeats",
    [
        pytest.param(24, 0, 20, False, False, marks=pytest.mark.slow),
        (24, 1, 20, False, True),  # quick tier: cheap e=1 dimer engine case
        pytest.param(36, 2, 24, False, True, marks=pytest.mark.slow),  # branchy e=2 case
        pytest.param(36, 2, 24, True, False, marks=pytest.mark.slow),
        pytest.param(50, 2, 31, False, False, marks=pytest.mark.slow),
    ],
)
def test_dimer_engine_matches_mono(K, e, o, with_n, repeats):
    data = _mk_data(seed=K * 10 + e, with_n=with_n, repeats=repeats)
    assert data.parts[0].dimer is not None
    assert data.parts[0].dimer_flag_frac < 0.05

    params = SearchParams(length=K, overlap=o, rev_compl=True)
    # force the dimer tier: the auto-gate needs a flag fraction only large
    # genomes reach (tested separately in test_dimer_gate)
    eng_d = MappabilityEngine(data, batch_blocks=512, dedup=False, dimer_tier=True)
    eng_m = MappabilityEngine(data, batch_blocks=512, dedup=False, dimer_tier=False)

    rd = eng_d.compute_file(eng_d.layouts[0], params, e, 65535)
    assert eng_d.stats["dimer_tier"]
    rm = eng_m.compute_file(eng_m.layouts[0], params, e, 65535)
    assert not eng_m.stats["dimer_tier"]
    np.testing.assert_array_equal(rd.c, rm.c)
    # sanity: the run must not have escalated everything off the dimer tier
    # (the dimer fast window is 256 symbols vs the mono 1024, so repeat-heavy
    # genomes legitimately escalate a somewhat larger share of blocks).  Only
    # meaningful where the auto-gate would enable the tier: dense flags
    # escalate ~1-(1-frac)^gathers of all blocks by design.
    if data.parts[0].dimer_flag_frac < 1e-3:
        assert eng_d.stats["overflow_blocks"] < 0.15 * (
            (data.text_len - K + 1) // (K - o + 1) + 1
        )


@pytest.mark.slow
def test_dimer_engine_rev_compl_off_and_exact_outputs():
    data = _mk_data(seed=9, repeats=True)
    K, e, o = 30, 1, 24
    params = SearchParams(length=K, overlap=o, rev_compl=False)
    eng_d = MappabilityEngine(data, batch_blocks=512, dedup=False, dimer_tier=True)
    eng_m = MappabilityEngine(data, batch_blocks=512, dedup=False, dimer_tier=False)
    rd = eng_d.compute_file(eng_d.layouts[0], params, e, 255)
    assert eng_d.stats["dimer_tier"]
    rm = eng_m.compute_file(eng_m.layouts[0], params, e, 255)
    np.testing.assert_array_equal(rd.c, rm.c)


def test_dimer_gate():
    """The auto-gate marks the dimer tier available only for genomes whose
    flagged sub-block fraction is tiny (flags escalate whole blocks,
    compounded over ~100+ gathers per block); per-config use additionally
    requires a wide pool schedule (short-infix configs)."""
    big = _mk_data(seed=11, n=1_000_000)
    assert big.parts[0].dimer_flag_frac < 1e-3
    eng = MappabilityEngine(big, batch_blocks=256)
    assert eng._dimer_ok
    # short infix (wide frontiers) -> dimer tier; long infix -> mono tier
    p_short = SearchParams(length=30, overlap=26, rev_compl=True)
    eng.compute_file(eng.layouts[0], p_short, 2, 255,
                     intervals=[(0, 1280)])
    assert eng.stats["dimer_tier"]
    p_long = SearchParams(length=30, overlap=15, rev_compl=True)
    eng.compute_file(eng.layouts[0], p_long, 0, 255,
                     intervals=[(0, 1280)])
    assert not eng.stats["dimer_tier"]
    tiny = _mk_data(seed=12, n=30_000, nseq=10)
    assert tiny.parts[0].dimer_flag_frac >= 1e-3
    assert not MappabilityEngine(tiny, batch_blocks=64)._dimer_ok
