"""Unique-infix short-circuit: probe + skip must be invisible in results.

If a block's total infix survivor mass is 1, every k-mer's frequency is
exactly 1 (count is sandwiched between the self-match and the mass); the
engine then skips the extension phase.  These tests compare against the
probe-disabled engine on genomes with planted repeats, N characters and
sequence boundaries, including the adaptive-abandon path (repeat-dominated
first batch).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from genmap_tpu.engine.mappability import MappabilityEngine, SearchParams  # noqa: E402
from genmap_tpu.index.build import build_index  # noqa: E402
from genmap_tpu.io.fasta import FastaFile  # noqa: E402


def _data(seed, n=200_000, nseq=2, with_n=False, repeat_all=False):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 4, size=n, dtype=np.uint8)
    if repeat_all:
        s = np.tile(s[:512], n // 512 + 1)[:n].copy()
    else:
        s[50_000:58_000] = np.tile(s[10_000:10_400], 20)  # repeat region
    if with_n:
        s[rng.integers(0, n, size=4)] = 4
    ff = FastaFile(name="g.fa")
    ff.ids = [f"chr{i}" for i in range(nseq)]
    ff.seqs = [s[i * n // nseq : (i + 1) * n // nseq] for i in range(nseq)]
    return build_index([ff], sampling=5)


@pytest.mark.parametrize(
    "with_n,rc",
    [(False, True), pytest.param(True, True, marks=pytest.mark.slow),
     pytest.param(False, False, marks=pytest.mark.slow)],
)
def test_probe_matches_full(with_n, rc):
    data = _data(seed=3 + int(with_n), with_n=with_n)
    K, e, o = 64, 1, 33  # J=32: extension-dominated -> probe active
    params = SearchParams(length=K, overlap=o, rev_compl=rc)
    eng_p = MappabilityEngine(data, batch_blocks=1024, dedup=False)
    eng_f = MappabilityEngine(data, batch_blocks=1024, dedup=False)
    eng_f._probe_enabled = False
    rp = eng_p.compute_file(eng_p.layouts[0], params, e, 65535)
    assert eng_p.stats["probe_skipped"] > 0.5 * (200_000 // 32)
    rf = eng_f.compute_file(eng_f.layouts[0], params, e, 65535)
    assert eng_f.stats["probe_skipped"] == 0
    np.testing.assert_array_equal(rp.c, rf.c)


def test_probe_cut_matches_full_scan():
    """A tight probe cut (stop at log4(2n)+2 chars) only changes WHICH
    blocks the probe can skip, never results."""
    data = _data(seed=5)
    K, e, o = 64, 1, 33
    params = SearchParams(length=K, overlap=o, rev_compl=True)
    eng_c = MappabilityEngine(data, batch_blocks=1024, dedup=False)
    eng_c._probe_cut_slack = 2
    eng_n = MappabilityEngine(data, batch_blocks=1024, dedup=False)
    eng_n._probe_cut_slack = None  # full-length probe scan
    rc_ = eng_c.compute_file(eng_c.layouts[0], params, e, 65535)
    rn = eng_n.compute_file(eng_n.layouts[0], params, e, 65535)
    assert eng_c.stats["probe_skipped"] > 0
    assert eng_c.stats["probe_skipped"] <= eng_n.stats["probe_skipped"]
    np.testing.assert_array_equal(rc_.c, rn.c)


def test_probe_abandons_on_repeat_genome():
    data = _data(seed=9, repeat_all=True)
    K, e, o = 64, 1, 33
    params = SearchParams(length=K, overlap=o, rev_compl=True)
    eng_p = MappabilityEngine(data, batch_blocks=1024, dedup=False)
    eng_f = MappabilityEngine(data, batch_blocks=1024, dedup=False)
    eng_f._probe_enabled = False
    rp = eng_p.compute_file(eng_p.layouts[0], params, e, 255)
    rf = eng_f.compute_file(eng_f.layouts[0], params, e, 255)
    np.testing.assert_array_equal(rp.c, rf.c)
