"""Measure TRUE infix-frontier occupancy vs the static pool schedule.

Runs the real _search_infix eagerly (no jit) on a CPU sample of blocks and
records, per compaction call, how many candidate states were actually valid
vs the pool capacity they were compacted into.  This quantifies the padding
waste the occupancy-driven scheduling work (round 4) must recover.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import genmap_tpu.search.engine as eng  # noqa: E402
from genmap_tpu.engine.mappability import MappabilityEngine  # noqa: E402
from genmap_tpu.index.build import build_index  # noqa: E402
from genmap_tpu.io.fasta import FastaFile  # noqa: E402
from genmap_tpu.ops.rank import extract_needles  # noqa: E402
from genmap_tpu.search.schemes import plans_for  # noqa: E402


def main():
    n_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    E = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 192
    mode = sys.argv[5] if len(sys.argv) > 5 else "random"

    rng = np.random.default_rng(0)
    n = int(n_mb * 1_000_000)
    if mode == "random":
        seq = rng.integers(0, 4, size=n, dtype=np.uint8)
    else:
        # repeat-structured text (test_stress_repeats-style)
        core = rng.integers(0, 4, size=n // 20, dtype=np.uint8)
        parts = []
        tot = 0
        while tot < n:
            if rng.random() < 0.5:
                s = rng.integers(0, len(core) - 2000)
                seg = core[s : s + rng.integers(200, 2000)].copy()
                # sprinkle mutations
                idx = rng.integers(0, len(seg), max(1, len(seg) // 100))
                seg[idx] = rng.integers(0, 4, len(idx))
            else:
                seg = rng.integers(0, 4, size=rng.integers(200, 2000), dtype=np.uint8)
            parts.append(seg)
            tot += len(seg)
        seq = np.concatenate(parts)[:n].astype(np.uint8)
    ff = FastaFile(name="g.fa")
    ff.ids = ["c"]
    ff.seqs = [seq]
    data = build_index([ff], sampling=10)
    engine = MappabilityEngine(data)
    index = engine.indices[0]
    dtext = engine.dtext

    from genmap_tpu.cli.map_cmd import default_overlap

    xs = min(default_overlap(K, E), K - 1, K - E - 2)
    o = K - xs
    J = K - o + 1
    plans = plans_for(E, o)
    n_total = index.n_total
    tier = eng.DEFAULT_TIERS[1]  # exact tier, no far-flag noise
    ex_steps = eng.exact_prefix_steps(n_total)

    pools = eng.infix_pool_schedule(plans, K - o, n_total, 1.0)
    print(f"(K={K},E={E}) o={o} J={J} P={len(plans)} pools sum={pools.sum()} "
          f"schedule={list(pools)}")

    # sample random block starts
    nkmers = n - K + 1
    starts = rng.integers(0, nkmers - J, size=B).astype(np.uint32)
    cnts = np.full(B, J, np.int32)
    Ln = K + J - 1
    needles = extract_needles(dtext, jax.numpy.asarray(starts), Ln,
                              np.uint32(n))

    record = []
    orig = eng._compact

    def spy(arrays, valid, F):
        v = np.asarray(valid)
        per_block = v.reshape(v.shape[0], -1).sum(axis=1)
        record.append((F, per_block))
        return orig(arrays, valid, F)

    eng._compact = spy
    try:
        with jax.disable_jit():  # lax.scan runs as a Python loop
            survivors, ovf_cap, ovf_far = eng._search_infix(
                index, plans, K - o, needles, B, tier, n_total, ex_steps,
                n_total
            )
            ovf = ovf_cap | ovf_far
    finally:
        eng._compact = orig

    print(f"overflow blocks: {int(np.asarray(ovf).sum())}/{B}")
    tot_cap = 0
    tot_live = 0
    print(" step  cap   mean   p50   p90   p99    max")
    for t, (F, pb) in enumerate(record):
        tot_cap += F
        tot_live += pb.mean()
        print(f"  {t:3d}  {F:4d}  {pb.mean():6.1f} {np.percentile(pb,50):5.0f} "
              f"{np.percentile(pb,90):5.0f} {np.percentile(pb,99):5.0f} {pb.max():6d}")
    print(f"TOTAL capacity slot-steps/block: {tot_cap}  "
          f"mean live: {tot_live:.1f}  waste factor: {tot_cap/max(tot_live,1e-9):.2f}")


if __name__ == "__main__":
    main()
