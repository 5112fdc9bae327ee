"""50 Mbp genome-like cross-tool validation (VERDICT r4 task 9).

Builds a deterministic genome-like corpus (benchmarks/corpus.py), computes
(20,1)- and (30,2)-frequency bedgraphs with the engine on the TPU, and
byte-diffs them against the independent C++ pigeonhole counter
(tests/crosscheck/crosscheck.cpp — no shared code or algorithm family).
The realistic-corpus counterpart of the reference's bowtie harness
(/root/reference/tests/bowtie-test.sh).

Run on the TPU:  python scripts/realistic_crosscheck.py [mbp]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    from genmap_tpu.cache import enable_compile_cache
    from genmap_tpu.hostmem import retain_heap

    enable_compile_cache()
    retain_heap()

    from benchmarks.corpus import make_genomelike
    from genmap_tpu.cli.main import main as cli_main

    mbp = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    work = os.path.expanduser(f"~/.cache/genmap_tpu/realistic_{mbp}")
    os.makedirs(work, exist_ok=True)

    exe = os.path.join(work, "crosscheck")
    if not os.path.exists(exe):
        subprocess.run(
            ["g++", "-O2", "-march=native", "-o", exe,
             os.path.join(ROOT, "tests", "crosscheck", "crosscheck.cpp")],
            check=True,
        )

    n = mbp * 1_000_000
    codes_path = os.path.join(work, "codes.bin")
    fa_path = os.path.join(work, "g.fa")
    if not os.path.exists(fa_path):
        codes = make_genomelike(n, seed=7)
        codes.tofile(codes_path)
        bases = np.array([65, 67, 71, 84], np.uint8)[codes]
        with open(fa_path, "wb") as f:
            f.write(b">chrR\n")
            for i in range(0, n, 80):
                f.write(bases[i : i + 80].tobytes() + b"\n")

    idx = os.path.join(work, "idx")
    if not os.path.isdir(idx):
        t0 = time.time()
        assert cli_main(["index", "-F", fa_path, "-I", idx]) == 0
        print(f"# index build: {time.time() - t0:.0f}s", file=sys.stderr)

    ok = True
    for K, E in [(20, 1), (30, 2)]:
        outdir = os.path.join(work, f"out_{K}_{E}")
        os.makedirs(outdir, exist_ok=True)
        t0 = time.time()
        assert cli_main(["map", "-I", idx, "-O", outdir + "/",
                         "-K", str(K), "-E", str(E), "-fl", "-bg"]) == 0
        t_eng = time.time() - t0
        ref_bg = os.path.join(work, f"ref_{K}_{E}.bedgraph")
        t0 = time.time()
        if not os.path.exists(ref_bg):
            subprocess.run(
                [exe, codes_path, str(K), str(E), ref_bg, "chrR"], check=True
            )
        t_ref = time.time() - t0
        got = open(os.path.join(outdir, "g.genmap.bedgraph"), "rb").read()
        want = open(ref_bg, "rb").read()
        same = got == want
        ok &= same
        print(f"# ({K},{E}) {mbp} Mbp: engine {t_eng:.0f}s "
              f"({(n - K + 1) / t_eng:,.0f} kmers/s end-to-end), "
              f"crosscheck {t_ref:.0f}s, bedgraph byte-equal: {same}",
              file=sys.stderr, flush=True)
        if not same:
            gl, wl = got.splitlines(), want.splitlines()
            for i, (a, b) in enumerate(zip(gl, wl)):
                if a != b:
                    print(f"# first diff at line {i}: {a!r} vs {b!r}",
                          file=sys.stderr)
                    break
            print(f"# line counts {len(gl)} vs {len(wl)}", file=sys.stderr)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    os._exit(rc)
