"""Cross-tool validation: TPU engine vs an independent C++ seed-and-verify
counter (the counterpart of the reference's bowtie harness,
/root/reference/tests/bowtie-test.sh: (20,1)-frequency bedgraph diff).

The C++ tool (tests/crosscheck/crosscheck.cpp) shares no code or algorithm
with the engine: pigeonhole half-mer hashing + packed-word verification vs
FM-index optimal search schemes.  Byte-equal bedgraph required.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build_crosscheck(tmp):
    src = os.path.join(_DIR, "crosscheck", "crosscheck.cpp")
    exe = os.path.join(tmp, "crosscheck")
    subprocess.run(
        ["g++", "-O2", "-march=native", "-o", exe, src], check=True
    )
    return exe


@pytest.mark.parametrize(
    "K,E",
    [pytest.param(20, 1, marks=pytest.mark.slow), (16, 0),
     pytest.param(30, 2, marks=pytest.mark.slow)],
)
def test_bedgraph_matches_independent_counter(tmp_path, K, E):
    tmp = str(tmp_path)
    exe = _build_crosscheck(tmp)

    rng = np.random.default_rng(42 + K)
    n = 150_000 if E >= 2 else 400_000  # E=2 is heavy on the CPU mesh
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    # plant repeats so non-trivial frequencies appear at (20,1)
    unit = codes[1000:1060].copy()
    for off in range(5000, 40000, 7000):
        codes[off : off + 60] = unit
    codes[n // 2 : n // 2 + 600] = np.tile(codes[3000:3100], 6)

    codes.tofile(os.path.join(tmp, "codes.bin"))
    bases = np.array([65, 67, 71, 84], np.uint8)[codes]  # ACGT
    with open(os.path.join(tmp, "g.fa"), "wb") as f:
        f.write(b">chrT\n")
        for i in range(0, n, 80):
            f.write(bases[i : i + 80].tobytes() + b"\n")

    from genmap_tpu.cli.main import main

    outdir = os.path.join(tmp, "out")
    os.makedirs(outdir)
    assert main(["index", "-F", os.path.join(tmp, "g.fa"),
                 "-I", os.path.join(tmp, "idx")]) == 0
    assert main(["map", "-I", os.path.join(tmp, "idx"),
                 "-O", outdir + "/", "-K", str(K), "-E", str(E),
                 "-fl", "-bg"]) == 0

    ref_bg = os.path.join(tmp, "ref.bedgraph")
    subprocess.run(
        [exe, os.path.join(tmp, "codes.bin"), str(K), str(E), ref_bg, "chrT"],
        check=True,
    )

    got = open(os.path.join(outdir, "g.genmap.bedgraph"), "rb").read()
    want = open(ref_bg, "rb").read()
    if got != want:
        gl, wl = got.splitlines(), want.splitlines()
        for i, (a, b) in enumerate(zip(gl, wl)):
            if a != b:
                print("first diff line", i, a, b, file=sys.stderr)
                break
        print("lines", len(gl), len(wl), file=sys.stderr)
    assert got == want
