"""End-to-end golden-file tests against the reference's expected outputs.

Mirrors the reference CLI test harness (/root/reference/tests/tests.sh +
tests/CMakeLists.txt:56-73): for every hand-written case directory, build an
index, run `map` with the case's flags for every output format, and require
byte equality with the expected files.  Also re-runs with forced overlaps
-xo 1 / -xo 2 (output must be overlap-invariant).
"""

import filecmp
import os

import pytest

from genmap_tpu.cli.main import main as cli_main

CASES_DIR = "/root/reference/tests/test_cases"

# (case, directory_index?, map flags)  — tests/CMakeLists.txt:56-73
# quick tier: one representative per feature axis (Dna4, Dna5/N, e=1,
# directory + exclude-pseudo, BED selection); the rest run in the full suite
_QUICK = {"1b", "1c", "1f", "3d"}
CASES = [
    ("1a", False, ["-E", "0", "-K", "3", "-nc"]),
    ("1b", False, ["-E", "0", "-K", "3"]),
    ("1c", False, ["-E", "0", "-K", "3", "-nc"]),
    ("1d", False, ["-E", "0", "-K", "3"]),
    ("1e", False, ["-E", "1", "-K", "3", "-nc"]),
    ("1f", False, ["-E", "1", "-K", "3"]),
    ("1g", False, ["-E", "1", "-K", "3"]),
    ("2a", False, ["-E", "0", "-K", "4", "-nc"]),
    ("2b", False, ["-E", "0", "-K", "4"]),
    ("2c", False, ["-E", "0", "-K", "4", "-nc"]),
    ("2d", False, ["-E", "0", "-K", "4"]),
    ("2e", False, ["-E", "0", "-K", "4"]),
    ("3a", True, ["-E", "0", "-K", "4", "-nc"]),
    ("3b", True, ["-E", "0", "-K", "4"]),
    ("3c", True, ["-E", "0", "-K", "4", "-ep", "-nc"]),
    ("3d", True, ["-E", "0", "-K", "4", "-ep"]),
    ("3e", True, ["-E", "0", "-K", "4", "-ep"]),
    ("3f", True, ["-E", "0", "-K", "4", "-ep"]),
]
CASE_IDS = [c[0] for c in CASES]
CASES = [
    pytest.param(*c, marks=() if c[0] in _QUICK else (pytest.mark.slow,))
    for c in CASES
]

FORMATS = [
    ("raw_map", ["-r"]),
    ("raw_freq8", ["-r", "-fs"]),
    ("raw_freq16", ["-r", "-fl"]),
    ("txt_map", ["-t"]),
    ("txt_freq16", ["-t", "-fl"]),
    ("txt_freq8", ["-t", "-fs"]),  # only where expected folder exists
    ("wig_map", ["-w"]),
    ("wig_freq16", ["-w", "-fl"]),
    ("bed_map", ["-bg"]),
    ("bed_freq16", ["-bg", "-fl"]),
    ("csv", ["-d"]),
]

_INDEX_CACHE: dict[str, str] = {}


def _index_for(case: str, directory: bool, tmp_root) -> str:
    if case in _INDEX_CACHE:
        return _INDEX_CACHE[case]
    idx = str(tmp_root / f"index_{case}")
    case_dir = f"{CASES_DIR}/case_{case}"
    if directory:
        rc = cli_main(["index", "-FD", case_dir, "-I", idx])
    else:
        rc = cli_main(["index", "-F", f"{case_dir}/genome.fa", "-I", idx])
    assert rc == 0
    _INDEX_CACHE[case] = idx
    return idx


def _compare_dirs(expected: str, actual: str):
    exp_files = sorted(os.listdir(expected))
    act_files = sorted(os.listdir(actual))
    assert exp_files == act_files, f"file sets differ: {exp_files} vs {act_files}"
    for fn in exp_files:
        e, a = os.path.join(expected, fn), os.path.join(actual, fn)
        with open(e, "rb") as f:
            eb = f.read().replace(b"\r\n", b"\n")
        with open(a, "rb") as f:
            ab = f.read().replace(b"\r\n", b"\n")
        assert eb == ab, f"{fn} differs (expected {eb[:400]!r}..., got {ab[:400]!r}...)"


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("golden")


@pytest.mark.parametrize("case,directory,flags", CASES, ids=CASE_IDS)
def test_golden_case(case, directory, flags, tmp_root):
    case_dir = f"{CASES_DIR}/case_{case}"
    idx = _index_for(case, directory, tmp_root)
    sel = []
    if os.path.exists(f"{case_dir}/subset.bed"):
        sel = ["-S", f"{case_dir}/subset.bed"]

    overlaps = [[]]
    if case not in ("1e", "1f", "1g"):
        overlaps.append(["-xo", "1"])
    if not case.startswith("1"):
        overlaps.append(["-xo", "2"])

    for fmt_name, fmt_flags in FORMATS:
        expected = f"{case_dir}/{fmt_name}"
        if not os.path.isdir(expected):
            continue
        for xo in overlaps:
            out = tmp_root / f"out_{case}_{fmt_name}_{'_'.join(xo) or 'def'}"
            out.mkdir(exist_ok=True)
            for f in out.iterdir():
                f.unlink()
            rc = cli_main(
                ["map", "-I", idx, "-O", str(out), "--batch-blocks", "64"]
                + flags + fmt_flags + sel + xo
            )
            assert rc == 0, f"map failed for {case}/{fmt_name} xo={xo}"
            _compare_dirs(expected, str(out))
