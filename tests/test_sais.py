"""Native SA-IS vs numpy doubling / naive sort, including sentinel-heavy texts."""

import numpy as np
import pytest

from genmap_tpu.index.suffix import suffix_array_numpy
from genmap_tpu.native import sais


@pytest.mark.parametrize("seed", range(8))
def test_sais_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 2000))
    k = int(rng.integers(1, 7))
    t = rng.integers(0, k, size=n, dtype=np.uint8)
    np.testing.assert_array_equal(sais.suffix_array(t), suffix_array_numpy(t))


@pytest.mark.parametrize("seed", range(4))
def test_sais_sentinel_heavy(seed):
    """Texts like the index ctext: many equal 0 sentinels, ends with 0."""
    rng = np.random.default_rng(100 + seed)
    parts = []
    for _ in range(int(rng.integers(1, 6))):
        parts.append(rng.integers(1, 6, size=int(rng.integers(0, 200)), dtype=np.uint8))
        parts.append(np.zeros(1, dtype=np.uint8))
    t = np.concatenate(parts)
    np.testing.assert_array_equal(sais.suffix_array(t), suffix_array_numpy(t))


def test_sais_edge_cases():
    for t in ([0], [0, 0, 0], [1], [1, 1, 1, 1], [2, 1, 0], [0, 1, 0, 1, 0]):
        arr = np.array(t, dtype=np.uint8)
        np.testing.assert_array_equal(sais.suffix_array(arr), suffix_array_numpy(arr))


def test_sais_speed_1mbp():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 5, size=1_000_000, dtype=np.uint8)
    import time

    t0 = time.time()
    sa = sais.suffix_array(t)
    dt = time.time() - t0
    assert dt < 5.0, f"SA-IS too slow: {dt:.2f}s for 1 Mbp"
    # spot check order
    idx = rng.integers(0, len(t) - 1, size=200)
    for i in idx:
        a, b = sa[i], sa[i + 1]
        assert t[a : a + 50].tobytes() <= t[b : b + 50].tobytes()
