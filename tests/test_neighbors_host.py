"""Native C++ neighbor engine: parity with the python oracle."""

import numpy as np
import pytest

from lagrangebench_tpu.ops import neighbors_host

from .test_neighbors import brute_force_edges

pytestmark = pytest.mark.skipif(
    not neighbors_host.available(), reason="no C++ toolchain"
)


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("n", [16, 200])
def test_native_matches_bruteforce(periodic, n):
    rng = np.random.default_rng(0)
    box, cutoff = 2.0, 0.31
    pos = rng.uniform(0, box, size=(n, 3))

    count = neighbors_host.count_edges(pos, [box] * 3, periodic, cutoff)
    want = brute_force_edges(pos, box, cutoff, periodic)
    assert count == len(want)

    idx, total = neighbors_host.build_edges(
        pos, [box] * 3, periodic, cutoff, e_cap=count + 16
    )
    assert total == count
    mask = idx[0] < n
    got = set(zip(idx[0][mask].tolist(), idx[1][mask].tolist()))
    assert got == want
    # receiver-major ordering
    assert (np.diff(idx[0][mask]) >= 0).all()


def test_native_overflow_reports_true_count():
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 1, size=(64, 2))
    full = neighbors_host.count_edges(pos, [1, 1], True, 0.3)
    idx, total = neighbors_host.build_edges(pos, [1, 1], True, 0.3, e_cap=10)
    assert total == full > 10
    assert idx.shape == (2, 10)


def test_native_padding_excluded():
    pos = np.array([[0.5, 0.5], [0.55, 0.5], [0.0, 0.0], [0.0, 0.0]])
    count = neighbors_host.count_edges(pos, [2, 2], False, 0.2, num_particles=2)
    assert count == 4  # 2 self + 2 cross


def test_max_occupancy():
    pos = np.array([[0.1, 0.1], [0.12, 0.11], [0.9, 0.9]])
    occ = neighbors_host.max_occupancy(pos, [1.0, 1.0], 0.25)
    assert occ == 2
