"""Native C++ EMD vs scipy assignment: exact-optimum equality + speed."""

import time

import numpy as np
import pytest

from fairdiff.fairness.emd import emd_assignment, emd_batch
from fairdiff.native.emd_lib import emd_assignment_native, native_available


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_matches_scipy_optimum():
    rng = np.random.default_rng(0)
    for trial in range(10):
        n, c = int(rng.integers(4, 40)), int(rng.integers(2, 16))
        cost = rng.uniform(0, 3, (n, c))
        b = rng.multinomial(n, np.ones(c) / c)
        nat = emd_assignment_native(b, cost)
        ref = emd_assignment(b, cost, native=False)
        # plans may differ at ties; optima must match exactly
        np.testing.assert_allclose(nat.sum(1), 1.0)
        np.testing.assert_allclose(nat.sum(0), b)
        np.testing.assert_allclose(
            (nat * cost).sum(), (ref * cost).sum(), atol=1e-9
        )


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_batch_matches_single():
    rng = np.random.default_rng(1)
    n, c, d = 24, 8, 32
    cost = rng.uniform(0, 2, (n, c))
    bs = np.stack([rng.multinomial(n, np.ones(c) / c) for _ in range(d)])
    plans = emd_batch(bs, cost)
    assert plans.shape == (d, n, c)
    for k in range(0, d, 7):
        ref = emd_assignment(bs[k], cost, native=False)
        np.testing.assert_allclose(
            (plans[k] * cost).sum(), (ref * cost).sum(), atol=1e-9
        )


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_faster_than_scipy_path():
    rng = np.random.default_rng(2)
    n, c, d = 32, 8, 200  # the exp-3 per-step shape (100/device x 2)
    cost = rng.uniform(0, 2, (n, c))
    bs = np.stack([rng.multinomial(n, np.ones(c) / c) for _ in range(d)])

    t0 = time.perf_counter()
    emd_batch(bs, cost)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for b in bs:
        emd_assignment(b, cost, native=False)
    t_scipy = time.perf_counter() - t0
    # informational bound: native must not be slower than 2x scipy
    assert t_native < 2 * t_scipy, (t_native, t_scipy)


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_rejects_invalid_inputs():
    """The C solver must never see inputs it would corrupt memory on:
    non-finite costs, column mismatches, and negative masses raise
    ValueError (matching the scipy path) instead of reaching C++."""
    from fairdiff.native.emd_lib import emd_batch_native

    cost = np.ones((4, 2))
    with pytest.raises(ValueError, match="finite"):
        emd_assignment_native(np.asarray([2, 2]), cost * np.nan)
    with pytest.raises(ValueError, match="columns"):
        emd_assignment_native(np.asarray([2, 1, 1]), cost)
    with pytest.raises(ValueError, match="negative"):
        emd_assignment_native(np.asarray([-1, 5]), cost)
    with pytest.raises(ValueError, match="finite"):
        emd_batch_native(np.asarray([[2, 2]]), np.full((4, 2), np.inf))
