"""Differential test: the C++ schedule builder must be bit-identical to the
NumPy oracle on randomized session structures (the reference's
disable_custom_op differential-testing pattern, gpu_ops.py:13-27)."""

import numpy as np
import pytest

from gru4rec_tpu.data import _native_scheduler
from gru4rec_tpu.data.scheduler import _build_schedule_numpy

pytestmark = pytest.mark.skipif(
    not _native_scheduler.available(), reason="native scheduler not built (no g++?)"
)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("batch_size", [1, 4, 32])
@pytest.mark.parametrize("require_two_lanes", [False, True])
def test_native_matches_numpy(seed, batch_size, require_two_lanes):
    rng = np.random.RandomState(seed)
    n_sessions = rng.randint(3, 120)
    lens = rng.randint(1, 10, size=n_sessions)
    offsets = np.zeros(n_sessions + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(lens)
    items = rng.randint(0, 500, size=int(offsets[-1])).astype(np.int32)
    order = rng.permutation(n_sessions)

    a = _native_scheduler.build_schedule(items, offsets, order, batch_size, require_two_lanes)
    b = _build_schedule_numpy(items, offsets, order, batch_size, require_two_lanes)
    assert a.n_steps == b.n_steps
    np.testing.assert_array_equal(a.in_idx, b.in_idx)
    np.testing.assert_array_equal(a.out_idx, b.out_idx)
    np.testing.assert_array_equal(a.valid, b.valid)
    np.testing.assert_array_equal(a.reset, b.reset)


def test_native_is_fast():
    """The native builder should comfortably beat NumPy on many-window data."""
    import time

    rng = np.random.RandomState(0)
    n_sessions = 40_000
    lens = rng.randint(2, 8, size=n_sessions)
    offsets = np.zeros(n_sessions + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(lens)
    items = rng.randint(0, 30_000, size=int(offsets[-1])).astype(np.int32)
    order = np.arange(n_sessions)

    t0 = time.time()
    a = _native_scheduler.build_schedule(items, offsets, order, 80, False)
    t_native = time.time() - t0
    t0 = time.time()
    b = _build_schedule_numpy(items, offsets, order, 80, False)
    t_numpy = time.time() - t0
    assert a.n_steps == b.n_steps
    assert t_native < t_numpy, (t_native, t_numpy)
