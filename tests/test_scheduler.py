"""Property + exact-simulation tests for the session-parallel scheduler.

The strongest test transcribes the reference's lane loop (gru4rec.py:587-651)
independently — with physical compaction, tracking each lane's original
position — and asserts our fixed-width masked schedule emits the identical
(in, out) pair in the identical lane at the identical step.
"""

import numpy as np
import pytest

from gru4rec_tpu.data.scheduler import _build_schedule_numpy, build_schedule


def make_sessions(rng, n_sessions, min_len=1, max_len=9):
    lens = rng.randint(min_len, max_len + 1, size=n_sessions)
    offsets = np.zeros(n_sessions + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(lens)
    items = rng.randint(0, 1000, size=int(offsets[-1])).astype(np.int32)
    return items, offsets, lens


def reference_walk(data_items, offsets, order, batch_size, require_two_lanes):
    """Direct transcription of the reference's training lane loop
    (gru4rec.py:593-651), emitting (step, lane_id, in, out, is_session_start)."""
    n_sessions = len(offsets) - 1
    n0 = min(batch_size, n_sessions)
    iters = np.arange(n0)
    lane_ids = np.arange(n0)  # original lane identity through compaction
    maxiter = iters.max() if n0 else -1
    start = offsets[order[iters]].copy()
    end = offsets[order[iters] + 1].copy()
    fresh = np.ones(n0, dtype=bool)
    events = []
    t = 0
    finished = False
    while not finished and len(iters):
        minlen = (end - start).min()
        out_idx = data_items[start]
        for i in range(minlen - 1):
            in_idx = out_idx
            out_idx = data_items[start + i + 1]
            for j in range(len(iters)):
                events.append((t, lane_ids[j], in_idx[j], out_idx[j], bool(fresh[j])))
            fresh[:] = False
            t += 1
        start = start + minlen - 1
        finished_mask = (end - start) <= 1
        n_finished = finished_mask.sum()
        iters[finished_mask] = maxiter + np.arange(1, n_finished + 1)
        maxiter += n_finished
        valid_mask = iters < n_sessions
        n_valid = valid_mask.sum()
        if n_valid == 0 or (require_two_lanes and n_valid < 2):
            break
        mask = finished_mask & valid_mask
        sessions = order[iters[mask]]
        start[mask] = offsets[sessions]
        end[mask] = offsets[sessions + 1]
        fresh[mask] = True
        iters = iters[valid_mask]
        lane_ids = lane_ids[valid_mask]
        start = start[valid_mask]
        end = end[valid_mask]
        fresh = fresh[valid_mask]
    return events


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("batch_size", [1, 3, 8, 32])
@pytest.mark.parametrize("require_two_lanes", [False, True])
def test_matches_reference_walk(seed, batch_size, require_two_lanes):
    rng = np.random.RandomState(seed)
    items, offsets, _ = make_sessions(rng, rng.randint(5, 60))
    order = rng.permutation(len(offsets) - 1)
    sched = _build_schedule_numpy(items, offsets, order, batch_size, require_two_lanes)
    ref = reference_walk(items, offsets, order, batch_size, require_two_lanes)

    got = []
    for t in range(sched.n_steps):
        for b in range(batch_size):
            if sched.valid[t, b]:
                got.append(
                    (t, b, sched.in_idx[t, b], sched.out_idx[t, b], bool(sched.reset[t, b]))
                )
    assert got == ref


def test_every_consecutive_pair_trained_exactly_once():
    """With enough lanes relative to sessions still alive, every consecutive
    event pair of every session scheduled must appear exactly once."""
    rng = np.random.RandomState(7)
    items, offsets, lens = make_sessions(rng, 30, min_len=2, max_len=6)
    order = np.arange(30)
    # batch_size=1 walks sessions one by one => full coverage
    sched = _build_schedule_numpy(items, offsets, order, 1, False)
    pairs = []
    for t in range(sched.n_steps):
        if sched.valid[t, 0]:
            pairs.append((sched.in_idx[t, 0], sched.out_idx[t, 0]))
    expected = []
    for s in range(30):
        seq = items[offsets[s]: offsets[s + 1]]
        expected.extend(zip(seq[:-1], seq[1:]))
    assert pairs == expected
    assert sched.n_events == int((lens - 1).sum())


def test_reset_marks_session_starts():
    rng = np.random.RandomState(3)
    items, offsets, _ = make_sessions(rng, 25, min_len=2)
    order = np.arange(25)
    sched = _build_schedule_numpy(items, offsets, order, 4, False)
    # A reset step's in_idx must be some session's first event.
    first_events = set(items[offsets[:-1]])
    for t in range(sched.n_steps):
        for b in range(4):
            if sched.valid[t, b] and sched.reset[t, b]:
                assert sched.in_idx[t, b] in first_events
    # Lane 0..3 start fresh at t=0
    assert sched.reset[0, : min(4, 25)].all()


def test_single_event_sessions_are_skipped():
    """Length-1 sessions produce no training step (end-start<=1 refill path)."""
    items = np.array([5, 1, 2, 3, 9], dtype=np.int32)
    offsets = np.array([0, 1, 4, 5])  # sessions: [5], [1,2,3], [9]
    sched = _build_schedule_numpy(items, offsets, np.arange(3), 2, False)
    pairs = sorted(
        (int(sched.in_idx[t, b]), int(sched.out_idx[t, b]))
        for t in range(sched.n_steps)
        for b in range(2)
        if sched.valid[t, b]
    )
    assert pairs == [(1, 2), (2, 3)]


def test_dispatch_wrapper():
    rng = np.random.RandomState(11)
    items, offsets, _ = make_sessions(rng, 12)
    s1 = build_schedule(items, offsets, np.arange(12), 4)
    s2 = _build_schedule_numpy(items, offsets, np.arange(12), 4, False)
    assert (s1.in_idx == s2.in_idx).all()
    assert (s1.valid == s2.valid).all()


def test_session_order_time_sort():
    """time_sort orders sessions by first-event timestamp (gru4rec.py:585);
    time_sort=False keeps session-key order."""
    import pandas as pd
    from gru4rec_tpu.data.scheduler import session_order

    # session 0 starts at t=50, session 1 at t=10, session 2 at t=30
    df = pd.DataFrame({
        "SessionId": [0, 0, 1, 1, 2, 2],
        "ItemId": list("abcdef"),
        "Time": [50, 51, 10, 11, 30, 31],
    })
    order = session_order(df, "SessionId", "Time", time_sort=True, n_sessions=3)
    assert list(order) == [1, 2, 0]
    order = session_order(df, "SessionId", "Time", time_sort=False, n_sessions=3)
    assert list(order) == [0, 1, 2]


def test_stacked_chunk_upload_roundtrip():
    """fit()'s stacked-schedule device path: _stack_chunks + the packed wire
    format (_upload_stacks/_get_chunk) must reproduce each per-chunk block
    bit-for-bit (incl. the zero-padded ragged tail), so the single
    4-transfer epoch upload is semantics-free — in BOTH wire formats
    (uint16 ids + bit-packed lanes for catalogs <= 65535; int32 above)."""
    import numpy as np

    from gru4rec_tpu.models.gru4rec import (_chunk_schedule, _get_chunk,
                                            _stack_chunks, _upload_stacks)

    rng = np.random.RandomState(3)
    items, offsets, _ = make_sessions(rng, 40, min_len=2, max_len=7)
    sched = build_schedule(items, offsets, np.arange(40), batch_size=8)
    C = 16
    chunks = _chunk_schedule(sched, C)
    assert len(chunks) >= 2 and sched.n_steps % C != 0  # ragged tail covered
    base, ends = _stack_chunks(chunks)
    assert ends == [c[4] for c in chunks]
    for n_items in (1000, 1 << 20):  # uint16 wire format / int32 fallback
        stacks = _upload_stacks(base, None, n_items=n_items)
        assert stacks[0] == "packed"
        want_dt = np.uint16 if n_items <= np.iinfo(np.uint16).max else np.int32
        assert np.asarray(stacks[1][0]).dtype == want_dt
        for ci, c in enumerate(chunks):
            got = _get_chunk(stacks, ci)
            for a, b in zip(got, c[:4]):
                np.testing.assert_array_equal(np.asarray(a), b)
