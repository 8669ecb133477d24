"""Seen-set state machine + cuckoo filter properties (SURVEY.md §5.2 test 3)."""

import hashlib

from raycrawl.seen import CuckooFilter, SeenState


def _k(i: int) -> bytes:
    return hashlib.sha1(f"url-{i}".encode()).digest()


def test_cuckoo_no_false_negatives_and_low_fp():
    ck = CuckooFilter(capacity=1 << 14)
    n = 10_000
    for i in range(n):
        ck.add(_k(i))
    # zero false negatives
    assert all(ck.contains(_k(i)) for i in range(n))
    # false-positive rate below 1% (16-bit fingerprints → expect ~0.02%)
    fp = sum(ck.contains(_k(i)) for i in range(n, 2 * n))
    assert fp / n < 0.01, fp


def test_admit_is_test_and_set_in_order():
    s = SeenState()
    ks = [_k(1), _k(2), _k(1), _k(3)]
    assert s.admit("a", ks) == [True, True, False, True]
    assert s.admit("a", [_k(2)]) == [False]
    # per-site isolation
    assert s.admit("b", [_k(1)]) == [True]


def test_popped_then_readmit():
    s = SeenState()
    s.admit("a", [_k(1)])
    s.on_popped("a", [_k(1)])
    # not visited → readmittable (excluded/robots-skip reference semantics)
    assert s.admit("a", [_k(1)]) == [True]
    s.on_popped("a", [_k(1)])
    s.mark_visited("a", [_k(1)])
    assert s.admit("a", [_k(1)]) == [False]


def test_hash_propose_confirm_min_order_wins():
    s = SeenState()
    s.propose_hash("a", [("h1", (0, 0, "x", 5)), ("h1", (0, 0, "x", 2))])
    assert s.confirm_hashes("a", [("h1", (0, 0, "x", 5))]) == [False]
    assert s.confirm_hashes("a", [("h1", (0, 0, "x", 2))]) == [True]
    s.clear_pending()
    # already permanent → new proposals dead
    s.propose_hash("a", [("h1", (0, 0, "x", 0))])
    assert s.confirm_hashes("a", [("h1", (0, 0, "x", 0))]) == [False]


def test_snapshot_restore_roundtrip():
    s = SeenState(mode="cuckoo")
    s.admit("a", [_k(i) for i in range(100)])
    s.mark_visited("a", [_k(i) for i in range(50)])
    s.set_cache([(_k(1), ("x", 1.0, None, "a"))])
    blob = s.snapshot()
    s2 = SeenState()
    s2.restore(blob)
    assert s2.queued["a"] == s.queued["a"]
    assert s2.get_cache([_k(1)])[0][0] == "x"
    assert all(s2._visited_contains("a", _k(i)) for i in range(50))


def test_sliding_cuckoo_window_expiry_and_bound():
    """Keys expire exactly `window` rotations after insertion, never
    sooner (no false negatives within the window); live segments are
    capped at `window` regardless of rotations."""
    from raycrawl.seen import SlidingCuckooFilter

    f = SlidingCuckooFilter(capacity=1 << 12, window=3)
    epochs: dict[int, list[bytes]] = {}
    for e in range(8):
        epochs[e] = [_k(1000 * e + i) for i in range(200)]
        for k in epochs[e]:
            f.add(k)
        # everything inserted within the last `window` epochs is present
        for live in range(max(0, e - 2), e + 1):
            assert all(f.contains(k) for k in epochs[live]), (e, live)
        # epoch e-3 and older have fully expired (modulo cuckoo false
        # positives — with 16-bit fingerprints allow a small fraction)
        for dead in range(0, max(0, e - 2)):
            hits = sum(f.contains(k) for k in epochs[dead])
            assert hits <= 4, (e, dead, hits)
        f.rotate()
        assert len(f.segments) <= 3


def test_sliding_cuckoo_state_roundtrip():
    from raycrawl.seen import SlidingCuckooFilter

    f = SlidingCuckooFilter(capacity=1 << 10, window=2)
    f.add(_k(1)); f.rotate(); f.add(_k(2))
    g = SlidingCuckooFilter.from_state(f.state())
    assert g.contains(_k(1)) and g.contains(_k(2))
    g.rotate()           # expires the segment holding k1
    assert not g.contains(_k(1)) and g.contains(_k(2))
    assert f.contains(_k(1))   # original untouched


def test_seen_state_cuckoo_window_mode_and_snapshot():
    """cuckoo_window mode: re-admission after the window slides past a
    visit, and snapshot/restore preserves segment boundaries."""
    s = SeenState(mode="cuckoo_window", window_epochs=2)
    s.mark_visited("a", [_k(1)])
    assert s.admit("a", [_k(1)]) == [False]
    s.rotate_window()    # window=2: k1's segment still live
    assert s._visited_contains("a", _k(1))
    blob = s.snapshot()
    t = SeenState()
    t.restore(blob)
    assert t.mode == "cuckoo_window"
    assert t._visited_contains("a", _k(1))
    t.rotate_window()    # second rotation: k1's segment expires
    assert t._visited_contains("a", _k(1)) is False
    assert s._visited_contains("a", _k(1))  # original untouched


def test_sharded_window_readmission_after_expiry(ray_session):
    """The full pop->mark->rotate cycle over ShardedSeen in
    cuckoo_window mode: a fetched URL (admitted, popped, marked) is
    blocked while any live segment holds it and becomes re-admittable
    once the window slides past — the continuous-crawl TTL contract."""
    from raycrawl.seen import ShardedSeen

    s = ShardedSeen(2, "cuckoo_window", window_epochs=2)
    k = _k(42)
    assert s.admit_many([("a", k)]) == [True]
    s.on_popped_many([("a", k)])          # leaves queued (fetch pop)
    s.mark_visited_many([("a", k)])       # rotating visited mark
    assert s.admit_many([("a", k)]) == [False]
    s.rotate_window()                     # segment still live (window 2)
    assert s.contains_many([("a", k)]) == [True]
    s.rotate_window()                     # now expired
    assert s.admit_many([("a", k)]) == [True]


def test_cuckoo_restore_is_bit_identical_mid_stream():
    """r5 (ADVICE r4): eviction slot choice is derived from the in-flight
    fingerprint + kick index (no RNG), so `add` is a pure function of
    (table state, key) — a filter snapshotted mid-stream and restored
    must continue BIT-identically to the uninterrupted run, including
    layout and stash, even under heavy eviction pressure (tiny capacity
    forces the kick loop constantly)."""
    import numpy as np

    def key(i):
        return hashlib.sha1(f"url-{i}".encode()).digest()

    a = CuckooFilter(capacity=256)
    for i in range(400):          # way past capacity: stash + kicks active
        a.add(key(i))
    # snapshot mid-stream the way SeenState.snapshot/restore does
    nb, table, stash, count = a.n_buckets, a.table.copy(), set(a.stash), a.count
    b = CuckooFilter(nb * 4)
    b.table, b.stash, b.count = table, stash, count
    for i in range(400, 800):     # continue BOTH from the same state
        a.add(key(i))
        b.add(key(i))
    assert np.array_equal(a.table, b.table)   # bit-identical layout
    assert a.stash == b.stash
    assert a.count == b.count
    assert all(a.contains(key(i)) for i in range(800))  # no false negatives
