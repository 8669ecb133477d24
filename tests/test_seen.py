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
