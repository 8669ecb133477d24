"""URL-seen / frontier-membership / incremental-cache state.

The reference keeps three in-memory Python sets per site (``visited``,
``in_progress``, ``to_visit_urls``, crawler.py:1121-1124), a per-site
``processed_hashes`` set (crawler.py:944) and a cross-run SQLite cache
(cache_db.py:17-93). At 10^10-URL design scale this becomes a SHARDED actor
pool keyed by SHA-1(canonical url) (north_star): ``SeenState`` is the plain
state machine, ``SeenShard`` the Ray actor wrapper, ``ShardedSeen`` the
client that routes batched calls by key-hash.

Membership can run in two modes:
- ``exact``  — Python sets/dicts (test scale; the semantic ground truth);
- ``cuckoo`` — a cuckoo filter per shard (~2-4 bytes/key) for the *visited*
  membership, with an exact overflow stash; validated against exact mode at
  test scale (SURVEY.md §2.5 note / §5.2 test 3). The incremental cache
  metadata (content_hash/etag/last_crawl) stays an exact mapping — at design
  scale it is the at-rest ``seen`` Parquet table, of which the in-memory dict
  here is the test-scale stand-in.

All APIs are batch-first: one RPC per shard per wave, never per URL
(SURVEY.md §7.7 actor-RPC amortization).
"""

from __future__ import annotations

import pickle

import numpy as np


class CuckooFilter:
    """Fixed-capacity cuckoo filter: 4-slot buckets, 16-bit fingerprints,
    exact stash overflow. No deletions (crawl seen-sets only grow within a
    run; compaction happens at checkpoint rewrite)."""

    MAX_KICKS = 500

    def __init__(self, capacity: int = 1 << 16, seed: int = 0x5EED):
        n_buckets = 1
        while n_buckets * 4 < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.stash: set[bytes] = set()
        self.count = 0
        # seed kept for state-tuple compat; eviction choices are derived
        # from the fingerprint + kick index (no RNG), so `add` is a pure
        # function of (table state, key) and a checkpoint-restored filter
        # continues BIT-IDENTICALLY to an uninterrupted run
        self.seed = seed

    @staticmethod
    def _fp_and_index(key: bytes) -> tuple[int, int]:
        # key is a SHA-1 digest: uniform bytes — slice, don't rehash
        fp = (int.from_bytes(key[0:2], "little") | 1) & 0xFFFF
        idx = int.from_bytes(key[2:6], "little")
        return fp, idx

    def _alt_index(self, idx: int, fp: int) -> int:
        # standard partial-key cuckoo: alt = idx XOR hash(fp)
        return (idx ^ (fp * 0x5BD1E995)) & (self.n_buckets - 1)

    def add(self, key: bytes) -> None:
        fp, idx = self._fp_and_index(key)
        i1 = idx & (self.n_buckets - 1)
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            for s in range(4):
                if row[s] == 0:
                    row[s] = fp
                    self.count += 1
                    return
        # evict loop — slot choice mixes the in-flight fingerprint with the
        # kick index (stateless; replaces the former RNG so restores are
        # bit-identical, ADVICE r4)
        i = i1 if (self.count & 1) == 0 else i2
        cur = fp
        for kick in range(self.MAX_KICKS):
            s = ((cur * 0x5BD1E995) >> 11 ^ kick) & 3
            cur, self.table[i][s] = int(self.table[i][s]), cur
            i = self._alt_index(i, cur)
            row = self.table[i]
            for s2 in range(4):
                if row[s2] == 0:
                    row[s2] = cur
                    self.count += 1
                    return
        self.stash.add(bytes((cur & 0xFF, (cur >> 8) & 0xFF)) + b"#" + str(i).encode())
        self.count += 1

    def contains(self, key: bytes) -> bool:
        fp, idx = self._fp_and_index(key)
        i1 = idx & (self.n_buckets - 1)
        i2 = self._alt_index(i1, fp)
        if fp in self.table[i1] or fp in self.table[i2]:
            return True
        probe1 = bytes((fp & 0xFF, (fp >> 8) & 0xFF)) + b"#" + str(i1).encode()
        probe2 = bytes((fp & 0xFF, (fp >> 8) & 0xFF)) + b"#" + str(i2).encode()
        return probe1 in self.stash or probe2 in self.stash


class SlidingCuckooFilter:
    """Window-segmented approximate membership: ``window`` cuckoo
    segments, inserts land in the newest, lookups probe all live
    segments, and ``rotate()`` (called once per crawl epoch) starts a
    fresh segment and drops the oldest — so a URL inserted ``window``
    rotations ago silently expires and gets re-admitted, which is
    exactly the recrawl-after-TTL semantics a continuous crawl wants
    from its seen set (the membership-tier analogue of the cache TTL;
    sliding-window AMQ filters per the SIGMOD'23 learned-cuckoo line of
    work, the segmented-rotation scheme being the classic baseline).

    Memory is BOUNDED by design: ≤ ``window`` fixed-capacity segments
    regardless of crawl lifetime — the property a years-running frontier
    at 10¹⁰ URLs needs, where a grow-only filter eventually evicts into
    an unbounded stash. No false negatives within the window (cuckoo
    property, per segment); expiry is all-or-nothing per segment, i.e.
    TTL granularity is one rotation."""

    def __init__(self, capacity: int = 1 << 16, window: int = 4,
                 seed: int = 0x5EED):
        if window < 1:
            raise ValueError("SlidingCuckooFilter: window must be >= 1")
        self.capacity = capacity
        self.window = window
        self.seed = seed
        self.segments: list[CuckooFilter] = [CuckooFilter(capacity, seed)]

    def add(self, key: bytes) -> None:
        self.segments[-1].add(key)

    def contains(self, key: bytes) -> bool:
        return any(s.contains(key) for s in self.segments)

    def rotate(self) -> None:
        self.segments.append(CuckooFilter(self.capacity, self.seed))
        if len(self.segments) > self.window:
            del self.segments[0]

    @property
    def count(self) -> int:
        return sum(s.count for s in self.segments)

    def state(self) -> tuple:
        return (self.capacity, self.window, self.seed,
                [(s.n_buckets, s.table, s.stash, s.count)
                 for s in self.segments])

    @classmethod
    def from_state(cls, st: tuple) -> "SlidingCuckooFilter":
        capacity, window, seed, segs = st
        f = cls(capacity, window, seed)
        f.segments = []
        for nb, table, stash, count in segs:
            ck = CuckooFilter(nb * 4, seed)
            ck.table = table
            ck.stash = stash
            ck.count = count
            f.segments.append(ck)
        return f


class SeenState:
    """Per-shard crawl membership + incremental cache. Keys are SHA-1
    digests (bytes); all per-site sets are keyed by site name."""

    def __init__(self, mode: str = "exact", cuckoo_capacity: int = 1 << 18,
                 window_epochs: int = 4):
        assert mode in ("exact", "cuckoo", "cuckoo_window")
        self.mode = mode
        self.window_epochs = window_epochs
        self.cuckoo_capacity = cuckoo_capacity
        self.visited: dict[str, set[bytes]] = {}
        self.visited_ck: dict[str, CuckooFilter] = {}
        self.queued: dict[str, set[bytes]] = {}
        self.hashes: dict[str, set[str]] = {}     # indexed content hashes per site
        self.pending: dict[str, dict[str, tuple]] = {}  # per-wave hash proposals
        self.cache: dict[bytes, dict] = {}        # cross-run incremental state
        self.active: dict[str, int] = {}          # per-site active-frontier counters
        self.popped: dict[str, int] = {}          # cumulative frontier dequeues

    def _new_filter(self):
        if self.mode == "cuckoo_window":
            return SlidingCuckooFilter(self.cuckoo_capacity,
                                       self.window_epochs)
        return CuckooFilter(self.cuckoo_capacity)

    # -- membership -------------------------------------------------------
    def _visited_contains(self, site: str, key: bytes) -> bool:
        if self.mode in ("cuckoo", "cuckoo_window"):
            ck = self.visited_ck.get(site)
            return ck.contains(key) if ck else False
        return key in self.visited.get(site, ())

    def mark_visited(self, site: str, keys: list[bytes]) -> None:
        if self.mode in ("cuckoo", "cuckoo_window"):
            ck = self.visited_ck.setdefault(site, self._new_filter())
            for k in keys:
                if not ck.contains(k):
                    ck.add(k)
        else:
            self.visited.setdefault(site, set()).update(keys)

    def rotate_window(self) -> None:
        """Advance the sliding seen window one epoch (no-op for
        grow-only modes): the oldest segment's URLs expire and become
        re-admittable — recrawl-after-TTL at membership granularity."""
        if self.mode == "cuckoo_window":
            for ck in self.visited_ck.values():
                ck.rotate()

    def on_popped(self, site: str, keys: list[bytes]) -> None:
        """Every popped frontier entry leaves the queued set
        (crawler.py:1162 ``to_visit_urls.discard``)."""
        q = self.queued.get(site)
        if q:
            q.difference_update(keys)

    def admit(self, site: str, keys: list[bytes]) -> list[bool]:
        """Test-and-set admission: new iff not visited and not queued
        (crawler.py:1205). In-order within the call; exactly-once."""
        q = self.queued.setdefault(site, set())
        out = []
        for k in keys:
            if k in q or self._visited_contains(site, k):
                out.append(False)
            else:
                q.add(k)
                out.append(True)
        return out

    def queued_count(self, site: str) -> int:
        return len(self.queued.get(site, ()))

    def queued_counts(self, sites: list[str]) -> list[int]:
        return [len(self.queued.get(s, ())) for s in sites]

    # -- active-frontier counters (wave engine) ----------------------------
    # The wave engine leaves fetched/extension-skipped keys in ``queued``
    # (queued ∪ visited is the admission predicate — identical semantics,
    # no 20-byte-key flood back to the shards per wave). The per-site
    # ACTIVE frontier size for the queue cap is then a plain counter,
    # maintained on shard 0 via client-aggregated deltas.
    def adjust_active(self, deltas: dict[str, int]) -> None:
        for site, d in deltas.items():
            self.active[site] = self.active.get(site, 0) + d
            if d < 0:
                # negative deltas are exactly the pop paths (fetch /
                # extension-skip inplace notes + excluded/robots removals)
                # -> a cumulative frontier-dequeue counter for free, the
                # north_rule's second throughput metric
                self.popped[site] = self.popped.get(site, 0) - d

    def get_active(self, sites: list[str]) -> list[int]:
        return [self.active.get(s, 0) for s in sites]

    def get_popped(self, sites: list[str]) -> list[int]:
        return [self.popped.get(s, 0) for s in sites]

    # -- multi-site batched variants (one RPC per shard per wave partition,
    # regardless of how many sites/hosts the partition holds) --------------
    def admit_many(self, pairs: list[tuple[str, bytes]]) -> list[bool]:
        out = []
        for site, k in pairs:
            q = self.queued.setdefault(site, set())
            if k in q or self._visited_contains(site, k):
                out.append(False)
            else:
                q.add(k)
                out.append(True)
        return out

    def contains_many(self, pairs: list[tuple[str, bytes]]) -> list[bool]:
        """Read-only membership probe (queued ∪ visited) — NO state change.
        Used to pre-filter deferred-admission candidates: the seen set only
        grows, so a True here can never be admitted later (safe to drop);
        a False is re-checked by the authoritative admit test-and-set."""
        return [
            (k in self.queued.get(site, ())
             or self._visited_contains(site, k))
            for site, k in pairs
        ]

    def on_popped_many(self, pairs: list[tuple[str, bytes]]) -> dict[str, int]:
        """Remove keys from queued; returns per-site removal counts (for
        client-side active-counter adjustment)."""
        removed: dict[str, int] = {}
        for site, k in pairs:
            q = self.queued.get(site)
            if q and k in q:
                q.discard(k)
                removed[site] = removed.get(site, 0) + 1
        return removed

    def mark_visited_many(self, pairs: list[tuple[str, bytes]]) -> None:
        for site, k in pairs:
            if self.mode in ("cuckoo", "cuckoo_window"):
                ck = self.visited_ck.setdefault(site, self._new_filter())
                if not ck.contains(k):
                    ck.add(k)
            else:
                self.visited.setdefault(site, set()).add(k)

    # -- content-hash dedup (crawler.py:944, 1034, 1039) -------------------
    # Two-phase, order-deterministic "first-processed wins": eligible rows
    # PROPOSE (hash, order_key) during the wave's first pass; the min
    # order_key per hash wins; CONFIRM (second pass) grants exactly that row
    # unless the hash was already indexed in an earlier wave. This keeps
    # duplicate-content resolution deterministic under concurrent batches
    # without a per-wave groupby shuffle.
    def propose_hash(self, site: str, items: list[tuple[str, tuple]]) -> None:
        permanent = self.hashes.get(site, ())
        p = self.pending.setdefault(site, {})
        for h, okey in items:
            if h in permanent:
                continue  # dead on arrival: an earlier wave indexed it
            cur = p.get(h)
            if cur is None or okey < cur:
                p[h] = okey

    def confirm_hashes(self, site: str, items: list[tuple[str, tuple]]) -> list[bool]:
        permanent = self.hashes.setdefault(site, set())
        p = self.pending.get(site, {})
        out = []
        for h, okey in items:
            if h not in permanent and p.get(h) == okey:
                permanent.add(h)
                out.append(True)
            else:
                out.append(False)
        return out

    def clear_pending(self) -> None:
        self.pending = {}

    def claim_atomic(self, site: str, hashes: list[str]) -> list[bool]:
        """Single-pass test-and-set hash claim (the throughput-mode dedup:
        exactly one winner per hash, winner chosen by arrival order rather
        than the canonical order — see pipeline.CrawlConfig.dedup_mode)."""
        permanent = self.hashes.setdefault(site, set())
        out = []
        for h in hashes:
            if h in permanent:
                out.append(False)
            else:
                permanent.add(h)
                out.append(True)
        return out

    # -- incremental cache (cache_db.py:49-93) ----------------------------
    def get_cache(self, keys: list[bytes]) -> list[dict | None]:
        return [self.cache.get(k) for k in keys]

    def set_cache(self, entries: list[tuple[bytes, dict]]) -> None:
        for k, rec in entries:
            self.cache[k] = rec

    # -- checkpoint --------------------------------------------------------
    def snapshot(self) -> bytes:
        return pickle.dumps(
            {
                "mode": self.mode,
                "visited": self.visited,
                "queued": self.queued,
                "hashes": self.hashes,
                "cache": self.cache,
                "visited_ck": {
                    s: (ck.state() if isinstance(ck, SlidingCuckooFilter)
                        else (ck.n_buckets, ck.table, ck.stash, ck.count))
                    for s, ck in self.visited_ck.items()
                },
                "cuckoo_capacity": self.cuckoo_capacity,
                "window_epochs": self.window_epochs,
                "active": self.active,
                "popped": self.popped,
            }
        )

    def restore(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        self.mode = d["mode"]
        self.visited = d["visited"]
        self.queued = d["queued"]
        self.hashes = d["hashes"]
        self.cache = d["cache"]
        self.cuckoo_capacity = d["cuckoo_capacity"]
        self.window_epochs = d.get("window_epochs", 4)
        self.active = d.get("active", {})
        self.popped = d.get("popped", {})
        self.visited_ck = {}
        for s, st in d["visited_ck"].items():
            if self.mode == "cuckoo_window":
                self.visited_ck[s] = SlidingCuckooFilter.from_state(st)
            else:
                nb, table, stash, count = st
                ck = CuckooFilter(nb * 4)
                ck.table = table
                ck.stash = stash
                ck.count = count
                self.visited_ck[s] = ck


def make_seen_shard_cls():
    """Deferred ray.remote decoration so importing this module never
    touches Ray (the driver owns ray.init)."""
    import os

    import ray

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    @ray.remote(num_cpus=0,
                runtime_env={"env_vars": {"PYTHONPATH": repo_root}})
    class SeenShard(SeenState):
        """Control-plane actor: num_cpus=0 so shards never compete with
        Dataset tasks for CPU slots; work per call is set ops on batches."""

        def ping(self):
            return True

    return SeenShard


class ShardedSeen:
    """Client routing batched calls to N SeenShard actors by key-hash.

    One RPC per touched shard per call; calls to distinct shards run
    concurrently (submit all, then gather)."""

    def __init__(self, n_shards: int = 4, mode: str = "exact",
                 cuckoo_capacity: int = 1 << 18, window_epochs: int = 4):
        import ray

        cls = make_seen_shard_cls()
        self.n = n_shards
        self.mode = mode  # read by _to_cand_tbl's pre-filter gate
        self.shards = [cls.remote(mode, cuckoo_capacity, window_epochs)
                       for _ in range(n_shards)]
        self._ray = ray

    def rotate_window(self) -> None:
        """Advance every shard's sliding seen window (cuckoo_window
        mode; no-op otherwise) — one broadcast RPC per epoch."""
        self._ray.get([s.rotate_window.remote() for s in self.shards])

    def _route(self, keys: list[bytes]):
        by_shard: dict[int, list[int]] = {}
        for i, k in enumerate(keys):
            by_shard.setdefault(k[-1] % self.n, []).append(i)
        return by_shard

    def _scatter_gather(self, method: str, site: str | None, keys: list[bytes],
                        want_result: bool = True):
        by_shard = self._route(keys)
        refs = {}
        for sid, idxs in by_shard.items():
            ks = [keys[i] for i in idxs]
            m = getattr(self.shards[sid], method)
            refs[sid] = m.remote(site, ks) if site is not None else m.remote(ks)
        if not want_result:
            self._ray.get(list(refs.values()))
            return None
        out = [None] * len(keys)
        for sid, idxs in by_shard.items():
            vals = self._ray.get(refs[sid])
            if vals is None:
                continue
            for j, i in enumerate(idxs):
                out[i] = vals[j]
        return out

    def admit(self, site: str, keys: list[bytes]) -> list[bool]:
        flags = self._scatter_gather("admit", site, keys)
        # same active-frontier accounting as admit_many: seed admissions
        # must increment the counter the planner later decrements, or every
        # site's active count drifts to -1 and skews the queue-cap check
        n_admitted = sum(1 for f in flags if f)
        if n_admitted:
            self._ray.get(
                self.shards[0].adjust_active.remote({site: n_admitted}))
        return flags

    def on_popped(self, site: str, keys: list[bytes]) -> None:
        self._scatter_gather("on_popped", site, keys, want_result=False)

    def mark_visited(self, site: str, keys: list[bytes]) -> None:
        self._scatter_gather("mark_visited", site, keys, want_result=False)

    def _scatter_pairs(self, method: str, pairs: list[tuple[str, bytes]],
                       want_result: bool = True):
        by_shard: dict[int, list[int]] = {}
        for i, (_, k) in enumerate(pairs):
            by_shard.setdefault(k[-1] % self.n, []).append(i)
        refs = {sid: getattr(self.shards[sid], method).remote([pairs[i] for i in idxs])
                for sid, idxs in by_shard.items()}
        if not want_result:
            self._ray.get(list(refs.values()))
            return None
        out = [None] * len(pairs)
        for sid, idxs in by_shard.items():
            vals = self._ray.get(refs[sid])
            if vals is None:
                continue
            for j, i in enumerate(idxs):
                out[i] = vals[j]
        return out

    def contains_many(self, pairs: list[tuple[str, bytes]]) -> list[bool]:
        return self._scatter_pairs("contains_many", pairs)

    def admit_many(self, pairs: list[tuple[str, bytes]]) -> list[bool]:
        flags = self._scatter_pairs("admit_many", pairs)
        deltas: dict[str, int] = {}
        for (site, _), f in zip(pairs, flags):
            if f:
                deltas[site] = deltas.get(site, 0) + 1
        if deltas:
            self._ray.get(self.shards[0].adjust_active.remote(deltas))
        return flags

    def on_popped_many(self, pairs: list[tuple[str, bytes]]) -> None:
        removed_lists = self._scatter_pairs_raw("on_popped_many", pairs)
        deltas: dict[str, int] = {}
        for rem in removed_lists:
            for site, n in rem.items():
                deltas[site] = deltas.get(site, 0) - n
        if deltas:
            self._ray.get(self.shards[0].adjust_active.remote(deltas))

    def note_popped_inplace(self, deltas: dict[str, int]) -> None:
        """Count-only active-frontier decrement for rows popped but LEFT in
        the queued set (fetched / extension-skipped — they double as the
        visited mark; no key traffic)."""
        if deltas:
            self._ray.get(self.shards[0].adjust_active.remote(
                {s: -n for s, n in deltas.items()}
            ))

    def mark_visited_many(self, pairs: list[tuple[str, bytes]]) -> None:
        self._scatter_pairs("mark_visited_many", pairs, want_result=False)

    def _scatter_pairs_raw(self, method: str, pairs: list[tuple[str, bytes]]):
        by_shard: dict[int, list[int]] = {}
        for i, (_, k) in enumerate(pairs):
            by_shard.setdefault(k[-1] % self.n, []).append(i)
        refs = [getattr(self.shards[sid], method).remote([pairs[i] for i in idxs])
                for sid, idxs in by_shard.items()]
        return self._ray.get(refs)

    def queued_counts(self, sites: list[str]) -> dict[str, int]:
        """Per-site ACTIVE frontier size (counter on shard 0)."""
        return dict(zip(sites, self._ray.get(
            self.shards[0].get_active.remote(sites)
        )))

    def popped_counts(self, sites: list[str]) -> dict[str, int]:
        """Cumulative per-site frontier dequeues (pops), counter on shard 0."""
        return dict(zip(sites, self._ray.get(
            self.shards[0].get_popped.remote(sites)
        )))

    def get_cache(self, keys: list[bytes]) -> list[dict | None]:
        return self._scatter_gather("get_cache", None, keys)

    def set_cache(self, entries: list[tuple[bytes, dict]]) -> None:
        keys = [k for k, _ in entries]
        by_shard = self._route(keys)
        refs = []
        for sid, idxs in by_shard.items():
            refs.append(self.shards[sid].set_cache.remote([entries[i] for i in idxs]))
        self._ray.get(refs)

    def _route_hashes(self, items: list[tuple[str, tuple]]):
        by_shard: dict[int, list[int]] = {}
        for i, (h, _) in enumerate(items):
            by_shard.setdefault(int(h[:2], 16) % self.n, []).append(i)
        return by_shard

    def propose_hash(self, site: str, items: list[tuple[str, tuple]]) -> None:
        by_shard = self._route_hashes(items)
        refs = [self.shards[sid].propose_hash.remote(site, [items[i] for i in idxs])
                for sid, idxs in by_shard.items()]
        self._ray.get(refs)

    def confirm_hashes(self, site: str, items: list[tuple[str, tuple]]) -> list[bool]:
        by_shard = self._route_hashes(items)
        refs = {sid: self.shards[sid].confirm_hashes.remote(site, [items[i] for i in idxs])
                for sid, idxs in by_shard.items()}
        out = [False] * len(items)
        for sid, idxs in by_shard.items():
            vals = self._ray.get(refs[sid])
            for j, i in enumerate(idxs):
                out[i] = vals[j]
        return out

    def clear_pending(self) -> None:
        self._ray.get([s.clear_pending.remote() for s in self.shards])

    def claim_atomic(self, site: str, hashes: list[str]) -> list[bool]:
        by_shard: dict[int, list[int]] = {}
        for i, h in enumerate(hashes):
            by_shard.setdefault(int(h[:2], 16) % self.n, []).append(i)
        refs = {sid: self.shards[sid].claim_atomic.remote(site, [hashes[i] for i in idxs])
                for sid, idxs in by_shard.items()}
        out = [False] * len(hashes)
        for sid, idxs in by_shard.items():
            vals = self._ray.get(refs[sid])
            for j, i in enumerate(idxs):
                out[i] = vals[j]
        return out

    def snapshots(self) -> list[bytes]:
        return self._ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, blobs: list[bytes]) -> None:
        assert len(blobs) == self.n
        self._ray.get([s.restore.remote(b) for s, b in zip(self.shards, blobs)])

    def load_prior_cache(self, entries: list[tuple[bytes, dict]]) -> None:
        self.set_cache(entries)


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
