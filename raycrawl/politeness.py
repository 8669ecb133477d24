"""Per-host politeness: token-bucket rate limits + robots verdicts.

The reference serializes all of a site's requests through one async mutex at
≥delay spacing (RateLimiter, crawler.py:956-968) and consults robots at
dequeue time (crawler.py:1174-1176). Our engine generalizes to PER-HOST
token buckets held in a sharded actor pool (north_star): hosts are assigned
to shards by hash, each shard owns the ``next_free`` virtual-time cursor and
the robots parser for its hosts, and the wave planner asks for grants in one
batched call per host per epoch.

Time is VIRTUAL in the sandbox (no live HTTP): grants carry simulated fetch
timestamps and the politeness tests assert per-host spacing ≥ delay
(SURVEY.md §5.2 test 4). A live deployment would replace the virtual window
with wall-clock admission — the state machine is identical.

Delay precedence per host: site delay → robots Crawl-delay → 0.5 s default
(crawler.py:946-949, 432-438).
"""

from __future__ import annotations

from .robots import DEFAULT_DELAY, RobotsTable


class HostPoliteness:
    """Plain state machine (used directly in strict mode; wrapped in a Ray
    actor for the wave engine)."""

    def __init__(self, robots_bodies: dict[str, str | None] | None = None,
                 site_delays: dict[str, float] | None = None,
                 robots_fetcher=None):
        # fetcher: lazy live robots.txt per host (ref crawler.py:411-428);
        # each shard fetches/caches only its own hosts' robots
        self.robots = RobotsTable(robots_bodies or {}, fetcher=robots_fetcher)
        self.site_delays = dict(site_delays or {})  # host → explicit site delay
        self.next_free: dict[str, float] = {}
        self._delay: dict[str, float] = {}

    def delay_of(self, host: str) -> float:
        d = self._delay.get(host)
        if d is None:
            d = self.robots.effective_delay(host, self.site_delays.get(host))
            self._delay[host] = d
        return d

    def can_fetch_many(self, host: str, urls: list[str]) -> list[bool]:
        return [self.robots.can_fetch(host, u) for u in urls]

    def available(self, host: str, window_start: float, window_end: float) -> int:
        """Tokens available for this host inside [window_start, window_end)."""
        d = self.delay_of(host)
        t0 = max(self.next_free.get(host, 0.0), window_start)
        if t0 >= window_end:
            return 0
        import math

        return max(0, math.ceil((window_end - t0) / d)) if d > 0 else 1_000_000

    def consume(self, host: str, n: int, window_start: float) -> list[float]:
        """Take n tokens; returns the virtual grant timestamps (spaced by the
        host delay). Caller must not exceed ``available``."""
        d = self.delay_of(host)
        t = max(self.next_free.get(host, 0.0), window_start)
        ts = [t + i * d for i in range(n)]
        if n:
            self.next_free[host] = ts[-1] + d
        return ts

    def snapshot(self) -> dict:
        return {"next_free": dict(self.next_free), "delay": dict(self._delay)}

    def restore_state(self, blob: dict) -> None:
        self.next_free = dict(blob["next_free"])
        self._delay = dict(blob["delay"])


def make_politeness_shard_cls():
    import os

    import ray

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    @ray.remote(num_cpus=0,
                runtime_env={"env_vars": {"PYTHONPATH": repo_root}})
    class PolitenessShard(HostPoliteness):
        def plan_host(self, host: str, urls: list[str], window_start: float,
                      window_end: float, cap: int):
            """One-RPC wave planning for a host: robots verdicts + token
            grant in a single call (avail → verdicts → consume)."""
            verdicts = self.can_fetch_many(host, urls)
            avail = self.available(host, window_start, window_end)
            return verdicts, min(avail, cap)

        def plan_many(self, items):
            """Batched plan_host: items = [(host, urls, ws, we, cap)].
            One RPC per shard per wave partition, not per host."""
            return [self.plan_host(*it) for it in items]

        def take(self, host: str, n: int, window_start: float) -> list[float]:
            return self.consume(host, n, window_start)

        def take_many(self, items):
            """Batched consume: items = [(host, n, window_start)]."""
            return [self.consume(*it) for it in items]

        def ping(self):
            return True

    return PolitenessShard


class ShardedPoliteness:
    """Routes host-keyed calls to P PolitenessShard actors."""

    def __init__(self, n_shards: int, robots_bodies: dict[str, str | None],
                 site_delays: dict[str, float], robots_fetcher=None):
        import ray

        cls = make_politeness_shard_cls()
        self.n = n_shards
        self.shards = [cls.remote(robots_bodies, site_delays, robots_fetcher)
                       for _ in range(n_shards)]
        self._ray = ray

    def shard_for(self, host: str):
        # stable routing (Python's str hash is salted per process — a
        # restore in a new driver must route identically)
        import zlib

        return self.shards[zlib.crc32(host.encode()) % self.n]

    def plan_host(self, host: str, urls: list[str], window_start: float,
                  window_end: float, cap: int):
        return self._ray.get(
            self.shard_for(host).plan_host.remote(host, urls, window_start, window_end, cap)
        )

    def take(self, host: str, n: int, window_start: float) -> list[float]:
        return self._ray.get(self.shard_for(host).take.remote(host, n, window_start))

    def _scatter(self, method: str, items: list, host_idx: int = 0):
        import zlib

        by_shard: dict[int, list[int]] = {}
        for i, it in enumerate(items):
            sid = zlib.crc32(it[host_idx].encode()) % self.n
            by_shard.setdefault(sid, []).append(i)
        refs = {sid: getattr(self.shards[sid], method).remote([items[i] for i in idxs])
                for sid, idxs in by_shard.items()}
        out = [None] * len(items)
        for sid, idxs in by_shard.items():
            vals = self._ray.get(refs[sid])
            for j, i in enumerate(idxs):
                out[i] = vals[j]
        return out

    def plan_many(self, items: list) -> list:
        """items = [(host, urls, ws, we, cap)] → [(verdicts, avail)]."""
        return self._scatter("plan_many", items)

    def take_many(self, items: list) -> list:
        """items = [(host, n, window_start)] → [grant timestamps]."""
        return self._scatter("take_many", items)

    def snapshots(self) -> list[dict]:
        return self._ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, blobs: list[dict]) -> None:
        assert len(blobs) == self.n
        self._ray.get([s.restore_state.remote(b) for s, b in zip(self.shards, blobs)])


# ship this module's code with closures/actor classes so Ray workers never
# need to import the package (driver cwd / PYTHONPATH independent)
import raycrawl as _raycrawl_pkg

_raycrawl_pkg.register_by_value()
