"""Brute-force parity for the as-of / range-join operators (ops/asof.py)
on randomized interleaved event logs — the generic-semantics check that the
sf-table oracle (test_entry) can't cover (its clicks/views cluster per
user; here timestamps, types and keys are adversarially shuffled)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raycrawl.ops.asof import asof_join, range_join_agg


def _events(n: int = 400, users: int = 7, seed: int = 5) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # unique microsecond timestamps -> no tie ambiguity in the brute force
    offs = rng.choice(10**9, size=n, replace=False)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(offs, unit="us"),
        "event_type": rng.choice(["click", "view", "error"], n),
        "value": rng.uniform(0, 50, n).round(2),
    })


def test_asof_join_matches_bruteforce(ray_session):
    df = _events()
    clicks = df[df.event_type == "click"][["event_id", "user_id", "ts"]]
    views = df[df.event_type == "view"][["event_id", "user_id", "ts"]].rename(
        columns={"event_id": "prior_event_id"})

    out = asof_join(
        rd.from_pandas(clicks.reset_index(drop=True)),
        rd.from_pandas(views.reset_index(drop=True)),
        by="user_id", on="ts", right_cols=["prior_event_id"], n_parts=4,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    want = {}
    for _, c in clicks.iterrows():
        prior = views[(views.user_id == c.user_id) & (views.ts <= c.ts)]
        want[int(c.event_id)] = (
            None if prior.empty
            else int(prior.loc[prior.ts.idxmax(), "prior_event_id"]))

    assert len(out) == len(clicks)
    for _, row in out.iterrows():
        exp = want[int(row.event_id)]
        got = None if pd.isna(row.prior_event_id) else int(row.prior_event_id)
        assert got == exp, f"event {int(row.event_id)}: {got} != {exp}"
        # matched ts_right must be the matched view's ts
        if exp is not None:
            vt = views.loc[views.prior_event_id == exp, "ts"].iloc[0]
            assert pd.Timestamp(row.ts_right) == vt


def test_asof_join_rejects_column_clash(ray_session):
    df = _events(50)
    ds = rd.from_pandas(df[["event_id", "user_id", "ts"]])
    with pytest.raises(ValueError, match="collide"):
        asof_join(ds, ds, by="user_id", on="ts", right_cols=["event_id"])


def test_range_join_agg_matches_bruteforce(ray_session):
    df = _events(seed=11)
    win_s = 3600 * 3
    out = range_join_agg(
        rd.from_pandas(df), anchor_type="click", window_s=win_s, n_parts=4,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    clicks = df[df.event_type == "click"]
    assert len(out) == len(clicks)
    delta = pd.Timedelta(seconds=win_s)
    for _, c in clicks.iterrows():
        follow = df[(df.user_id == c.user_id) & (df.ts > c.ts)
                    & (df.ts <= c.ts + delta)]
        cents = int(np.floor(follow.value.to_numpy() * 100.0 + 0.5)
                    .astype(np.int64).sum())
        row = out[out.event_id == c.event_id].iloc[0]
        assert int(row.n_follow) == len(follow)
        assert int(row.cents_follow) == cents


def test_range_join_agg_no_anchors_is_typed_empty(ray_session):
    df = _events(60)
    out = range_join_agg(rd.from_pandas(df), anchor_type="nope",
                         window_s=60, n_parts=2).to_pandas()
    assert len(out) == 0
    # Ray may drop the schema entirely when every group block is empty; if
    # columns survive they must be the contract columns
    assert list(out.columns) in ([], ["event_id", "n_follow", "cents_follow"])
