"""Incremental actor-based sessionization == batch sessionize on the
same bounded input; incremental emission and late-event accounting."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from deepie_ray.ops import stream, window


def _events(n=3000, users=40, seed=2):
    rng = np.random.default_rng(seed)
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 10 * 86400, n)), unit="s"
    )
    return pd.DataFrame({"user_id": rng.integers(0, users, n), "ts": ts})


def test_streaming_sessionizer_matches_batch():
    df = _events()
    s = stream.StreamingSessionizer(n_buckets=3, gap_s=1800)
    try:
        out = s.process_sorted(df, batch_rows=257)
        assert s.late_counts() == 0
        # batch reference
        batch = window.sessionize(rd.from_pandas(df), "user_id", "ts", 1800).to_pandas()
        got = out.groupby("user_id").size().sort_index()
        want = batch.set_index("user_id")["n_sessions"].sort_index()
        assert got.index.tolist() == want.index.tolist()
        assert got.tolist() == want.tolist()
        # event conservation
        assert out["n_events"].sum() == len(df)
        # sessions are internally consistent
        assert (out["end_us"] >= out["start_us"]).all()
    finally:
        s.shutdown()


def test_streaming_sessions_emitted_incrementally():
    # two sessions per user separated by a big gap: the first must be
    # emitted by feed(), not only by flush()
    import ray

    actor = stream.SessionStateActor.remote(gap_s=60)
    us = 1_000_000
    closed1 = ray.get(actor.feed.remote(["u"], [0 * us]))
    closed2 = ray.get(actor.feed.remote(["u"], [30 * us]))
    closed3 = ray.get(actor.feed.remote(["u"], [500 * us]))  # gap -> closes first
    assert closed1 == [] and closed2 == []
    assert len(closed3) == 1 and closed3[0][3] == 2
    rest = ray.get(actor.flush.remote())
    assert len(rest) == 1 and rest[0][3] == 1
    ray.kill(actor)


def test_streaming_late_events_dropped_and_counted():
    import ray

    actor = stream.SessionStateActor.remote(gap_s=60, allowed_lateness_s=10)
    us = 1_000_000
    ray.get(actor.feed.remote(["a"], [100 * us]))
    ray.get(actor.feed.remote(["b"], [50 * us]))  # 50s late > 10s allowance
    stats = ray.get(actor.stats.remote())
    assert stats["n_late"] == 1
    assert stats["n_open"] == 1
    ray.kill(actor)
