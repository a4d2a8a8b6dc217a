"""Incremental (stream-shaped) processing with raw Ray actors.

Everything else in this engine is a ``Dataset`` pipeline; this module
is the documented exception (SURVEY custom-operator rule (c)): a
workload whose semantics need *incremental cross-batch state in event
order* — e.g. sessionization over an unbounded log where results must
be emitted as sessions CLOSE, not after a bounded corpus ends — cannot
be expressed as a batch ``map_batches``/``groupby`` (those see bounded
inputs).

Pattern: one ``@ray.remote`` state actor per key-hash bucket; the
driver (or an upstream source) feeds micro-batches in event-time order
PER BUCKET.  Partitioning assumptions (documented, asserted):

* all events of one key route to one bucket (hash(key) % n_buckets) —
  the same co-location contract as a keyed shuffle;
* within a bucket, feed order is non-decreasing in event time up to
  ``allowed_lateness_s`` (a per-partition ordered log; Kafka-like
  sources provide this).  Events older than watermark - lateness are
  COUNTED in ``n_late`` and skipped by default — construct the actor
  with ``strict=True`` to raise on the first violation instead
  (turns a silently fragmented session into a loud contract failure).

The final ``flush()`` closes any sessions still open — calling it
makes results identical to the batch ``window.sessionize`` over the
same bounded input, which is what the equivalence test asserts.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

import ray


@ray.remote
class SessionStateActor:
    """Per-bucket incremental sessionizer.

    State: per key, the open session's (start_us, last_us, n_events).
    ``feed`` applies a micro-batch and returns sessions that CLOSED
    (gap exceeded) during it; ``flush`` closes the rest.
    """

    def __init__(
        self, gap_s: int = 1800, allowed_lateness_s: int = 0, strict: bool = False
    ):
        self.gap_us = gap_s * 1_000_000
        self.late_us = allowed_lateness_s * 1_000_000
        self.open: dict = {}
        self.watermark = -(1 << 62)
        self.n_late = 0
        self.strict = strict

    def feed(self, keys: list, ts_us: list[int]) -> list[tuple]:
        closed = []
        for k, t in zip(keys, ts_us):
            if t < self.watermark - self.late_us:
                if self.strict:
                    raise ValueError(
                        f"event-time order violated: ts {t} below watermark "
                        f"{self.watermark} - lateness {self.late_us}"
                    )
                self.n_late += 1
                continue
            self.watermark = max(self.watermark, t)
            cur = self.open.get(k)
            if cur is None:
                self.open[k] = [t, t, 1]
            elif t - cur[1] > self.gap_us:
                closed.append((k, cur[0], cur[1], cur[2]))
                self.open[k] = [t, t, 1]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
        return closed

    def flush(self) -> list[tuple]:
        out = [(k, v[0], v[1], v[2]) for k, v in sorted(self.open.items())]
        self.open.clear()
        return out

    def stats(self) -> dict:
        return {"n_late": self.n_late, "n_open": len(self.open)}


class StreamingSessionizer:
    """Driver-side facade: routes event micro-batches to bucket actors
    and collects closed sessions.

    ``process_sorted`` consumes a bounded, globally ts-sorted event
    DataFrame in micro-batches (the bounded-replay mode used for
    equivalence testing); a real deployment would feed per-bucket
    ordered partitions concurrently.
    """

    def __init__(self, n_buckets: int = 4, gap_s: int = 1800, allowed_lateness_s: int = 0):
        self.n_buckets = n_buckets
        self.actors = [
            SessionStateActor.remote(gap_s, allowed_lateness_s)
            for _ in range(n_buckets)
        ]

    def _bucket(self, key) -> int:
        import zlib

        return zlib.crc32(str(key).encode()) % self.n_buckets

    def process_sorted(
        self,
        events: pd.DataFrame,
        key_col: str = "user_id",
        ts_col: str = "ts",
        batch_rows: int = 1024,
    ) -> pd.DataFrame:
        events = events.sort_values(ts_col, kind="mergesort")
        ts_us = events[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        keys = events[key_col].to_numpy()
        closed: list[tuple] = []
        for lo in range(0, len(events), batch_rows):
            hi = min(lo + batch_rows, len(events))
            per_bucket: dict[int, tuple[list, list]] = defaultdict(lambda: ([], []))
            for k, t in zip(keys[lo:hi], ts_us[lo:hi]):
                b = self._bucket(k)
                per_bucket[b][0].append(k)
                per_bucket[b][1].append(int(t))
            futs = [
                self.actors[b].feed.remote(ks, ts) for b, (ks, ts) in per_bucket.items()
            ]
            for part in ray.get(futs):
                closed.extend(part)
        for part in ray.get([a.flush.remote() for a in self.actors]):
            closed.extend(part)
        if not closed:
            return pd.DataFrame(
                {key_col: [], "start_us": [], "end_us": [], "n_events": []}
            )
        df = pd.DataFrame(closed, columns=[key_col, "start_us", "end_us", "n_events"])
        return df.sort_values([key_col, "start_us"]).reset_index(drop=True)

    def late_counts(self) -> int:
        return int(sum(s["n_late"] for s in ray.get([a.stats.remote() for a in self.actors])))

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
