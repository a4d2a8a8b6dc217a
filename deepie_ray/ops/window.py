"""Stream-shaped operators over the bounded ``events`` table.

Ray Data has no event-time windowing; the reference has none either
(SURVEY §2.9 — bounded batch only).  These operators implement the
standard window shapes the way a batch engine does: assign a window
key per row (vectorized), then grouped aggregation — plus sessionize,
which needs per-key ordered iteration (``groupby(key).map_groups``
over ts-sorted groups).  The ordering assumption is per-group only;
no global sort is ever taken.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum



def add_tumbling_window(
    batch: pa.Table, ts_col: str = "ts", width_s: int = 3600, out_col: str = "window_start"
) -> pa.Table:
    """Vectorized window assignment: epoch-seconds floored to width.
    Emits int64 epoch seconds (timezone-proof for oracle comparison)."""
    ts = pc.cast(batch[ts_col], pa.timestamp("us"))  # normalize ns/us units
    epoch = pc.cast(ts, pa.int64())
    null_mask = pc.is_null(epoch).to_numpy(zero_copy_only=False)
    epoch_us = pc.fill_null(epoch, 0).to_numpy(zero_copy_only=False)
    # numpy floor division, NOT Arrow's divide (which truncates toward
    # zero): pre-1970 timestamps must land in the window at or BELOW
    # them, same as the floor(epoch/width) windowing definition
    win = (epoch_us // (width_s * 1_000_000)) * width_s
    return batch.append_column(out_col, pa.array(win, pa.int64(), mask=null_mask))


def tumbling_aggregate(
    events: rd.Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
    width_s: int = 3600,
    value_col: str = "value",
) -> rd.Dataset:
    """-> (key, window_start, n_events, sum_value).  Combiner-first:
    per-batch partial sums, then the small groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        b = add_tumbling_window(batch, ts_col, width_s)
        g = b.group_by([key_col, "window_start"]).aggregate(
            [([], "count_all"), (value_col, "sum")]
        )
        return pa.table(
            {
                key_col: g[key_col],
                "window_start": g["window_start"],
                "n_events": g["count_all"],
                "sum_value": g[f"{value_col}_sum"],
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )


def sessionize(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> rd.Dataset:
    """Session windows per key (gap-based): -> (key, n_sessions,
    n_events).  Per-key ordered scan inside map_groups — the shuffle is
    hash-partitioned by key, each group sorted locally by ts."""

    def sess(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col)
        ts_us = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        new_session = np.ones(len(ts_us), dtype=bool)
        if len(ts_us) > 1:
            new_session[1:] = (ts_us[1:] - ts_us[:-1]) > gap_s * 1_000_000
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "n_sessions": [int(new_session.sum())],
                "n_events": [len(df)],
            }
        )

    return events.groupby(key_col).map_groups(sess, batch_format="pandas")


def sliding_aggregate(
    events: rd.Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
    width_s: int = 3600,
    slide_s: int = 1800,
    value_col: str = "value",
) -> rd.Dataset:
    """Sliding windows: each row lands in width/slide windows.  The
    explode is pure Arrow — one vectorized window-id column per slide
    offset, concatenated — no per-row Python (an event at epoch ``e``
    belongs to window ``floor(e/slide)*slide - j*slide`` for every
    ``j in [0, width/slide)``: ``e - w = (e mod slide) + j*slide <
    width`` always holds, so no membership filter is needed)."""
    n_windows = width_s // slide_s

    def explode(batch: pa.Table) -> pa.Table:
        # numpy floor division throughout: Arrow's integer divide
        # truncates toward zero, which for pre-1970 epochs would assign
        # rows to windows ABOVE them (and, with the membership filter
        # removed, silently mislabel instead of drop them)
        epoch = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
        null_mask = pc.is_null(epoch).to_numpy(zero_copy_only=False)
        epoch_us = pc.fill_null(epoch, 0).to_numpy(zero_copy_only=False)
        last = (epoch_us // 1_000_000 // slide_s) * slide_s
        vals = pc.cast(batch[value_col], pa.float64())
        tables = [
            pa.table(
                {
                    key_col: batch[key_col],
                    "window_start": pa.array(last - j * slide_s, pa.int64(), mask=null_mask),
                    value_col: vals,
                }
            )
            for j in range(n_windows)
        ]
        return pa.concat_tables(tables)

    exploded = events.map_batches(explode, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by([key_col, "window_start"]).aggregate(
            [([], "count_all"), (value_col, "sum")]
        )
        return pa.table(
            {
                key_col: g[key_col],
                "window_start": g["window_start"],
                "n_events": g["count_all"],
                "sum_value": g[f"{value_col}_sum"],
            }
        )

    return (
        exploded.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )
