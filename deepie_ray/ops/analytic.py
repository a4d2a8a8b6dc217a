"""Per-key ORDERED analytics — the SQL window-function family
(``... OVER (PARTITION BY key ORDER BY ts)``): running aggregates,
row numbering, lag deltas.

The reference has no ordered-frame operator (its per-sentence maps are
order-free), but every training-data pipeline over event/log tables
needs one (session position features, inter-arrival gaps, running
spend).  Scale shape: ONE shuffle on the partition key
(``groupby.map_groups``); each task holds exactly one key's rows —
bounded by per-entity event volume (the same contract as
sessionization, ops/window.py §sessionize), never by corpus size.
Within a group everything is numpy (stable sort + cumsum + diff); no
per-row Python anywhere.

Determinism: ordering ties on the timestamp are broken by the id
column (mergesort = stable), so output is independent of partitioning
and of arrival order — required for the driver's value-hash oracle and
for retry/resume idempotence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd


def ordered_apply(
    ds: rd.Dataset,
    key_col: str,
    order_cols: list[str],
    fn,
) -> rd.Dataset:
    """Generic per-key ordered transform: shuffle once on ``key_col``,
    sort each group by ``order_cols`` (stable), apply ``fn`` (pandas ->
    pandas, vectorized)."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.sort_values(order_cols, kind="mergesort"))

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def running_totals(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
) -> rd.Dataset:
    """-> (key, id, seq, cum_cents, gap_us): per key in (ts, id) order,
    the 1-based row number, the running sum of ``floor(value*100)``
    (integer cents — exact, so the DuckDB ``SUM(...) OVER`` twin
    value-hashes bit-for-bit; a float running sum would be at the mercy
    of the oracle engine's segment-tree summation order), and the
    microseconds since the key's previous row (-1 for the first row —
    SQL's ``COALESCE(date_diff(..., lag(ts) OVER w, ts), -1)``).

    Null timestamps are excluded on both sides (same rule as
    keep-latest compaction, queries.latest_event_per_user)."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        ts_us = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        cents = np.floor(df[value_col].to_numpy() * 100.0).astype(np.int64)
        gap_us = np.empty(n, dtype=np.int64)
        gap_us[0] = -1
        gap_us[1:] = ts_us[1:] - ts_us[:-1]
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                id_col: df[id_col].to_numpy(),
                "seq": np.arange(1, n + 1, dtype=np.int64),
                "cum_cents": np.cumsum(cents),
                "gap_us": gap_us,
            }
        )

    clean = ds.map_batches(
        lambda df: df.dropna(subset=[ts_col]), batch_format="pandas"
    )
    return ordered_apply(clean, key_col, [ts_col, id_col], per_key)


def rank_features(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int = 4,
) -> rd.Dataset:
    """-> (key, id, ntile{k}, pct_rank): per key in ascending
    (value, id) order, SQL ``NTILE(k)`` (first ``n % k`` buckets get
    the extra row — the standard semantics) and ``PERCENT_RANK()``
    ((rank-1)/(n-1), 0.0 for a single-row partition).  The (value, id)
    ordering is tie-free (ids unique), so rank == row number and the
    double division is bit-identical to any SQL engine's.

    Same scale contract as ``running_totals``: one shuffle on the key,
    per-task state is one key's rows, all-numpy within a group."""

    ntile_col = f"ntile{k}"

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        idx = np.arange(n, dtype=np.int64)
        base, rem = divmod(n, k)
        cut = (base + 1) * rem
        nt = np.empty(n, dtype=np.int64)
        big = idx < cut
        nt[big] = idx[big] // (base + 1) + 1
        if base:
            nt[~big] = rem + (idx[~big] - cut) // base + 1
        pct = np.zeros(n, dtype=np.float64) if n == 1 else idx / (n - 1)
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                id_col: df[id_col].to_numpy(),
                ntile_col: nt,
                "pct_rank": pct,
            }
        )

    return ordered_apply(ds, key_col, [value_col, id_col], per_key)


def dense_ranks(
    ds: rd.Dataset,
    key_col: str,
    order_col: str,
    id_col: str,
) -> rd.Dataset:
    """SQL ``DENSE_RANK() OVER (PARTITION BY key ORDER BY order_col)``
    -> (key, id, rank): ties on ``order_col`` share a rank and leave no
    gaps (rank advances by 1 at each DISTINCT order value — a cumsum of
    value-change flags, vs row_number's unconditional increment).
    Deterministic under ties by construction: the rank of a row depends
    only on its order value, never on intra-tie arrival order.  Same
    one-shuffle / per-key-task / all-numpy contract as the other
    window functions here."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        vals = df[order_col].to_numpy()
        step = np.empty(n, dtype=np.int64)
        step[0] = 1
        step[1:] = (vals[1:] != vals[:-1]).astype(np.int64)
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                id_col: df[id_col].to_numpy(),
                "rank": np.cumsum(step),
            }
        )

    return ordered_apply(ds, key_col, [order_col, id_col], per_key)


def moving_sums(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    frame_rows: int = 4,
) -> rd.Dataset:
    """Frame-bounded moving aggregate — SQL ``SUM(...) OVER (PARTITION
    BY key ORDER BY ts, id ROWS BETWEEN frame_rows-1 PRECEDING AND
    CURRENT ROW)`` -> (key, id, win_cents, win_n): the trailing sum of
    ``floor(value*100)`` in integer cents (exact, hash-stable — see
    running_totals) and the actual row count in the frame (< frame_rows
    near the head).  Vectorized as a cumsum difference; same
    one-shuffle / per-key-task scale contract as ``running_totals``."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        cents = np.floor(df[value_col].to_numpy() * 100.0).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(cents)))
        lo = np.maximum(0, np.arange(n) - (frame_rows - 1))
        win = cum[1:] - cum[lo]
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                id_col: df[id_col].to_numpy(),
                "win_cents": win,
                "win_n": np.arange(1, n + 1, dtype=np.int64) - lo,
            }
        )

    clean = ds.map_batches(
        lambda df: df.dropna(subset=[ts_col]), batch_format="pandas"
    )
    return ordered_apply(clean, key_col, [ts_col, id_col], per_key)


def range_sums(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    interval_us: int = 3_600_000_000,
) -> rd.Dataset:
    """Time-RANGE-frame moving aggregate — SQL ``SUM(...) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN INTERVAL ... PRECEDING
    AND CURRENT ROW)`` -> (key, id, range_cents, range_n): per row,
    the sum of ``floor(value*100)`` (integer cents — exact and
    hash-stable, see ``running_totals``) and row count over every row
    of the key whose timestamp lies in ``[ts - interval, ts]``.
    Unlike the ROWS frame (``moving_sums``), the RANGE frame is
    peer-inclusive: all rows sharing the current timestamp are in the
    frame, so the result needs NO tie-break and is deterministic under
    any peer order.  Vectorized as two ``np.searchsorted`` probes into
    the sorted timestamp array + a cumsum difference; one shuffle on
    the key, numpy within each group."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        cents = np.floor(df[value_col].to_numpy() * 100.0).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(cents)))
        hi = np.searchsorted(ts_us, ts_us, side="right")
        lo = np.searchsorted(ts_us, ts_us - interval_us, side="left")
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                id_col: df[id_col].to_numpy(),
                "range_cents": cum[hi] - cum[lo],
                "range_n": (hi - lo).astype(np.int64),
            }
        )

    clean = ds.map_batches(
        lambda df: df.dropna(subset=[ts_col, value_col]),
        batch_format="pandas",
    )
    return ordered_apply(clean, key_col, [ts_col, id_col], per_key)


def islands(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
) -> rd.Dataset:
    """Gaps-and-islands segmentation (the SCD2 / CDC history-compaction
    staple) -> (key, seg_no, state, ts_start, ts_end, n_rows): per key
    in (ts, id) order, collapse runs of consecutive equal ``state_col``
    values into one validity interval each.  ``seg_no`` is the 1-based
    island index — SQL's ``SUM(state IS DISTINCT FROM lag(state) OVER
    w) OVER w`` running change count.  The id tie-break makes the
    total order (hence the segmentation) deterministic when timestamps
    collide.  Vectorized: one shuffle on the key, then run boundaries
    via a shifted != compare and ``np.flatnonzero`` — no per-row loop;
    ts_start/ts_end are the boundary elements of the sorted timestamp
    array, so no per-island min/max scan is needed.

    At 100 TB this is one hash shuffle of (key, ts, id, state) rows;
    the output is at most input-sized and usually far smaller (history
    compaction).  Null timestamps are excluded on both sides (same
    rule as ``running_totals``)."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        state = df[state_col].to_numpy()
        chg = np.empty(n, dtype=bool)
        chg[0] = True
        chg[1:] = state[1:] != state[:-1]
        starts = np.flatnonzero(chg)
        ends = np.concatenate((starts[1:], [n])) - 1
        ts = df[ts_col].to_numpy()
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy()[starts],
                "seg_no": np.arange(1, len(starts) + 1, dtype=np.int64),
                state_col: state[starts],
                "ts_start": ts[starts],
                "ts_end": ts[ends],
                "n_rows": (ends - starts + 1).astype(np.int64),
            }
        )

    clean = ds.map_batches(
        lambda df: df.dropna(subset=[ts_col]), batch_format="pandas"
    )
    return ordered_apply(clean, key_col, [ts_col, id_col], per_key)


def global_rank(
    ds: rd.Dataset,
    score_col: str,
    id_col: str,
    out_col: str = "rank",
    num_shards: int = 8,
) -> rd.Dataset:
    """(id, score) -> (id, rank): every row's global 1..N position
    under (score DESC, id ASC) — the full-corpus ranking primitive
    behind retrieval fusion (SQL ``row_number() OVER (ORDER BY score
    DESC, id)`` with one unbounded partition).

    Scale shape: the range-partitioned global-sort pattern
    (queries.orders_price_ranked) generalized to ranks — quantile-
    sketch shard boundaries (``num_shards - 1`` broadcast floats;
    APPROXIMATE boundaries only skew shard balance, never rank
    correctness, because ranks come from local positions + exact
    shard counts), rows routed by a vectorized searchsorted, ONE
    shuffle on the shard column, a per-shard local sort with
    positions, then per-shard row counts (``num_shards`` rows —
    driver-sized) folded into cumulative offsets that a final
    map_batches adds back.  No task ever holds more than one shard;
    driver state is ``num_shards`` ints."""
    import pyarrow as pa

    from ..ops.sketch import grouped_quantile

    if ds.limit(1).count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    out_col: pa.array([], pa.int64()),
                }
            )
        )

    def neg(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "_neg": -df[score_col].to_numpy(),
            }
        )

    # narrow (id, -score) rows, consumed TWICE (boundary sketch pass +
    # shard routing pass): materialize so the upstream scoring lineage
    # does not re-execute per consumer
    scored = ds.map_batches(neg, batch_format="pandas").materialize()

    def add_g(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_g"] = np.int64(0)
        return df

    qs = {f"b{i}": i / num_shards for i in range(1, num_shards)}
    b = (
        grouped_quantile(
            scored.map_batches(add_g, batch_format="pandas"),
            "_g",
            "_neg",
            q=qs,
            ndigits=None,
        )
        .to_pandas()
        .iloc[0]
    )
    bounds = np.array(
        [b[f"b{i}"] for i in range(1, num_shards)], dtype=np.float64
    )

    def shard(df: pd.DataFrame) -> pd.DataFrame:
        s = np.searchsorted(
            bounds, df["_neg"].to_numpy().astype(np.float64), side="right"
        ).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "_neg": df["_neg"].to_numpy(),
                "_shard": s,
            }
        )

    def local_sort(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_neg", id_col], kind="mergesort")
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "_shard": df["_shard"].to_numpy(),
                "_pos": np.arange(len(df), dtype=np.int64),
            }
        )

    ranked = (
        scored.map_batches(shard, batch_format="pandas")
        .groupby("_shard")
        .map_groups(local_sort, batch_format="pandas")
        .materialize()  # narrow (id, shard, pos); consumed twice below
    )
    counts = (
        ranked.groupby("_shard").count().to_pandas().sort_values("_shard")
    )
    offs = np.zeros(num_shards, dtype=np.int64)
    acc = 0
    for s, c in zip(counts["_shard"], counts["count()"]):
        offs[int(s)] = acc
        acc += int(c)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    id_col: np.array([], np.int64),
                    out_col: np.array([], np.int64),
                }
            )
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                out_col: offs[df["_shard"].to_numpy()]
                + df["_pos"].to_numpy()
                + 1,
            }
        )

    return ranked.map_batches(finish, batch_format="pandas")


def running_distinct(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    cat_col: str,
) -> rd.Dataset:
    """Running COUNT-DISTINCT -> (key, id, n_seen): per key in
    (ts, id) order, the number of distinct ``cat_col`` values observed
    up to and including each row.  SQL has no ``count(distinct) OVER``;
    the standard rewrite (first-occurrence flag via a per-(key, cat)
    row_number, then a running sum) is exactly what the numpy kernel
    computes, so the DuckDB twin value-hashes bit-for-bit.

    Scale contract: one shuffle on the key; per-task state is one
    key's rows (the np.unique is over a single user's events, bounded
    by user activity, never corpus size).  Null timestamps excluded on
    both sides (running_totals convention)."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cats = df[cat_col].to_numpy()
        n = len(cats)
        _, first_idx = np.unique(cats, return_index=True)
        is_first = np.zeros(n, dtype=np.int64)
        is_first[first_idx] = 1
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                id_col: df[id_col].to_numpy(),
                "n_seen": np.cumsum(is_first),
            }
        )

    clean = ds.map_batches(
        lambda df: df.dropna(subset=[ts_col]), batch_format="pandas"
    )
    return ordered_apply(clean, key_col, [ts_col, id_col], per_key)


def ewma_pow2(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    n_terms: int = 8,
) -> rd.Dataset:
    """Dyadic-weight EWMA -> (key, id, ewma): per key in (ts, id)
    order, ``sum_{k=0..n-1} cents[t-k] * 2^-(k+1)`` over the last
    ``n_terms`` rows (missing lags contribute 0).  The weights are
    negative powers of TWO over integer cents, so every term and every
    partial sum is exactly representable in a double — the value is
    bit-identical to the SQL twin's ``lag(...) * pow(2, -k)`` chain
    regardless of either engine's summation order (a conventional
    alpha-EWMA would differ by ulps and break the value hash).

    Scale contract: one shuffle on the key; the kernel is n_terms
    shifted vector adds, O(rows x n_terms), no per-row Python."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df[value_col].to_numpy() * 100.0).astype(np.int64)
        n = len(cents)
        ew = np.zeros(n, dtype=np.float64)
        for k in range(n_terms):
            if k >= n:
                break
            ew[k:] += cents[: n - k] * (2.0 ** -(k + 1))
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                id_col: df[id_col].to_numpy(),
                "ewma": ew,
            }
        )

    clean = ds.map_batches(
        lambda df: df.dropna(subset=[ts_col]), batch_format="pandas"
    )
    return ordered_apply(clean, key_col, [ts_col, id_col], per_key)


def gap_stats(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
) -> rd.Dataset:
    """Inter-arrival gap profile -> one row per key: (key, n_gaps,
    min_gap_us, max_gap_us, sum_gap_us) over (ts, id)-ordered rows.
    Single-row keys report (0, -1, -1, 0) — the SQL twin's COALESCE
    convention.  All four stats are exact int64 microseconds.

    Scale contract: one shuffle on the key, one output row per key;
    the per-task reduction is a numpy diff over one key's rows."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        gaps = ts_us[1:] - ts_us[:-1]
        n = len(gaps)
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "n_gaps": np.array([n], dtype=np.int64),
                "min_gap_us": np.array(
                    [gaps.min() if n else -1], dtype=np.int64
                ),
                "max_gap_us": np.array(
                    [gaps.max() if n else -1], dtype=np.int64
                ),
                "sum_gap_us": np.array(
                    [gaps.sum() if n else 0], dtype=np.int64
                ),
            }
        )

    clean = ds.map_batches(
        lambda df: df.dropna(subset=[ts_col]), batch_format="pandas"
    )
    return ordered_apply(clean, key_col, [ts_col, id_col], per_key)


_I64_MIN = np.iinfo(np.int64).min


def global_exclusive_prefix_max(
    ds: rd.Dataset,
    order_col: str,
    val_col: str,
    keep_cols: list[str] | None = None,
    num_shards: int = 8,
) -> rd.Dataset:
    """Global EXCLUSIVE running max of ``val_col`` in ``order_col``
    order (SQL ``max(val) OVER (ORDER BY ord ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``) -> input columns + ``prev_max``
    (int64; the first global row gets the _I64_MIN sentinel, the SQL
    NULL).  The single-unbounded-partition window that per-key
    ``ordered_apply`` cannot express — the streaming-watermark
    primitive (prev_max IS the watermark-so-far at each row's arrival
    position).

    Scale shape: the range-partitioned global-sort pattern
    (ops/analytic.global_rank): quantile-sketch shard boundaries on
    ``order_col`` (broadcast floats; approximation skews balance,
    never correctness), rows routed by vectorized searchsorted, ONE
    shuffle on the shard id, per-shard local sort + exclusive cummax,
    then per-shard maxima (``num_shards`` rows — driver-sized) folded
    into exclusive carry-ins a final vectorized map combines back.
    No task ever holds more than one shard; driver state is
    ``num_shards`` ints."""
    import pyarrow as pa

    from ..ops.sketch import grouped_quantile

    keep_cols = list(keep_cols or [])
    cols = [order_col, val_col] + keep_cols

    if ds.limit(1).count() == 0:
        # from_pandas, not from_arrow: Ray's to_pandas() on an empty
        # arrow-backed dataset drops the column index entirely
        return rd.from_pandas(
            pd.DataFrame(
                {
                    **{c: pd.Series([], dtype=np.int64) for c in cols},
                    "prev_max": pd.Series([], dtype=np.int64),
                }
            )
        )

    narrow = ds.map_batches(
        lambda df: df[cols], batch_format="pandas"
    ).materialize()  # consumed twice: boundary sketch + shard routing

    def add_g(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_g"] = np.int64(0)
        return df

    qs = {f"b{i}": i / num_shards for i in range(1, num_shards)}
    b = (
        grouped_quantile(
            narrow.map_batches(add_g, batch_format="pandas"),
            "_g",
            order_col,
            q=qs,
            ndigits=None,
        )
        .to_pandas()
        .iloc[0]
    )
    bounds = np.array([b[f"b{i}"] for i in range(1, num_shards)], np.float64)

    def shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_shard"] = np.searchsorted(
            bounds, df[order_col].to_numpy().astype(np.float64), side="right"
        ).astype(np.int64)
        return df

    sharded = narrow.map_batches(shard, batch_format="pandas").materialize()

    # per-shard maxima: num_shards narrow rows -> exclusive driver fold
    shard_max = (
        sharded.map_batches(
            lambda df: (
                pd.DataFrame(
                    {
                        "_shard": df["_shard"],
                        "_m_partial": df[val_col].to_numpy(np.int64),
                    }
                )
                .groupby("_shard", sort=False)["_m_partial"]
                .max()
                .reset_index()
            ),
            batch_format="pandas",
        )
        .groupby("_shard")
        .max("_m_partial")
        .to_pandas()
    )
    col = "max(_m_partial)"
    shard_max = shard_max.sort_values("_shard")
    carry = {}
    run = _I64_MIN
    for s, m in zip(shard_max["_shard"], shard_max[col]):
        carry[int(s)] = run
        run = max(run, int(m))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = df[cols].copy()
            out["prev_max"] = np.array([], np.int64)
            return out
        df = df.sort_values(order_col, kind="mergesort")
        v = df[val_col].to_numpy(np.int64)
        excl = np.empty(len(v), np.int64)
        excl[0] = _I64_MIN
        np.maximum.accumulate(v[:-1], out=excl[1:])
        c = carry.get(int(df["_shard"].iloc[0]), _I64_MIN)
        out = df[cols].copy()
        out["prev_max"] = np.maximum(excl, c)
        return out

    return (
        sharded.groupby("_shard")
        .map_groups(finish, batch_format="pandas")
        .select_columns(cols + ["prev_max"])
    )


def global_exclusive_prefix_sum(
    ds: rd.Dataset,
    order_col: str,
    val_col: str,
    keep_cols: list[str] | None = None,
    num_shards: int = 8,
) -> rd.Dataset:
    """Global EXCLUSIVE running sum of ``val_col`` in ``order_col``
    order (SQL ``sum(val) OVER (ORDER BY ord ROWS UNBOUNDED PRECEDING)
    - val``) -> input columns + ``cum_before`` (int64; the first
    global row gets 0).  The additive sibling of
    ``global_exclusive_prefix_max`` — the distributed prefix-sum that
    sequence packing, byte-offset assignment and contiguous-capacity
    planning all reduce to.

    Scale shape (identical to prefix_max): quantile-sketch shard
    boundaries on ``order_col`` (broadcast floats; approximation skews
    balance, never correctness), ONE shuffle on the shard id,
    per-shard local sort + exclusive cumsum, per-shard TOTALS
    (``num_shards`` ints) folded into exclusive carry-ins on the
    driver, and a final vectorized add.  Assumes ``order_col`` values
    are unique (a total order)."""
    import pyarrow as pa  # noqa: F401  (kept for parity with siblings)

    from ..ops.sketch import grouped_quantile

    keep_cols = list(keep_cols or [])
    cols = [order_col, val_col] + keep_cols

    if ds.limit(1).count() == 0:
        return rd.from_pandas(
            pd.DataFrame(
                {
                    **{c: pd.Series([], dtype=np.int64) for c in cols},
                    "cum_before": pd.Series([], dtype=np.int64),
                }
            )
        )

    narrow = ds.map_batches(
        lambda df: df[cols], batch_format="pandas"
    ).materialize()  # consumed twice: boundary sketch + shard routing

    def add_g(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_g"] = np.int64(0)
        return df

    qs = {f"b{i}": i / num_shards for i in range(1, num_shards)}
    b = (
        grouped_quantile(
            narrow.map_batches(add_g, batch_format="pandas"),
            "_g",
            order_col,
            q=qs,
            ndigits=None,
        )
        .to_pandas()
        .iloc[0]
    )
    bounds = np.array([b[f"b{i}"] for i in range(1, num_shards)], np.float64)

    def shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_shard"] = np.searchsorted(
            bounds, df[order_col].to_numpy().astype(np.float64), side="right"
        ).astype(np.int64)
        return df

    sharded = narrow.map_batches(shard, batch_format="pandas").materialize()

    # per-shard totals: num_shards narrow rows -> exclusive driver fold
    shard_sum = (
        sharded.map_batches(
            lambda df: (
                pd.DataFrame(
                    {
                        "_shard": df["_shard"],
                        "_s_partial": df[val_col].to_numpy(np.int64),
                    }
                )
                .groupby("_shard", sort=False)["_s_partial"]
                .sum()
                .reset_index()
            ),
            batch_format="pandas",
        )
        .groupby("_shard")
        .sum("_s_partial")
        .to_pandas()
    )
    col = "sum(_s_partial)"
    shard_sum = shard_sum.sort_values("_shard")
    carry = {}
    run = 0
    for s, m in zip(shard_sum["_shard"], shard_sum[col]):
        carry[int(s)] = run
        run += int(m)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = df[cols].copy()
            out["cum_before"] = np.array([], np.int64)
            return out
        df = df.sort_values(order_col, kind="mergesort")
        v = df[val_col].to_numpy(np.int64)
        excl = np.zeros(len(v), np.int64)
        np.cumsum(v[:-1], out=excl[1:])
        c = carry.get(int(df["_shard"].iloc[0]), 0)
        out = df[cols].copy()
        out["cum_before"] = excl + c
        return out

    return (
        sharded.groupby("_shard")
        .map_groups(finish, batch_format="pandas")
        .select_columns(cols + ["cum_before"])
    )
