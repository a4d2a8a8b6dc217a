"""Join strategies (SURVEY §2.5).

* ``broadcast_join`` — small side via ``ray.put`` once, pandas merge
  per batch.  The only join the flagship needs (J1/J4); no shuffle.
* ``Dataset.join`` — Ray's hash-partitioned join, used directly for
  large-large relational queries (wrapper adds key-name plumbing).
* ``asof_join`` — per-key ``merge_asof`` inside ``map_groups``: both
  sides bucketed by key through one hash shuffle, each group sorted
  locally by time.  No global sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def broadcast_join(
    large: rd.Dataset,
    small_df: pd.DataFrame,
    on: str,
    how: str = "inner",
    concurrency=(1, 8),
) -> rd.Dataset:
    """Map-side join: ``small_df`` is shipped to the object store once
    and merged into every batch with pandas (hash join per batch)."""
    import ray

    small_ref = ray.put(small_df)

    class Joiner:
        def __init__(self):
            self.small = ray.get(small_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return large.map_batches(
        Joiner, batch_format="pandas", batch_size=8192, concurrency=concurrency
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_id: str,
    left_ts: str,
    right_ts: str,
    tie_break: str,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Backward as-of join (inner): for each left row, the right row
    with the same ``key`` and the greatest ``right_ts <= left_ts``
    (ties broken by ``tie_break`` desc — deterministic, matching the
    explicit-window SQL oracle rather than DuckDB's unspecified ASOF
    tie order).

    Implementation: hash-partitioned expand join on ``key`` + range
    filter + per-left-row argmax via map_groups.  Assumes bounded
    per-key right-side cardinality (true for entity-keyed event/state
    tables); for unbounded keys switch to per-key merge_asof over
    ts-sorted buckets.
    """
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=(key,),
    )

    def in_range(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[right_ts] <= df[left_ts]]

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values([right_ts, tie_break], ascending=False).head(1)

    return (
        joined.map_batches(in_range, batch_format="pandas")
        .groupby(left_id)
        .map_groups(pick, batch_format="pandas")
    )


def _field_type(ds: rd.Dataset, name: str, default=None):
    """Arrow type of a column, robust to Arrow- and pandas-block
    schemas (from_pandas datasets report a PandasBlockSchema)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    try:
        if isinstance(base, pa.Schema):
            return base.field(name).type
        if isinstance(sch, pa.Schema):
            return sch.field(name).type
        idx = list(sch.names).index(name)
        dtype = sch.types[idx]
        if getattr(dtype, "kind", None) == "O":  # pandas object = strings
            return pa.string()
        return pa.from_numpy_dtype(dtype)
    except Exception:
        return default if default is not None else pa.int64()


def _right_side_bounds(
    right: rd.Dataset, right_ts: str, tie_break: str
) -> tuple[int, int, int, int, int]:
    """(tb_min, tb_max, epoch_min_us, epoch_max_us, subsec_max_us) of
    the right side — one cheap streaming aggregate pass (the right side
    is the smaller state table in an as-of join).  ``subsec_max_us`` is
    the largest sub-second component: 0 proves every right timestamp is
    whole-second, making second-granularity packing EXACT."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    def to_epoch(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[right_ts], pa.timestamp("us")), pa.int64())
        es = pc.divide(us, 1_000_000)  # truncating; negatives take the fallback
        return pa.table(
            {
                "tb": pc.cast(t[tie_break], pa.int64()),
                "eu": us,
                "sub": pc.subtract(us, pc.multiply(es, 1_000_000)),
            }
        )

    agg = right.map_batches(to_epoch, batch_format="pyarrow").aggregate(
        Min("tb", alias_name="tb_min"),
        Max("tb", alias_name="tb_max"),
        Min("eu", alias_name="eu_min"),
        Max("eu", alias_name="eu_max"),
        Max("sub", alias_name="sub_max"),
    )
    return (
        agg["tb_min"],
        agg["tb_max"],
        agg["eu_min"],
        agg["eu_max"],
        agg["sub_max"],
    )


def asof_join_argmax(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_id: str,
    left_ts: str,
    right_ts: str,
    tie_break: str,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Vectorized backward as-of join returning (left_id, tie_break).

    Same semantics as ``asof_join`` but fully vectorized: the per-left-
    row argmax over (right_ts, tie_break) is a grouped MAX over a
    packed int64 sort key ``epoch_s(right_ts) << tie_bits | tie_break``
    — per-batch partial max (combiner) then one grouped aggregate, no
    per-group pandas.  ~100x faster than the map_groups path; use it
    whenever only the matched right *id* is needed.

    The packing width is MEASURED, not assumed: one cheap aggregate
    pass over the right side bounds ``tie_break`` and ``right_ts``;
    ``tie_bits`` is sized to the actual id range.  Timestamp
    granularity is also measured: when every right timestamp is a
    whole second (``subsec_max == 0``) the pack uses epoch SECONDS
    (widest id headroom); otherwise epoch MICROSECONDS when the
    combined widths still fit 62 bits — so sub-second feeds order
    exactly rather than collapsing same-second rows to tie-break
    order.  If neither fits an int64 (or any value is negative) the
    function falls back to the exact ``asof_join`` map_groups path
    instead of silently corrupting the argmax.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    tb_min, tb_max, eu_min, eu_max, sub_max = _right_side_bounds(
        right, right_ts, tie_break
    )
    if tb_min is None or left.limit(1).count() == 0:
        # empty side: inner as-of matches nothing — emit the typed
        # empty result directly (Ray joins can't finalize 0-row
        # partitions; limit(1) probes the left without a full pass)
        lid_type = _field_type(left, left_id)
        return rd.from_arrow(
            pa.table(
                {left_id: pa.array([], lid_type), tie_break: pa.array([], pa.int64())}
            )
        )
    tie_bits = max(1, int(tb_max).bit_length())
    es_bits = int(int(eu_max) // 1_000_000).bit_length()
    if tb_min >= 0 and eu_min >= 0 and sub_max == 0 and tie_bits + es_bits <= 62:
        ts_div = 1_000_000  # whole-second feed: pack epoch seconds
    elif tb_min >= 0 and eu_min >= 0 and tie_bits + int(eu_max).bit_length() <= 62:
        ts_div = 1  # sub-second feed: pack epoch microseconds
    else:
        # ids or timestamps outside packable range: exact fallback
        return asof_join(
            left, right, key, left_id, left_ts, right_ts, tie_break, num_partitions
        ).map_batches(
            lambda t: pa.table(
                {left_id: t[left_id], tie_break: pc.cast(t[tie_break], pa.int64())}
            ),
            batch_format="pyarrow",
        )

    joined = left.join(
        right, join_type="inner", num_partitions=num_partitions, on=(key,)
    )

    def pack(t: pa.Table) -> pa.Table:
        ok = pc.less_equal(t[right_ts], t[left_ts])
        t = t.filter(ok)
        rts_us = pc.cast(pc.cast(t[right_ts], pa.timestamp("us")), pa.int64())
        epoch = pc.divide(rts_us, ts_div) if ts_div > 1 else rts_us
        packed = pc.add(
            pc.shift_left(epoch, tie_bits), pc.cast(t[tie_break], pa.int64())
        )
        part = (
            pa.table({left_id: t[left_id], "_packed": packed})
            .group_by(left_id)
            .aggregate([("_packed", "max")])
        )
        return pa.table({left_id: part[left_id], "_packed": part["_packed_max"]})

    agg = (
        joined.map_batches(pack, batch_format="pyarrow")
        .groupby(left_id)
        .aggregate(Max("_packed", alias_name="_packed"))
    )

    def unpack(t: pa.Table) -> pa.Table:
        tb = pc.bit_wise_and(t["_packed"], (1 << tie_bits) - 1)
        return pa.table({left_id: t[left_id], tie_break: pc.cast(tb, pa.int64())})

    return agg.map_batches(unpack, batch_format="pyarrow")


def asof_join_merge(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_id: str,
    left_ts: str,
    right_ts: str,
    tie_break: str,
    num_partitions: int = 8,
    direction: str = "backward",
) -> rd.Dataset:
    """Bucketed merge_asof as-of join -> (left_id, tie_break).
    ``direction="backward"`` (default) matches the greatest
    ``right_ts <= left_ts``; ``"forward"`` matches the smallest
    ``right_ts >= left_ts`` (the "next event after" variant) — ties at
    the matched timestamp break to the greatest ``tie_break`` in both
    modes (backward: right bucket ascending by (ts, tie), merge_asof
    takes the LAST at the ts; forward: ascending ts with tie
    DESCENDING, merge_asof takes the FIRST at the ts).

    Same semantics as ``asof_join``/``asof_join_argmax`` (greatest
    ``right_ts <= left_ts`` per key, ties by greatest ``tie_break``)
    but WITHOUT the expand join: both sides are tagged with
    ``part = mix(key) mod P`` and unioned, ONE groupby(part) shuffle
    co-locates each key's rows, and each of the P tasks runs one
    vectorized ``pd.merge_asof(by=key)`` over its ts-sorted bucket.
    The join+argmax path first materializes |left| x |right-rows-per-
    key| expanded rows (~10M at sf0.1 for 100k events x ~100 orders/
    user) before filtering; this path's peak is the bucket itself —
    (|left|+|right|)/P rows — so cost scales with the INPUT, not the
    per-key cross product.  Tie rule: the right side of each bucket is
    sorted ascending by (right_ts, tie_break) and merge_asof takes the
    LAST row at the matched timestamp = the max tie_break (pinned
    against the explicit-window SQL oracle).

    Requires an integer ``key`` (the part router mixes int64); falls
    back to ``asof_join_argmax`` otherwise.  Null timestamps on either
    side match nothing (inner semantics), same as the oracle's
    ``o_orderdate <= e.ts`` predicate on a NULL ts.
    """
    import numpy as np
    import pyarrow.compute as pc

    if not pa.types.is_integer(_field_type(left, key, pa.string())):
        return asof_join_argmax(
            left, right, key, left_id, left_ts, right_ts, tie_break, num_partitions
        )

    lid_type = _field_type(left, left_id)
    key_type = _field_type(left, key)
    empty = pa.table(
        {left_id: pa.array([], lid_type), tie_break: pa.array([], pa.int64())}
    )
    if left.limit(1).count() == 0 or right.limit(1).count() == 0:
        return rd.from_arrow(empty)

    _G = np.uint64(0x9E3779B97F4A7C15)
    _M1 = np.uint64(0xBF58476D1CE4E5B9)
    _M2 = np.uint64(0x94D049BB133111EB)

    def _part(keys: np.ndarray) -> np.ndarray:
        x = keys.astype(np.uint64)
        with np.errstate(over="ignore"):
            x = (x + _G) * _M1
            x ^= x >> np.uint64(27)
            x *= _M2
            x ^= x >> np.uint64(31)
        return (x % np.uint64(num_partitions)).astype(np.int64)

    def tag_left(t: pa.Table) -> pa.Table:
        # null key or null ts matches nothing under inner semantics
        t = t.filter(pc.and_(pc.is_valid(t[left_ts]), pc.is_valid(t[key])))
        k = pc.cast(t[key], pa.int64()).to_numpy(zero_copy_only=False)
        n = len(t)
        return pa.table(
            {
                key: pc.cast(t[key], key_type),
                "part": pa.array(_part(k), pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                left_id: t[left_id],
                "lts": pc.cast(t[left_ts], pa.timestamp("us")),
                "rts": pa.nulls(n, pa.timestamp("us")),
                "tie": pa.nulls(n, pa.int64()),
            }
        )

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[right_ts]), pc.is_valid(t[key])))
        k = pc.cast(t[key], pa.int64()).to_numpy(zero_copy_only=False)
        n = len(t)
        return pa.table(
            {
                key: pc.cast(t[key], key_type),
                "part": pa.array(_part(k), pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                left_id: pa.nulls(n, lid_type),
                "lts": pa.nulls(n, pa.timestamp("us")),
                "rts": pc.cast(t[right_ts], pa.timestamp("us")),
                "tie": pc.cast(t[tie_break], pa.int64()),
            }
        )

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        L = df[df["side"] == 0]
        R = df[df["side"] == 1]
        out_empty = pd.DataFrame(
            {
                left_id: pd.Series([], dtype=L[left_id].dtype),
                tie_break: pd.Series([], dtype="int64"),
            }
        )
        if L.empty or R.empty:
            return out_empty
        L = L[[key, "lts", left_id]].sort_values("lts", kind="mergesort")
        asc = [True, direction == "backward"]
        R = R[[key, "rts", "tie"]].sort_values(
            ["rts", "tie"], ascending=asc, kind="mergesort"
        )
        m = pd.merge_asof(
            L, R, left_on="lts", right_on="rts", by=key, direction=direction
        )
        m = m[m["tie"].notna()]
        if m.empty:
            return out_empty
        ids = m[left_id].to_numpy()
        if pa.types.is_integer(lid_type):
            # the unioned column carries right-side nulls, so pandas
            # holds it as float64; left rows are exact (< 2^53)
            ids = ids.astype(np.int64)
        return pd.DataFrame(
            {
                left_id: ids,
                tie_break: m["tie"].to_numpy().astype(np.int64),
            }
        )

    return both.groupby("part").map_groups(merge, batch_format="pandas")


def bloom_filter_keys(
    ds: rd.Dataset, key_col: str, m_bits: int = 1 << 22, k: int = 5
):
    """Distributed Bloom filter over an integer key column -> uint64
    bit array (m_bits/8 bytes, FIXED size regardless of key count).
    Each batch emits a partial bit array; partials merge by bitwise OR
    on the driver (the Bloom filter is an OR-mergeable sketch — same
    contract as ops/dedup.bloom_build, here over int64 keys)."""
    import numpy as np
    import pyarrow.compute as pc

    from .dedup import _bloom_positions

    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(words, dtype=np.uint64)
        keys = pc.cast(t[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        keys = keys[~pd.isna(keys)].astype(np.int64)
        if len(keys):
            for j in range(k):
                pos = _bloom_positions(keys, j, m_bits)
                np.bitwise_or.at(
                    bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
                )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    acc = np.zeros(words, dtype=np.uint64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for raw in b["bits"].to_pylist():
            acc |= np.frombuffer(raw, dtype=np.uint64)
    return acc


def bloom_prefilter(
    ds: rd.Dataset, key_col: str, bloom_bits, m_bits: int = 1 << 22, k: int = 5
) -> rd.Dataset:
    """Bloom semi-join pushdown: drop rows whose key is definitely NOT
    in the build side before an expensive hash join.  False positives
    pass through and are dropped by the join itself (inner semantics
    unchanged — only the shuffle volume shrinks); false negatives are
    impossible by construction.  The filter ships via ``ray.put`` once
    (fixed m_bits/8 bytes however large the build side grows) — the
    scale-safe alternative to broadcasting the key set itself."""
    import numpy as np
    import pyarrow.compute as pc

    import ray

    from .dedup import _bloom_positions

    bits_ref = ray.put(bloom_bits)

    class Prefilter:
        def __init__(self):
            self.bits = ray.get(bits_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = pc.cast(t[key_col], pa.int64()).to_numpy(zero_copy_only=False)
            ok = ~pd.isna(keys)
            member = ok.copy()
            if member.any():
                kv = np.where(ok, keys, 0).astype(np.int64)
                for j in range(k):
                    pos = _bloom_positions(kv, j, m_bits)
                    word = self.bits[pos >> 6]
                    hit = (
                        (word >> (pos & 63).astype(np.uint64)) & np.uint64(1)
                    ).astype(bool)
                    member &= hit
                    if not member.any():
                        break
            return t.filter(pa.array(member))

    from ..tuning import POOL_REMOTE_ARGS

    return ds.map_batches(
        Prefilter, batch_format="pyarrow", concurrency=(1, 8), **POOL_REMOTE_ARGS
    )


def range_join_count(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_id: str,
    left_ts: str,
    right_ts: str,
    lo_s: int,
    hi_s: int,
    num_partitions: int = 8,
    hi_exclusive: bool = False,
) -> rd.Dataset:
    """Interval join, aggregated: for each left row, COUNT right rows
    with the same ``key`` and ``right_ts`` in ``[left_ts + lo_s,
    left_ts + hi_s]`` seconds (upper bound strict when
    ``hi_exclusive`` — the self-join shape that excludes the row
    itself) -> (left_id, n_matches:int64, left rows with zero matches
    included).

    Implementation: hash-partitioned equi-join on ``key`` (the only
    all-to-all) + vectorized Arrow range filter + per-batch partial
    count (combiner) + grouped sum, then a left anti-fill for
    zero-match rows via a second cheap join of the left ids.  Assumes
    bounded per-key right cardinality, like ``asof_join`` — for
    unbounded keys bucket by (key, time-bucket) so each row joins only
    its ±1 bucket neighborhood.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _zero_fill() -> rd.Dataset:
        return left.map_batches(
            lambda t: pa.table(
                {
                    left_id: t[left_id],
                    "n_matches": pa.array([0] * len(t), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    # pin the right side (the bounded state table — the smaller side of
    # a range join by construction): reused by the join, and an empty
    # right must short-circuit because Ray's join cannot finalize
    # zero-row partitions.  The left side gets the cheap emptiness
    # probe (limit(1) stops the stream after one row — no full pass).
    right = right.materialize()
    if right.count() == 0 or left.limit(1).count() == 0:
        return _zero_fill()

    joined = left.join(
        right, join_type="inner", num_partitions=num_partitions, on=(key,)
    )

    def in_range_count(t: pa.Table) -> pa.Table:
        lts = pc.cast(pc.cast(t[left_ts], pa.timestamp("us")), pa.int64())
        rts = pc.cast(pc.cast(t[right_ts], pa.timestamp("us")), pa.int64())
        delta = pc.subtract(rts, lts)
        upper = (
            pc.less(delta, hi_s * 1_000_000)
            if hi_exclusive
            else pc.less_equal(delta, hi_s * 1_000_000)
        )
        ok = pc.and_(pc.greater_equal(delta, lo_s * 1_000_000), upper)
        t = t.filter(ok)
        g = (
            pa.table({left_id: t[left_id]})
            .group_by(left_id)
            .aggregate([([], "count_all")])
        )
        return pa.table({left_id: g[left_id], "n_matches": g["count_all"]})

    counts = (
        joined.map_batches(in_range_count, batch_format="pyarrow")
        .groupby(left_id)
        .aggregate(Sum("n_matches", alias_name="n_matches"))
    )

    # zero-match left rows: left ids joined against the match counts
    # (left outer), nulls -> 0.  The counts are pinned (post-aggregation
    # small — one row per matched left id) both to merge empty groupby
    # blocks and to short-circuit the no-matches-anywhere case: Ray's
    # join cannot finalize zero-row partitions, and an empty or
    # non-overlapping right side would otherwise crash it.
    left_ids = left.map_batches(
        lambda t: pa.table({left_id: t[left_id]}), batch_format="pyarrow"
    )
    counts = counts.repartition(num_partitions).materialize()
    if counts.count() == 0:
        return _zero_fill()
    filled = left_ids.join(
        counts,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(left_id,),
    )
    return filled.map_batches(
        lambda t: pa.table(
            {
                left_id: t[left_id],
                "n_matches": pc.cast(
                    pc.fill_null(t["n_matches"], 0), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    how: str = "inner",
    num_partitions: int = 8,
) -> rd.Dataset:
    """Hash-partitioned large-large join (Ray Dataset.join); ``on`` /
    ``right_on`` may be a single column or a composite-key tuple.

    Keep ``num_partitions`` at a few per NODE: join aggregator actors
    cost ~O(partitions) in setup; 8 partitions joined 600k x 150k rows
    in 0.8s where 32 partitions took 105s (tuning.py).

    CONSUMER CONTRACT: empty hash partitions emit ZERO-COLUMN blocks —
    a downstream map_batches that accesses columns by name must first
    merge them away (``.repartition(k)`` right after the join, the
    repo-wide convention) or tolerate empty frames (pandas
    ``df.empty`` guard).  Normalizing here would force an extra
    repartition stage on every join, including the many call sites
    that already reshuffle for their own reasons."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    right_t: tuple[str, ...] | None = None
    if right_on is not None:
        right_t = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on_t,
        right_on=right_t,
    )


def _distinct_keys(ds: rd.Dataset, key: str) -> rd.Dataset:
    """Combiner-first distinct: per-batch dedup (pyarrow group_by, no
    aggregate) so the shuffle moves O(distinct-per-block) narrow key
    rows, then one grouped pass keeps the first of each key."""

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.select([key]).group_by([key]).aggregate([])

    return (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby(key)
        .map_groups(
            lambda t: t.slice(0, 1),
            batch_format="pyarrow",
        )
    )


def semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Left rows whose key EXISTS in right (SQL semi-join), fully
    distributed: right collapses to its DISTINCT keys (combiner-first —
    the shuffle moves narrow key rows, never right's payload), then one
    hash-partitioned inner join against a key-only side.  Distinctness
    of the build side guarantees no row multiplication, so the output
    schema is exactly ``left``'s.

    Empty-side guards: Ray's join aggregators cannot finalize zero-row
    partitions (tuning.py), so BOTH possibly-empty sides are guarded —
    an empty left (limit(1) probe, streaming-cheap) or an empty key set
    means an empty result anyway; return a typed empty slice of left."""
    rk = right_on or on
    if left.limit(1).count() == 0:
        return left.limit(0)
    # materialize the (already key-only, distinct) build side so the
    # empty guard's count() doesn't recompute the distinct pipeline
    # when the join consumes it
    keys = _distinct_keys(right, rk).repartition(num_partitions).materialize()
    if keys.count() == 0:
        return left.limit(0)
    return hash_join(
        left.repartition(num_partitions),
        keys,
        on=on,
        right_on=rk if rk != on else None,
        num_partitions=num_partitions,
    )


def anti_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Left rows whose key does NOT exist in right (SQL anti-join):
    distinct right keys tagged with a marker column, LEFT OUTER
    hash join, keep rows where the marker stayed null, drop the marker.
    Same distinct-build + empty-side guards as ``semi_join`` (an empty
    key set keeps every left row; an empty left is already its own
    result)."""
    import pyarrow.compute as pc

    rk = right_on or on
    if left.limit(1).count() == 0:
        return left.limit(0)
    keys = (
        _distinct_keys(right, rk)
        .map_batches(
            lambda t: t.append_column(
                "_present", pa.array([1] * t.num_rows, pa.int8())
            ),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
        .materialize()  # pin: count() guard + join both consume it
    )
    if keys.count() == 0:
        return left
    joined = hash_join(
        left.repartition(num_partitions),
        keys,
        on=on,
        right_on=rk if rk != on else None,
        how="left_outer",
        num_partitions=num_partitions,
    )

    def keep_missing(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t["_present"]))
        return t.drop_columns(["_present"])

    return joined.map_batches(keep_missing, batch_format="pyarrow")


def skew_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    hot_k: int = 4,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Hybrid skew-aware inner join: detect the left side's hottest
    keys, join THOSE map-side against a broadcast of the right side's
    matching rows (a hot key never funnels through one hash partition),
    and hash-join only the cold tail.  Output rows/columns are exactly
    ``hash_join``'s; hotness is pure ROUTING, so the approximate
    detection cannot affect correctness — only which path a key takes.

    Detection: per-block top-8 partial counts (narrow (key, n) rows,
    O(blocks x 8) = metadata-sized) are summed on the driver and the
    top ``hot_k`` keys become the hot set — a key hot globally is hot
    in many blocks, the same partial-evidence argument as the
    Misra-Gries sketch (ops/sketch.py).  Scale contract: the broadcast
    side is ``hot_k`` keys x the right side's per-key multiplicity —
    bounded whenever the right side is bounded per key (the dimension
    -table shape skew joins exist for); corpus-scaled-per-key right
    sides should use plain hash_join with more partitions instead."""
    import pyarrow.compute as pc

    lk, rk = on, right_on or on
    # both inputs feed multiple consumers (detection + hot/cold splits
    # + the joins): pin them so the source lineage executes once —
    # blocks spill rather than recompute
    left = left.materialize()
    right = right.materialize()
    payload_schema = [
        (name, _field_type(right, name))
        for name in right.schema().names
        if name != rk
    ]
    left_cols = list(left.schema().names)

    def _typed_empty() -> rd.Dataset:
        cols = {
            name: pa.array([], _field_type(left, name)) for name in left_cols
        }
        for name, typ in payload_schema:
            cols[name] = pa.array([], typ)
        return rd.from_arrow(pa.table(cols))

    def local_top(t: pa.Table) -> pa.Table:
        # null keys can never match an inner join — keep them out of
        # detection (a null group would crash the driver's hot sort)
        t = t.filter(pc.is_valid(t[lk]))
        g = t.group_by([lk]).aggregate([([], "count_all")])
        g = g.sort_by([("count_all", "descending")]).slice(0, 8)
        return pa.table({lk: g[lk], "n": pc.cast(g["count_all"], pa.int64())})

    tops = left.map_batches(local_top, batch_format="pyarrow").take_all()
    if not tops:
        # contract: output columns are hash_join's (left + right
        # payload) even when left is empty
        return _typed_empty()
    agg: dict = {}
    for r in tops:
        agg[r[lk]] = agg.get(r[lk], 0) + r["n"]
    hot = [k for k, _ in sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:hot_k]]
    hot_arr = pa.array(hot)

    left_hot = left.map_batches(
        lambda t: t.filter(pc.is_in(t[lk], value_set=hot_arr)),
        batch_format="pyarrow",
    )
    left_cold = left.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t[lk], value_set=hot_arr))),
        batch_format="pyarrow",
    )
    # right rows for hot keys: hot_k keys x per-key multiplicity —
    # bounded by contract, safe to gather and broadcast
    right_hot_df = (
        right.map_batches(
            lambda t: t.filter(pc.is_in(t[rk], value_set=hot_arr)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .rename(columns={rk: lk})
    )
    payload_cols = [c for c in right_hot_df.columns if c != lk]
    hot_out = broadcast_join(left_hot, right_hot_df, on=lk)

    right_cold = right.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t[rk], value_set=hot_arr))),
        batch_format="pyarrow",
    ).repartition(num_partitions)
    if (
        left_cold.limit(1).count() == 0
        or right_cold.limit(1).count() == 0
    ):
        # a zero-row side cannot enter the hash join (tuning.py); an
        # empty side means an empty cold result — produce it map-side
        # so its columns match the hot path's
        cold_out = broadcast_join(left_cold.limit(0), right_hot_df.head(0), on=lk)
    else:
        cold_out = hash_join(
            left_cold.repartition(num_partitions),
            right_cold,
            on=lk,
            right_on=rk if rk != lk else None,
            num_partitions=num_partitions,
        )

    final_cols = left_cols + payload_cols
    hot_out = hot_out.map_batches(
        lambda t, cols=tuple(final_cols): t.select(list(cols)),
        batch_format="pyarrow",
    )
    cold_out = cold_out.map_batches(
        lambda t, cols=tuple(final_cols): t.select(list(cols)),
        batch_format="pyarrow",
    )
    return hot_out.union(cold_out)


def diff_by_key(
    old: rd.Dataset,
    new: rd.Dataset,
    on: str = "doc_id",
    fp_col: str = "fp",
    num_partitions: int = 8,
) -> rd.Dataset:
    """Dataset regression diff: two (key, fingerprint) datasets ->
    (key, status in {'added','removed','changed'}); unchanged rows are
    dropped (the diff is the SMALL output — at 100 TB both inputs
    stream through ONE full-outer hash-partitioned join of narrow
    fingerprint rows and only the delta survives).  The caller
    fingerprints whatever payload equality should mean (md5 of the
    row's compared columns); keys must be unique per side.

    Empty-side guards per the house join rule: an empty old marks all
    of new 'added' and vice versa."""
    o = old.map_batches(
        lambda t: pa.table({on: t[on], "fp_old": t[fp_col]}),
        batch_format="pyarrow",
    ).materialize()
    n = new.map_batches(
        lambda t: pa.table({on: t[on], "fp_new": t[fp_col]}),
        batch_format="pyarrow",
    ).materialize()

    def tag(ds: rd.Dataset, status: str) -> rd.Dataset:
        return ds.map_batches(
            lambda t, s=status: pa.table(
                {on: t[on], "status": pa.array([s] * t.num_rows, pa.string())}
            ),
            batch_format="pyarrow",
        )

    if o.count() == 0:
        return tag(n, "added")
    if n.count() == 0:
        return tag(o, "removed")

    j = hash_join(o, n, on=on, how="full_outer", num_partitions=num_partitions)

    def classify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fo, fn = t["fp_old"], t["fp_new"]
        status = pc.if_else(
            pc.is_null(fo),
            pa.scalar("added", pa.string()),
            pc.if_else(
                pc.is_null(fn),
                pa.scalar("removed", pa.string()),
                pa.scalar("changed", pa.string()),
            ),
        )
        out = pa.table({on: t[on], "status": status})
        keep = pc.or_kleene(
            pc.or_(pc.is_null(fo), pc.is_null(fn)),
            pc.not_equal(fo, fn),
        )
        return out.filter(pc.fill_null(keep, True))

    return j.map_batches(classify, batch_format="pyarrow")


def apply_changelog(
    base: rd.Dataset,
    changes: rd.Dataset,
    key_col: str,
    op_col: str = "op",
    num_partitions: int = 8,
) -> rd.Dataset:
    """MERGE INTO semantics — the CDC-apply step of a lakehouse table:
    changes rows carry base's schema plus ``op_col`` with 'D' (delete
    the key), 'U' (replace the key's row) or 'I' (insert a new key).
    Contract: at most one change row per key (keep-latest compaction,
    queries.latest_event_per_user, is the canonical upstream that
    guarantees it).

    Plan: the DISTINCT affected keys (D + U) anti-join base — the
    shuffle moves narrow key rows, never base payloads (anti_join's
    combiner-first build side) — then the U + I payloads union in.
    No driver state, no full materialization of either side beyond
    anti_join's key-only build table."""
    import pyarrow.compute as pc

    def only_ops(ops: tuple[str, ...], drop_op: bool):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t[op_col], value_set=pa.array(list(ops))))
            return t.drop_columns([op_col]) if drop_op else t

        return f

    affected = changes.map_batches(
        only_ops(("D", "U"), drop_op=True), batch_format="pyarrow"
    ).select_columns([key_col])
    survivors = anti_join(
        base, affected, on=key_col, num_partitions=num_partitions
    )
    upserts = changes.map_batches(
        only_ops(("U", "I"), drop_op=True), batch_format="pyarrow"
    )
    return survivors.union(upserts)


# ------------------------------------------------------------------
# Bloom-prefiltered join
# ------------------------------------------------------------------


def _join_key_hashes(col: pa.ChunkedArray) -> np.ndarray:
    """Column -> uint64 hash lanes for Bloom membership.  Integer keys
    pass through (``_bloom_positions`` mixes); strings go through
    pandas' vectorized siphash (fixed default key — deterministic
    across processes)."""
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.uint64)
    return pd.util.hash_array(
        np.asarray(col.to_pylist(), dtype=object), categorize=False
    )


def bloom_filter_of_keys(
    build: rd.Dataset, key: str, m_bits: int = 1 << 20, k: int = 5
) -> np.ndarray:
    """OR-merged Bloom filter over a dataset's join-key column, built
    distributed: each block emits one m/8-byte partial bit array (the
    sketch, never the keys), folded on the driver — the
    ``ops/dedup.bloom_build`` shape for join keys."""
    from .dedup import _bloom_positions

    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(words, dtype=np.uint64)
        if t.num_rows:
            h = _join_key_hashes(t[key])
            for j in range(k):
                pos = _bloom_positions(h, j, m_bits)
                np.bitwise_or.at(
                    bits,
                    pos >> 6,
                    np.uint64(1) << (pos & 63).astype(np.uint64),
                )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    acc = np.zeros(words, dtype=np.uint64)
    for b in build.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for raw in b["bits"].to_pylist():
            acc |= np.frombuffer(raw, dtype=np.uint64)
    return acc


def bloom_prefilter_join(
    probe: rd.Dataset,
    build: rd.Dataset,
    on: str,
    right_on: str | None = None,
    m_bits: int = 1 << 20,
    k: int = 5,
    num_partitions: int = 8,
) -> rd.Dataset:
    """EXACT inner join with a Bloom-filter probe-side prefilter.

    The build side's join keys fold into an OR-mergeable Bloom filter
    (fixed m/8 bytes regardless of build-side row count); the bit
    array broadcasts once via ``ray.put`` and prunes probe rows whose
    key CANNOT match BEFORE the all-to-all hash-partition shuffle.
    Bloom filters have no false negatives and the real join removes
    the ~(1-e^{-kn/m})^k false positives, so the result is identical
    to ``hash_join`` — only the exchange volume changes.  The 100-TB
    win: for selective joins (a filtered dimension against a fact
    table) the probe side's shuffled bytes shrink by the join
    selectivity while the broadcast stays kilobytes."""
    import ray

    from .dedup import _bloom_positions

    rk = right_on or on
    bits = bloom_filter_of_keys(build, rk, m_bits, k)
    if not bits.any():
        # empty build side: no key can match.  Ray's hash join
        # aggregator raises on fully-empty inputs, so emit the empty
        # joined table directly (column name/type union; the join
        # collapses same-named keys to one column).
        cols: dict[str, pa.Array] = {}
        for sch in (probe.schema().base_schema, build.schema().base_schema):
            for f in sch:
                cols.setdefault(f.name, pa.array([], f.type))
        return rd.from_arrow(pa.table(cols))
    bits_ref = ray.put(bits)

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        bb = ray.get(bits_ref)
        h = _join_key_hashes(t[on])
        keep = np.ones(len(h), dtype=bool)
        for j in range(k):
            pos = _bloom_positions(h, j, m_bits)
            keep &= (
                bb[pos >> 6] >> (pos & 63).astype(np.uint64)
            ) & np.uint64(1) > 0
        return t.filter(pa.array(keep))

    pruned = probe.map_batches(prune, batch_format="pyarrow")
    return hash_join(
        pruned, build, on, right_on=rk, num_partitions=num_partitions
    )


def interval_overlap_pairs(
    ds: rd.Dataset,
    key: str,
    id_col: str,
    start_col: str,
    end_col: str,
    cell: int = 32,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Interval-interval OVERLAP self-join within each ``key`` ->
    (key, id_a, id_b) with id_a < id_b, for integer intervals
    [start, end] that satisfy ``start_a <= end_b AND start_b <= end_a``
    — the distributed interval join (concurrent shipments, session
    collisions), distinct from the point-in-range ``range_join``.

    Scale shape: grid bucketing.  Every interval explodes to its
    covered cells (``start//cell .. end//cell`` — explode factor =
    interval length / cell, the tuning knob), ONE hash-partitioned
    equi-join on (key, cell), then a vectorized exact-overlap filter.
    A pair sharing k cells would appear k times; instead of a dedup
    shuffle, each pair is counted ONLY in its ownership cell — the
    first cell both intervals cover, ``max(start_a, start_b) // cell``
    (the standard grid-join dedup-free trick: that cell provably
    exists for every overlapping pair, and is unique).  Output rows
    are emitted exactly once, no post-join distinct pass."""
    ints = ds.map_batches(
        lambda t: pa.table(
            {
                "k": pc.cast(t[key], pa.int64()),
                "i": pc.cast(t[id_col], pa.int64()),
                "s": pc.cast(t[start_col], pa.int64()),
                "e": pc.cast(t[end_col], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def explode(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        i = t["i"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        e = t["e"].to_numpy(zero_copy_only=False)
        c0 = s // cell
        c1 = e // cell
        reps = (c1 - c0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(k), dtype=np.int64), reps)
        # within-row cell offsets: global arange minus each row's start
        offs = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        return pa.table(
            {
                "k": pa.array(k[idx], pa.int64()),
                "cell": pa.array(c0[idx] + offs, pa.int64()),
                "i": pa.array(i[idx], pa.int64()),
                "s": pa.array(s[idx], pa.int64()),
                "e": pa.array(e[idx], pa.int64()),
            }
        )

    left = ints.map_batches(explode, batch_format="pyarrow").materialize()
    right = left.map_batches(
        lambda t: pa.table(
            {
                "k": t["k"],
                "cell": t["cell"],
                "i_b": t["i"],
                "s_b": t["s"],
                "e_b": t["e"],
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(
        left, right, on=("k", "cell"), num_partitions=num_partitions
    ).repartition(num_partitions)

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or "i" not in t.column_names:
            return empty
        ia = t["i"].to_numpy(zero_copy_only=False)
        ib = t["i_b"].to_numpy(zero_copy_only=False)
        sa = t["s"].to_numpy(zero_copy_only=False)
        ea = t["e"].to_numpy(zero_copy_only=False)
        sb = t["s_b"].to_numpy(zero_copy_only=False)
        eb = t["e_b"].to_numpy(zero_copy_only=False)
        cl = t["cell"].to_numpy(zero_copy_only=False)
        keep = (
            (ia < ib)
            & (sa <= eb)
            & (sb <= ea)
            & (np.maximum(sa, sb) // cell == cl)  # ownership cell only
        )
        return pa.table(
            {
                key: pa.array(
                    t["k"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "id_a": pa.array(ia[keep], pa.int64()),
                "id_b": pa.array(ib[keep], pa.int64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")
