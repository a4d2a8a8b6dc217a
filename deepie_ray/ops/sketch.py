"""Mergeable sketches as streaming aggregates.

KMV (k-minimum-values) distinct-count sketch: keep the k smallest
64-bit hashes of the values seen; merge = k smallest of the union;
estimate = (k-1) / (kth_min / 2^64).  Standard error ~ 1/sqrt(k-2).

Why KMV here: it is deterministic (content hashing, no RNG), exactly
mergeable (the property the per-batch -> groupby pattern needs: one
tiny sketch row per key per block crosses the shuffle, never the
values), and collapses to EXACT distinct counting whenever the true
cardinality is <= k — so small groups pay nothing for the
approximation.

Pattern (the guide's "emit one serialized sketch per batch and merge
them in a second, tiny stage"): per-batch partial sketches inside
``map_batches`` -> ``groupby(key)`` -> merge inside ``map_groups`` ->
estimate.  At 100 TB the shuffle moves O(keys x blocks x k) int64s.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..hashing import fingerprint64

_SPACE = float(1 << 64)


def kmv_hash(values) -> np.ndarray:
    """Values -> uint64 content hashes (string/​int agnostic)."""
    return np.fromiter(
        (np.uint64(fingerprint64("kmv:" + str(v))) for v in values),
        dtype=np.uint64,
        count=len(values),
    )


def kmv_partial(hashes: np.ndarray, k: int) -> np.ndarray:
    """Smallest-k distinct hashes, ascending."""
    u = np.unique(hashes)  # sorted ascending
    return u[:k]


def kmv_merge(sketches: list[np.ndarray], k: int) -> np.ndarray:
    if not sketches:
        return np.array([], dtype=np.uint64)
    return kmv_partial(np.concatenate(sketches), k)


def kmv_estimate(sketch: np.ndarray, k: int) -> float:
    """<k entries -> exact count; else (k-1)/normalized kth minimum."""
    if len(sketch) < k:
        return float(len(sketch))
    kth = float(sketch[k - 1]) + 1.0
    return (k - 1) / (kth / _SPACE)


def _content_salt(arr: np.ndarray, buckets: int) -> int:
    """Deterministic salt from sketch CONTENT (not randomness, not task
    ids): identical under task retries, spreads a key's per-block
    sketch rows over ``buckets`` level-1 reducers."""
    if len(arr) == 0:
        return 0
    return int(arr[0] % np.uint64(buckets))


def grouped_approx_distinct(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    k: int = 256,
    salt_buckets: int = 64,
) -> rd.Dataset:
    """-> (key, approx_distinct:int64).  One KMV sketch row per
    (key, block) crosses the shuffle, and the merge is TWO-LEVEL
    (salted): level 1 merges each key's sketch rows within a salt
    bucket, level 2 merges the <= ``salt_buckets`` survivors — so no
    single task ever holds O(#blocks) sketches for a hot key (at 100 TB
    #blocks is ~10^6; one-level merge would gather k x 8 B x 10^6 per
    key).  Merging is exact, so the two-level shape changes nothing in
    the answer."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out_k, out_s, out_salt = [], [], []
        for key, grp in df.groupby(key_col, sort=False):
            s = kmv_partial(kmv_hash(grp[value_col].tolist()), k)
            out_k.append(key)
            out_s.append(s)
            out_salt.append(_content_salt(s, salt_buckets))
        # bit-preserving uint64 -> int64 reinterpretation for Arrow transport
        return pd.DataFrame(
            {
                key_col: out_k,
                "_salt": out_salt,
                "sketch": [s.view(np.int64).tolist() for s in out_s],
            }
        )

    def merge_lvl1(df: pd.DataFrame) -> pd.DataFrame:
        sketches = [np.asarray(s, dtype=np.int64).view(np.uint64) for s in df["sketch"]]
        m = kmv_merge(sketches, k)
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "sketch": [m.view(np.int64).tolist()],
            }
        )

    def merge_final(df: pd.DataFrame) -> pd.DataFrame:
        sketches = [np.asarray(s, dtype=np.int64).view(np.uint64) for s in df["sketch"]]
        m = kmv_merge(sketches, k)
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "approx_distinct": [int(round(kmv_estimate(m, k)))],
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    lvl1 = partials.groupby([key_col, "_salt"]).map_groups(
        merge_lvl1, batch_format="pandas"
    )
    return lvl1.groupby(key_col).map_groups(merge_final, batch_format="pandas")


def grouped_kmv_sketch(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    k: int = 256,
    salt_buckets: int = 64,
) -> rd.Dataset:
    """-> (key, sketch:list<int64>) — the final MERGED KMV sketch per
    key, same two-level salted merge as ``grouped_approx_distinct``
    but emitting the sketch itself so callers can do SET ALGEBRA on
    the sketches (intersection / overlap estimates).  Below the cap a
    sketch holds every distinct value hash, so set operations on the
    hash sets are exact (up to 64-bit fingerprint collisions)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out_k, out_s, out_salt = [], [], []
        for key, grp in df.groupby(key_col, sort=False):
            s = kmv_partial(kmv_hash(grp[value_col].tolist()), k)
            out_k.append(key)
            out_s.append(s)
            out_salt.append(_content_salt(s, salt_buckets))
        return pd.DataFrame(
            {
                key_col: out_k,
                "_salt": out_salt,
                "sketch": [s.view(np.int64).tolist() for s in out_s],
            }
        )

    def merge_lvl1(df: pd.DataFrame) -> pd.DataFrame:
        sketches = [np.asarray(s, dtype=np.int64).view(np.uint64) for s in df["sketch"]]
        m = kmv_merge(sketches, k)
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "sketch": [m.view(np.int64).tolist()],
            }
        )

    def merge_final(df: pd.DataFrame) -> pd.DataFrame:
        sketches = [np.asarray(s, dtype=np.int64).view(np.uint64) for s in df["sketch"]]
        m = kmv_merge(sketches, k)
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "sketch": [m.view(np.int64).tolist()],
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    lvl1 = partials.groupby([key_col, "_salt"]).map_groups(
        merge_lvl1, batch_format="pandas"
    )
    return lvl1.groupby(key_col).map_groups(merge_final, batch_format="pandas")


# ------------------------------------------------------- quantile sketch
#
# Weighted-value quantile sketch in the same mold: per-batch partials
# (distinct sorted values + counts), grouped merge, estimate.  EXACT
# whenever the merged distinct-value count stays within ``cap`` (true
# at every test scale — the oracle's quantile_cont verifies the whole
# machinery); beyond ``cap`` adjacent value pairs are collapsed to
# their weighted mean (each compaction pass at most halves resolution;
# rank error after c passes is bounded by c * n / cap).  The shuffle
# moves one (key, block) sketch row, never the values.

QUANTILE_CAP = 65536


def quantile_compress(vals: np.ndarray, weights: np.ndarray, cap: int):
    """(sorted distinct values, weights) -> compacted to <= cap entries.
    Returns (vals, weights, n_compactions)."""
    comp = 0
    while len(vals) > cap:
        n = len(vals)
        even = np.arange(0, n - 1, 2)
        w_pair = weights[even] + weights[even + 1]
        v_pair = (vals[even] * weights[even] + vals[even + 1] * weights[even + 1]) / w_pair
        if n % 2:
            vals = np.append(v_pair, vals[-1])
            weights = np.append(w_pair, weights[-1])
        else:
            vals, weights = v_pair, w_pair
        comp += 1
    return vals, weights, comp


def quantile_partial(values: np.ndarray, cap: int = QUANTILE_CAP):
    """Raw values -> (sorted distinct values, counts, n_compactions)."""
    vals, weights = np.unique(np.asarray(values, dtype=np.float64), return_counts=True)
    return quantile_compress(vals, weights.astype(np.int64), cap)


def quantile_merge_sketches(sketches, cap: int = QUANTILE_CAP):
    """Merge [(vals, weights, comp), ...] -> one sketch (sorted, distinct)."""
    all_v = np.concatenate([s[0] for s in sketches])
    all_w = np.concatenate([s[1] for s in sketches])
    comp = sum(int(s[2]) for s in sketches)
    order = np.argsort(all_v, kind="mergesort")
    v, w = all_v[order], all_w[order]
    # collapse equal values
    uniq, inv = np.unique(v, return_inverse=True)
    wsum = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(wsum, inv, w)
    v2, w2, c2 = quantile_compress(uniq, wsum, cap)
    return v2, w2, comp + c2


def quantile_value(vals: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Linear-interpolated quantile of the weighted multiset — identical
    to numpy ``percentile(..., interpolation='linear')`` / DuckDB
    ``quantile_cont`` over the expanded value sequence, computed from
    cumulative weights without expanding."""
    n = int(weights.sum())
    if n == 0:
        return float("nan")
    pos = (n - 1) * q
    lo, hi = int(np.floor(pos)), int(np.ceil(pos))
    cum = np.cumsum(weights)  # cum[i] = # of expanded entries in vals[:i+1]
    v_lo = vals[np.searchsorted(cum, lo + 1)]
    v_hi = vals[np.searchsorted(cum, hi + 1)]
    return float(v_lo + (pos - lo) * (v_hi - v_lo))


def grouped_quantile(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    q: float | dict = 0.5,
    cap: int = QUANTILE_CAP,
    out_col: str = "median_value",
    ndigits: int | None = 4,
    salt_buckets: int = 64,
) -> rd.Dataset:
    """-> (key, quantile) via mergeable per-block sketches: no task ever
    holds a whole group's raw values (the round-1 map_groups gather did
    — one task per event_type held corpus/5 rows).  The merge is
    two-level (content-salted) like ``grouped_approx_distinct``: a hot
    key's per-block sketch rows fan out over ``salt_buckets`` level-1
    merges, so final-merge state is bounded by buckets, not by block
    count.  Merging below ``cap`` is exact, so the tree shape does not
    change the answer."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out_k, out_v, out_w, out_c, out_s = [], [], [], [], []
        for key, grp in df.groupby(key_col, sort=False):
            v, w, c = quantile_partial(grp[value_col].to_numpy(), cap)
            out_k.append(key)
            out_v.append(v.tolist())
            out_w.append(w.tolist())
            out_c.append(c)
            out_s.append(_content_salt(v.view(np.uint64), salt_buckets))
        return pd.DataFrame(
            {
                key_col: out_k, "_salt": out_s,
                "vals": out_v, "weights": out_w, "comp": out_c,
            }
        )

    def _sketches(df: pd.DataFrame):
        return [
            (np.asarray(v, dtype=np.float64), np.asarray(w, dtype=np.int64), c)
            for v, w, c in zip(df["vals"], df["weights"], df["comp"])
        ]

    def merge_lvl1(df: pd.DataFrame) -> pd.DataFrame:
        mv, mw, mc = quantile_merge_sketches(_sketches(df), cap)
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "vals": [mv.tolist()],
                "weights": [mw.tolist()],
                "comp": [mc],
            }
        )

    def merge_final(df: pd.DataFrame) -> pd.DataFrame:
        mv, mw, _ = quantile_merge_sketches(_sketches(df), cap)
        # q may be one quantile (out_col named) or a {col: q} dict —
        # one merged sketch answers any number of quantiles for free
        qmap = q if isinstance(q, dict) else {out_col: q}
        row: dict = {key_col: [df[key_col].iloc[0]]}
        for col, qq in qmap.items():
            val = quantile_value(mv, mw, qq)
            row[col] = [round(val, ndigits) if ndigits is not None else val]
        return pd.DataFrame(row)

    partials = ds.map_batches(partial, batch_format="pandas")
    lvl1 = partials.groupby([key_col, "_salt"]).map_groups(
        merge_lvl1, batch_format="pandas"
    )
    return lvl1.groupby(key_col).map_groups(merge_final, batch_format="pandas")


# ------------------------------------------------------------ heavy hitters


def mg_partial(items: np.ndarray, counts: np.ndarray, cap: int):
    """Misra-Gries summary of (item, count) pairs: if more than ``cap``
    distinct items, subtract the (cap+1)-th largest count from all and
    keep the positive remainder (the classic decrement step, batched).
    Counts become UNDERestimates with error <= N/cap; when distinct <=
    cap the summary is EXACT — the same exact-degenerate contract as
    the KMV and quantile sketches above."""
    if len(items) <= cap:
        return items, counts
    order = np.argsort(counts)[::-1]
    thresh = counts[order[cap]]
    keep = order[:cap]
    kept_counts = counts[keep] - thresh
    pos = kept_counts > 0
    return items[keep][pos], kept_counts[pos]


def mg_merge(parts: list[tuple[np.ndarray, np.ndarray]], cap: int):
    """Merge MG summaries: sum counts per item, then one decrement
    step.  Merged error bounds add (Agarwal et al., 'Mergeable
    Summaries'); exactness is preserved while the union stays <= cap."""
    if not parts:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    items = np.concatenate([p[0] for p in parts])
    counts = np.concatenate([p[1] for p in parts])
    u, inv = np.unique(items, return_inverse=True)
    summed = np.zeros(len(u), dtype=np.int64)
    np.add.at(summed, inv, counts)
    return mg_partial(u, summed, cap)


def summary_salt(items: np.ndarray, counts: np.ndarray, buckets: int) -> int:
    """Level-1 reducer salt from the WHOLE summary's content, not its
    first item — item[0] is the lexicographic minimum, which is the
    same token in almost every block of a text corpus, and would
    collapse the 'salted fan-out' to a single reducer.  Count totals
    differ per block, so hashing (size, total, ends, first count)
    spreads; still deterministic under task retries (content-addressed,
    same contract as _content_salt above)."""
    if len(items) == 0:
        return 0
    return int(
        fingerprint64(
            f"hh:{len(items)}|{int(counts.sum())}|{items[0]}|{items[-1]}|"
            f"{int(counts[0])}"
        )
        % buckets
    )


def global_topk_heavy_hitters(
    ds: rd.Dataset,
    item_col: str,
    count_col: str,
    k: int = 20,
    cap: int = 4096,
    salt_buckets: int = 32,
) -> rd.Dataset:
    """Approximate global top-k over (item, partial_count) rows via
    mergeable Misra-Gries summaries: per-batch summary -> two-level
    salted merge (no task ever holds O(#blocks) summaries; a hot
    stream fans over ``salt_buckets`` level-1 reducers) -> final top-k
    ordered by (count desc, item).  Exact whenever the true distinct
    item count is <= cap, which is what the DuckDB oracle verifies at
    test scale; at 100 TB the summary rows crossing the shuffle are
    O(blocks x cap), never the corpus."""

    def partial(t: pa.Table) -> pa.Table:
        items = np.asarray(t[item_col].to_pylist(), dtype=object)
        counts = t[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(items, return_inverse=True)
        summed = np.zeros(len(u), dtype=np.int64)
        np.add.at(summed, inv, counts)
        it, ct = mg_partial(u, summed, cap)
        salt = summary_salt(it, ct, salt_buckets)
        return pa.table(
            {
                "_salt": pa.array(np.full(len(it), salt, np.int64)),
                item_col: pa.array([str(x) for x in it], pa.string()),
                "n": pa.array(ct, pa.int64()),
            }
        )

    def merge_lvl(df: pd.DataFrame) -> pd.DataFrame:
        it, ct = mg_merge(
            [(df[item_col].to_numpy(dtype=object), df["n"].to_numpy())], cap
        )
        out = pd.DataFrame({item_col: it.astype(str), "n": ct})
        out["_g"] = 0
        return out

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        it, ct = mg_merge(
            [(df[item_col].to_numpy(dtype=object), df["n"].to_numpy())], cap
        )
        out = pd.DataFrame({item_col: it.astype(str), "n": ct})
        out = out.sort_values(["n", item_col], ascending=[False, True]).head(k)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[["rank", item_col, "n"]]

    partials = ds.map_batches(partial, batch_format="pyarrow")
    lvl1 = partials.groupby("_salt").map_groups(merge_lvl, batch_format="pandas")
    return lvl1.groupby("_g").map_groups(final_topk, batch_format="pandas")


def exact_quantile_sorted(ds, col: str, q: float) -> float:
    """EXACT continuous (interpolated) quantile of a whole-dataset
    column via range-partitioned distributed sort + metadata split —
    the exact partner of the KMV quantile sketch for when a gate
    threshold must be bit-reproducible: ``ds.sort`` shuffles only the
    narrow value column, ``split_at_indices`` locates the two
    straddling order statistics from block row-counts (metadata), and
    only those <=2 rows ever reach the driver.  Interpolation is
    ``lo + (hi-lo)*frac`` — the same rule as numpy 'linear' and DuckDB
    ``quantile_cont`` (bit parity probed in events_p50_cont)."""
    import math

    n = ds.count()
    if n == 0:
        return float("nan")
    pos = q * (n - 1)
    lo_i, hi_i = math.floor(pos), math.ceil(pos)
    mid = (
        ds.select_columns([col])
        .sort(col)
        .split_at_indices([lo_i, hi_i + 1])[1]
        .take_all()
    )
    vals = [r[col] for r in mid]
    return float(vals[0] + (vals[-1] - vals[0]) * (pos - lo_i))


# --------------------------------------------------------- HyperLogLog
#
# The register-max mergeable distinct sketch (Flajolet et al. 2007)
# alongside KMV: fixed 2^p bytes per key regardless of cardinality,
# merge = elementwise max (commutative, idempotent — safe under task
# retries), standard error ~1.04/sqrt(2^p).  KMV degenerates to exact
# below its cap (and is what the oracle-checked queries use); HLL is
# the constant-memory path when even k distinct hashes per key is too
# much state.

HLL_P = 12  # 4096 registers, ~1.6% standard error


def _clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (0 -> 64)."""
    n = np.zeros(len(w), dtype=np.int64)
    x = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        high = x >> np.uint64(64 - shift)
        zero_high = high == 0
        n[zero_high] += shift
        x[zero_high] = x[zero_high] << np.uint64(shift)
    return np.where(w == 0, 64, n)


def hll_partial(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """uint64 hashes -> uint8 register array of size 2^p (max rho)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    w = hashes << np.uint64(p)  # remaining 64-p bits, left-aligned
    rho = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(1 << HLL_P, dtype=np.uint8)
    for s in sketches:
        out = np.maximum(out, s)
    return out


def hll_estimate(regs: np.ndarray, p: int = HLL_P) -> float:
    """Raw HLL estimate with the small-range linear-counting switch."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    E = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    V = int(np.sum(regs == 0))
    if E <= 2.5 * m and V > 0:
        return m * np.log(m / V)
    return float(E)


def grouped_hll_distinct(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    salt_buckets: int = 64,
) -> rd.Dataset:
    """-> (key, hll_distinct:int64): constant-memory grouped distinct
    count.  Same two-level salted merge shape as
    ``grouped_approx_distinct`` — one 4 KiB register row per
    (key, block) crosses the shuffle; merge is elementwise max."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out_k, out_s, out_salt = [], [], []
        for key, grp in df.groupby(key_col, sort=False):
            regs = hll_partial(kmv_hash(grp[value_col].tolist()))
            out_k.append(key)
            out_s.append(regs)
            out_salt.append(int(regs.sum()) % salt_buckets)
        return pd.DataFrame(
            {
                key_col: out_k,
                "_salt": out_salt,
                "regs": [s.tobytes() for s in out_s],
            }
        )

    def merge_lvl1(df: pd.DataFrame) -> pd.DataFrame:
        m = hll_merge([np.frombuffer(b, dtype=np.uint8) for b in df["regs"]])
        return pd.DataFrame(
            {key_col: [df[key_col].iloc[0]], "regs": [m.tobytes()]}
        )

    def merge_final(df: pd.DataFrame) -> pd.DataFrame:
        m = hll_merge([np.frombuffer(b, dtype=np.uint8) for b in df["regs"]])
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "hll_distinct": [int(round(hll_estimate(m)))],
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    lvl1 = partials.groupby([key_col, "_salt"]).map_groups(
        merge_lvl1, batch_format="pandas"
    )
    return lvl1.groupby(key_col).map_groups(merge_final, batch_format="pandas")


# ---------------------------------------- exact distributed selection


def exact_quantiles_refine(
    ds: rd.Dataset,
    col: str,
    qs: tuple[float, ...],
    n_buckets: int = 1024,
    max_rounds: int = 16,
) -> list[int]:
    """EXACT global order statistics over an integer column by
    iterative histogram refinement (classic distributed selection) —
    the scale path where both the sketch (approximate above its cap)
    and sort-then-index (a full all-to-all shuffle) are wrong answers.

    Round 0 scans for (n, min, max); each refinement round scans once
    more, histogramming every still-active quantile's current
    [lo, hi] range into ``n_buckets`` equal-width buckets inside
    ``map_batches`` (one vectorized ``np.bincount`` per quantile per
    block) and emitting only non-empty (quantile, bucket, count)
    micro-rows.  The driver folds those (bounded by
    blocks x len(qs) x n_buckets ints — metadata, never values),
    descends into the bucket containing each quantile's remaining
    rank, and rescales.  Ranges shrink by n_buckets per round, so a
    2^31 integer domain is EXACT after 4 scans; values themselves
    never shuffle and no worker ever holds more than one block.

    Rank rule: index ``floor(q * (n-1))`` of the ascending sort —
    DuckDB's ``quantile_disc``, same pin as events_p50_disc.
    Returns one exact int per q (the actual element).
    """

    def stats_partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        v = v[~pd.isna(v)].astype(np.int64)
        if not len(v):
            return pa.table(
                {"n": pa.array([], pa.int64()),
                 "lo": pa.array([], pa.int64()),
                 "hi": pa.array([], pa.int64())}
            )
        return pa.table(
            {"n": [len(v)], "lo": [int(v.min())], "hi": [int(v.max())]}
        )

    st = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    if not len(st) or st["n"].sum() == 0:
        raise ValueError("exact_quantiles_refine: empty input")
    n = int(st["n"].sum())
    glo, ghi = int(st["lo"].min()), int(st["hi"].max())
    # per-quantile state: [lo, hi, k] with k = remaining rank WITHIN [lo, hi]
    state = [[glo, ghi, int(np.floor(q * (n - 1)))] for q in qs]

    for _round in range(max_rounds):
        active = [j for j, (lo, hi, _k) in enumerate(state) if lo < hi]
        if not active:
            break
        ranges = [(j, state[j][0], state[j][1]) for j in active]
        widths = {
            j: -(-(hi - lo + 1) // n_buckets) for j, lo, hi in ranges
        }  # ceil division

        def hist_partial(
            t: pa.Table, _ranges=tuple(ranges), _widths=dict(widths)
        ) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            v = v[~pd.isna(v)].astype(np.int64)
            js, bs, cs = [], [], []
            for j, lo, hi in _ranges:
                m = v[(v >= lo) & (v <= hi)]
                if not len(m):
                    continue
                cnt = np.bincount((m - lo) // _widths[j])
                nz = np.nonzero(cnt)[0]
                js.extend([j] * len(nz))
                bs.extend(nz.tolist())
                cs.extend(cnt[nz].tolist())
            return pa.table(
                {
                    "qj": pa.array(js, pa.int64()),
                    "bucket": pa.array(bs, pa.int64()),
                    "cnt": pa.array(cs, pa.int64()),
                }
            )

        fold = (
            ds.map_batches(hist_partial, batch_format="pyarrow")
            .to_pandas()
            .groupby(["qj", "bucket"], sort=True)["cnt"]
            .sum()
        )
        for j, lo, hi in ranges:
            counts = fold.loc[j] if j in fold.index.get_level_values(0) else None
            assert counts is not None, "range must contain its rank"
            buckets = counts.index.to_numpy()
            cum = counts.to_numpy().cumsum()
            k = state[j][2]
            pos = int(np.searchsorted(cum, k + 1))
            b = int(buckets[pos])
            below = int(cum[pos - 1]) if pos else 0
            w = widths[j]
            state[j][0] = lo + b * w
            state[j][1] = min(hi, lo + (b + 1) * w - 1)
            state[j][2] = k - below
    # convergence is checked on the state itself, not loop exhaustion:
    # a run that narrows every range on its final permitted round is done
    if any(lo < hi for lo, hi, _k in state):
        raise RuntimeError("exact_quantiles_refine: did not converge")
    return [lo for lo, _hi, _k in state]


# ------------------------------------------------- count-min sketch
#
# The fixed-size frequency sketch (Cormode & Muthukrishnan 2005)
# alongside Misra-Gries: depth x width int64 counters, update = add the
# count at one hashed cell per row, merge = elementwise SUM (exactly
# mergeable, safe under the per-batch -> salted-merge pattern), point
# estimate = MIN over the depth cells (always an OVERestimate, error
# <= e*N/width with prob 1-exp(-depth)).  MG keeps the identities of
# its cap survivors; CMS answers frequency for ANY item after the fact
# in O(1) space per query — which is what makes the two-pass exact
# frequent-items pattern below work: the overestimate property means
# the CMS prune has NO false negatives, so the exact verify pass sees
# every true heavy hitter.

CMS_DEPTH = 4
CMS_WIDTH = 8192

# splitmix64 finalizer constants (same family as dedup.band_hashes_vec;
# duplicated rather than imported to keep sketch.py dependency-light)
_SMX_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SMX_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SMX_M2 = np.uint64(0x94D049BB133111EB)


def cms_indices(
    keys: np.ndarray, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> np.ndarray:
    """uint64 content keys -> (depth, n) int64 cell columns, one
    splitmix64-finalizer pass per depth row over the whole batch (zero
    per-item Python; same mixing family as dedup.band_hashes_vec).
    NOT the md5 oracle convention on purpose: the sketch cells never
    appear in any oracle — output exactness comes from the verify
    pass, not the hash."""
    out = np.empty((depth, len(keys)), dtype=np.int64)
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        for r in range(depth):
            z = k + _SMX_GAMMA * np.uint64(r + 1)
            z ^= z >> np.uint64(30)
            z *= _SMX_M1
            z ^= z >> np.uint64(27)
            z *= _SMX_M2
            z ^= z >> np.uint64(31)
            out[r] = (z % np.uint64(width)).astype(np.int64)
    return out


def cms_partial(
    keys: np.ndarray,
    counts: np.ndarray,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> np.ndarray:
    """(distinct keys, their counts) -> (depth, width) int64 sketch."""
    sk = np.zeros((depth, width), dtype=np.int64)
    if len(keys):
        idx = cms_indices(keys, depth, width)
        for r in range(depth):
            np.add.at(sk[r], idx[r], counts)
    return sk


def cms_merge(sketches: list[np.ndarray]) -> np.ndarray:
    """Elementwise sum — counts are additive across disjoint inputs."""
    return np.sum(np.stack(sketches), axis=0)


def cms_estimate(
    sk: np.ndarray, keys: np.ndarray
) -> np.ndarray:
    """Point frequency estimates (min over depth cells) — >= truth."""
    if not len(keys):
        return np.array([], dtype=np.int64)
    depth, width = sk.shape
    idx = cms_indices(keys, depth, width)
    est = sk[0][idx[0]]
    for r in range(1, depth):
        est = np.minimum(est, sk[r][idx[r]])
    return est


def frequent_items_cms(
    ds: rd.Dataset,
    item_col: str,
    count_col: str,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt_buckets: int = 32,
) -> rd.Dataset:
    """EXACT frequent items (global count >= ``threshold``) over
    (int64 item, partial count) rows by the canonical two-pass scale
    pattern: pass 1 folds a global count-min sketch (per-batch
    (depth x width) partials -> salted level-1 sum -> <=
    ``salt_buckets`` fixed-size rows folded on the driver — bounded by
    buckets x depth x width ints, never by items); pass 2 broadcasts
    the sketch once (``ray.put``) and re-streams the rows, keeping only
    items whose CMS estimate clears the threshold, then exact-counts
    the survivors with one combiner-first grouped sum and applies the
    threshold to the TRUE counts.

    Output (item_col, n:int64) is EXACT regardless of sketch quality:
    CMS never underestimates, so the prune admits every true heavy
    hitter (no false negatives), and false positives die at the final
    exact filter.  The sketch only bounds how much the verify pass
    shuffles: O(items-with-est>=T), not O(distinct items).

    ``ds`` is consumed twice — pass an already-materialized dataset."""
    import ray

    from ray.data.aggregate import Sum

    def p1(t: pa.Table) -> pa.Table:
        items = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = t[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(items, return_inverse=True)
        summed = np.zeros(len(u), dtype=np.int64)
        np.add.at(summed, inv, counts)
        sk = cms_partial(u.astype(np.uint64), summed, depth, width)
        salt = int(sk.sum()) % salt_buckets
        return pa.table(
            {"_salt": pa.array([salt], pa.int64()),
             "sk": pa.array([sk.tobytes()], pa.binary())}
        )

    def sum_lvl1(df: pd.DataFrame) -> pd.DataFrame:
        m = cms_merge(
            [np.frombuffer(b, dtype=np.int64).reshape(depth, width)
             for b in df["sk"]]
        )
        return pd.DataFrame({"sk": [m.tobytes()]})

    lvl1 = (
        ds.map_batches(p1, batch_format="pyarrow")
        .groupby("_salt")
        .map_groups(sum_lvl1, batch_format="pandas")
        .take_all()
    )  # <= salt_buckets fixed-size rows: bounded driver fold
    sk = cms_merge(
        [np.frombuffer(r["sk"], dtype=np.int64).reshape(depth, width)
         for r in lvl1]
    )
    sk_ref = ray.put(sk)

    def p2(t: pa.Table) -> pa.Table:
        s = ray.get(sk_ref)
        items = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = t[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(items, return_inverse=True)
        summed = np.zeros(len(u), dtype=np.int64)
        np.add.at(summed, inv, counts)
        keep = cms_estimate(s, u.astype(np.uint64)) >= threshold
        return pa.table(
            {item_col: pa.array(u[keep], pa.int64()),
             "n": pa.array(summed[keep], pa.int64())}
        )

    out = (
        ds.map_batches(p2, batch_format="pyarrow")
        .groupby(item_col)
        .aggregate(Sum("n", alias_name="n"))
        .filter(expr=f"n >= {threshold}")
    )
    return out.map_batches(
        lambda t: pa.table(
            {item_col: pc.cast(t[item_col], pa.int64()),
             "n": pc.cast(t["n"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
