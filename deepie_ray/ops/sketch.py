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


def grouped_approx_distinct(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    k: int = 256,
) -> rd.Dataset:
    """-> (key, approx_distinct:int64).  One KMV sketch row per
    (key, block) crosses the shuffle."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out_k, out_s = [], []
        for key, grp in df.groupby(key_col, sort=False):
            out_k.append(key)
            out_s.append(kmv_partial(kmv_hash(grp[value_col].tolist()), k))
        # bit-preserving uint64 -> int64 reinterpretation for Arrow transport
        return pd.DataFrame(
            {key_col: out_k, "sketch": [s.view(np.int64).tolist() for s in out_s]}
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        sketches = [np.asarray(s, dtype=np.int64).view(np.uint64) for s in df["sketch"]]
        m = kmv_merge(sketches, k)
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "approx_distinct": [int(round(kmv_estimate(m, k)))],
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(key_col).map_groups(merge, batch_format="pandas")
