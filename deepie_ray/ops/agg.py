"""Skew-aware aggregation helpers (SURVEY §7.5).

``salted_count`` is the two-level (salted) grouped count: a hot key
(the flagship's E000000 entity) would otherwise send every one of its
rows to a single reducer.  Level 1 groups by (key..., salt) where salt
= stable-hash(row) % K — the hot key fans out over K reducers; level 2
re-groups the K partial counts without the salt.  Correct for any
associative-commutative aggregate; provided here for count/sum.

``partial_count`` is the batch-local combiner (pre-aggregation inside
``map_batches``): emits one row per distinct key per batch, so the
shuffle moves O(distinct-keys-per-block) rows, not O(rows).  For
grouped *counts* this alone usually de-skews better than salting (the
partial rows per hot key = number of blocks, already bounded), so the
flagship uses combiner + plain groupby and keeps salting for aggregates
whose per-group state is not constant-size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum


def partial_count(keys: list[str], count_col: str = "weight"):
    """-> batch fn emitting (keys..., count_col) partial counts."""

    def fn(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([([], "count_all")])
        cols = {k: g[k] for k in keys}
        cols[count_col] = g["count_all"]
        return pa.table(cols)

    return fn


def grouped_count(
    ds: rd.Dataset, keys: list[str], count_col: str = "weight"
) -> rd.Dataset:
    """Combiner + final groupby-sum: grouped count with bounded skew."""
    partials = ds.map_batches(partial_count(keys, count_col), batch_format="pyarrow")
    return partials.groupby(keys).aggregate(Sum(count_col, alias_name=count_col))


def add_salt(batch: pa.Table, key: str, buckets: int, col: str = "_salt") -> pa.Table:
    """Deterministic per-row salt from a row-id column (NOT random —
    resume/retry must re-produce identical partitions)."""
    import zlib

    vals = batch[key].to_pylist()
    salt = np.fromiter(
        (zlib.crc32(str(v).encode()) % buckets for v in vals),
        dtype=np.int32,
        count=len(vals),
    )
    return batch.append_column(col, pa.array(salt, pa.int32()))


def salted_count(
    ds: rd.Dataset,
    keys: list[str],
    salt_key: str,
    buckets: int = 16,
    count_col: str = "weight",
) -> rd.Dataset:
    """Two-level salted grouped count: groupby(keys+salt) then
    groupby(keys).  ``salt_key`` is the high-cardinality row-id column
    the salt is derived from."""
    salted = ds.map_batches(
        lambda t: add_salt(t, salt_key, buckets), batch_format="pyarrow"
    )
    lvl1 = (
        salted.map_batches(
            partial_count(keys + ["_salt"], count_col), batch_format="pyarrow"
        )
        .groupby(keys + ["_salt"])
        .aggregate(Sum(count_col, alias_name=count_col))
    )
    return lvl1.groupby(keys).aggregate(Sum(count_col, alias_name=count_col))
