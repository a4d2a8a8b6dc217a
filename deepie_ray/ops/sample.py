"""Deterministic sampling / mixing / shuffle-shard operators for
training-data assembly.

All decisions are CONTENT-ADDRESSED (md5 of stable ids + a versioned
salt), never RNG-state-addressed: any partitioning of the corpus over
any number of workers makes the same keep/shard decision for every row,
runs are exactly reproducible, and the rules are ANSI-SQL-expressible
so DuckDB oracles value-hash-verify them end to end (same pattern as
``ops/text.py`` train/val/test split).

Scale shape:
* ``mix_sources_batch`` is a pure per-batch map — zero shuffle at any
  corpus size; the per-source rate is derived from the source NAME
  (hash), so no rate table needs to ship anywhere.
* ``shuffle_shards`` hash-partitions once on the shard id and ranks
  within each shard — the standard distributed training-data export
  (shard count is a knob: scale it with the corpus so one shard fits a
  worker; 100 TB / 4096 shards ~ 25 GB per shard group).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..hashing import md5_hex

MIX_SALT = "mix-v1"
RATE_SALT = "rate-v1"
SHUFFLE_SALT = "shuffle-v1"


def source_rate_permille(source: str) -> int:
    """Per-source sampling rate in [100, 999] per-mille, derived from
    the source name: ``100 + md5(source || ':rate-v1')[:4] % 900``.
    Data-driven (works for any source vocabulary) and SQL-expressible."""
    return 100 + int(md5_hex(f"{source}:{RATE_SALT}")[:4], 16) % 900


def mix_sources_batch(batch: pa.Table) -> pa.Table:
    """Weighted deterministic source mixing (domain up/down-sampling):
    keep a doc iff ``md5(doc_id || ':mix-v1')[:8] % 1000 <
    rate_permille(source)``.  The doc-level hash is independent of the
    rate hash so each source keeps an unbiased, reproducible fraction.

    Rates are computed once per DISTINCT source in the batch (sources
    are low-cardinality); the doc hash is the only per-row work.
    -> (doc_id, source, bucket, rate_permille) for kept docs."""
    ids = batch["doc_id"].to_pylist()
    buckets = np.fromiter(
        (int(md5_hex(f"{d}:{MIX_SALT}")[:8], 16) % 1000 for d in ids),
        dtype=np.int64,
        count=len(ids),
    )
    src = batch["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    dict_src = src.dictionary_encode()
    rate_by_code = np.fromiter(
        (source_rate_permille(s) for s in dict_src.dictionary.to_pylist()),
        dtype=np.int64,
        count=len(dict_src.dictionary),
    )
    codes = dict_src.indices.to_numpy(zero_copy_only=False)
    rates = (
        rate_by_code[codes]
        if len(rate_by_code)
        else np.zeros(len(batch), np.int64)
    )
    keep = buckets < rates
    out = pa.table(
        {
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "bucket": pa.array(buckets, pa.int64()),
            "rate_permille": pa.array(rates, pa.int64()),
        }
    )
    return out.filter(pa.array(keep))


def shard_hash_batch(batch: pa.Table, n_shards: int, id_col: str = "doc_id") -> pa.Table:
    """Adds (shard, shuffle_key): shard = md5-bucket of the id, key =
    the full first-12-hex value (collision-free ordering surrogate at
    any realistic corpus size; ties broken by id downstream)."""
    ids = batch[id_col].to_pylist()
    hx = [md5_hex(f"{d}:{SHUFFLE_SALT}")[:12] for d in ids]
    keys = np.fromiter((int(h, 16) for h in hx), dtype=np.int64, count=len(hx))
    return pa.table(
        {
            id_col: batch[id_col],
            "shard": pa.array(keys % n_shards, pa.int64()),
            "shuffle_key": pa.array(keys, pa.int64()),
        }
    )


def shuffle_shards(
    ds: rd.Dataset, n_shards: int = 16, id_col: str = "doc_id"
) -> rd.Dataset:
    """Deterministic global shuffle for training-data export:
    -> (id, shard, pos) where ``shard`` is a content-addressed bucket
    and ``pos`` is the row's rank within its shard ordered by the md5
    shuffle key (id tie-break).  Every row's placement is a pure
    function of its id — resumable, partition-independent, and exactly
    reproducible, unlike RNG-based ``random_shuffle``.

    One hash-partition exchange on ``shard`` + a per-shard sort; shard
    count is the scale knob (one shard group must fit a worker)."""

    def rank(df):
        df = df.sort_values(["shuffle_key", id_col]).reset_index(drop=True)
        df["pos"] = np.arange(len(df), dtype=np.int64)
        return df[[id_col, "shard", "pos"]]

    keyed = ds.map_batches(
        lambda t: shard_hash_batch(t, n_shards, id_col), batch_format="pyarrow"
    )
    return keyed.groupby("shard").map_groups(rank, batch_format="pandas")
