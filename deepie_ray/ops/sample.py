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


def greedy_max_coverage(
    ds: rd.Dataset,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    unit: str = "word",
) -> pa.Table:
    """Greedy MAX-COVERAGE document selection (the submodular
    facility-location curation step: pick the k docs that together
    cover the most distinct vocabulary; the greedy is (1-1/e)-optimal
    for monotone submodular objectives) -> (round, doc_id, gain,
    covered_total), one row per pick in pick order.  Deterministic:
    max marginal gain, ties to the smallest doc id.

    Scale shape per round: the (doc, word) pair table streams through a
    filter against the BROADCAST covered-word set (bounded by the union
    of the <=k picked docs' vocabularies — curation picks are few and
    doc-bounded, never corpus-bounded), marginal gains are a
    combiner-first grouped count, and the argmax is one grouped MAX
    over a packed ``gain * 2^32 + (2^32-1 - doc_id)`` int64 key (per-doc
    vocab and doc ids both < 2^31; re-pack wider beyond that).  Only the
    winner's own word list ever reaches the driver.

    ``unit``: "word" covers distinct whitespace tokens; "gram3" covers
    distinct lowercased word-3-grams (the repeated_ngrams shingle rule
    — whole doc as one gram when shorter than 3 tokens), the richer
    space a curation run actually optimizes."""
    import pyarrow.compute as pc

    import ray
    from ray.data.aggregate import Max, Sum

    from ..hashing import ws_tokens

    def pairs_batch(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t[text_col], pattern=r"\s+")
        ids = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        doc = pc.take(pc.cast(t[id_col], pa.int64()), ids)
        # per-doc distinct within the batch; the grouped SUM below
        # makes the count exact even if a doc's rows straddle blocks
        return (
            pa.table({"doc_id": doc, "word": flat})
            .group_by(["doc_id", "word"])
            .aggregate([])
        )

    def grams_batch(t: pa.Table) -> pa.Table:
        out_d, out_w = [], []
        for d, txt in zip(
            t[id_col].to_pylist(), t[text_col].to_pylist()
        ):
            tk = ws_tokens((txt or "").lower())
            if len(tk) < 3:
                g = {" ".join(tk)} if tk else set()
            else:
                g = {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}
            out_d.extend([int(d)] * len(g))
            out_w.extend(sorted(g))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "word": pa.array(out_w, pa.string()),
            }
        )

    fn = grams_batch if unit == "gram3" else pairs_batch
    pairs = ds.map_batches(fn, batch_format="pyarrow").materialize()
    covered: set[str] = set()
    rows: list[tuple[int, int, int, int]] = []
    B = 1 << 32
    for rnd in range(1, k + 1):
        cov_ref = ray.put(pa.array(sorted(covered), pa.string()))
        picked_ref = ray.put(
            pa.array(sorted(int(r[1]) for r in rows), pa.int64())
        )

        def gains(t: pa.Table) -> pa.Table:
            cov = ray.get(cov_ref)
            pk = ray.get(picked_ref)
            keep = pc.is_null(pc.index_in(t["word"], value_set=cov))
            if len(pk):
                keep = pc.and_(
                    keep, pc.is_null(pc.index_in(t["doc_id"], value_set=pk))
                )
            t = t.filter(keep)
            g = t.group_by(["doc_id"]).aggregate([([], "count_all")])
            return pa.table(
                {
                    "doc_id": g["doc_id"],
                    "gain": pc.cast(g["count_all"], pa.int64()),
                }
            )

        def pack(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "doc_id" not in t.column_names:
                return pa.table({"pk": pa.array([], pa.int64())})
            g = t["gain"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"pk": pa.array(g * B + (B - 1 - d), pa.int64())})

        best = (
            pairs.map_batches(gains, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("gain", alias_name="gain"))
            .repartition(4)
            .map_batches(pack, batch_format="pyarrow")
            .max("pk")
        )
        if best is None:  # nothing uncovered remains
            break
        best = int(best)
        gain = best // B
        doc = (B - 1) - (best % B)
        if gain <= 0:
            break
        # the winner's uncovered words: doc-bounded driver pull
        win = pairs.map_batches(
            lambda t, d=doc: t.filter(pc.equal(t["doc_id"], d)),
            batch_format="pyarrow",
        ).to_pandas()
        covered |= set(win["word"])  # the winner's full vocabulary
        rows.append((rnd, doc, gain, len(covered)))
    return pa.table(
        {
            "round": pa.array([r[0] for r in rows], pa.int64()),
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
            "gain": pa.array([r[2] for r in rows], pa.int64()),
            "covered_total": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
