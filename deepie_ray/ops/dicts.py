"""Dictionary-building aggregations (reference A1/A2/A4/A5).

The reference builds string->int dictionaries by first-encounter order
while streaming files single-threaded
(``rnn_process_onlyExtra.py:99-205``) — ids depend on file order and
are unreproducible under parallelism (SURVEY §7.6.1).  The engine's
rule: **id = 1 + rank in the lexicographic sort of the distinct set**
(0 reserved for padding, like the reference's zero row), which is a
pure function of the SET — any partitioning yields identical ids.

* ``build_dict``       — distinct -> sorted -> enumerate (A4).
* ``column_max``       — global maxima (A2: maxLength/maxDist...).
* ``vocab_counts``     — per-token counts with per-sentence set
  semantics (A1: the reference counts a word once per sentence, O4).
* ``binary_feature_dict`` — count + cutoff>=2 on the training corpus
  (A5, ``rnnRE.py:452-482``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Max, Sum


def build_dict(
    ds: rd.Dataset, col: str, seed: dict[str, int] | None = None
) -> dict[str, int]:
    """Deterministic categorical dictionary over a (possibly list)
    column.  ``seed`` pins reserved entries (e.g. {'NONE': 0} for the
    label dict, ``rnn_process_onlyExtra.py:17``); remaining ids follow
    sorted order after the seeds."""

    def distinct(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks()
        while pa.types.is_list(arr.type):  # nested lists (e.g. per-token sets)
            arr = arr.flatten()
        return pa.table({"v": pc.unique(arr)})

    vals = (
        ds.map_batches(distinct, batch_format="pyarrow")
        .groupby("v")
        .count()
        .take_all()
    )
    distinct_sorted = sorted(r["v"] for r in vals if r["v"] is not None)
    out = dict(seed or {})
    next_id = (max(out.values()) + 1) if out else 1
    for v in distinct_sorted:
        if v not in out:
            out[v] = next_id
            next_id += 1
    return out


def column_max(ds: rd.Dataset, exprs: dict[str, str]) -> dict[str, int]:
    """Global maxima of derived per-row quantities.  ``exprs`` maps
    output name -> column; list columns contribute their length,
    scalar ints their value (A2)."""

    def partial(t: pa.Table) -> pa.Table:
        cols = {}
        for name, col in exprs.items():
            arr = t[col].combine_chunks()
            if pa.types.is_list(arr.type):
                v = pc.max(pc.list_value_length(arr)).as_py() or 0
            else:
                v = pc.max(arr).as_py() or 0
            cols[name] = [int(v)]
        return pa.table(cols)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .aggregate(*[Max(name, alias_name=name) for name in exprs])
    )
    return {k: int(v) for k, v in agg.items()}


def vocab_counts(ds: rd.Dataset, col: str = "tokens") -> rd.Dataset:
    """A1+O4: count each token once per row (sentence-set semantics),
    combiner-first."""

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks()
        words = []
        for row in arr.to_pylist():
            words.extend(set(row or []))
        g = (
            pa.table({"word": pa.array(words, pa.string())})
            .group_by("word")
            .aggregate([([], "count_all")])
        )
        return pa.table({"word": g["word"], "n": g["count_all"]})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


def binary_feature_dict(
    ds: rd.Dataset, col: str = "binary_features", cutoff: int = 2
) -> dict[str, int]:
    """A5: feature occurrence count over the (training) corpus, keep
    count >= cutoff, deterministic sorted ids from 1."""
    counts = vocab_counts(ds, col)
    # batch mask, not a row lambda — keeps the repo-wide "no per-row
    # Python in a Dataset filter" invariant even on this vocab-bounded
    # table (round-4 verdict #7)
    kept = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], cutoff)),
        batch_format="pyarrow",
    ).take_all()
    return {w: i for i, w in enumerate(sorted(x["word"] for x in kept), 1)}


def encode_column(
    ds: rd.Dataset, col: str, mapping: dict[str, int], out_col: str, default: int = 1
) -> rd.Dataset:
    """M12 second pass: broadcast dict -> vectorized id lookup (list or
    scalar column).  ``default`` mirrors the reference's 'Other' id.

    The lookup is one Arrow ``index_in`` against the broadcast key set
    + a ``take`` on the id array (missing -> ``default`` via
    fill_null) — no Python per value; null list rows encode as empty
    lists (the row-path ``row or []`` rule)."""
    import numpy as np
    import ray

    keys = pa.array(list(mapping.keys()), pa.string())
    ids = pa.array(list(mapping.values()), pa.int32())
    map_ref = ray.put((keys, ids))

    def enc(t: pa.Table) -> pa.Table:
        m_keys, m_ids = ray.get(map_ref)
        arr = t[col].combine_chunks()
        if pa.types.is_list(arr.type):
            lens = (
                pc.fill_null(pc.list_value_length(arr), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            flat = arr.flatten()
            looked = pc.take(m_ids, pc.index_in(flat, value_set=m_keys))
            vals = pc.fill_null(looked, default).cast(pa.int32())
            off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            col_arr = pa.ListArray.from_arrays(pa.array(off, pa.int32()), vals)
        else:
            looked = pc.take(m_ids, pc.index_in(arr, value_set=m_keys))
            col_arr = pc.fill_null(looked, default).cast(pa.int32())
        return t.append_column(out_col, col_arr)

    return ds.map_batches(enc, batch_format="pyarrow")
