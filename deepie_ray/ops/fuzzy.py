"""Fuzzy string matching (KG entity resolution): bounded-Levenshtein
near-duplicate self-join over a name/surface column.

The classic entity-resolution primitive: find all pairs of records
whose names are within edit distance ``k`` (typo-level variants of the
same real-world entity).  Reference parity: the reference engine links
entity surfaces by exact alias lookup only (rnnRE ``loadAlias``/link
path); fuzzy matching is part of the engine-brief LLM/KG pipeline
surface, not the reference inventory.

Distribution shape (mirrors ``dedup.embedding_neardup_blockjoin``):
rows are grouped into fixed-size chunks, each chunk consolidated into
ONE packed row (ids + utf-8 name bytes + lengths); the C(C+1)/2 chunk
pairs are enumerated distributed and hash-joined to the chunk table on
both sides; each chunk-pair task runs a *batched* dynamic program over
all surviving candidate pairs at once (numpy ops over the pair axis —
no per-pair Python DP).  Memory per task is two chunk payloads
regardless of corpus size.

Exactness / scale note: a bounded-edit-distance self-join is
inherently O(N^2) candidate pairs before pruning; the only *lossless*
prefilter applied here is the length gate (|len(a)-len(b)| <= k is
necessary for dist <= k).  At 100 TB a deployment puts a lossy
blocking key first (name-shingle MinHash bands, ops/dedup.py) and
feeds only candidate buckets through the same verify kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def levenshtein_bounded_pairs(
    A: np.ndarray,
    la: np.ndarray,
    B: np.ndarray,
    lb: np.ndarray,
    k: int,
) -> np.ndarray:
    """Batched Levenshtein over m aligned pairs: ``A`` (m, La_max) and
    ``B`` (m, Lb_max) are zero-padded uint8 rows with true lengths
    ``la``/``lb``.  Returns (m,) int32 exact distances (the ``k`` bound
    is only used by callers to prefilter; the DP itself is exact).

    Vectorization: the classic DP iterated over *character positions*
    (La_max x Lb_max scalar steps, ~18x18 for entity names) with every
    step a numpy op over the whole pair axis — per-pair results are
    captured at row i == la (padding bytes beyond a pair's true length
    are never read)."""
    m = len(la)
    res = np.zeros(m, dtype=np.int32)
    if m == 0:
        return res
    la = la.astype(np.int64)
    lb = lb.astype(np.int64)
    La_max = int(la.max())
    Lb_max = int(lb.max())
    rows = np.arange(m)
    prev = np.tile(np.arange(Lb_max + 1, dtype=np.int32), (m, 1))
    res[la == 0] = lb[la == 0].astype(np.int32)
    for i in range(1, La_max + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, Lb_max + 1):
            cost = (ai != B[:, j - 1]).astype(np.int32)
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
            np.minimum(cur[:, j], prev[:, j - 1] + cost, out=cur[:, j])
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res


def _pad_matrix(names: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """utf-8 byte strings -> (n, L_max) zero-padded uint8 matrix +
    (n,) int32 lengths.  Byte-domain distances (== char-domain for
    ASCII; documented contract, same as the winnowing grams)."""
    lens = np.array([len(b) for b in names], dtype=np.int32)
    L = int(lens.max()) if len(lens) else 0
    M = np.zeros((len(names), max(L, 1)), dtype=np.uint8)
    for r, b in enumerate(names):
        M[r, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return M, lens


def levenshtein_neardup_pairs(
    ds: rd.Dataset,
    k: int = 1,
    id_col: str = "s_suppkey",
    name_col: str = "s_name",
    chunk_rows: int = 4096,
    num_partitions: int = 8,
) -> rd.Dataset:
    """All pairs (s1 < s2, dist) with byte-Levenshtein(name) <= k,
    as a distributed chunk-pair cross join (module docstring)."""

    def to_chunk_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        names = [
            (s or "").encode("utf-8") for s in batch[name_col].to_pylist()
        ]
        chunks = ids // chunk_rows
        out_c, out_ids, out_lens, out_names = [], [], [], []
        for c in np.unique(chunks):
            msk = chunks == c
            sel = [names[i] for i in np.nonzero(msk)[0]]
            out_c.append(int(c))
            out_ids.append(ids[msk].tobytes())
            out_lens.append(
                np.array([len(b) for b in sel], dtype=np.int32).tobytes()
            )
            out_names.append(b"".join(sel))
        return pa.table(
            {
                "chunk": pa.array(out_c, pa.int64()),
                "ids": pa.array(out_ids, pa.binary()),
                "lens": pa.array(out_lens, pa.binary()),
                "names": pa.array(out_names, pa.binary()),
            }
        )

    def merge_chunk(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate([np.frombuffer(b, dtype=np.int64) for b in df["ids"]])
        lens = np.concatenate(
            [np.frombuffer(b, dtype=np.int32) for b in df["lens"]]
        )
        blob = b"".join(df["names"])
        # re-split, sort by id, re-pack
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        names = [blob[offs[i] : offs[i + 1]] for i in range(len(lens))]
        order = np.argsort(ids)
        names = [names[i] for i in order]
        return pd.DataFrame(
            {
                "chunk": [int(df["chunk"].iloc[0])],
                "ids": [ids[order].tobytes()],
                "lens": [lens[order].tobytes()],
                "names": [b"".join(names)],
            }
        )

    chunks_ds = (
        ds.map_batches(to_chunk_rows, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(merge_chunk, batch_format="pandas")
        .repartition(num_partitions)
        .materialize()  # two join consumers below
    )

    import ray

    chunk_ids = sorted(
        r["chunk"] for r in chunks_ds.select_columns(["chunk"]).take_all()
    )
    empty = pa.table(
        {
            "s1": pa.array([], pa.int64()),
            "s2": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        }
    )
    if not chunk_ids:
        return rd.from_arrow(empty)
    ids_ref = ray.put(np.asarray(chunk_ids, dtype=np.int64))

    def expand_pairs(batch: pa.Table) -> pa.Table:
        all_ids = ray.get(ids_ref)
        ci_out, cj_out = [], []
        for c in batch["chunk"].to_pylist():
            partners = all_ids[all_ids >= c]
            ci_out.append(np.full(len(partners), c, dtype=np.int64))
            cj_out.append(partners)
        ci = np.concatenate(ci_out) if ci_out else np.array([], dtype=np.int64)
        cj = np.concatenate(cj_out) if cj_out else np.array([], dtype=np.int64)
        return pa.table(
            {"ci": pa.array(ci, pa.int64()), "cj": pa.array(cj, pa.int64())}
        )

    pairs_idx = (
        chunks_ds.select_columns(["chunk"])
        .map_batches(expand_pairs, batch_format="pyarrow")
        .repartition(num_partitions)
    )

    def side(name: str):
        return chunks_ds.map_batches(
            lambda t, n=name: pa.table(
                {
                    n: t["chunk"],
                    f"ids_{n}": t["ids"],
                    f"lens_{n}": t["lens"],
                    f"names_{n}": t["names"],
                }
            ),
            batch_format="pyarrow",
        )

    j = (
        pairs_idx.join(
            side("ci"), join_type="inner", num_partitions=num_partitions, on=("ci",)
        )
        .repartition(num_partitions)  # join also emits empty-partition blocks
        .join(
            side("cj"), join_type="inner", num_partitions=num_partitions, on=("cj",)
        )
    )

    def _unpack(batch: pa.Table, r: int, tag: str):
        ids = np.frombuffer(batch[f"ids_{tag}"][r].as_py(), dtype=np.int64)
        lens = np.frombuffer(batch[f"lens_{tag}"][r].as_py(), dtype=np.int32)
        blob = batch[f"names_{tag}"][r].as_py()
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        names = [blob[offs[i] : offs[i + 1]] for i in range(len(lens))]
        return ids, names

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_d = [], [], []
        for r in range(len(batch)):
            same = batch["ci"][r].as_py() == batch["cj"][r].as_py()
            ia, na = _unpack(batch, r, "ci")
            ib, nb = _unpack(batch, r, "cj")
            Ma, la = _pad_matrix(na)
            Mb, lb = _pad_matrix(nb)
            if same:
                xa, xb = np.triu_indices(len(ia), k=1)
            else:
                xa, xb = np.meshgrid(
                    np.arange(len(ia)), np.arange(len(ib)), indexing="ij"
                )
                xa, xb = xa.ravel(), xb.ravel()
            # lossless length gate: |la-lb| <= k is necessary for dist <= k
            keep = np.abs(la[xa] - lb[xb]) <= k
            xa, xb = xa[keep], xb[keep]
            d = levenshtein_bounded_pairs(Ma[xa], la[xa], Mb[xb], lb[xb], k)
            hit = d <= k
            a, b, d = ia[xa[hit]], ib[xb[hit]], d[hit]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_d.append(d.astype(np.int64))
        a = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
        d = np.concatenate(out_d) if out_d else np.array([], dtype=np.int64)
        return pa.table(
            {
                "s1": pa.array(a, pa.int64()),
                "s2": pa.array(b, pa.int64()),
                "dist": pa.array(d, pa.int64()),
            }
        )

    return j.map_batches(verify, batch_format="pyarrow", batch_size=4)
