"""Arrow IPC (Feather-v2 / ``.arrows`` stream) shard sink + source.

Arrow IPC is the zero-parse interchange format between Arrow-native
engines (the wire format of Flight, the mmap format of Feather): a
table round-trips with its exact schema and no text-encoding layer at
all, which makes it the natural hand-off when BOTH ends are Arrow —
parquet pays an encode/decode it doesn't need to.

Determinism contract (same as the tar-shard sink, sources/tar_shards.py):

* shard assignment is content-addressed (``stable_u32(key) %
  n_shards``) — independent of input partitioning;
* each shard's rows are written in sorted key order, so the SAME data
  always produces byte-identical shard files and the sha256 manifest
  detects partial/corrupt shards;
* writes are atomic (tmp + rename) — the resumable-output pattern.

Scale shape: one groupby(shard) shuffle; each shard task streams one
bounded table through ``pa.ipc.new_stream``; the manifest is
n_shards rows.  Reading is embarrassingly parallel over shard files.
"""

from __future__ import annotations

import hashlib
import io
import os

import pyarrow as pa

import ray.data as rd

from ..hashing import stable_u32


def write_ipc_shards(
    ds: rd.Dataset, out_dir: str, key_col: str, n_shards: int = 16
) -> rd.Dataset:
    """Dataset -> ``{out_dir}/shard-NNNNN.arrows`` IPC stream files
    (atomic rename); returns the manifest dataset (shard, path, n_rows,
    n_bytes, sha256)."""
    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        sh = pa.array(
            [stable_u32(str(k), "ipc:") % n_shards for k in keys], pa.int64()
        )
        return t.append_column("_shard", sh)

    def write_shard(t: pa.Table) -> pa.Table:
        shard = int(t["_shard"][0].as_py())
        t = t.drop_columns(["_shard"])
        t = t.sort_by([(key_col, "ascending")])
        buf = io.BytesIO()
        with pa.ipc.new_stream(buf, t.schema) as w:
            w.write_table(t)
        data = buf.getvalue()
        path = os.path.join(out_dir, f"shard-{shard:05d}.arrows")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table(
            {
                "shard": pa.array([shard], pa.int64()),
                "path": pa.array([path], pa.string()),
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "n_bytes": pa.array([len(data)], pa.int64()),
                "sha256": pa.array(
                    [hashlib.sha256(data).hexdigest()], pa.string()
                ),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(write_shard, batch_format="pyarrow")
    )


def read_ipc_shards(out_dir: str) -> rd.Dataset:
    """``{out_dir}/shard-*.arrows`` -> Dataset (one read task per
    shard file, schema straight off the stream)."""
    paths = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".arrows")
    )

    def load(batch: dict) -> pa.Table:
        tables = []
        for path in batch["path"]:
            with pa.ipc.open_stream(path) as r:
                tables.append(r.read_all())
        return pa.concat_tables(tables)

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pandas"
    )
