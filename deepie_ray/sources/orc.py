"""ORC shard sink + source (pyarrow.orc — bundled, no external dep).

ORC is the columnar interchange format of the Hive/Presto/Trino world;
supporting it means a warehouse whose tables already live as ORC can
feed this engine (and be fed back) without a parquet conversion hop.
Same determinism contract as the IPC and tar-shard sinks
(sources/ipc.py, sources/tar_shards.py):

* shard assignment is content-addressed (``stable_u32(key) %
  n_shards``) — independent of input partitioning;
* each shard's rows are written in sorted key order — the same data
  always produces the same shard contents, and the sha256 manifest
  detects partial/corrupt shards (ORC embeds writer metadata, so
  unlike IPC the FILE bytes are not guaranteed stable across pyarrow
  versions; the determinism contract here is content-level, proven by
  the fingerprint round-trip oracle);
* writes are atomic (tmp + rename) — the resumable-output pattern.

Scale shape: one groupby(shard) shuffle; each shard task streams one
bounded table through ``pyarrow.orc.write_table``; the manifest is
n_shards rows.  Reading is embarrassingly parallel over shard files.
"""

from __future__ import annotations

import hashlib
import io
import os

import pyarrow as pa
import pyarrow.orc as pa_orc

import ray.data as rd

from ..hashing import stable_u32


def write_orc_shards(
    ds: rd.Dataset, out_dir: str, key_col: str, n_shards: int = 16
) -> rd.Dataset:
    """Dataset -> ``{out_dir}/shard-NNNNN.orc`` files (atomic rename);
    returns the manifest dataset (shard, path, n_rows, n_bytes,
    sha256)."""
    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        sh = pa.array(
            [stable_u32(str(k), "orc:") % n_shards for k in keys], pa.int64()
        )
        return t.append_column("_shard", sh)

    def write_shard(t: pa.Table) -> pa.Table:
        shard = int(t["_shard"][0].as_py())
        t = t.drop_columns(["_shard"])
        t = t.sort_by([(key_col, "ascending")])
        buf = io.BytesIO()
        pa_orc.write_table(t, buf)
        data = buf.getvalue()
        path = os.path.join(out_dir, f"shard-{shard:05d}.orc")
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


def read_orc_shards(out_dir: str) -> rd.Dataset:
    """``{out_dir}/shard-*.orc`` -> Dataset (one read task per shard
    file, schema straight off the file footer)."""
    paths = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".orc")
    )

    def load(batch: dict) -> pa.Table:
        tables = [pa_orc.read_table(path) for path in batch["path"]]
        return pa.concat_tables(tables)

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pandas"
    )
