"""Gzipped JSON-lines source/sink — the wire format most public text
corpora actually ship as (one ``.jsonl.gz`` per shard).

Sink: one compressed shard per input block, written tmp-then-rename so
a killed run leaves no half-shard a reader could see (same resumable
contract as the hive-partitioned parquet export).  Encoding is
pandas' vectorized ``to_json(lines=True)`` (C serializer), not a
per-row Python loop.

Source: ``read_binary_files`` streams the shards; each decompresses
and parses with ``pyarrow.json.read_json`` (vectorized) inside
``map_batches`` — one task per file group, no driver involvement.

Reference parity: the reference reads plain TSV only
(rnnRE/rnn_process_onlyExtra.py loaders); compressed-JSONL is
engine-brief source-format surface.
"""

from __future__ import annotations

import gzip
import io
import os
import uuid

import pyarrow as pa

import ray.data as rd


def write_jsonl_gz(ds: rd.Dataset, out_dir: str) -> rd.Dataset:
    """Write ``ds`` as gzipped JSONL shards (one per block) ->
    materialized (path, n_rows) manifest dataset.  The manifest is the
    sink's return value on purpose: callers verify/resume from it
    without re-listing the directory."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        df = t.to_pandas()
        payload = df.to_json(
            orient="records", lines=True, force_ascii=False
        ).encode("utf-8")
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.jsonl.gz")
        tmp = path + ".tmp"
        # mtime=0: deterministic bytes for a given payload (gzip headers
        # otherwise embed wall-clock time)
        with open(tmp, "wb") as f:
            with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                gz.write(payload)
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([path]), "n": pa.array([t.num_rows], pa.int64())}
        )

    # materialize = the write IS the job; lazy would write on first read
    return ds.map_batches(write_block, batch_format="pyarrow").materialize()


def read_jsonl_gz(path: str) -> rd.Dataset:
    """Read a directory (or single file) of ``.jsonl.gz`` shards.
    Decompress + parse run inside ``map_batches`` with pyarrow's
    vectorized JSON reader; schema comes from the data."""
    files = rd.read_binary_files(path, file_extensions=["gz"])

    def parse(t: pa.Table) -> pa.Table:
        from pyarrow import json as pajson

        # Ray's binary reader auto-decompresses by extension on some
        # paths; detect the gzip magic rather than assume either way
        def _maybe_gunzip(raw: bytes) -> bytes:
            return gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw

        tables = [
            pajson.read_json(io.BytesIO(_maybe_gunzip(b.as_py())))
            for b in t["bytes"]
        ]
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default")

    return files.map_batches(parse, batch_format="pyarrow")
