"""Stage checkpoints, per-partition lineage, resume (SURVEY §4, north
rule: "resumable from checkpoint with per-partition lineage + metrics").

Layout per stage::

    <dir>/<stage>/data/*.parquet      partitioned output (atomic: written
                                      to data.tmp/, renamed on success)
    <dir>/<stage>/MANIFEST.json       {"complete": true, "rows": N,
                                      "wall_ms": ..., "run_id": ...}
    <dir>/lineage.parquet             appended (stage, part_id, rows_in,
                                      rows_out, counters, wall_ms) rows

``checkpoint_dataset`` is the resume point: if a complete manifest
exists the stage's upstream lineage is *not executed at all* — the
stream re-starts from the parquet files.  A mid-run kill leaves only a
``data.tmp`` directory, which the next run overwrites.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from .schema import LINEAGE


def _manifest_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, "MANIFEST.json")


def stage_complete(root: str, stage: str) -> bool:
    p = _manifest_path(root, stage)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            return bool(json.load(f).get("complete"))
    except (json.JSONDecodeError, OSError):
        return False


def checkpoint_dataset(
    ds: rd.Dataset,
    root: str,
    stage: str,
    run_id: str | None = None,
    counter=None,
    rows_in_stage: str | None = None,
) -> rd.Dataset:
    """Write ``ds`` to a stage checkpoint (unless already complete) and
    return a dataset reading from it.  Atomic via tmp-dir rename.

    ``counter``: optional ``CounterActor`` handle — after the write
    drains the stream, its per-stage totals are read and written into
    the lineage rows (real counters, not placeholders); ``rows_in`` is
    taken from ``rows_in_stage``'s rows_in total."""
    stage_dir = os.path.join(root, stage)
    data_dir = os.path.join(stage_dir, "data")
    if stage_complete(root, stage):
        return rd.read_parquet(data_dir)

    run_id = run_id or uuid.uuid4().hex[:12]
    tmp_dir = os.path.join(stage_dir, "data.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    t0 = time.monotonic()
    ds.write_parquet(tmp_dir)
    wall_ms = int((time.monotonic() - t0) * 1000)

    shutil.rmtree(data_dir, ignore_errors=True)
    os.replace(tmp_dir, data_dir)
    out = rd.read_parquet(data_dir)
    rows = out.count()
    counters_json, rows_in = "{}", -1
    if counter is not None:
        from .ops.metrics import read_counters

        counts = read_counters(counter)
        counters_json = json.dumps(counts, sort_keys=True)
        if rows_in_stage and rows_in_stage in counts:
            rows_in = int(counts[rows_in_stage]["rows_in"])
    append_lineage(
        root,
        [
            {
                "run_id": run_id,
                "stage": stage,
                "part_id": i,
                "rows_in": rows_in,
                "rows_out": pq.read_metadata(os.path.join(data_dir, f)).num_rows,
                "counters": counters_json,
                "wall_ms": wall_ms,
            }
            for i, f in enumerate(sorted(os.listdir(data_dir)))
            if f.endswith(".parquet")
        ],
    )
    with open(_manifest_path(root, stage), "w") as f:
        json.dump(
            {"complete": True, "rows": rows, "wall_ms": wall_ms, "run_id": run_id},
            f,
        )
    return out


def append_lineage(root: str, rows: list[dict]) -> None:
    """Append lineage rows (one parquet fragment per call — append-only,
    safe under concurrent stages)."""
    if not rows:
        return
    os.makedirs(os.path.join(root, "lineage"), exist_ok=True)
    table = pa.Table.from_pylist(rows, schema=LINEAGE)
    pq.write_table(
        table, os.path.join(root, "lineage", uuid.uuid4().hex[:12] + ".parquet")
    )


def read_lineage(root: str) -> pa.Table:
    d = os.path.join(root, "lineage")
    if not os.path.isdir(d) or not os.listdir(d):
        return pa.Table.from_pylist([], schema=LINEAGE)
    return pq.read_table(d)


# --------------------------------------------------------------------
# versioned tables (snapshot isolation + time travel)
# --------------------------------------------------------------------
#
# Layout per table root::
#
#     <root>/v000001/data/*.parquet    immutable snapshot files
#     <root>/v000001/MANIFEST.json     {"complete": true, "version": 1,
#                                       "rows": N, "parent": 0}
#
# Versions are append-only: a writer stages into ``data.tmp`` and
# commits with one atomic rename + manifest write, so a reader only
# ever sees fully-committed snapshots (a mid-run kill leaves a tmp dir
# the next writer clears).  ``read_table_version`` with no version is
# "latest committed" — the AS OF read is just a different directory,
# which is the whole point: old snapshots stay byte-stable after new
# writes (verified by test and the documents_time_travel oracle).


def _version_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v{version:06d}")


def list_table_versions(root: str) -> list[int]:
    """Committed (manifested) versions, ascending."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if not (name.startswith("v") and name[1:].isdigit()):
            continue
        p = os.path.join(root, name, "MANIFEST.json")
        try:
            with open(p) as f:
                if json.load(f).get("complete"):
                    out.append(int(name[1:]))
        except (OSError, json.JSONDecodeError):
            continue
    return sorted(out)


def write_table_version(ds: rd.Dataset, root: str) -> int:
    """Append ``ds`` as the next immutable snapshot version of the
    table at ``root`` and return its version number.  Atomic: stream
    to ``data.tmp``, rename, then manifest — concurrent readers never
    observe a partial snapshot."""
    os.makedirs(root, exist_ok=True)
    versions = list_table_versions(root)
    version = (versions[-1] if versions else 0) + 1
    vdir = _version_dir(root, version)
    data_dir = os.path.join(vdir, "data")
    tmp_dir = os.path.join(vdir, "data.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    ds.write_parquet(tmp_dir)
    shutil.rmtree(data_dir, ignore_errors=True)
    os.replace(tmp_dir, data_dir)
    rows = sum(
        pq.read_metadata(os.path.join(data_dir, f)).num_rows
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    with open(os.path.join(vdir, "MANIFEST.json"), "w") as f:
        json.dump(
            {
                "complete": True,
                "version": version,
                "rows": rows,
                "parent": versions[-1] if versions else 0,
            },
            f,
        )
    return version


def read_table_version(root: str, version: int | None = None) -> rd.Dataset:
    """Read one committed snapshot (``version=None`` -> latest).  The
    AS OF read: old versions remain readable, byte-stable, after any
    number of newer commits."""
    versions = list_table_versions(root)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"version {version} not committed under {root} (have {versions})"
        )
    return rd.read_parquet(os.path.join(_version_dir(root, version), "data"))
