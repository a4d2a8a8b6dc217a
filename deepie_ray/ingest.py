"""Incremental corpus ingestion: dedup a NEW batch of documents both
within itself and against the fingerprint index persisted by prior
ingests — the "ingest day 2 without re-reading day 1" operational path
of a training-data pipeline.

State layout (append-only, crash-safe):

    state_root/fingerprints/gen-<id>/*.parquet   one dir per accepted
                                                 ingest generation
    state_root/fingerprints/gen-<id>.json        commit marker

A generation is written to ``gen-<id>.tmp`` and atomically renamed;
the commit marker is written only after the rename, and readers ignore
any ``gen-*`` directory without its marker — a crashed ingest leaves
garbage that is never read and is overwritten-safe.  At 100 TB the
index is (16-byte fingerprint, int64 id) rows — ~0.25% of corpus
bytes — and both dedup joins are hash-partitioned on the fingerprint,
so no task ever holds the index; re-ingesting a batch is a no-op
(idempotent by content).

Reference parity: the reference engine has no incremental path (one
preprocessing pass per run, rnnRE/rnn_process_onlyExtra.py); this is
engine-brief surface.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import ray.data as rd

from .ops import dedup, joins

def _fp_root(state_root: str) -> str:
    return os.path.join(state_root, "fingerprints")


def committed_generations(state_root: str) -> list[str]:
    """Data dirs of committed generations (marker present), oldest
    first by generation id."""
    root = _fp_root(state_root)
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        if name.startswith("gen-") and name.endswith(".json"):
            gen_dir = os.path.join(root, name[: -len(".json")])
            if os.path.isdir(gen_dir):
                out.append(gen_dir)
    return out


def read_fingerprint_index(state_root: str) -> rd.Dataset | None:
    """The union of all committed generations; None when no ingest has
    happened yet (the id column's type comes from the first committed
    batch, so there is no schema to synthesize an empty table from)."""
    gens = committed_generations(state_root)
    if not gens:
        return None
    return rd.read_parquet(gens)


def ingest_documents(
    new_docs: rd.Dataset,
    state_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> rd.Dataset:
    """Ingest a batch: drop rows whose content fingerprint already
    exists in the index, keep ONE row per new distinct content (min
    id — same rule as ``dedup.exact_dedup_keys``), commit the accepted
    fingerprints as a new generation, and return the accepted rows
    (full input schema).

    Shuffle budget: one groupby for the within-batch dedup, one
    hash-partitioned anti join against the index, one semi join back
    to the batch — all moving (fingerprint, id) rows, never document
    bodies."""
    # within-batch: one key row per distinct new content (min id)
    batch_keys = dedup.exact_dedup_keys(
        new_docs, text_col=text_col, id_col=id_col
    ).select_columns(["fingerprint", id_col])

    # vs prior generations: content seen in ANY earlier ingest loses
    index = read_fingerprint_index(state_root)
    fresh = (
        batch_keys
        if index is None
        else joins.anti_join(
            batch_keys, index, on="fingerprint", num_partitions=num_partitions
        )
    ).materialize()  # consumed twice: generation write + semi join

    # commit the new generation BEFORE returning rows, so a consumer
    # crash after ingest_documents() cannot double-accept content
    gen_id = uuid.uuid4().hex[:12]
    root = _fp_root(state_root)
    os.makedirs(root, exist_ok=True)
    gen_dir = os.path.join(root, f"gen-{gen_id}")
    n_fresh = fresh.count()
    if n_fresh > 0:
        tmp = gen_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        fresh.write_parquet(tmp)
        os.replace(tmp, gen_dir)
        with open(gen_dir + ".json", "w") as f:
            json.dump({"rows": n_fresh, "gen": gen_id}, f)

    # accepted full rows: the batch semi-joined to the fresh min-ids
    return joins.semi_join(
        new_docs,
        fresh,
        on=id_col,
        num_partitions=num_partitions,
    )
