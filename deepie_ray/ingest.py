"""Incremental corpus ingestion — the "ingest day 2 without re-reading
day 1" operational layer of a training-data pipeline, as three index
families over one generational state store:

- ``ingest_documents``        exact content dedup (md5 fingerprints)
- ``ingest_documents_neardup``  MinHash-LSH near-dedup (512-byte
                                signatures; estimate verify)
- ``ingest_kg``               incremental KG construction (additive
                                node/edge generations)
- ``compact_index``           merge generations, crash-safe

State layout (append-only, crash-safe; one subdir per index kind —
``fingerprints`` / ``minhash`` / ``kg_nodes`` / ``kg_edges``):

    state_root/<kind>/gen-<id>/*.parquet   one dir per accepted
                                           ingest generation
    state_root/<kind>/gen-<id>.json        commit marker

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


def _gen_files(gen_dirs: list[str]) -> list[str]:
    """Parquet files across generation dirs — ``read_parquet`` accepts
    a list of FILES but chokes on a list of DIRECTORIES (it opens the
    non-first entries as files)."""
    import glob

    return sorted(
        f for d in gen_dirs for f in glob.glob(os.path.join(d, "*.parquet"))
    )


def read_fingerprint_index(state_root: str) -> rd.Dataset | None:
    """The union of all committed generations; None when no ingest has
    happened yet (the id column's type comes from the first committed
    batch, so there is no schema to synthesize an empty table from)."""
    gens = committed_generations(state_root)
    if not gens:
        return None
    return rd.read_parquet(_gen_files(gens))


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


def compact_index(state_root: str, kind: str = "fingerprints") -> int:
    """Merge all committed generations of an index into ONE (the
    operational countermeasure to unbounded generation growth: every
    ingest otherwise adds a dir, and the anti-join reads them all).
    Crash-safe in the same commit discipline: the merged generation is
    written to a tmp dir, renamed, and MARKED before the old markers
    are removed — a crash at any point leaves either the old
    generations (merge invisible) or the new one plus stale data dirs
    whose markers are gone (ignored by readers, re-collectable).  The
    one crash window where BOTH old and new markers exist merely
    duplicates index rows, which every consumer tolerates: the exact
    path anti-joins on distinct fingerprints, the near-dup path
    dedups candidate ids.  Returns the number of generations merged
    (0/1 = nothing to do).

    Scale shape: one streaming read -> write_parquet; no shuffle (the
    rows are already distinct across generations by the ingest
    invariant), no driver materialization."""
    kind_dirs = _committed_dirs(state_root, kind)
    if len(kind_dirs) <= 1:
        return len(kind_dirs)
    merged = rd.read_parquet(_gen_files(kind_dirs))
    root = os.path.join(state_root, kind)
    gen_id = uuid.uuid4().hex[:12]
    gen_dir = os.path.join(root, f"gen-{gen_id}")
    tmp = gen_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    n = merged.count()
    merged.write_parquet(tmp)
    os.replace(tmp, gen_dir)
    with open(gen_dir + ".json", "w") as f:
        json.dump({"rows": n, "gen": gen_id, "compacted": len(kind_dirs)}, f)
    # retire the inputs: markers first (atomic visibility flip), then data
    for d in kind_dirs:
        os.remove(d + ".json")
    for d in kind_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return len(kind_dirs)


# ------------------------------------------------- incremental NEAR-dedup


def _commit_generation(state_root: str, kind: str, ds: rd.Dataset, n_rows: int) -> None:
    """Write ``ds`` as a new committed generation under
    ``state_root/<kind>/`` (tmp dir -> atomic rename -> marker)."""
    root = os.path.join(state_root, kind)
    os.makedirs(root, exist_ok=True)
    gen_id = uuid.uuid4().hex[:12]
    gen_dir = os.path.join(root, f"gen-{gen_id}")
    tmp = gen_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    os.replace(tmp, gen_dir)
    with open(gen_dir + ".json", "w") as f:
        json.dump({"rows": n_rows, "gen": gen_id}, f)


def _committed_dirs(state_root: str, kind: str) -> list[str]:
    root = os.path.join(state_root, kind)
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        if name.startswith("gen-") and name.endswith(".json"):
            gen_dir = os.path.join(root, name[: -len(".json")])
            if os.path.isdir(gen_dir):
                out.append(gen_dir)
    return out


def ingest_documents_neardup(
    new_docs: rd.Dataset,
    state_root: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> rd.Dataset:
    """Incremental MinHash-LSH NEAR-dedup ingest: reject new docs whose
    content near-duplicates (estimated Jaccard >= ``threshold``)
    anything accepted by a PRIOR ingest, keep one representative (min
    id) per within-batch near-dup cluster, and commit the accepted
    docs' signatures as a new generation.  Returns the accepted rows.

    The persistent index stores ONLY 512-byte minhash signatures per
    accepted doc (``dedup.minhash_sig_batch``); band rows are
    re-derived from signatures at read time (16 int64 mixes/doc), and
    verification is signature-lane agreement (``sig_agreement_verify``
    — the exact-Jaccard verify of ``minhash_dedup`` is impossible
    against an index that does not store shingle sets; same trade as
    datasketch's persistent MinHashLSH).  Rejection is cluster-level:
    if ANY member of a within-batch cluster matches the index, the
    whole cluster is rejected — its content family is already
    represented.

    Scale shape: every shuffle moves (band, band_hash, id) or
    (id, 512-byte sig) rows, never document bodies; the index streams
    from parquet generations (no driver materialization); the
    accepted-id algebra is semi/anti joins on narrow id columns.
    """
    from .ops import dedup

    sigs_new = new_docs.map_batches(
        lambda t: dedup.minhash_sig_batch(t, text_col, id_col),
        batch_format="pyarrow",
    ).materialize()  # consumed by bands, two verifies, and the commit
    id_type = joins._field_type(new_docs, id_col)

    def bands_part(t):
        import numpy as np
        import pyarrow as pa

        b = dedup.bands_from_sigs(t, id_col)
        bh = b["band_hash"].to_numpy()
        part = (bh & (2**62 - 1)) % num_partitions
        return b.append_column(
            "part", pa.array(part.astype(np.int64), pa.int64())
        )

    bands_new = sigs_new.map_batches(bands_part, batch_format="pyarrow")

    # -- within-batch clusters (part-colocate pair generation, then
    # signature-agreement verify and connected components)
    def pairs_group(df):
        return dedup._bucket_pairs_table(
            df["band"].to_numpy(),
            df["band_hash"].to_numpy(),
            df[id_col].to_numpy(),
            id_type,
        ).to_pandas()

    cands = bands_new.groupby("part").map_groups(
        pairs_group, batch_format="pandas"
    )
    edges = dedup.sig_agreement_verify(
        cands, sigs_new, sigs_new, id_col, threshold, num_partitions
    )
    clusters = dedup.components_from_pairs(
        edges, id_type, num_partitions
    ).materialize()  # (doc_id, cluster_id) for clustered docs only

    import pyarrow as pa
    import pyarrow.compute as pc

    all_ids = sigs_new.select_columns([id_col])
    nonroots = clusters.map_batches(
        lambda t: pa.table(
            {id_col: t.filter(pc.not_equal(t[id_col], t["cluster_id"]))[id_col]}
        ),
        batch_format="pyarrow",
    )
    # rejected ids accumulate (narrow id rows, union is shuffle-free);
    # ONE anti join at the end instead of one per rejection source —
    # join fixed costs dominate this pipeline's wall time
    rejected = nonroots

    # -- vs prior generations: bands join -> candidate (new, old) pairs
    gen_dirs = _committed_dirs(state_root, "minhash")
    if gen_dirs:
        sigs_old = rd.read_parquet(_gen_files(gen_dirs))
        bands_old = sigs_old.map_batches(
            lambda t: dedup.bands_from_sigs(t, id_col).rename_columns(
                ["band", "band_hash", "old_id"]
            ),
            batch_format="pyarrow",
        )
        xpairs = (
            bands_new.drop_columns(["part"])
            .join(
                bands_old,
                join_type="inner",
                num_partitions=num_partitions,
                on=("band", "band_hash"),
            )
            .map_batches(
                lambda t: pa.table(
                    {"id_a": t[id_col], "id_b": t["old_id"]}
                ).group_by(["id_a", "id_b"]).aggregate([]),
                batch_format="pyarrow",
            )
        )
        matched = dedup.sig_agreement_verify(
            xpairs,
            sigs_new,
            sigs_old.map_batches(
                lambda t: t.select([id_col, "sig", "n_sh"]),
                batch_format="pyarrow",
            ),
            id_col,
            threshold,
            num_partitions,
        ).map_batches(
            lambda t: pa.table({id_col: t["id_a"]}), batch_format="pyarrow"
        ).materialize()  # consumed by the root join AND the anti join
        # cluster-level rejection: matched members name their ROOT too
        if clusters.count() > 0 and matched.limit(1).count() > 0:
            matched_roots = joins.hash_join(
                matched.repartition(num_partitions),
                clusters.repartition(num_partitions),
                on=id_col,
                num_partitions=num_partitions,
            ).map_batches(
                lambda t: pa.table({id_col: t["cluster_id"]}),
                batch_format="pyarrow",
            )
            rejected = rejected.union(matched_roots)
        rejected = rejected.union(matched)

    kept = joins.anti_join(
        all_ids, rejected, on=id_col, num_partitions=num_partitions
    ).materialize()  # consumed twice: commit + return join
    accepted_sigs = joins.semi_join(
        sigs_new, kept, on=id_col, num_partitions=num_partitions
    ).materialize()
    n_acc = accepted_sigs.count()
    if n_acc > 0:
        _commit_generation(state_root, "minhash", accepted_sigs, n_acc)
    return joins.semi_join(
        new_docs, kept, on=id_col, num_partitions=num_partitions
    )


# --------------------------------------------------- incremental KG build


def ingest_kg(
    docs: rd.Dataset, state_root: str, model_name: str = "multinn"
) -> dict:
    """Incremental knowledge-graph construction: extract + link THIS
    batch of documents only (``pipeline.linked_triples``), aggregate
    its (nodes, edges), and commit both as new generations under
    ``state_root/kg_{nodes,edges}/`` — day 2 extends the graph without
    re-extracting day 1.  Edge weights and node mention counts are
    ADDITIVE across generations, so the merged view
    (``read_kg_graph``) is one grouped sum over the generation union;
    ``compact_index(state, "kg_edges"/"kg_nodes")`` preserves it
    byte-for-byte because concatenation commutes with the sum.

    Content dedup is NOT this layer's job — compose with
    ``ingest_documents`` (exact) / ``ingest_documents_neardup`` (LSH)
    upstream so re-shipped docs never reach extraction.  Canonical ids
    come from each batch's own alias/canon maps (documented drift;
    periodic re-canonicalization = recompute over the merged nodes).
    """
    from . import pipeline

    linked = pipeline.linked_triples(docs, model_name=model_name)
    nodes, edges = pipeline.build_graph(linked)
    nodes = nodes.materialize()
    edges = edges.materialize()
    n_nodes, n_edges = nodes.count(), edges.count()
    if n_edges > 0:
        _commit_generation(state_root, "kg_edges", edges, n_edges)
    if n_nodes > 0:
        _commit_generation(state_root, "kg_nodes", nodes, n_nodes)
    return {"nodes": nodes, "edges": edges}


def read_kg_graph(state_root: str) -> dict:
    """Merged graph view over all committed KG generations ->
    {'nodes', 'edges'} (None values when nothing is committed).  One
    grouped sum each; entity types recompute from the winning (min)
    surface so node merges stay deterministic."""
    from ray.data.aggregate import Min, Sum

    import pyarrow as pa
    import pyarrow.compute as pc

    from .features import entity_type_of

    e_dirs = _committed_dirs(state_root, "kg_edges")
    n_dirs = _committed_dirs(state_root, "kg_nodes")
    edges = nodes = None
    if e_dirs:
        edges = (
            rd.read_parquet(_gen_files(e_dirs))
            .groupby(["subj_entity", "pred_label", "obj_entity"])
            .aggregate(Sum("weight", alias_name="weight"))
        )
    if n_dirs:
        raw = (
            rd.read_parquet(_gen_files(n_dirs))
            .groupby("entity_id")
            .aggregate(
                Min("surface", alias_name="surface"),
                Sum("n_mentions", alias_name="n_mentions"),
            )
        )

        def retype(t: pa.Table) -> pa.Table:
            types = pa.array(
                [entity_type_of(s) or "Other" for s in t["surface"].to_pylist()],
                pa.string(),
            )
            return pa.table(
                {
                    "entity_id": t["entity_id"],
                    "surface": t["surface"],
                    "entity_type": types,
                    "n_mentions": pc.cast(t["n_mentions"], pa.int64()),
                }
            )

        nodes = raw.map_batches(retype, batch_format="pyarrow")
    return {"nodes": nodes, "edges": edges}
