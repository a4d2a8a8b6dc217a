"""Flagship KG-construction pipeline (BASELINE.json north_rule):

    read documents (interleaved text+media spans)
      -> map_batches(ExtractPairs)            stateless-ish actor pool
      -> map_batches(MultiNNScorer)           stateful actor pool (weights)
      -> filter NONE                          emitted triples
      -> [checkpoint]
      -> distinct surfaces (Dataset) -> GATE on surface count:
           <= gate: alias map + union-find CC on driver, ray.put once
                    -> map_batches(LinkEntities)   broadcast map-join
           >  gate: distributed min-label CC + hash-partitioned joins
                    (linked_triples_join — nothing driver-materialized)
      -> groupby dedup                        nodes + edges tables

The stream stays lazy end-to-end; the only materialization points are
(a) the emitted-triples checkpoint (consumed by three downstream
branches — re-reading a checkpoint beats re-running parse+score three
times, and it is the resume point), and (b) the vocabulary-bounded
distinct-surface set (a driver list only BELOW the broadcast gate; a
Dataset above it).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from .features import entity_type_of
from .ops.agg import grouped_count
from .ops.canon import connected_components_driver
from .ops.link import LinkEntities, build_alias_map
from .ops.linkref import component_edges
from .ops.parse import ExtractPairs, extract_pairs_fn  # noqa: F401 (ExtractPairs is the pooled variant)
from .ops.score import MultiNNScorer, drop_none
from .synth import interleave_batch


def _default_blocks() -> int:
    """Enough input blocks to keep every core busy (small corpora ship
    as a single parquet row-group = a single block = zero parallelism),
    few enough that downstream shuffles stay cheap (tuning.py)."""
    from .tuning import read_blocks

    return read_blocks()


def read_documents(sf_dir: str, num_blocks: int | None = None) -> rd.Dataset:
    """Driver flat documents parquet -> interleaved-span documents.

    Column-pruned read (only doc_id/text leave storage); the
    interleave transform is the deterministic synth mapping
    (synth.py) standing in for a real Lance interleaved corpus.
    """
    from .tuning import override_blocks_for

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(
        path,
        columns=["doc_id", "text"],
        override_num_blocks=(
            num_blocks if num_blocks is not None else override_blocks_for(path)
        ),
    )
    return ds.map_batches(interleave_batch, batch_format="pyarrow")


# Flagship actor pools: their constructors hold object-store refs
# (weights broadcast, counter handle) and Ray Data ships the transform
# closure through the object store, so in-place actor restart could not
# reconstruct them — core_worker logs an E-level warning per pool
# (ray-project/ray#53727).  Pin max_restarts=0: failure recovery is the
# streaming executor's TASK retry on a fresh pool actor, not in-place
# actor restart, so nothing is lost (round-3 verdict #8).
from .tuning import POOL_REMOTE_ARGS  # noqa: E402 (single shared definition)


def extract_triples(
    docs: rd.Dataset,
    weights_ref=None,
    parse_concurrency: int | tuple = (1, 16),
    score_concurrency: int | tuple = (1, 4),
    score_batch_size: int = 4096,
    with_prob: bool = True,
    counter=None,
) -> rd.Dataset:
    """documents -> scored pairs (TRIPLES schema, NONE rows included).

    Parse and scoring are SEPARATE actor pools on purpose: Ray fuses a
    task stage into a downstream actor-pool stage, which would make the
    scorer's pair-level batch_size apply to *documents* (measured: the
    whole sf0.1 corpus collapsed to 2 tasks).  Two distinct pools keep
    the stage boundary, so parse parallelism is doc-batch-sized and
    scoring batches are pair-sized.

    ``counter``: optional ``CounterActor`` handle — wraps both pools in
    ``CountingStage`` so lineage gets real per-stage row counts.
    """
    from .ops.metrics import CountingStage

    if counter is None:
        pairs = docs.map_batches(
            ExtractPairs,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=parse_concurrency,
            **POOL_REMOTE_ARGS,
        )
        return pairs.map_batches(
            MultiNNScorer,
            fn_constructor_kwargs={"weights_ref": weights_ref, "with_prob": with_prob},
            batch_format="pyarrow",
            batch_size=score_batch_size,
            concurrency=score_concurrency,
            **POOL_REMOTE_ARGS,
        )
    pairs = docs.map_batches(
        CountingStage,
        fn_constructor_kwargs={
            "inner_cls": ExtractPairs, "stage": "parse", "counter": counter,
        },
        batch_format="pyarrow",
        batch_size=256,
        concurrency=parse_concurrency,
        **POOL_REMOTE_ARGS,
    )
    return pairs.map_batches(
        CountingStage,
        fn_constructor_kwargs={
            "inner_cls": MultiNNScorer,
            "stage": "score",
            "counter": counter,
            "inner_kwargs": {"weights_ref": weights_ref, "with_prob": with_prob},
        },
        batch_format="pyarrow",
        batch_size=score_batch_size,
        concurrency=score_concurrency,
        **POOL_REMOTE_ARGS,
    )


def extract_triples_model(
    docs: rd.Dataset,
    model_name: str = "multinn",
    parse_concurrency: int | tuple = (1, 16),
    score_concurrency: int | tuple = (1, 4),
    score_batch_size: int = 4096,
    with_prob: bool = True,
    counter=None,
) -> rd.Dataset:
    """Extraction with a registry-selected scorer (§2.10: explicit
    name->class registry; encoder variants consume the token-id pairs
    table).  Same contract as ``extract_triples``: ``with_prob=False``
    skips building the prob list column entirely, ``counter`` wraps
    both pools in ``CountingStage`` for real lineage counts."""
    from .ops.metrics import CountingStage
    from .ops.parse import extract_pairs_tokens_fn
    from .ops.score import MODELS, NEEDS_TOKENS

    cls = MODELS[model_name]

    if model_name in NEEDS_TOKENS:
        class ParseStage:
            def __call__(self, batch):
                return extract_pairs_tokens_fn(batch)
    else:
        ParseStage = ExtractPairs

    class ScoreStage:
        def __init__(self):
            self.inner = cls()
            # variant scorers read this via getattr in their _emit call
            self.inner.with_prob = with_prob

        def __call__(self, batch):
            return self.inner(batch)

    if counter is None:
        parse_fn, parse_ctor = ParseStage, None
        score_fn, score_ctor = ScoreStage, None
    else:
        parse_fn = score_fn = CountingStage
        parse_ctor = {"inner_cls": ParseStage, "stage": "parse", "counter": counter}
        score_ctor = {"inner_cls": ScoreStage, "stage": "score", "counter": counter}

    pairs = docs.map_batches(
        parse_fn, fn_constructor_kwargs=parse_ctor,
        batch_format="pyarrow", batch_size=256,
        concurrency=parse_concurrency,
        **POOL_REMOTE_ARGS,
    )
    return pairs.map_batches(
        score_fn, fn_constructor_kwargs=score_ctor,
        batch_format="pyarrow",
        batch_size=score_batch_size,
        concurrency=score_concurrency,
        **POOL_REMOTE_ARGS,
    )


def emitted_triples(docs: rd.Dataset, weights_ref=None, **kw) -> rd.Dataset:
    return extract_triples(docs, weights_ref, **kw).map_batches(
        drop_none, batch_format="pyarrow"
    )


def extract_triples_tasks(
    docs: rd.Dataset, weights_ref, batch_size: int = 256, with_prob: bool = False
) -> rd.Dataset:
    """All-stateless-task variant of the extraction pipeline (parse +
    score + filter fused into one task stage; weights read zero-copy
    from the object store per task).  Identical output to
    ``emitted_triples`` (modulo the optional prob column).  Used for
    scaling measurements: no actor-pool spawn latency, so wall time
    tracks compute, and task elasticity follows the CPU count exactly.
    ``with_prob`` defaults off: the probability sink is the one
    consumer of that column, and on a single shared plasma store the
    extra ~44 B/row is the measured 8->32-cpu scaling bottleneck.
    """
    import ray

    from .ops.parse import extract_pairs_fn
    from .ops.score import score_batch, score_batch_emitted_narrow

    if with_prob:
        def fused(batch: pa.Table) -> pa.Table:
            pairs = extract_pairs_fn(batch)
            scored = score_batch(ray.get(weights_ref), pairs, True)
            return scored.filter(pc.not_equal(scored["pred_label"], "NONE"))
    else:
        def fused(batch: pa.Table) -> pa.Table:
            pairs = extract_pairs_fn(batch)
            return score_batch_emitted_narrow(ray.get(weights_ref), pairs)

    return docs.map_batches(fused, batch_format="pyarrow", batch_size=batch_size)


def replicate_documents(docs: rd.Dataset, factor: int) -> rd.Dataset:
    """Deterministically replicate a corpus ``factor``x with distinct
    doc ids (bench-scale stand-in for a larger corpus: identical
    per-doc work profile, factor-x total work)."""

    def rep(batch: pa.Table) -> pa.Table:
        tables = []
        for r in range(factor):
            ids = pc.binary_join_element_wise(
                batch["doc_id"], pa.scalar(f"r{r}"), "#"
            )
            tables.append(pa.table({"doc_id": ids, "spans": batch["spans"]}))
        return pa.concat_tables(tables)

    return docs.map_batches(rep, batch_format="pyarrow")


def _surface_batch(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "surface": pa.concat_arrays(
                [t["subj"].combine_chunks(), t["obj"].combine_chunks()]
            )
        }
    )


def distinct_surfaces_ds(triples: rd.Dataset) -> rd.Dataset:
    """Distinct mention surfaces as a DATASET (surface) — combiner +
    groupby (A4 pattern); stays distributed so the caller can gate on
    its count before deciding to materialize a driver list."""
    return (
        triples.map_batches(_surface_batch, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table({"surface": pc.unique(t["surface"].combine_chunks())}),
            batch_format="pyarrow",
        )
        .groupby("surface")
        .count()
        .map_batches(
            lambda t: pa.table({"surface": t["surface"]}), batch_format="pyarrow"
        )
    )


def distinct_surfaces(triples: rd.Dataset) -> list[str]:
    """Distinct mention surfaces via combiner + groupby (A4 pattern,
    deterministic sorted order — SURVEY §7.6.1).  Driver list — only
    correct below the canonicalization broadcast gate."""
    return sorted(r["surface"] for r in distinct_surfaces_ds(triples).take_all())


def _canon_broadcast_max() -> int:
    """Distinct-surface bound for the broadcast link/canon path.  Below
    it the alias + canonical maps are driver dicts broadcast once
    (vocabulary-bounded — the measured-fast path at bench scale);
    above it `linked_triples_join` runs distributed CC + hash joins.
    Env-overridable so tests force the distributed path."""
    import os

    return int(os.environ.get("DEEPIE_CANON_BROADCAST_MAX", "2000000"))


def linked_triples_join(
    triples: rd.Dataset,
    surfaces: rd.Dataset | None = None,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Scale path for link + canonicalize (round-4 verdict #1): no
    driver list, no broadcast dict.

    * alias side: ``surface_link_ds`` — (surface, entity_id,
      link_score) stays a hash-partitioned Dataset;
    * canonicalization: distributed min-label connected components
      (``ops/canon.connected_components``) over the candidate-edge
      Dataset, then ONE left-outer join alias->labels (entities in no
      component keep their own id via coalesce);
    * rewrite: TWO hash-partitioned inner joins of the triples stream
      against the canonical alias table (subj, then obj) — the
      100-TB replacement for the broadcast map-join, at the cost of
      shuffling the triples stream twice.

    Output is row-for-row equal to the broadcast ``LinkEntities`` path
    up to row order (joins shuffle; pytest pins sorted equality).
    """
    from .ops.canon import connected_components
    from .ops.link import candidate_edges_ds, surface_link_ds

    if surfaces is None:
        surfaces = distinct_surfaces_ds(triples)
    surfaces = surfaces.materialize()

    alias = surface_link_ds(surfaces).repartition(num_partitions).materialize()
    edges = candidate_edges_ds(surfaces).materialize()
    if edges.count() > 0:
        labels = connected_components(
            edges, num_partitions=num_partitions
        ).repartition(num_partitions)
        joined = alias.join(
            labels,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("entity_id",),
            right_on=("node",),
        )
        alias = joined.map_batches(
            lambda t: pa.table(
                {
                    "surface": t["surface"],
                    "entity_id": pc.coalesce(
                        t["label"].combine_chunks().cast(pa.string()),
                        t["entity_id"].combine_chunks(),
                    ),
                    "link_score": t["link_score"],
                }
            ),
            batch_format="pyarrow",
        )
    alias = alias.repartition(num_partitions).materialize()

    cols = [c for c in triples.schema().names if c != "prob"]
    t = triples
    if "prob" in triples.schema().names:
        t = t.drop_columns(["prob"])
    t = t.repartition(num_partitions)

    subj_side = alias.map_batches(
        lambda t: pa.table(
            {
                "surface": t["surface"],
                "subj_entity": t["entity_id"],
                "link_score": t["link_score"],
            }
        ),
        batch_format="pyarrow",
    ).repartition(num_partitions)
    obj_side = alias.map_batches(
        lambda t: pa.table(
            {"surface": t["surface"], "obj_entity": t["entity_id"]}
        ),
        batch_format="pyarrow",
    ).repartition(num_partitions)

    out = t.join(
        subj_side,
        join_type="inner",
        num_partitions=num_partitions,
        on=("subj",),
        right_on=("surface",),
    ).join(
        obj_side,
        join_type="inner",
        num_partitions=num_partitions,
        on=("obj",),
        right_on=("surface",),
    )
    # broadcast-path column order: triples cols + appended link cols
    order = cols + ["subj_entity", "obj_entity", "link_score"]
    return out.map_batches(
        lambda tb: tb.select(order), batch_format="pyarrow"
    )


class _Passthrough:
    """Identity batch fn — lets CountingStage count a join-produced
    stream (the distributed link path has no single actor stage to
    wrap, so lineage counts ride a passthrough count stage)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch


def link_and_canon(
    triples: rd.Dataset,
    counter=None,
    broadcast_max: int | None = None,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Gated link + canonicalize (round-4 verdict #1).

    Counts distinct surfaces first (one cheap aggregate over the
    vocabulary-bounded surface set).  At or below the gate
    (``DEEPIE_CANON_BROADCAST_MAX``, default 2M): today's measured-fast
    path — driver alias dict + union-find canon map, ``ray.put`` once,
    broadcast map-join in the ``LinkEntities`` actor pool.  Above it:
    ``linked_triples_join`` — distributed min-label connected
    components + hash-partitioned joins, nothing driver-materialized
    beyond per-round convergence scalars.  Both paths are pinned
    row-equal by pytest (sorted)."""
    surf_ds = distinct_surfaces_ds(triples).materialize()
    limit = _canon_broadcast_max() if broadcast_max is None else broadcast_max
    if surf_ds.count() > limit:
        linked = linked_triples_join(
            triples, surfaces=surf_ds, num_partitions=num_partitions
        )
        if counter is not None:
            from .ops.metrics import CountingStage

            linked = linked.map_batches(
                CountingStage,
                fn_constructor_kwargs={
                    "inner_cls": _Passthrough, "stage": "link", "counter": counter,
                },
                batch_format="pyarrow",
                batch_size=8192,
                concurrency=(1, 4),
                **POOL_REMOTE_ARGS,
            )
        return linked

    surfaces = sorted(r["surface"] for r in surf_ds.take_all())
    alias_ref = ray.put(build_alias_map(surfaces))
    canon_ref = ray.put(connected_components_driver(component_edges(surfaces)))
    link_kwargs: dict = {"alias_ref": alias_ref, "canon_ref": canon_ref}
    if counter is not None:
        from .ops.metrics import CountingStage

        link_fn, link_ctor = CountingStage, {
            "inner_cls": LinkEntities, "stage": "link",
            "counter": counter, "inner_kwargs": link_kwargs,
        }
    else:
        link_fn, link_ctor = LinkEntities, link_kwargs
    return triples.map_batches(
        link_fn,
        fn_constructor_kwargs=link_ctor,
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 8),
        **POOL_REMOTE_ARGS,
    )


def build_graph(
    linked: rd.Dataset,
) -> tuple[rd.Dataset, rd.Dataset]:
    """linked triples -> (nodes, edges) deduplicated tables (O5).

    Both dedups are combiner-first grouped aggregations; the hot
    canonical entity's partial rows are bounded by block count, not row
    count (ops/agg.py).
    """
    edges = grouped_count(
        linked, ["subj_entity", "pred_label", "obj_entity"], "weight"
    )

    def mention_rows(t: pa.Table) -> pa.Table:
        ent = pa.concat_arrays(
            [t["subj_entity"].combine_chunks(), t["obj_entity"].combine_chunks()]
        )
        surf = pa.concat_arrays(
            [t["subj"].combine_chunks(), t["obj"].combine_chunks()]
        )
        g = pa.table({"entity_id": ent, "surface": surf}).group_by(
            ["entity_id"]
        ).aggregate([("surface", "min"), ([], "count_all")])
        return pa.table(
            {
                "entity_id": g["entity_id"],
                "surface": g["surface_min"],
                "n_mentions": g["count_all"],
            }
        )

    node_partials = linked.map_batches(mention_rows, batch_format="pyarrow")
    nodes = node_partials.groupby("entity_id").aggregate(
        Min("surface", alias_name="surface"),
        Sum("n_mentions", alias_name="n_mentions"),
    )

    def add_type(t: pa.Table) -> pa.Table:
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

    nodes = nodes.map_batches(add_type, batch_format="pyarrow")
    return nodes, edges


def linked_triples(
    docs: rd.Dataset, model_name: str = "multinn", **extract_kw
) -> rd.Dataset:
    """docs -> linked triples (materialized) — the extract+link core of
    ``run_kg`` exposed over an arbitrary docs Dataset (no sf_dir, no
    checkpoint/counter plumbing) for incremental KG ingestion
    (ingest.ingest_kg).  Alias/canon maps are built from THIS batch's
    surfaces — canonical ids can drift across ingest batches, which is
    inherent to incremental canonicalization (periodic re-canon = the
    compaction story)."""
    extract_kw.setdefault("with_prob", False)
    if model_name == "multinn":
        triples = emitted_triples(docs, **extract_kw)
    else:
        triples = extract_triples_model(docs, model_name, **extract_kw).map_batches(
            drop_none, batch_format="pyarrow"
        )
    triples = triples.materialize()
    return link_and_canon(triples).materialize()


def run_kg(
    sf_dir: str,
    checkpoint_dir: str | None = None,
    model_name: str = "multinn",
    **extract_kw,
) -> dict[str, rd.Dataset]:
    """Full pipeline.  Returns {'triples', 'linked', 'nodes', 'edges'}.

    With ``checkpoint_dir`` the emitted triples are written to
    partitioned parquet and re-read (resume point); without it they are
    pinned in the object store (small-scale runs).

    ``model_name`` selects the extraction scorer from the registry
    (ops/score.MODELS — the engine's counterpart of the reference's
    evaluate.py model-selector grammar); the default is the flagship
    MultiNN path, which also supports counters/with_prob via
    ``extract_kw``.
    """
    docs = read_documents(sf_dir)
    # narrow path: link/canon/graph never read prob (S7 is a separate sink)
    extract_kw.setdefault("with_prob", False)
    counter = None
    if checkpoint_dir:
        # real per-stage row counters for the lineage store (north rule)
        from .ops.metrics import CounterActor

        counter = CounterActor.remote()
        extract_kw.setdefault("counter", counter)
    if model_name == "multinn":
        triples = emitted_triples(docs, **extract_kw)
    else:
        from .ops.score import drop_none

        triples = extract_triples_model(docs, model_name, **extract_kw).map_batches(
            drop_none, batch_format="pyarrow"
        )
    if checkpoint_dir:
        from .checkpoint import checkpoint_dataset

        triples = checkpoint_dataset(
            triples, checkpoint_dir, "triples",
            counter=counter, rows_in_stage="parse",
        )
    else:
        triples = triples.materialize()

    linked = link_and_canon(triples, counter=counter)
    if checkpoint_dir:
        from .checkpoint import checkpoint_dataset

        linked = checkpoint_dataset(
            linked, checkpoint_dir, "linked",
            counter=counter, rows_in_stage="link",
        )
    else:
        linked = linked.materialize()
    nodes, edges = build_graph(linked)
    return {"triples": triples, "linked": linked, "nodes": nodes, "edges": edges}


def materialize_graph(
    sf_dir: str, out_dir: str, **extract_kw
) -> dict[str, str]:
    """North-rule sink: run the pipeline and write deduplicated
    triples/nodes/edges as partitioned parquet checkpoints (atomic
    tmp-dir rename + manifest + lineage per stage) under ``out_dir``.
    A rerun after failure skips every completed stage."""
    from .checkpoint import checkpoint_dataset

    out = run_kg(sf_dir, checkpoint_dir=out_dir, **extract_kw)
    checkpoint_dataset(out["nodes"], out_dir, "nodes")
    checkpoint_dataset(out["edges"], out_dir, "edges")
    import os

    return {
        name: os.path.join(out_dir, name, "data")
        for name in ("triples", "linked", "nodes", "edges")
    }
