"""Stage 3: entity linking as a broadcast map-join (SURVEY §2.5 J4).

Pattern: the alias dictionary (small side) is materialized once on the
driver from the corpus' *distinct* mention surfaces (a groupby-distinct
over the triples — small output), scored (prior x embedding cosine),
frozen into a plain dict, shipped via ``ray.put`` ONCE, and read in
each actor's ``__init__`` — never re-shipped per batch and never a shuffle
join.  At 100 TB the distinct-surface set is vocabulary-bounded (Heaps'
law), so the broadcast side stays small even when the corpus does not.
"""

from __future__ import annotations

import pyarrow as pa

from .linkref import alias_candidates, best_link
from ..schema import ALIASES


def build_alias_map(surfaces: list[str]) -> dict[str, tuple[str, str, float]]:
    """surface -> (entity_id, entity_type, link_score), pre-scored."""
    return {s: best_link(s) for s in surfaces}


def alias_table(surfaces: list[str]) -> pa.Table:
    """Materialized alias KB (FIXTURES.md F3 shape) for inspection /
    queries; one row per (alias, candidate entity)."""
    a, e, t, p = [], [], [], []
    for s in sorted(surfaces):
        for ent, etype, prior in alias_candidates(s):
            a.append(s)
            e.append(ent)
            t.append(etype)
            p.append(prior)
    return pa.Table.from_arrays(
        [
            pa.array(a, pa.string()),
            pa.array(e, pa.string()),
            pa.array(t, pa.string()),
            pa.array(p, pa.float32()),
        ],
        schema=ALIASES,
    )


def surface_link_ds(surfaces: "rd.Dataset") -> "rd.Dataset":
    """Distributed twin of :func:`build_alias_map`: map the distinct-
    surface Dataset through ``best_link`` per batch -> (surface,
    entity_id, link_score) rows.  Same per-surface scoring as the
    broadcast build, but the alias table stays a hash-partitioned
    Dataset instead of a driver dict — the above-the-gate path when
    the surface universe outgrows one machine (round-4 verdict #1)."""

    def link_batch(t: pa.Table) -> pa.Table:
        surfs = t["surface"].to_pylist()
        ents, scores = [], []
        for s in surfs:
            ent, _etype, score = best_link(s)
            ents.append(ent)
            scores.append(score)
        return pa.table(
            {
                "surface": t["surface"],
                "entity_id": pa.array(ents, pa.string()),
                "link_score": pa.array(scores, pa.float32()),
            }
        )

    return surfaces.map_batches(link_batch, batch_format="pyarrow")


def candidate_edges_ds(surfaces: "rd.Dataset") -> "rd.Dataset":
    """Distributed twin of :func:`..ops.linkref.component_edges`:
    equivalence edges (src, dst) between all candidate entities of one
    alias surface, emitted per batch of distinct surfaces."""

    def edges_batch(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for s in t["surface"].to_pylist():
            cands = alias_candidates(s)
            for i in range(1, len(cands)):
                src.append(cands[0][0])
                dst.append(cands[i][0])
        return pa.table(
            {
                "src": pa.array(src, pa.string()),
                "dst": pa.array(dst, pa.string()),
            }
        )

    return surfaces.map_batches(edges_batch, batch_format="pyarrow")


class LinkEntities:
    """Actor-pool stage: triples batch -> linked-triples batch.

    ``alias_ref``: ObjectRef of the frozen alias map (ray.put on the
    driver).  ``canon_ref``: optional ObjectRef of the canonical-id map
    (entity -> component id) — when given, linking and
    canonical-rewrite fuse into one pass so the triples stream is
    touched once.
    """

    def __init__(self, alias_ref, canon_ref=None):
        import ray

        self.alias = ray.get(alias_ref) if alias_ref is not None else {}
        self.canon = ray.get(canon_ref) if canon_ref is not None else {}

    def _link(self, surface: str) -> tuple[str, str, float]:
        hit = self.alias.get(surface)
        if hit is None:  # unseen surface (never for in-corpus runs)
            hit = best_link(surface)
        ent, etype, score = hit
        return self.canon.get(ent, ent), etype, score

    def _link_column(self, col) -> tuple[pa.Array, pa.Array]:
        """(entity, score) arrays for a surface column: dict lookups run
        once per DISTINCT surface, then fan back out with ``take`` —
        O(distinct-per-batch) Python instead of O(rows).  The emitted
        triples stream is already dictionary-encoded (ops/score.py), so
        the encode below is usually a no-op reuse of its indices."""
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if not pa.types.is_dictionary(arr.type):
            arr = arr.dictionary_encode()
        ents, scores = [], []
        for s in arr.dictionary.to_pylist():
            ent, _etype, score = self._link(s)
            ents.append(ent)
            scores.append(score)
        import pyarrow.compute as pc

        idx = arr.indices
        return (
            pc.take(pa.array(ents, pa.string()), idx),
            pc.take(pa.array(scores, pa.float32()), idx),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        se, sc = self._link_column(batch["subj"])
        oe, _ = self._link_column(batch["obj"])
        out = batch.drop_columns(["prob"]) if "prob" in batch.column_names else batch
        return (
            out.append_column("subj_entity", se)
            .append_column("obj_entity", oe)
            .append_column("link_score", sc)
        )
