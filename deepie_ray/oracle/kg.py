"""Single-threaded reference-semantics oracle (SURVEY.md §5).

Runs the whole KG pipeline (parse -> score -> link -> canonicalize ->
materialize) over a pyarrow documents table in one process, one row at
a time, with plain dict/list state — the execution model of the
reference (single process, driver-resident state, SURVEY §4).  The Ray
pipeline must reproduce these outputs exactly (triple P/R target 1.0):
any divergence isolates a distributed-execution bug (partitioning,
shuffle, actor state), since both share the same leaf math
(features.py / model.py / nn.py with identical seeded weights).

Golden-output role mirrors the reference's ``*.best.txt`` emission
(``rnnRE.py:583-640``).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

from .. import model as M
from ..ops.linkref import alias_candidates, best_link
from ..ops.parse import doc_to_pair_rows, rows_to_pairs_table
from ..ops.score import score_batch


def oracle_pairs(documents: pa.Table) -> pa.Table:
    rows: list[tuple] = []
    for did, spans in zip(
        documents["doc_id"].to_pylist(), documents["spans"].to_pylist()
    ):
        rows.extend(doc_to_pair_rows(did, spans or []))
    return rows_to_pairs_table(rows)


def oracle_triples(documents: pa.Table, seed: int = M.DEFAULT_SEED) -> pa.Table:
    """All scored pairs (incl. NONE rows), deterministic order by pair_id."""
    pairs = oracle_pairs(documents)
    weights = M.init_weights(seed)
    scored = score_batch(weights, pairs)
    return scored.sort_by("pair_id")


def oracle_emitted_triples(documents: pa.Table, seed: int = M.DEFAULT_SEED) -> pa.Table:
    t = oracle_triples(documents, seed)
    import pyarrow.compute as pc

    return t.filter(pc.not_equal(t["pred_label"], "NONE"))


def oracle_kg(documents: pa.Table, seed: int = M.DEFAULT_SEED) -> dict[str, object]:
    """Full graph: linked triples + canonical nodes/edges, driver-side."""
    triples = oracle_emitted_triples(documents, seed)

    surfaces = sorted(
        set(triples["subj"].to_pylist()) | set(triples["obj"].to_pylist())
    )
    link_map = {s: best_link(s) for s in surfaces}

    # connected components over the alias-candidate graph (union-find)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # canonical = lexicographic min, matching the distributed
            # min-label propagation fixpoint
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for s in surfaces:
        cands = alias_candidates(s)
        for i in range(1, len(cands)):
            union(cands[0][0], cands[i][0])
    canon = {e: find(e) for e in list(parent)}

    subj_ent, obj_ent, scores = [], [], []
    for srow, orow in zip(triples["subj"].to_pylist(), triples["obj"].to_pylist()):
        se, _, ss = link_map[srow]
        oe, _, _ = link_map[orow]
        subj_ent.append(canon.get(se, se))
        obj_ent.append(canon.get(oe, oe))
        scores.append(ss)
    linked = triples.append_column(
        "subj_entity", pa.array(subj_ent, pa.string())
    ).append_column("obj_entity", pa.array(obj_ent, pa.string()))

    # nodes: canonical id -> (min surface, type of min surface, mentions)
    node_rows: dict[str, list] = {}
    for ent, surf, typ, nm in _node_mentions(linked):
        cur = node_rows.get(ent)
        if cur is None:
            node_rows[ent] = [surf, typ, nm]
        else:
            if surf < cur[0]:
                cur[0], cur[1] = surf, typ
            cur[2] += nm
    nodes = pa.table(
        {
            "entity_id": list(node_rows),
            "surface": [v[0] for v in node_rows.values()],
            "entity_type": [v[1] for v in node_rows.values()],
            "n_mentions": [v[2] for v in node_rows.values()],
        }
    ).sort_by("entity_id")

    edge_counts: dict[tuple, int] = defaultdict(int)
    for s, p, o in zip(
        linked["subj_entity"].to_pylist(),
        linked["pred_label"].to_pylist(),
        linked["obj_entity"].to_pylist(),
    ):
        edge_counts[(s, p, o)] += 1
    ek = sorted(edge_counts)
    edges = pa.table(
        {
            "subj_entity": [k[0] for k in ek],
            "pred_label": [k[1] for k in ek],
            "obj_entity": [k[2] for k in ek],
            "weight": [edge_counts[k] for k in ek],
        }
    )
    return {"triples": triples, "linked": linked, "nodes": nodes, "edges": edges}


def _node_mentions(linked: pa.Table):
    for ent, surf, typ in zip(
        linked["subj_entity"].to_pylist(),
        linked["subj"].to_pylist(),
        linked["subj_type"].to_pylist(),
    ):
        yield ent, surf, typ, 1
    for ent, surf, typ in zip(
        linked["obj_entity"].to_pylist(),
        linked["obj"].to_pylist(),
        linked["obj_type"].to_pylist(),
    ):
        yield ent, surf, typ, 1


def micro_prf(pred: pa.Table, gold: pa.Table, key: str = "pair_id") -> dict[str, float]:
    """Reference ``score()`` semantics (``rnnRE.py:564-581``): micro
    P/R/F1 over emitted (non-NONE) triples keyed by pair id + label."""
    p = {
        (k, l)
        for k, l in zip(pred[key].to_pylist(), pred["pred_label"].to_pylist())
        if l != "NONE"
    }
    g = {
        (k, l)
        for k, l in zip(gold[key].to_pylist(), gold["pred_label"].to_pylist())
        if l != "NONE"
    }
    correct = len(p & g)
    prec = correct / len(p) if p else 0.0
    rec = correct / len(g) if g else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1, "n_pred": len(p), "n_gold": len(g)}
