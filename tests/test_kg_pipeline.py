"""End-to-end parity: Ray pipeline == single-threaded oracle (SURVEY §5).

The north-rule gates: triple P/R >= 0.95 vs the reference-semantics
oracle (expected exactly 1.0 — same seeded math) and per-row
span-sequence equality through the pipeline.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from deepie_ray import pipeline, synth
from deepie_ray.oracle import kg as oracle


@pytest.fixture(scope="module")
def docs_table():
    return synth.generate_documents(120, seed=42)


@pytest.fixture(scope="module")
def kg_result(docs_table):
    docs = rd.from_arrow(docs_table)
    triples = pipeline.emitted_triples(docs).materialize()
    return triples


def test_triples_match_oracle_exactly(docs_table, kg_result):
    gold = oracle.oracle_emitted_triples(docs_table)
    pred = kg_result.to_pandas()
    prf = oracle.micro_prf(
        pa.Table.from_pandas(pred[["pair_id", "pred_label"]]),
        gold.select(["pair_id", "pred_label"]),
    )
    assert prf["n_gold"] > 50, "oracle produced too few triples to be meaningful"
    assert prf["precision"] == 1.0 and prf["recall"] == 1.0, prf


def test_triple_payload_matches_oracle(docs_table, kg_result):
    gold = oracle.oracle_emitted_triples(docs_table).to_pandas()
    pred = kg_result.to_pandas().sort_values("pair_id").reset_index(drop=True)
    gold = gold.sort_values("pair_id").reset_index(drop=True)
    for col in ["doc_id", "subj", "subj_type", "pred_label", "obj", "obj_type"]:
        assert pred[col].tolist() == gold[col].tolist(), col
    import numpy as np

    gp = np.array(gold["prob"].tolist())
    pp = np.array(pred["prob"].tolist())
    assert np.allclose(gp, pp, atol=1e-5)


def test_stateless_task_path_matches_pooled(docs_table, kg_result):
    """The fused stateless-task extraction (narrow dictionary-encoded
    output) emits the same logical triples as the actor-pool path."""
    import ray

    from deepie_ray import model as M

    docs = rd.from_arrow(docs_table)
    narrow = pipeline.extract_triples_tasks(
        docs, ray.put(M.init_weights())
    ).to_pandas()
    pooled = kg_result.to_pandas()
    cols = ["doc_id", "pair_id", "subj", "subj_type", "pred_label", "obj", "obj_type"]
    a = narrow[cols].astype(str).sort_values("pair_id").reset_index(drop=True)
    b = pooled[cols].astype(str).sort_values("pair_id").reset_index(drop=True)
    assert a.equals(b)


def test_span_sequence_invariant(docs_table):
    """The parse stage reads spans; the document stream itself must pass
    through bit-identical (kind, text, media_ref, order)."""
    docs = rd.from_arrow(docs_table)
    # identity pass through the pipeline's own batch path
    out = docs.map_batches(lambda t: t, batch_format="pyarrow").take_all()
    by_id = {r["doc_id"]: r["spans"] for r in out}
    for did, spans in zip(
        docs_table["doc_id"].to_pylist(), docs_table["spans"].to_pylist()
    ):
        got = by_id[did]
        assert [(s["kind"], s["text"], s["media_ref"]) for s in got] == [
            (s["kind"], s["text"], s["media_ref"]) for s in spans
        ]
        offs = [s["offset"] for s in got]
        assert offs == sorted(offs)


def test_full_kg_matches_oracle(docs_table, tmp_path):
    import ray

    docs = rd.from_arrow(docs_table)
    triples = pipeline.emitted_triples(docs).materialize()
    surfaces = pipeline.distinct_surfaces(triples)
    from deepie_ray.ops.canon import connected_components_driver
    from deepie_ray.ops.link import LinkEntities, build_alias_map
    from deepie_ray.ops.linkref import component_edges

    alias_ref = ray.put(build_alias_map(surfaces))
    canon_ref = ray.put(connected_components_driver(component_edges(surfaces)))
    linked = triples.map_batches(
        LinkEntities,
        fn_constructor_kwargs={"alias_ref": alias_ref, "canon_ref": canon_ref},
        batch_format="pyarrow",
        concurrency=2,
    ).materialize()
    nodes, edges = pipeline.build_graph(linked)

    gold = oracle.oracle_kg(docs_table)
    # edges: exact multiset equality
    ge = gold["edges"].to_pandas()
    pe = edges.to_pandas().sort_values(
        ["subj_entity", "pred_label", "obj_entity"]
    ).reset_index(drop=True)
    ge = ge.sort_values(["subj_entity", "pred_label", "obj_entity"]).reset_index(
        drop=True
    )
    assert pe["subj_entity"].tolist() == ge["subj_entity"].tolist()
    assert pe["weight"].tolist() == ge["weight"].tolist()
    # nodes: same ids, surfaces, mention counts
    gn = gold["nodes"].to_pandas().sort_values("entity_id").reset_index(drop=True)
    pn = nodes.to_pandas().sort_values("entity_id").reset_index(drop=True)
    assert pn["entity_id"].tolist() == gn["entity_id"].tolist()
    assert pn["surface"].tolist() == gn["surface"].tolist()
    assert pn["n_mentions"].tolist() == gn["n_mentions"].tolist()


def test_empty_and_media_only_documents_yield_zero_triples():
    """Verify-skill probes: empty corpus and media-only/empty-text docs
    flow through extraction without crashing and emit nothing."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "spans": pa.array(
                [],
                pa.list_(
                    pa.struct(
                        [
                            ("kind", pa.string()),
                            ("text", pa.string()),
                            ("media_ref", pa.string()),
                            ("offset", pa.int32()),
                        ]
                    )
                ),
            ),
        }
    )
    out = pipeline.emitted_triples(
        rd.from_arrow(empty), parse_concurrency=1, score_concurrency=1
    )
    assert out.count() == 0

    media_only = pa.table(
        {
            "doc_id": ["m1", "m2", "m3"],
            "spans": [
                [{"kind": "image", "text": "", "media_ref": "media://x", "offset": 0}],
                [{"kind": "text", "text": "", "media_ref": "", "offset": 0}],
                [],
            ],
        }
    )
    out2 = pipeline.emitted_triples(
        rd.from_arrow(media_only), parse_concurrency=1, score_concurrency=1
    )
    assert out2.count() == 0


def test_hot_entity_skew_present(docs_table):
    """The skew knob must actually fire: the hot entity exists and is
    among the highest-degree nodes."""
    gold = oracle.oracle_kg(docs_table)
    nodes = gold["nodes"].to_pandas()
    hot = nodes[nodes.entity_id == "E000000"]
    assert len(hot) == 1
    assert hot.iloc[0]["n_mentions"] >= nodes["n_mentions"].median()


def test_kg_entity_neighborhood_matches_driver_bfs(sf_dir):
    from collections import deque

    from deepie_ray import queries as Q

    out = Q.kg_entity_neighborhood(sf_dir).to_pandas()
    assert set(out.columns) == {"entity", "dist"}
    assert (out["dist"] <= 2).all() and (out["dist"] >= 0).all()
    # driver BFS over the same deduplicated edge table
    edges = Q.kg_edges(sf_dir).to_pandas()
    adj: dict[str, set] = {}
    deg: dict[str, int] = {}
    for a, b in zip(edges["subj_entity"], edges["obj_entity"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    source = sorted(deg, key=lambda e: (-deg[e], e))[0]
    want = {source: 0}
    q = deque([source])
    while q:
        u = q.popleft()
        if want[u] == 2:
            continue
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    got = dict(zip(out["entity"], out["dist"]))
    assert got == want


def test_kg_relation_schema_matches_driver_join(sf_dir):
    from deepie_ray import queries as Q

    out = Q.kg_relation_schema(sf_dir).to_pandas()
    assert list(out.columns) == [
        "pred_label",
        "subj_type",
        "obj_type",
        "n_edges",
        "weight",
    ]
    # driver-side recomputation over the same deduplicated tables
    edges = Q.kg_edges(sf_dir).to_pandas()
    nodes = Q.kg_nodes(sf_dir).to_pandas()
    ty = dict(zip(nodes["entity_id"], nodes["entity_type"]))
    want = (
        edges.assign(
            subj_type=edges["subj_entity"].map(ty),
            obj_type=edges["obj_entity"].map(ty),
            n_edges=1,
        )
        .groupby(["pred_label", "subj_type", "obj_type"])
        .agg(n_edges=("n_edges", "sum"), weight=("weight", "sum"))
        .reset_index()
    )
    got = out.sort_values(["pred_label", "subj_type", "obj_type"]).reset_index(
        drop=True
    )
    want = want.sort_values(
        ["pred_label", "subj_type", "obj_type"]
    ).reset_index(drop=True)[got.columns.tolist()]
    import pandas as pd

    pd.testing.assert_frame_equal(
        got, want.astype({"n_edges": "int64", "weight": "int64"})
    )
    # per-relation totals cover every edge exactly once
    assert out["n_edges"].sum() == len(edges)


def test_link_canon_distributed_matches_broadcast(kg_result):
    """Round-4 verdict #1: above the distinct-surface gate the
    flagship link+canonicalize path runs distributed min-label CC +
    hash-partitioned joins (no driver list, no broadcast dict).  Both
    paths must emit identical linked triples (sorted; joins shuffle
    row order)."""
    import pandas as pd

    bc = pipeline.link_and_canon(kg_result, broadcast_max=10**9).to_pandas()
    dist = pipeline.link_and_canon(kg_result, broadcast_max=0).to_pandas()
    assert list(bc.columns) == list(dist.columns)
    bc = bc.sort_values("pair_id").reset_index(drop=True)
    dist = dist.sort_values("pair_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, dist)


def test_forced_distributed_canon_same_graph(kg_result, monkeypatch):
    """The env gate (DEEPIE_CANON_BROADCAST_MAX=0) forces the
    distributed link/canon path through the flagship wiring
    (link_and_canon with no explicit bound); the downstream
    nodes/edges graph tables must be identical to the broadcast
    path's."""
    import pandas as pd

    def graph_frames(linked):
        nodes, edges = pipeline.build_graph(linked.materialize())
        n = nodes.to_pandas().sort_values("entity_id").reset_index(drop=True)
        e = (
            edges.to_pandas()
            .sort_values(["subj_entity", "pred_label", "obj_entity"])
            .reset_index(drop=True)
        )
        return n, e

    n_bc, e_bc = graph_frames(pipeline.link_and_canon(kg_result))
    monkeypatch.setenv("DEEPIE_CANON_BROADCAST_MAX", "0")
    n_d, e_d = graph_frames(pipeline.link_and_canon(kg_result))
    pd.testing.assert_frame_equal(n_bc, n_d)
    pd.testing.assert_frame_equal(e_bc, e_d)
