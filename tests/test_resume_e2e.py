"""End-to-end resumability of the flagship pipeline (north rule:
resumable from checkpoint with per-partition lineage + metrics)."""

import os

import pyarrow as pa

import ray.data as rd

from deepie_ray import checkpoint, pipeline, synth


def _docs():
    return rd.from_arrow(synth.generate_documents(60, seed=5))


def _run(checkpoint_dir):
    docs = _docs()
    triples = pipeline.emitted_triples(docs)
    triples = checkpoint.checkpoint_dataset(triples, checkpoint_dir, "triples")
    import ray

    from deepie_ray.ops.canon import connected_components_driver
    from deepie_ray.ops.link import LinkEntities, build_alias_map
    from deepie_ray.ops.linkref import component_edges

    surfaces = pipeline.distinct_surfaces(triples)
    alias_ref = ray.put(build_alias_map(surfaces))
    canon_ref = ray.put(connected_components_driver(component_edges(surfaces)))
    linked = triples.map_batches(
        LinkEntities,
        fn_constructor_kwargs={"alias_ref": alias_ref, "canon_ref": canon_ref},
        batch_format="pyarrow",
        concurrency=1,
    )
    linked = checkpoint.checkpoint_dataset(linked, checkpoint_dir, "linked")
    nodes, edges = pipeline.build_graph(linked)
    return {
        "triples": triples.to_pandas().sort_values("pair_id").reset_index(drop=True),
        "edges": edges.to_pandas()
        .sort_values(["subj_entity", "pred_label", "obj_entity"])
        .reset_index(drop=True),
        "nodes": nodes.to_pandas().sort_values("entity_id").reset_index(drop=True),
    }


def test_pipeline_resume_identical_outputs(tmp_path):
    root = str(tmp_path / "ckpt")
    first = _run(root)
    # simulate a later-stage failure: 'linked' lost, 'triples' survives
    import shutil

    shutil.rmtree(os.path.join(root, "linked"))
    second = _run(root)
    for key in ("triples", "edges", "nodes"):
        a, b = first[key], second[key]
        assert a.columns.tolist() == b.columns.tolist()
        for col in a.columns:
            assert a[col].astype(str).tolist() == b[col].astype(str).tolist(), (
                key, col,
            )

    # lineage rows exist for both stages, with positive row counts
    lin = checkpoint.read_lineage(root).to_pandas()
    assert {"triples", "linked"} <= set(lin["stage"])
    assert (lin["rows_out"] >= 0).all()
    assert (lin["wall_ms"] >= 0).all()


def test_run_kg_with_checkpoint_dir(tmp_path):
    import pyarrow.parquet as pq

    # run_kg over the real sf0.001 flat documents with checkpointing
    out = pipeline.run_kg("/root/testdata/sf0.001", checkpoint_dir=str(tmp_path / "ck"))
    assert out["nodes"].count() > 0
    assert out["edges"].count() > 0
    assert checkpoint.stage_complete(str(tmp_path / "ck"), "triples")
    assert checkpoint.stage_complete(str(tmp_path / "ck"), "linked")
    # checkpoint layout is partitioned parquet (resumable output rule)
    data_dir = os.path.join(str(tmp_path / "ck"), "triples", "data")
    files = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    assert len(files) >= 1
    total = sum(pq.read_metadata(os.path.join(data_dir, f)).num_rows for f in files)
    assert total == out["triples"].count()

    # lineage counters are REAL (north rule): parse/score/link stage
    # totals recorded, rows_in truthful (not the old -1 placeholder)
    import json

    lin = checkpoint.read_lineage(str(tmp_path / "ck")).to_pandas()
    trip_rows = lin[lin.stage == "triples"]
    assert (trip_rows["rows_in"] > 0).all()
    counts = json.loads(trip_rows["counters"].iloc[0])
    assert counts["parse"]["rows_in"] > 0            # documents parsed
    assert counts["score"]["rows_in"] == counts["parse"]["rows_out"]  # pairs scored
    assert counts["score"]["rows_out"] >= out["triples"].count()  # pre-NONE-filter
    link_rows = lin[lin.stage == "linked"]
    lcounts = json.loads(link_rows["counters"].iloc[0])
    assert lcounts["link"]["rows_in"] == out["triples"].count()
    assert lcounts["link"]["rows_out"] == out["linked"].count()


def test_materialize_graph_writes_parquet(tmp_path):
    import pyarrow.parquet as pq

    paths = pipeline.materialize_graph(
        "/root/testdata/sf0.001", str(tmp_path / "graph")
    )
    assert set(paths) == {"triples", "linked", "nodes", "edges"}
    for name, p in paths.items():
        files = [f for f in os.listdir(p) if f.endswith(".parquet")]
        assert files, name
        t = pq.read_table(p)
        assert t.num_rows > 0, name
    # rerun skips everything (manifests complete) and returns same paths
    again = pipeline.materialize_graph(
        "/root/testdata/sf0.001", str(tmp_path / "graph")
    )
    assert again == paths


def test_bench_path_counters_match_rows():
    """The BENCH flagship path (emitted_triples with a CounterActor, no
    checkpoint_dir) exercises real lineage counters: the scorer is 1:1
    per pair, so parse rows_out == score rows_in == score rows_out, and
    the emitted (non-NONE) triples are a subset of the scored rows
    (round-2 verdict #8 — lineage where performance is measured)."""
    import ray

    from deepie_ray.ops.metrics import CounterActor

    counter = CounterActor.remote()
    docs = _docs()
    n_docs = docs.count()
    emitted = pipeline.emitted_triples(docs, counter=counter).materialize()
    n_emitted = emitted.count()
    counts = ray.get(counter.get.remote())
    assert set(counts) == {"parse", "score"}
    assert counts["parse"]["rows_in"] == n_docs
    assert counts["parse"]["rows_out"] == counts["score"]["rows_in"]
    assert counts["score"]["rows_in"] == counts["score"]["rows_out"]
    assert 0 < n_emitted <= counts["score"]["rows_out"]


def test_run_kg_model_selectable():
    """run_kg accepts a registry model (the engine's counterpart of the
    reference evaluate.py selector grammar): full pipeline end-to-end
    on a non-default encoder."""
    out = pipeline.run_kg("/root/testdata/sf0.001", model_name="gru_head")
    n = out["triples"].count()
    assert n > 0
    assert out["nodes"].count() > 0 and out["edges"].count() > 0


# ------------------------------------------------------- incremental ingest


def _ingest_docs(ids, texts):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )


def test_incremental_ingest_two_steps_equal_one_shot(tmp_path):
    from deepie_ray import ingest

    state = str(tmp_path / "state")
    # day 1: dup within the batch ('aa' twice)
    d1 = _ingest_docs([1, 2, 3], ["aa", "bb", "aa"])
    acc1 = ingest.ingest_documents(d1, state).to_pandas()
    assert sorted(acc1["text"]) == ["aa", "bb"]
    assert sorted(acc1["doc_id"]) == [1, 2]  # min id per content
    # day 2: 'bb' already ingested, 'cc'/'dd' fresh, 'dd' dup within
    d2 = _ingest_docs([10, 11, 12, 13], ["bb", "cc", "dd", "dd"])
    acc2 = ingest.ingest_documents(d2, state).to_pandas()
    assert sorted(acc2["text"]) == ["cc", "dd"]
    assert sorted(acc2["doc_id"]) == [11, 12]
    # accepted contents across both steps == one-shot distinct contents
    assert sorted(list(acc1["text"]) + list(acc2["text"])) == [
        "aa", "bb", "cc", "dd",
    ]


def test_incremental_ingest_idempotent_and_crash_safe(tmp_path):
    import json
    import os

    from deepie_ray import ingest

    state = str(tmp_path / "state")
    d1 = _ingest_docs([1, 2], ["xx", "yy"])
    assert ingest.ingest_documents(d1, state).count() == 2
    # garbage from a "crashed" ingest: tmp dir + dir without marker
    root = os.path.join(state, "fingerprints")
    os.makedirs(os.path.join(root, "gen-deadbeef.tmp"), exist_ok=True)
    os.makedirs(os.path.join(root, "gen-orphan"), exist_ok=True)
    # marker without dir must also be ignored
    with open(os.path.join(root, "gen-ghost.json"), "w") as f:
        json.dump({}, f)
    # re-ingesting identical content accepts nothing and commits no rows
    assert ingest.ingest_documents(d1, state).count() == 0
    gens = ingest.committed_generations(state)
    assert len(gens) == 1  # the empty second ingest added no generation
    # a fresh doc still lands
    assert ingest.ingest_documents(
        _ingest_docs([9], ["zz"]), state
    ).count() == 1
    assert len(ingest.committed_generations(state)) == 2


def test_incremental_neardup_ingest(tmp_path):
    from deepie_ray import ingest

    base = " ".join(f"tok{i}" for i in range(30))
    near = " ".join(f"tok{i}" for i in range(29)) + " xxx"
    far = " ".join(f"zzz{i}" for i in range(30))
    fresh = " ".join(f"qqq{i}" for i in range(30))
    state = str(tmp_path / "nd")

    # day 1: near-dup pair clusters within the batch -> min id kept
    a1 = ingest.ingest_documents_neardup(
        _ingest_docs([1, 2, 3], [base, near, far]), state, threshold=0.5
    )
    assert sorted(a1.to_pandas()["doc_id"]) == [1, 3]
    # day 2: near-dup of indexed content and an exact repeat both
    # reject; fresh content lands
    a2 = ingest.ingest_documents_neardup(
        _ingest_docs([10, 11, 12], [near, far, fresh]), state, threshold=0.5
    )
    assert sorted(a2.to_pandas()["doc_id"]) == [12]
    # day 3: re-ingesting day-1 content is a no-op and commits nothing
    a3 = ingest.ingest_documents_neardup(
        _ingest_docs([20, 21], [base, far]), state, threshold=0.5
    )
    assert a3.count() == 0
    assert len(ingest._committed_dirs(state, "minhash")) == 2


def test_incremental_neardup_cluster_level_rejection(tmp_path):
    from deepie_ray import ingest

    state = str(tmp_path / "nd")
    base = " ".join(f"w{i}" for i in range(40))
    ingest.ingest_documents_neardup(
        _ingest_docs([1], [base]), state, threshold=0.5
    )
    # a within-batch cluster {5, 6} whose member 6 near-dups the index:
    # the WHOLE cluster rejects (content family already represented)
    m5 = " ".join(f"w{i}" for i in range(38)) + " a b"  # ~base, ~m6
    m6 = " ".join(f"w{i}" for i in range(39)) + " a"  # ~base
    out = ingest.ingest_documents_neardup(
        _ingest_docs([5, 6], [m5, m6]), state, threshold=0.5
    )
    assert out.count() == 0


def test_exact_ingest_multi_generation_index(tmp_path):
    """read_parquet over MULTIPLE generation dirs (regression: a list
    of directories used to be opened as files)."""
    from deepie_ray import ingest

    state = str(tmp_path / "state")
    assert ingest.ingest_documents(_ingest_docs([1], ["aa"]), state).count() == 1
    assert ingest.ingest_documents(_ingest_docs([2], ["bb"]), state).count() == 1
    # third ingest reads a 2-generation index
    out = ingest.ingest_documents(
        _ingest_docs([3, 4, 5], ["aa", "bb", "cc"]), state
    )
    assert sorted(out.to_pandas()["doc_id"]) == [5]


def test_compact_index_preserves_behavior(tmp_path):
    from deepie_ray import ingest

    state = str(tmp_path / "state")
    ingest.ingest_documents(_ingest_docs([1], ["aa"]), state)
    ingest.ingest_documents(_ingest_docs([2], ["bb"]), state)
    ingest.ingest_documents(_ingest_docs([3], ["cc"]), state)
    assert len(ingest.committed_generations(state)) == 3
    assert ingest.compact_index(state) == 3
    assert len(ingest.committed_generations(state)) == 1
    # identical accept/reject behavior after compaction
    out = ingest.ingest_documents(
        _ingest_docs([10, 11, 12, 13], ["aa", "bb", "cc", "dd"]), state
    )
    assert sorted(out.to_pandas()["doc_id"]) == [13]
    # compacting a single generation is a no-op
    assert ingest.compact_index(state) <= 2  # merged gen + new dd gen


def test_incremental_kg_two_batches_merge_additively(tmp_path):
    from deepie_ray import ingest, pipeline

    state = str(tmp_path / "kg")
    docs = pipeline.read_documents("/root/testdata/sf0.001").materialize()
    half0 = docs.limit(40).materialize()
    # disjoint second half via anti semantics: take rows 40-79
    rest = docs.limit(80).materialize()
    ids0 = set(r["doc_id"] for r in half0.select_columns(["doc_id"]).take_all())

    import pyarrow.compute as pc

    half1 = rest.map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t["doc_id"], value_set=pa.array(list(ids0))))
        ),
        batch_format="pyarrow",
    ).materialize()

    g0 = ingest.ingest_kg(half0, state)
    g1 = ingest.ingest_kg(half1, state)
    w0 = sum(r["weight"] for r in g0["edges"].take_all())
    w1 = sum(r["weight"] for r in g1["edges"].take_all())

    merged = ingest.read_kg_graph(state)
    mw = sum(r["weight"] for r in merged["edges"].take_all())
    assert mw == w0 + w1  # edge weights are additive across generations
    nm = sum(r["n_mentions"] for r in merged["nodes"].take_all())
    nm0 = sum(r["n_mentions"] for r in g0["nodes"].take_all())
    nm1 = sum(r["n_mentions"] for r in g1["nodes"].take_all())
    assert nm == nm0 + nm1

    # compaction preserves the merged view exactly
    before_e = merged["edges"].to_pandas().sort_values(
        ["subj_entity", "pred_label", "obj_entity"]
    ).reset_index(drop=True)
    assert ingest.compact_index(state, "kg_edges") == 2
    assert ingest.compact_index(state, "kg_nodes") == 2
    after = ingest.read_kg_graph(state)
    after_e = after["edges"].to_pandas().sort_values(
        ["subj_entity", "pred_label", "obj_entity"]
    ).reset_index(drop=True)
    assert before_e.equals(after_e)


def test_transient_task_failure_is_retried_exactly(tmp_path):
    """The 100-TB resilience contract BELOW the checkpoint layer: a
    map_batches task that fails transiently (first attempt raises) is
    retried by Ray's lineage with ``retry_exceptions`` and the pipeline
    completes with EXACT output — no rows lost or duplicated.  The
    checkpoint/manifest layer (tests above) covers whole-run restarts;
    this covers in-run worker flakiness."""
    import pyarrow.compute as _pc

    import ray.data as rd

    marker = str(tmp_path / "injected_failure_fired")

    def flaky_double(t):
        import os

        if not os.path.exists(marker):  # first attempt on this node
            with open(marker, "w") as f:
                f.write("x")
            raise RuntimeError("transient worker failure (injected)")
        return t.append_column("y", _pc.multiply(t["id"], 2))

    out = (
        rd.range(10_000, override_num_blocks=4)
        .map_batches(
            flaky_double,
            batch_format="pyarrow",
            # forwarded to the underlying ray task
            retry_exceptions=[RuntimeError],
            max_retries=3,
        )
        .sum("y")
    )
    assert out == 2 * sum(range(10_000))
    import os

    assert os.path.exists(marker)  # the failure really fired


def test_versioned_table_time_travel(tmp_path):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from deepie_ray import checkpoint

    root = str(tmp_path / "vt")
    t1 = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    t2 = pa.table({"k": pa.array([1, 2, 3, 4, 5], pa.int64())})
    v1 = checkpoint.write_table_version(rd.from_arrow(t1), root)
    v2 = checkpoint.write_table_version(rd.from_arrow(t2), root)
    assert (v1, v2) == (1, 2)
    assert checkpoint.list_table_versions(root) == [1, 2]
    # AS OF read: v1 byte-stable after the v2 commit
    got1 = sorted(checkpoint.read_table_version(root, 1).to_pandas()["k"])
    assert got1 == [1, 2, 3]
    # latest = v2
    got = sorted(checkpoint.read_table_version(root).to_pandas()["k"])
    assert got == [1, 2, 3, 4, 5]
    with pytest.raises(FileNotFoundError):
        checkpoint.read_table_version(root, 3)
    with pytest.raises(FileNotFoundError):
        checkpoint.read_table_version(str(tmp_path / "missing"))


def test_versioned_table_ignores_uncommitted(tmp_path):
    import os

    import pyarrow as pa
    import ray.data as rd

    from deepie_ray import checkpoint

    root = str(tmp_path / "vt")
    checkpoint.write_table_version(
        rd.from_arrow(pa.table({"k": pa.array([7], pa.int64())})), root
    )
    # simulate a mid-run kill: a version dir with data but no manifest
    os.makedirs(os.path.join(root, "v000002", "data.tmp"), exist_ok=True)
    assert checkpoint.list_table_versions(root) == [1]
    assert checkpoint.read_table_version(root).count() == 1
    # the next writer claims version 2 and commits over the debris
    v = checkpoint.write_table_version(
        rd.from_arrow(pa.table({"k": pa.array([8], pa.int64())})), root
    )
    assert v == 2
    assert checkpoint.list_table_versions(root) == [1, 2]


def test_run_kg_job_script_end_to_end_and_resume(tmp_path):
    """The `ray job submit` entrypoint (scripts/run_kg_job.py) as a
    real subprocess: fresh Ray session, JSON status line, parquet
    checkpoints on disk — then a SECOND invocation over the same
    output dir resumes (identical row counts, completed stages
    skipped)."""
    import json
    import subprocess
    import sys

    out_dir = str(tmp_path / "kg_out")
    cmd = [
        sys.executable,
        "/root/repo/scripts/run_kg_job.py",
        "--input",
        "/root/testdata/sf0.001",
        "--output",
        out_dir,
    ]
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="local")

    r1 = subprocess.run(
        cmd, capture_output=True, text=True, timeout=240, env=env
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    line = [l for l in r1.stdout.splitlines() if l.startswith("{")][-1]
    j1 = json.loads(line)
    assert j1["status"] == "ok"
    assert j1["rows"]["triples"] > 0
    assert j1["rows"]["nodes"] > 0 and j1["rows"]["edges"] > 0

    r2 = subprocess.run(
        cmd, capture_output=True, text=True, timeout=240, env=env
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    j2 = json.loads(
        [l for l in r2.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert j2["rows"] == j1["rows"]  # resume: same graph, nothing redone
