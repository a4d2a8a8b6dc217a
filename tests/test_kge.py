"""TransE KG embeddings (ops/kge.py): loss monotonicity, mean-rank vs
chance, determinism, partitioning independence, link-prediction shape."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from deepie_ray.ops import kge


def _edge_table(n_ent: int = 30) -> pa.Table:
    """Structured synthetic KG: r0 = successor ring, r1 = +5 ring —
    consistent translations TransE can fit."""
    subs, preds, objs = [], [], []
    for i in range(n_ent):
        subs.append(f"e{i:02d}")
        preds.append("r0")
        objs.append(f"e{(i + 1) % n_ent:02d}")
        subs.append(f"e{i:02d}")
        preds.append("r1")
        objs.append(f"e{(i + 5) % n_ent:02d}")
    return pa.table(
        {
            "subj_entity": pa.array(subs, pa.string()),
            "pred_label": pa.array(preds, pa.string()),
            "obj_entity": pa.array(objs, pa.string()),
            "weight": pa.array([1] * len(subs), pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def trained(ray_session):
    edges = rd.from_arrow(_edge_table())
    return kge.train_transe(edges, dim=16, epochs=50, seed=0)


def test_vocab_sorted_and_complete(trained):
    assert trained["entities"] == sorted(trained["entities"])
    assert len(trained["entities"]) == 30
    assert trained["relations"] == ["r0", "r1"]


def test_loss_decreases(trained):
    hist = trained["loss_history"]
    assert len(hist) == 50
    # margin loss should fall substantially from the random init
    assert hist[-1] < 0.5 * hist[0]


def test_mean_rank_beats_chance(trained):
    t = _edge_table()
    triples = list(
        zip(
            t["subj_entity"].to_pylist(),
            t["pred_label"].to_pylist(),
            t["obj_entity"].to_pylist(),
        )
    )
    mr = kge.mean_rank(trained, triples)
    chance = (len(trained["entities"]) + 1) / 2  # 15.5
    assert mr < chance / 2  # well under half of chance


def test_deterministic_across_runs(ray_session, trained):
    edges = rd.from_arrow(_edge_table())
    again = kge.train_transe(edges, dim=16, epochs=50, seed=0)
    np.testing.assert_array_equal(trained["E"], again["E"])
    np.testing.assert_array_equal(trained["R"], again["R"])


def test_partitioning_independence(ray_session, trained):
    # different block boundaries change only float64 addition order in
    # the driver fold; embeddings must agree to tight tolerance
    edges5 = rd.from_arrow(_edge_table()).repartition(5)
    m5 = kge.train_transe(edges5, dim=16, epochs=50, seed=0)
    np.testing.assert_allclose(trained["E"], m5["E"], atol=1e-9)
    np.testing.assert_allclose(trained["R"], m5["R"], atol=1e-9)


def test_entities_unit_norm(trained):
    norms = np.linalg.norm(trained["E"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-9)


def test_predict_tails_shape_and_ranks(trained):
    out = kge.predict_tails(trained, [("e00", "r0"), ("e03", "r1")], k=3)
    assert out.column_names == ["head", "rel", "rank", "tail", "score"]
    assert out.num_rows == 6
    df = out.to_pandas()
    for (_h, _r), grp in df.groupby(["head", "rel"]):
        assert list(grp["rank"]) == [1, 2, 3]
        assert list(grp["score"]) == sorted(grp["score"])
        assert _h not in set(grp["tail"])  # head excluded from tails


def test_predict_tails_learns_ring(trained):
    # the successor ring is a single consistent translation; the true
    # tail should appear in the top-3 for most heads
    heads = [f"e{i:02d}" for i in range(30)]
    out = kge.predict_tails(
        trained, [(h, "r0") for h in heads], k=3
    ).to_pandas()
    hits = 0
    for i, h in enumerate(heads):
        want = f"e{(i + 1) % 30:02d}"
        got = set(out[out["head"] == h]["tail"])
        hits += want in got
    assert hits >= 24  # >= 80% hits@3


def test_unknown_query_skipped(trained):
    out = kge.predict_tails(trained, [("zzz", "r0"), ("e00", "nope")], k=3)
    assert out.num_rows == 0


def test_empty_edges(ray_session):
    empty = pa.table(
        {
            "subj_entity": pa.array([], pa.string()),
            "pred_label": pa.array([], pa.string()),
            "obj_entity": pa.array([], pa.string()),
            "weight": pa.array([], pa.int64()),
        }
    )
    m = kge.train_transe(rd.from_arrow(empty), dim=8, epochs=2)
    assert m["entities"] == [] and m["loss_history"] == []
    assert kge.predict_tails(m, [("a", "b")]).num_rows == 0


@pytest.fixture(scope="module")
def trained_dm(ray_session):
    edges = rd.from_arrow(_edge_table())
    return kge.train_kge(edges, model="distmult", dim=16, epochs=50, lr=0.05, seed=0)


def test_distmult_loss_decreases(trained_dm):
    hist = trained_dm["loss_history"]
    assert trained_dm["model"] == "distmult"
    assert hist[-1] < 0.5 * hist[0]


def test_distmult_mean_rank_beats_chance(trained_dm):
    t = _edge_table()
    triples = list(
        zip(
            t["subj_entity"].to_pylist(),
            t["pred_label"].to_pylist(),
            t["obj_entity"].to_pylist(),
        )
    )
    mr = kge.mean_rank(trained_dm, triples)
    assert mr < (len(trained_dm["entities"]) + 1) / 4


def test_distmult_predict_scores_ascending(trained_dm):
    out = kge.predict_tails(trained_dm, [("e00", "r0")], k=5).to_pandas()
    assert len(out) == 5
    assert list(out["score"]) == sorted(out["score"])
    assert "e00" not in set(out["tail"])


def test_distmult_partitioning_independence(ray_session, trained_dm):
    edges5 = rd.from_arrow(_edge_table()).repartition(5)
    m5 = kge.train_kge(
        edges5, model="distmult", dim=16, epochs=50, lr=0.05, seed=0
    )
    np.testing.assert_allclose(trained_dm["E"], m5["E"], atol=1e-9)
    np.testing.assert_allclose(trained_dm["R"], m5["R"], atol=1e-9)


def test_unknown_model_rejected(ray_session):
    with pytest.raises(ValueError):
        kge.train_kge(rd.from_arrow(_edge_table()), model="rescal")


def test_negative_sampling_deterministic_and_valid():
    h = np.arange(10, dtype=np.int64)
    r = np.zeros(10, np.int64)
    t = (h + 1) % 10
    nh1, nt1 = kge._neg_entities(h, r, t, epoch=3, n_ent=10)
    nh2, nt2 = kge._neg_entities(h, r, t, epoch=3, n_ent=10)
    np.testing.assert_array_equal(nh1, nh2)
    np.testing.assert_array_equal(nt1, nt2)
    # exactly one side corrupted per triple, never equal to the truth
    head_changed = nh1 != h
    tail_changed = nt1 != t
    assert (head_changed ^ tail_changed).all()
    assert ((nh1 >= 0) & (nh1 < 10) & (nt1 >= 0) & (nt1 < 10)).all()
    # different epoch -> different draw somewhere
    nh3, nt3 = kge._neg_entities(h, r, t, epoch=4, n_ent=10)
    assert (nh3 != nh1).any() or (nt3 != nt1).any()


def test_holdout_split_partition_and_content_stable(ray_session):
    edges = rd.from_arrow(_edge_table())
    tr1, te1 = kge.split_edges_holdout(edges)
    tr2, te2 = kge.split_edges_holdout(rd.from_arrow(_edge_table()).repartition(7))

    def key_set(ds):
        df = ds.to_pandas()
        return set(zip(df["subj_entity"], df["pred_label"], df["obj_entity"]))

    a_tr, a_te = key_set(tr1), key_set(te1)
    b_tr, b_te = key_set(tr2), key_set(te2)
    assert a_tr == b_tr and a_te == b_te
    assert a_tr.isdisjoint(a_te)
    assert len(a_tr) + len(a_te) == 60
    # ~1/5 in test: loose band, content-addressed
    assert 3 <= len(a_te) <= 25


def _cluster_edge_table(groups: int = 8, per: int = 5) -> pa.Table:
    """Redundant planted graph: every member of group g links to EVERY
    member of group g+1 under one relation.  A held-out edge is
    inferable from the 4 sibling edges that survive the split — the
    structure held-out generalization needs (the sparse ring has none:
    removing an edge removes the only evidence for it)."""
    subs, objs = [], []
    for g in range(groups):
        for m in range(per):
            for m2 in range(per):
                subs.append(f"g{g}_m{m}")
                objs.append(f"g{(g + 1) % groups}_m{m2}")
    return pa.table(
        {
            "subj_entity": pa.array(subs, pa.string()),
            "pred_label": pa.array(["next"] * len(subs), pa.string()),
            "obj_entity": pa.array(objs, pa.string()),
            "weight": pa.array([1] * len(subs), pa.int64()),
        }
    )


def test_filtered_eval_beats_chance_and_filters(ray_session):
    edges = rd.from_arrow(_cluster_edge_table())
    train, test = kge.split_edges_holdout(edges)
    model = kge.train_kge(train.materialize(), dim=16, epochs=60, lr=0.02, seed=0)

    def triples(ds):
        df = ds.to_pandas()
        return list(zip(df["subj_entity"], df["pred_label"], df["obj_entity"]))

    te = triples(test)
    al = te + triples(train)
    m = kge.evaluate_link_prediction(model, al, te)
    assert m["n_eval"] == len(te)
    # random ranking over 40 entities: hits@10 ~ 0.25, mean rank ~20.
    # offline study: trained h10=0.82 / mr=6.6 vs init 0.24 / 18.1
    assert m["hits10"] >= 0.6
    assert m["mean_rank"] < 12.0
    assert 0.0 <= m["mrr"] <= 1.0
    # the UNTRAINED init must do clearly worse (generalization is real)
    init = kge._init_weights(
        len(model["entities"]), len(model["relations"]), 16, 0
    )
    m0 = kge.evaluate_link_prediction(
        {
            "model": "transe",
            "E": init[0],
            "R": init[1],
            "entities": model["entities"],
            "relations": model["relations"],
        },
        al,
        te,
    )
    assert m["mean_rank"] < m0["mean_rank"] - 2.0
    # filtered protocol: ranks never worse than the unfiltered count
    m_unf = kge.evaluate_link_prediction(model, te, te)  # no extra knowns
    assert m["mean_rank"] <= m_unf["mean_rank"] + 1e-9


def test_eval_empty_test_set():
    m = kge.evaluate_link_prediction(
        {"model": "transe", "E": np.zeros((0, 4)), "R": np.zeros((0, 4)),
         "entities": [], "relations": []},
        [],
        [],
    )
    assert m["n_eval"] == 0 and np.isnan(m["mean_rank"])


def test_complex_gradient_finite_difference():
    rng = np.random.default_rng(1)
    n, d2 = 6, 8
    E = rng.normal(size=(n, d2))
    R = rng.normal(size=(2, d2))
    h = np.array([0, 1], np.int64)
    r = np.array([0, 1], np.int64)
    t = np.array([2, 3], np.int64)
    d = d2 // 2

    def loss_of(E2, R2, ep=0):
        nh, nt = kge._neg_entities(h, r, t, ep, n)

        def sc(hh, tt2):
            hr, hi = E2[hh, :d], E2[hh, d:]
            rr, ri = R2[r, :d], R2[r, d:]
            tr, ti = E2[tt2, :d], E2[tt2, d:]
            return (hr * rr * tr + hi * ri * tr + hr * ri * ti - hi * rr * ti).sum(1)

        v = 1.0 - sc(h, t) + sc(nh, nt)
        return v[v > 0].sum()

    loss, _c, eids, erows, rids, rrows = kge._grad_complex(h, r, t, E, R, 0, 1.0)
    eps = 1e-6
    for ids, rows, which in ((eids, erows, "E"), (rids, rrows, "R")):
        for p, i in enumerate(ids):
            for j in range(d2):
                W2 = (E if which == "E" else R).copy()
                W2[i, j] += eps
                l2 = loss_of(W2, R) if which == "E" else loss_of(E, W2)
                fd = (l2 - loss) / eps
                assert abs(fd - rows[p, j]) < 1e-3, (which, i, j, fd, rows[p, j])


def test_complex_learns_antisymmetric_ring(ray_session):
    # the directional successor ring: ComplEx's Im(R) makes
    # s(h,r,t) != s(t,r,h) fittable; offline study mr ~1.5-1.7
    edges = rd.from_arrow(_edge_table())
    m = kge.train_kge(edges, model="complex", dim=16, epochs=50, lr=0.1, seed=0)
    assert m["loss_history"][-1] < 0.3 * m["loss_history"][0]
    t = _edge_table()
    triples = list(
        zip(
            t["subj_entity"].to_pylist(),
            t["pred_label"].to_pylist(),
            t["obj_entity"].to_pylist(),
        )
    )
    assert kge.mean_rank(m, triples) < 4.0


def test_complex_odd_width_rejected(ray_session):
    with pytest.raises(ValueError):
        kge.train_kge(rd.from_arrow(_edge_table()), model="complex", dim=15)


def test_warm_start_converges_faster_and_validates(ray_session, trained):
    # delta: 6 new entities spliced into the ring via two new edges each
    base = _edge_table()
    subs = base["subj_entity"].to_pylist()
    preds = base["pred_label"].to_pylist()
    objs = base["obj_entity"].to_pylist()
    for i in range(6):
        subs += [f"e{i:02d}", f"x{i}"]
        preds += ["r0", "r0"]
        objs += [f"x{i}", f"e{(i + 1) % 30:02d}"]
    grown = pa.table(
        {
            "subj_entity": pa.array(subs, pa.string()),
            "pred_label": pa.array(preds, pa.string()),
            "obj_entity": pa.array(objs, pa.string()),
            "weight": pa.array([1] * len(subs), pa.int64()),
        }
    )
    edges = rd.from_arrow(grown)
    warm = kge.train_kge(
        edges, dim=16, epochs=10, seed=0, warm_start=trained
    )
    cold = kge.train_kge(edges, dim=16, epochs=10, seed=0)
    assert set(warm["entities"]) == set(cold["entities"])
    # warm start resumes near the old optimum: first-epoch loss well
    # under cold init's, and still ahead after the short budget
    assert warm["loss_history"][0] < 0.6 * cold["loss_history"][0]
    assert warm["loss_history"][-1] < cold["loss_history"][-1]
    # known entities carried over: their rows started from `trained`
    # (verify e00's warm row is closer to the old row than cold's is)
    i_new = warm["entities"].index("e00")
    i_old = trained["entities"].index("e00")
    d_warm = np.abs(warm["E"][i_new] - trained["E"][i_old]).sum()
    d_cold = np.abs(cold["E"][i_new] - trained["E"][i_old]).sum()
    assert d_warm < d_cold


def test_warm_start_mismatch_rejected(ray_session, trained):
    with pytest.raises(ValueError):
        kge.train_kge(
            rd.from_arrow(_edge_table()),
            model="distmult",
            dim=16,
            warm_start=trained,
        )
    with pytest.raises(ValueError):
        kge.train_kge(
            rd.from_arrow(_edge_table()), dim=32, warm_start=trained
        )


def test_rotate_gradient_finite_difference():
    rng = np.random.default_rng(1)
    n, d2 = 6, 8
    E = rng.normal(size=(n, d2))
    R = rng.normal(size=(2, d2))
    R[:, d2 // 2 :] = 0.0
    h = np.array([0, 1], np.int64)
    r = np.array([0, 1], np.int64)
    t = np.array([2, 3], np.int64)
    d = d2 // 2

    def loss_of(E2, R2, ep=0):
        nh, nt = kge._neg_entities(h, r, t, ep, n)

        def dist(hh, tt2):
            th = R2[r, :d]
            c, s = np.cos(th), np.sin(th)
            hr, hi = E2[hh, :d], E2[hh, d:]
            pr, pi = hr * c - hi * s, hr * s + hi * c
            return (
                np.abs(pr - E2[tt2, :d]).sum(1)
                + np.abs(pi - E2[tt2, d:]).sum(1)
            )

        v = 1.0 + dist(h, t) - dist(nh, nt)
        return v[v > 0].sum()

    loss, _c, eids, erows, rids, rrows = kge._grad_rotate(h, r, t, E, R, 0, 1.0)
    eps = 1e-6
    for ids, rows, which in ((eids, erows, "E"), (rids, rrows, "R")):
        for p, i in enumerate(ids):
            for j in range(d2):
                W2 = (E if which == "E" else R).copy()
                W2[i, j] += eps
                l2 = loss_of(W2, R) if which == "E" else loss_of(E, W2)
                fd = (l2 - loss) / eps
                assert abs(fd - rows[p, j]) < 1e-3, (which, i, j, fd, rows[p, j])
    # the scorer never reads the second phase half -> identically zero grads
    assert np.allclose(rrows[:, d:], 0.0)


def test_rotate_learns_rings_exactly(ray_session):
    # both relations of the fixture are rotations (successor ring and
    # +5 ring), i.e. exactly representable by RotatE's geometry — the
    # composition-capable scorer should fit them to mean rank ~1
    edges = rd.from_arrow(_edge_table())
    m = kge.train_kge(edges, model="rotate", dim=16, epochs=50, lr=0.1, seed=0)
    assert m["loss_history"][-1] < 0.1 * m["loss_history"][0]
    t = _edge_table()
    triples = list(
        zip(
            t["subj_entity"].to_pylist(),
            t["pred_label"].to_pylist(),
            t["obj_entity"].to_pylist(),
        )
    )
    assert kge.mean_rank(m, triples) < 2.0
    # the unused phase half stays zero through training
    d = m["R"].shape[1] // 2
    assert np.abs(m["R"][:, d:]).max() == 0.0


def test_rotate_odd_width_rejected(ray_session):
    with pytest.raises(ValueError):
        kge.train_kge(rd.from_arrow(_edge_table()), model="rotate", dim=15)


def test_predict_tails_distributed_matches_driver_scan(trained, monkeypatch):
    """The scale path (broadcast query vectors + streamed entity
    blocks, round-4 verdict #3) is bit-identical to the driver scan:
    same rows, same order; ranks/tails exact, scores to ulp (BLAS
    sums a block-shaped matmul in a different order than the full
    matrix, so the *keys* match to the last couple of bits, not
    bitwise) — for every model kind's ranking kernel, with block
    boundaries forced mid-vocabulary."""
    queries = [("e00", "r0"), ("e07", "r1"), ("e29", "r0"), ("zz", "r0")]
    for kind in ("transe", "distmult", "complex", "rotate"):
        m = dict(trained)
        m["model"] = kind
        want = kge.predict_tails(m, queries, k=4)
        got = kge.predict_tails_distributed(m, queries, k=4, block_rows=7)
        assert got.drop_columns(["score"]).equals(
            want.drop_columns(["score"])
        ), kind
        assert np.allclose(
            got["score"].to_numpy(), want["score"].to_numpy(),
            rtol=1e-12, atol=1e-12,
        ), kind

    # and predict_tails itself routes through the distributed path
    # above the scan bound
    monkeypatch.setattr(kge, "_DRIVER_SCAN_MAX", 1)
    routed = kge.predict_tails(trained, queries, k=4)
    monkeypatch.undo()
    direct = kge.predict_tails(trained, queries, k=4)
    assert routed.drop_columns(["score"]).equals(direct.drop_columns(["score"]))


def test_predict_tails_distributed_empty_and_unknown(trained):
    out = kge.predict_tails_distributed(trained, [("zz", "r0")], k=3)
    assert out.num_rows == 0
    assert out.schema.names == ["head", "rel", "rank", "tail", "score"]
