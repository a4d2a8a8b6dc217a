"""End-to-end semantics of the composed llm_corpus_prep pipeline on a
planted corpus: each gate (length bounds, exact-dedup semi-join,
decontamination anti-join, split assignment) must act on exactly the
docs planted to trigger it."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from deepie_ray import queries as Q
from deepie_ray.ops import text as T


def _write_docs(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_llm_corpus_prep_planted_gates(tmp_path):
    rows = []
    # eval set (doc_id < 10): excluded from output, defines the
    # decontamination shingles
    rows.append((0, " ".join(f"eval0w{i}" for i in range(18))))
    for d in range(1, 10):
        rows.append((d, " ".join(f"eval{d}w{i}" for i in range(20))))
    # exact-dup pair: min id (20) survives, 21 is dropped
    dup_text = " ".join(f"dupw{i}" for i in range(20))
    rows.append((20, dup_text))
    rows.append((21, dup_text))
    # contaminated: 16 of its 18 trigrams come from eval doc 0 (89% >=
    # the 20% rule), but the content is unique so dedup keeps it
    rows.append((22, rows[0][1] + " uniq22a uniq22b"))
    # clean corpus docs
    for d in range(23, 53):
        rows.append((d, " ".join(f"doc{d}w{i}" for i in range(20))))
    # length-tail docs: below p05 / above p95 (bounds land at 20 tokens)
    rows.append((53, "shorty"))
    rows.append((54, " ".join(f"long54w{i}" for i in range(400))))

    sf_dir = _write_docs(tmp_path, rows)
    out = Q.llm_corpus_prep(sf_dir).to_pandas().set_index("doc_id")

    assert sorted(out.index) == [20] + list(range(23, 53))
    assert (out["n_tokens"] == 20).all()
    # split assignment matches the content-addressed rule exactly
    ids = pa.table({"doc_id": pa.array(sorted(out.index), pa.int64())})
    want_split = T.split_batch(ids).to_pandas().set_index("doc_id")["split"]
    got_split = out["split"].sort_index()
    assert (got_split.to_numpy() == want_split.to_numpy()).all()
    assert set(out["split"]) <= {"train", "val", "test"}


# ---------------------------------------------- Gopher repetition signals


def test_line_repetition_planted():
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "aa\nbb\naa\ncc",  # 4 lines, 'aa' twice
                    "x\ny\nz",  # no repeats
                    "",  # one empty line, zero chars
                ]
            ),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(T.line_repetition_batch, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_lines"] == 4
    assert out.loc[1, "dup_line_frac"] == 0.25  # 4 lines, 3 distinct
    assert out.loc[1, "dup_line_char_frac"] == 4 / 8  # both 'aa' occurrences
    assert out.loc[2, "dup_line_frac"] == 0.0
    assert out.loc[3, "n_lines"] == 1
    assert out.loc[3, "dup_line_char_frac"] == 0.0  # zero-char guard


def test_top_bigram_tiebreak_and_short_docs():
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "b c b c a a",  # 'b c' x2 beats; 'a a' x1
                    "one",  # <2 tokens: no output row
                    "z z z",  # 'z z' x2, total chars 3
                ]
            ),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(T.top_bigram_frac_batch, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 3]
    assert out.loc[1, "top_bigram"] == "b c"
    assert out.loc[1, "bg_count"] == 2
    assert out.loc[1, "top_bigram_char_frac"] == (2 * 2) / 6
    assert out.loc[3, "top_bigram"] == "z z"
    assert out.loc[3, "top_bigram_char_frac"] == (2 * 2) / 3


def test_top_bigram_tie_goes_lexicographic():
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["d e b c"]),  # all bigrams count 1
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(T.top_bigram_frac_batch, batch_format="pyarrow")
        .to_pandas()
    )
    assert out["top_bigram"].iloc[0] == "b c"


def test_unigram_nll_hand_computed():
    import math

    import ray.data as rd

    # corpus: 'a' x3, 'b' x1 -> total 4; p(a)=3/4, p(b)=1/4
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a a b", "a"]),
        }
    )
    out = (
        T.unigram_nll(rd.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    la, lb = -math.log(3 / 4), -math.log(1 / 4)
    assert out.loc[1, "n_tokens"] == 3
    assert abs(out.loc[1, "nll"] - (2 * la + lb) / 3) < 1e-12
    assert abs(out.loc[2, "nll"] - la) < 1e-12


def test_unigram_nll_min_count_floor():
    import math

    import ray.data as rd

    # 'rare' appears once; with min_count=2 it scores at the floor
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["common common common", "rare"]),
        }
    )
    out = (
        T.unigram_nll(rd.from_arrow(t), min_count=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert abs(out.loc[2, "nll"] - (-math.log(2 / 4))) < 1e-12


def test_neardup_keep_best_exemplar_rule(tmp_path):
    # cluster {1,2,3}: near-identical 12-token docs; 2 is longest ->
    # exemplar.  {4,5}: identical length -> tie breaks to min id 4.
    # 6: singleton.
    base = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, base),
        (2, base + " extraextraextra"),
        (3, base + " x"),
        (4, "p q r s t u v w x y z0 z1"),
        (5, "p q r s t u v w x y z0 z2"),  # same length as 4, near-dup
        (6, "totally different content here nothing shared at all ok"),
    ]
    sf = _write_docs(tmp_path, rows)
    out = (
        Q.neardup_keep_best(sf)
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    by_cluster = {r.cluster_id: r for r in out.itertuples()}
    assert by_cluster[1].doc_id == 2 and by_cluster[1].cluster_size == 3
    assert by_cluster[4].doc_id == 4 and by_cluster[4].cluster_size == 2
    assert by_cluster[6].doc_id == 6 and by_cluster[6].cluster_size == 1
    assert len(out) == 3


def test_containment_catches_quote_inclusion(tmp_path):
    # doc 2 quotes all of doc 1 inside much more text: containment of 1
    # in 2 is 1.0 but jaccard is ~0.23 -> jaccard misses, containment hits
    small = " ".join(f"q{i}" for i in range(12))  # 10 3-gram shingles
    big = small + " " + " ".join(f"pad{i}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(20))
    sf = _write_docs(tmp_path, [(1, small), (2, big), (3, other)])

    cont = Q.containment_pairs(sf).to_pandas()
    assert len(cont) == 1
    r = cont.iloc[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.n_inter == r.n_a  # fully contained
    assert r.n_b > r.n_a

    jac = Q.ngram_jaccard_exact(sf).to_pandas()
    assert len(jac) == 0  # jaccard at 0.3 misses the inclusion


def test_bigram_nll_hand_computed():
    import math

    import ray.data as rd

    # corpus bigrams: doc1 'a b','b a','a b'; doc2 'b a'
    # c('a b')=2, c('b a')=2; left counts: a->2, b->2
    # p('a b'|a)=1.0, p('b a'|b)=1.0 -> every nll term is 0... make it
    # non-trivial: add 'a c' so left 'a' splits 2/1
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b a b", "b a", "a c"]),
        }
    )
    out = (
        T.bigram_nll(rd.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # corpus: 'a b' x2, 'b a' x1, 'a c' x1 -> left a: 3, left b: 1
    lab = -math.log(2 / 3)  # p(b|a)
    lba = -math.log(1 / 1)  # p(a|b)
    lac = -math.log(1 / 3)  # p(c|a)
    assert out.loc[1, "n_bigrams"] == 3
    assert abs(out.loc[1, "nll2"] - (lab + lba + lab) / 3) < 1e-12
    assert abs(out.loc[2, "nll2"] - lba) < 1e-12
    assert abs(out.loc[3, "nll2"] - lac) < 1e-12


def test_bigram_nll_order_sensitivity_vs_unigram():
    """The bigram score separates a scrambled doc from a fluent one
    with identical token multiset — unigram NLL cannot."""
    import ray.data as rd

    fluent = "the cat sat on the mat"
    scrambled = "mat the on cat the sat"  # same multiset, one-off order
    ids = list(range(1, 11)) + [99]
    texts = [fluent] * 10 + [scrambled]
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
        }
    )
    uni = T.unigram_nll(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    bi = T.bigram_nll(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert abs(uni.loc[1, "nll"] - uni.loc[99, "nll"]) < 1e-9
    assert bi.loc[99, "nll2"] > bi.loc[1, "nll2"] + 0.5


def test_oov_rate_planted():
    import ray.data as rd

    # 'common' x4 (kept at min_count=3), each rare_i once (OOV)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                ["common common rare1 rare2", "common common rare3"]
            ),
        }
    )
    out = (
        T.oov_rate(rd.from_arrow(t), min_count=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_oov"] == 2 and out.loc[1, "oov_rate"] == 0.5
    assert out.loc[2, "n_oov"] == 1 and abs(out.loc[2, "oov_rate"] - 1 / 3) < 1e-15


def test_random_projection_distance_preservation_and_stability():
    import ray.data as rd

    from deepie_ray.ops import ann

    rng = np.random.default_rng(3)
    n, d = 60, 64
    X = rng.standard_normal((n, d))
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(X.tolist(), pa.list_(pa.float32())),
        }
    )
    outs = []
    for parts in (1, 4):
        ds = rd.from_arrow(t).repartition(parts)
        df = (
            ann.random_projection(ds, out_dim=24)
            .to_pandas()
            .sort_values("vec_id")
        )
        outs.append(np.array(df["proj"].tolist()))
    # bit-identical under any partitioning (pure per-row function)
    assert np.array_equal(outs[0], outs[1])
    P = outs[0]
    # JL distance preservation on random pairs (generous eps for k=24)
    Xf = X.astype(np.float32).astype(np.float64)  # arrow stores f32
    idx = rng.integers(0, n, size=(40, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    do = np.linalg.norm(Xf[idx[:, 0]] - Xf[idx[:, 1]], axis=1)
    dp = np.linalg.norm(P[idx[:, 0]] - P[idx[:, 1]], axis=1)
    ratio = dp / do
    assert (ratio > 0.5).all() and (ratio < 1.6).all()
    assert abs(np.median(ratio) - 1.0) < 0.25


def test_diff_by_key_statuses_and_empty_sides():
    import ray.data as rd

    from deepie_ray.ops import joins

    def fp_ds(pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([p[0] for p in pairs], pa.int64()),
                    "fp": pa.array([p[1] for p in pairs], pa.string()),
                }
            )
        )

    old = fp_ds([(1, "a"), (2, "b"), (3, "c")])
    new = fp_ds([(2, "b"), (3, "CHANGED"), (4, "d")])
    out = (
        joins.diff_by_key(old, new)
        .to_pandas()
        .set_index("doc_id")["status"]
        .sort_index()
    )
    assert out.to_dict() == {1: "removed", 3: "changed", 4: "added"}
    # empty sides
    assert (
        joins.diff_by_key(fp_ds([]), new).to_pandas()["status"] == "added"
    ).all()
    assert (
        joins.diff_by_key(old, fp_ds([])).to_pandas()["status"] == "removed"
    ).all()
    # identical versions -> empty diff
    assert joins.diff_by_key(old, old).count() == 0


def test_unigram_signals_fused_matches_standalone():
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["alpha beta alpha rare1", "beta beta gamma", "rare2"]
            ),
        }
    )
    ds = rd.from_arrow(t)
    fused = (
        T.unigram_signals(ds, min_count_oov=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    nll = T.unigram_nll(ds).to_pandas().set_index("doc_id").sort_index()
    oov = (
        T.oov_rate(ds, min_count=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert np.allclose(fused["nll"], nll["nll"], atol=0)
    assert np.allclose(fused["oov_rate"], oov["oov_rate"], atol=0)
    assert (fused["n_tokens"] == nll["n_tokens"]).all()


def test_cross_source_dup_matrix_planted(tmp_path):
    import pyarrow.parquet as pq2

    rows = [
        # 'shared1' in A,B; 'shared2' in A,B,C; unique texts elsewhere
        (1, "shared one content", "A"),
        (2, "shared one content", "B"),
        (3, "shared two content", "A"),
        (4, "shared two content", "B"),
        (5, "shared two content", "C"),
        (6, "only in a", "A"),
        (7, "only in c", "C"),
        (8, "shared one content", "A"),  # same content twice in A: still 1 distinct fp
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "source": pa.array([r[2] for r in rows]),
        }
    )
    pq2.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        Q.cross_source_dup_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["source_a", "source_b"])["n_shared"]
        .to_dict()
    )
    assert out == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


def test_new_ops_empty_documents_no_crash(tmp_path):
    """Empty corpus: every round-4 operator returns 0 rows, no crash
    (the empty-block join/schema bug class)."""
    import pyarrow.parquet as pq2

    pq2.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    d = str(tmp_path)
    for name in (
        "doc_unigram_nll",
        "doc_bigram_nll",
        "doc_oov_rate",
        "doc_line_repetition",
        "doc_top_bigram",
        "quality_gate_composite",
        "weighted_sample_docs",
        "doc_search_and",
        "cross_source_dup_matrix",
        "quality_classifier_scores",
        "bpe_train_merges",
        "doc_bpe_lengths",
    ):
        r = getattr(Q, name)(d)
        n = r.num_rows if isinstance(r, pa.Table) else r.count()
        assert n == 0, name


def test_jaccard_prefix_equals_blockjoin(tmp_path):
    from deepie_ray.ops import dedup as D

    base = [f"w{i}" for i in range(20)]
    rows = [
        (1, " ".join(base)),
        (2, " ".join(base[:18] + ["x1", "x2"])),  # high overlap
        (3, " ".join(base[:8] + [f"y{i}" for i in range(12)])),  # borderline
        (4, " ".join(f"z{i}" for i in range(20))),  # disjoint
        (5, " ".join(base)),  # exact dup of 1
    ]
    sf = _write_docs(tmp_path, rows)
    import ray.data as rd

    ds = rd.read_parquet(sf + "/documents.parquet")

    def canon(res):
        df = res.to_pandas() if not isinstance(res, pa.Table) else res.to_pandas()
        return (
            df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )

    for num in (3, 7):  # low AND near-dup thresholds
        a = canon(D.jaccard_exact_blockjoin(ds, num, 10))
        b = canon(D.jaccard_prefix_join(ds, num, 10))
        assert a.equals(b), (num, a, b)
    assert len(a) >= 1  # the planted dups actually matched at 0.7


def test_dsir_importance_numpy_parity_and_planted_direction():
    import ray.data as rd

    from deepie_ray.hashing import md5_hex

    # target domain (src0) talks about cats; raw background about tax.
    docs = [
        (1, "cat cat whiskers purr", "src0"),
        (2, "cat purr nap", "src0"),
        (3, "tax form ledger audit", "src1"),
        (4, "tax ledger filing", "src1"),
        (5, "cat whiskers nap purr", "src1"),  # target-like text, raw source
        (6, "audit filing form tax", "src1"),  # background-like text
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
            "text": pa.array([x for _, x, _ in docs]),
            "source": pa.array([s for _, _, s in docs]),
        }
    )
    B = 256
    out = (
        T.dsir_importance(rd.from_arrow(t), target_source="src0")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    # numpy oracle: same md5 bucket convention, add-one smoothing
    def bucket(w):
        return int(md5_hex(f"dsir-v1:{w}")[:8], 16) % B

    ct, cr = np.zeros(B), np.zeros(B)
    for _d, txt, src in docs:
        for w in txt.split():
            cr[bucket(w)] += 1
            if src == "src0":
                ct[bucket(w)] += 1
    ratio = np.log((ct + 1) / (ct.sum() + B)) - np.log(
        (cr + 1) / (cr.sum() + B)
    )
    for d, txt, _src in docs:
        want = sum(ratio[bucket(w)] for w in txt.split())
        assert abs(out.loc[d, "log_w"] - want) < 1e-12
        assert out.loc[d, "n_tokens"] == len(txt.split())

    # planted direction: target-like text scores above background-like
    # text regardless of its own source label
    assert out.loc[5, "log_w"] > out.loc[6, "log_w"] + 0.5
    assert out.loc[1, "log_w"] > out.loc[3, "log_w"]


def test_repeated_ngram_removal_planted():
    import ray.data as rd

    boiler = "subscribe to our newsletter"
    docs = [
        (1, f"alpha beta {boiler} gamma"),
        (2, f"{boiler} delta epsilon"),
        (3, f"zeta {boiler}"),
        (4, f"eta theta {boiler} iota kappa"),
        (5, f"unique words only here"),
        (6, boiler),  # fully covered -> NULL text_clean
        (7, ""),      # no tokens -> no output row
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([x for _, x in docs]),
        }
    )
    out = (
        T.repeated_ngram_removal(rd.from_arrow(t), df_threshold=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # the boilerplate phrase has two 3-grams ('subscribe to our',
    # 'to our newsletter'), each in 5 distinct docs (>= 4): all 4
    # phrase tokens are covered everywhere it appears.
    assert 7 not in out.index  # empty doc produces no row
    assert out.loc[1, "text_clean"] == "alpha beta gamma"
    assert out.loc[1, "n_dropped"] == 4 and out.loc[1, "n_kept"] == 3
    assert out.loc[2, "text_clean"] == "delta epsilon"
    assert out.loc[3, "text_clean"] == "zeta"
    assert out.loc[4, "text_clean"] == "eta theta iota kappa"
    assert out.loc[5, "text_clean"] == "unique words only here"
    assert out.loc[5, "n_dropped"] == 0
    assert out.loc[6, "text_clean"] is None and out.loc[6, "n_kept"] == 0


def test_repeated_ngram_removal_partitioning_independent():
    import ray.data as rd

    boiler = "all rights reserved worldwide"
    rows = [(i, f"w{i} x{i} {boiler} y{i}") for i in range(20)]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "text": pa.array([x for _, x in rows]),
        }
    )
    a = (
        T.repeated_ngram_removal(rd.from_arrow(t), df_threshold=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        T.repeated_ngram_removal(
            rd.from_arrow(t).repartition(7), df_threshold=5
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert (a["n_dropped"] == 4).all()


def test_term_pmi_planted_direction(tmp_path):
    # 'salt pepper' always together (high PMI); 'salt water' co-occur
    # only by chance across otherwise-independent docs (lower PMI).
    import pyarrow.parquet as pqw

    rows = []
    for i in range(10):
        rows.append((i, "salt pepper filler%d" % i))
    for i in range(10, 20):
        rows.append((i, "water filler%d" % i))
    for i in range(20, 25):
        rows.append((i, "salt water pepper"))
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "text": pa.array([x for _, x in rows]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pqw.write_table(t, str(d / "documents.parquet"))
    out = Q.term_pmi(str(d)).to_pandas()
    out = out.set_index(["term_a", "term_b"])
    # salt+pepper: n_ab=15, df both 15 -> pmi = ln(15*25/225) > 0
    sp = out.loc[("pepper", "salt"), "pmi"]
    sw = out.loc[("salt", "water"), "pmi"]
    assert abs(sp - np.log(15 * 25 / (15.0 * 15.0))) < 1e-12
    assert abs(sw - np.log(5 * 25 / (15.0 * 15.0))) < 1e-12
    assert sp > sw


def test_supplier_entity_resolution_transitive_chain(tmp_path):
    import pyarrow.parquet as pqw

    # chain: 'acme corp' ~1~ 'acme c0rp' ~1~ 'acme c0rp.' — ends are
    # distance 2 apart but must merge transitively; 'zenith' stays solo
    t = pa.table(
        {
            "s_suppkey": pa.array([11, 12, 13, 14], pa.int64()),
            "s_name": pa.array(
                ["acme corp", "acme c0rp", "acme c0rp.", "zenith"]
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pqw.write_table(t, str(d / "supplier.parquet"))
    out = (
        Q.supplier_entity_resolution(str(d))
        .to_pandas()
        .set_index("s_suppkey")
        .sort_index()
    )
    assert out.loc[11, "canon_id"] == 11
    assert out.loc[12, "canon_id"] == 11
    assert out.loc[13, "canon_id"] == 11  # transitive, dist('acme corp','acme c0rp.')=2
    assert out.loc[14, "canon_id"] == 14  # singleton maps to itself


def test_range_sums_peer_inclusive_and_boundary():
    import ray.data as rd

    from deepie_ray.ops import analytic

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    ts = [base, base, base + H, base + H + np.timedelta64(1, "us")]
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            "ts": pa.array(list(ts), pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
        }
    )
    out = (
        analytic.range_sums(rd.from_arrow(t), "user_id", "ts", "event_id", "value")
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # peers at t0 both see BOTH peer rows (RANGE is peer-inclusive)
    assert out.loc[1, "range_cents"] == 300 and out.loc[2, "range_cents"] == 300
    # row 3 at exactly +1h: boundary is inclusive -> 100+200+400
    assert out.loc[3, "range_cents"] == 700 and out.loc[3, "range_n"] == 3
    # row 4 at +1h+1us: the two t0 rows fall out of the frame
    assert out.loc[4, "range_cents"] == 1200 and out.loc[4, "range_n"] == 2


def test_islands_segmentation_and_tie_break():
    import ray.data as rd

    from deepie_ray.ops import analytic

    base = np.datetime64("2024-01-01T00:00:00", "us")
    M = np.timedelta64(1, "m")
    # user 7: view,view,click,view -> 3 islands; the two t0 rows tie on
    # ts and are ordered by event_id (1 then 2), so the first island
    # spans both.  user 8: one null-ts row (dropped) + one click.
    t = pa.table(
        {
            "event_id": pa.array([2, 1, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
            "ts": pa.array(
                [base, base, base + M, base + 2 * M, None, base], pa.timestamp("us")
            ),
            "event_type": pa.array(
                ["view", "view", "click", "view", "view", "click"]
            ),
        }
    )
    out = (
        analytic.islands(rd.from_arrow(t), "user_id", "ts", "event_id", "event_type")
        .to_pandas()
        .sort_values(["user_id", "seg_no"])
        .reset_index(drop=True)
    )
    u7 = out[out.user_id == 7]
    assert list(u7.event_type) == ["view", "click", "view"]
    assert list(u7.n_rows) == [2, 1, 1]
    assert list(u7.seg_no) == [1, 2, 3]
    assert u7.iloc[0].ts_start == pd.Timestamp(base) and u7.iloc[0].ts_end == pd.Timestamp(base)
    assert u7.iloc[1].ts_start == pd.Timestamp(base + M)
    u8 = out[out.user_id == 8]
    assert len(u8) == 1 and u8.iloc[0].event_type == "click" and u8.iloc[0].n_rows == 1


def test_compact_events_export_collapses_files(tmp_path):
    import math

    from deepie_ray.queries import _hive_partition_file_stats

    # synthesize a small events table so the test owns its scale
    n = 4000
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "event_type": pa.array(
                [("view", "click")[i % 2] for i in range(n)]
            ),
            "ts": pa.array(
                np.datetime64("2024-01-01", "us")
                + np.arange(n).astype("timedelta64[s]").astype("timedelta64[us]"),
                pa.timestamp("us"),
            ),
            "user_id": pa.array(np.arange(n) % 7, pa.int64()),
            "value": pa.array(np.ones(n), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        Q.compact_events_export(str(tmp_path)).to_pandas().set_index("event_type")
    )
    # nothing lost
    assert int(out.loc["view", "n_rows"]) == 2000
    assert int(out.loc["click", "n_rows"]) == 2000
    # the written dirs are deterministic for this pid+sf_dir; re-derive
    import hashlib, os

    tag = hashlib.md5(str(tmp_path).encode()).hexdigest()[:12]
    small = _hive_partition_file_stats(
        f"/tmp/deepie_export/p{os.getpid()}_compact_small_{tag}", "event_type"
    )
    compacted = _hive_partition_file_stats(
        f"/tmp/deepie_export/p{os.getpid()}_compact_out_{tag}", "event_type"
    )
    for part in ("view", "click"):
        n_small, rows_small = small[part]
        n_out, rows_out = compacted[part]
        assert rows_small == rows_out == 2000
        # fragmentation was real (500-row files) and compaction undid it
        assert n_small >= math.ceil(2000 / 500)
        assert n_out < n_small
        assert n_out <= math.ceil(2000 / 50_000) + 1


def test_manifest_pruned_scan_reads_fraction_of_files():
    from deepie_ray.queries import _manifest_pruned_scan

    counts, n_total, n_read = _manifest_pruned_scan("/root/testdata/sf0.001")
    df = counts.to_pandas()
    # a ~10% time window over a time-clustered layout should prune
    # most files (allow slack for file-boundary overlap)
    assert n_total >= 3
    assert n_read < n_total
    assert n_read <= max(2, n_total // 2)
    assert (df["n_rows"] > 0).any()


def test_rolling_wau_window_semantics(tmp_path):
    # day 0: users {1,2}; day 3: {2}; day 10: {3} (gap > window)
    base = np.datetime64("2024-03-01T12:00:00", "us")
    D = np.timedelta64(1, "D")
    t = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "user_id": pa.array([1, 2, 2, 2, 3], pa.int64()),
            "ts": pa.array(
                [base, base, base + 3 * D, base + 3 * D, base + 10 * D],
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["view"] * 5),
            "value": pa.array([1.0] * 5, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        Q.events_rolling_wau(str(tmp_path))
        .to_pandas()
        .set_index("day")["wau"]
        .sort_index()
    )
    d0 = pd.Timestamp("2024-03-01")
    # only observed days appear
    assert set(out.index) == {d0, d0 + pd.Timedelta(days=3), d0 + pd.Timedelta(days=10)}
    assert out[d0] == 2                      # {1,2}
    assert out[d0 + pd.Timedelta(days=3)] == 2   # {1,2} from d0 still in window, +2 dedup
    assert out[d0 + pd.Timedelta(days=10)] == 1  # {3}; d3 is 7 days back (outside [d-6,d])


def test_apply_changelog_merge_semantics():
    import ray.data as rd

    from deepie_ray.ops import joins

    base = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4], pa.int64()),
                "v": pa.array([10, 20, 30, 40], pa.int64()),
            }
        )
    )
    changes = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([2, 3, 9], pa.int64()),
                "v": pa.array([99, 0, 90], pa.int64()),
                "op": pa.array(["U", "D", "I"]),
            }
        )
    )
    out = (
        joins.apply_changelog(base, changes, key_col="k")
        .to_pandas()
        .set_index("k")["v"]
        .sort_index()
    )
    assert dict(out) == {1: 10, 2: 99, 4: 40, 9: 90}

    # empty changelog: base unchanged
    empty = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "op": pa.array([], pa.string()),
            }
        )
    )
    out2 = joins.apply_changelog(base, empty, key_col="k").to_pandas()
    assert sorted(out2["k"]) == [1, 2, 3, 4]


def test_hll_error_bound_and_partition_invariance():
    import ray.data as rd

    from deepie_ray.ops import sketch as sk

    # direct numpy path: error bound across magnitudes
    for n in (100, 5000, 60000):
        h = sk.kmv_hash(list(range(n)))
        est = sk.hll_estimate(sk.hll_partial(h))
        assert abs(est - n) / n < 0.05, (n, est)

    # distributed path: merge-invariant under partitioning, same answer
    t = pa.table(
        {
            "k": pa.array(["a"] * 3000 + ["b"] * 1000),
            "v": pa.array(list(range(3000)) + list(range(500, 1500)), pa.int64()),
        }
    )
    outs = []
    for parts in (1, 7):
        df = (
            sk.grouped_hll_distinct(rd.from_arrow(t).repartition(parts), "k", "v")
            .to_pandas()
            .set_index("k")["hll_distinct"]
            .sort_index()
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    assert abs(outs[0]["a"] - 3000) / 3000 < 0.05
    assert abs(outs[0]["b"] - 1000) / 1000 < 0.05


def test_skyline_kernel_vs_bruteforce_and_combiner():
    import ray.data as rd

    from deepie_ray.queries import _skyline_table

    rng = np.random.default_rng(7)
    n = 400
    price = np.round(rng.uniform(1, 50, n), 2)
    size = rng.integers(1, 20, n).astype(np.int32)
    # plant exact duplicates (must survive or die together) and an
    # undominated corner
    price[10] = price[11] = 3.5
    size[10] = size[11] = 2
    price[12], size[12] = 0.5, 19
    t = pa.table(
        {
            "p_partkey": pa.array(np.arange(n), pa.int64()),
            "p_retailprice": pa.array(price, pa.float64()),
            "p_size": pa.array(size, pa.int32()),
        }
    )

    # brute-force O(n^2) oracle
    dominated = np.zeros(n, bool)
    for i in range(n):
        dom = (
            (price <= price[i])
            & (size <= size[i])
            & ((price < price[i]) | (size < size[i]))
        )
        dominated[i] = dom.any()
    want = set(np.nonzero(~dominated)[0].tolist())

    got = set(_skyline_table(t)["p_partkey"].to_pylist())
    assert got == want and 12 in got

    # combiner property: local skylines per block -> global pass gives
    # the identical frontier at any partitioning
    for parts in (1, 5):
        ds = (
            rd.from_arrow(t)
            .repartition(parts)
            .map_batches(_skyline_table, batch_format="pyarrow")
            .repartition(1)
            .map_batches(_skyline_table, batch_format="pyarrow")
        )
        assert set(ds.to_pandas()["p_partkey"]) == want

    # duplicates share fate
    assert (10 in got) == (11 in got)


def test_user_event_sequences_ordering_and_ties():
    import ray.data as rd

    import deepie_ray.queries as Q

    base = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    # user 1: ts tie at t0 broken by event_id (2 before 5); user 2: one row
    t = pa.table(
        {
            "event_id": pa.array([5, 2, 9, 1], pa.int64()),
            "ts": pa.array([base, base, base + S, base], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["b", "a", "c", "z"]),
        }
    )
    import tempfile, os
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (
            Q.user_event_sequences(d)
            .to_pandas()
            .set_index("user_id")
            .sort_index()
        )
    assert out.loc[1, "seq"] == "a,b,c" and out.loc[1, "n_events"] == 3
    assert out.loc[2, "seq"] == "z" and out.loc[2, "n_events"] == 1


def test_user_event_mode_tie_break_and_partials():
    import tempfile, os
    import pyarrow.parquet as pq
    import ray.data as rd

    import deepie_ray.queries as Q

    # user 1: a x2, b x2 -> tie broken to 'a'; user 2: c x3 beats d x1
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 2, 2], pa.int64()),
            "event_type": pa.array(["b", "a", "b", "a", "c", "c", "d", "c"]),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (
            Q.user_event_mode(d).to_pandas().set_index("user_id").sort_index()
        )
    assert out.loc[1, "mode_event_type"] == "a" and out.loc[1, "n"] == 2
    assert out.loc[2, "mode_event_type"] == "c" and out.loc[2, "n"] == 3


def test_copurchase_components_distributed_parity():
    """The size-gated resolver's DISTRIBUTED path must produce the same
    component map as the union-find fast path on the same edge set."""
    import ray.data as rd

    from deepie_ray.ops import dedup
    from deepie_ray.ops.canon import connected_components_driver

    rng = np.random.default_rng(11)
    # two chained components + isolated pair
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21)]
    # add random extra edges within {1..4} and {10..12}
    for _ in range(10):
        a, b = rng.integers(1, 5, 2)
        if a != b:
            edges.append((int(min(a, b)), int(max(a, b))))
    t = pa.table(
        {
            "id_a": pa.array([e[0] for e in edges], pa.int64()),
            "id_b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    want = connected_components_driver(edges)
    got = (
        dedup.components_from_pairs(
            rd.from_arrow(t).repartition(3),
            pa.int64(),
            num_partitions=4,
            force_distributed_cc=True,
        )
        .to_pandas()
        .set_index("doc_id")["cluster_id"]
        .to_dict()
    )
    assert got == want


def test_documents_checksum_row_order_invariant(sf_dir):
    import os
    import tempfile

    import pyarrow.parquet as pq

    import deepie_ray.queries as Q

    a = Q.documents_checksum(sf_dir)
    # the checksum is an addition fold: reversing row order (and hence
    # changing every block boundary) must give the identical value
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    with tempfile.TemporaryDirectory() as d:
        t2 = t.take(list(reversed(range(t.num_rows))))
        pq.write_table(t2, os.path.join(d, "documents.parquet"))
        b = Q.documents_checksum(d)
    assert int(a["checksum"][0]) == int(b["checksum"][0])
    assert int(a["n_rows"][0]) == int(b["n_rows"][0])


def test_fk_orphan_scan_plants_orphans():
    import os
    import tempfile

    import pyarrow.parquet as pq

    import deepie_ray.queries as Q

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    "o_custkey": pa.array([10, 11, 99], pa.int64()),  # 99 orphan
                }
            ),
            os.path.join(d, "orders.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([10, 11], pa.int64()),
                    "c_nationkey": pa.array([0, 77], pa.int32()),  # 77 orphan
                }
            ),
            os.path.join(d, "customer.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    # orderkeys 1,2 exist; 5 and 6 are orphans
                    "l_orderkey": pa.array([1, 2, 5, 6], pa.int64()),
                }
            ),
            os.path.join(d, "lineitem.parquet"),
        )
        pq.write_table(
            pa.table({"n_nationkey": pa.array([0], pa.int32())}),
            os.path.join(d, "nation.parquet"),
        )
        out = Q.fk_orphan_scan(d).set_index("relation")["n_orphans"]
    assert out["orders.o_custkey->customer"] == 1
    assert out["lineitem.l_orderkey->orders"] == 2
    assert out["customer.c_nationkey->nation"] == 1


def test_doc_compression_ratio_discriminates_repetition():
    import os
    import tempfile

    import pyarrow.parquet as pq

    import deepie_ray.queries as Q

    rng = np.random.default_rng(3)
    random_text = " ".join(
        "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), 8)) for _ in range(200)
    )
    repeated_text = "the same phrase again " * 80
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([random_text, repeated_text, ""]),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = Q.doc_compression_ratio(d).to_pandas().set_index("doc_id")
        out2 = Q.doc_compression_ratio(d).to_pandas().set_index("doc_id")
    # repetitive text compresses far below random-word text
    assert out.loc[2, "ratio_ppm"] < out.loc[1, "ratio_ppm"] / 3
    # empty doc sentinel
    assert out.loc[3, "n_bytes"] == 0 and out.loc[3, "ratio_ppm"] == -1
    # deterministic
    assert out.equals(out2)


def test_session_day_overlap_midnight_split():
    import os
    import tempfile

    import pyarrow.parquet as pq

    import deepie_ray.queries as Q

    # one session from 23:50 to 00:10 next day -> two day rows with
    # 10-minute overlaps; a point session at noon -> one row, 0 us
    base = np.datetime64("2024-03-01T23:50:00", "us")
    M = np.timedelta64(1, "m")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [base, base + 10 * M, base + 20 * M,
                 np.datetime64("2024-03-05T12:00:00", "us")],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (
            Q.session_day_overlap(d)
            .to_pandas()
            .sort_values(["user_id", "session_no", "day_start"])
            .reset_index(drop=True)
        )
    u7 = out[out.user_id == 7]
    assert len(u7) == 2
    assert list(u7.overlap_us) == [10 * 60 * 1_000_000, 10 * 60 * 1_000_000]
    assert u7.iloc[1].day_start - u7.iloc[0].day_start == 86400
    u8 = out[out.user_id == 8]
    assert len(u8) == 1 and u8.iloc[0].overlap_us == 0


def test_embedding_pca_projection_properties(sf_dir):
    import deepie_ray.queries as Q

    out = Q.embedding_pca_projection(sf_dir).to_pandas().sort_values("vec_id")
    pcs = out[[f"pc{j}" for j in range(1, 9)]].to_numpy()
    # variance ordering: component j explains at least as much as j+1
    var = pcs.var(axis=0, ddof=1)
    assert (np.diff(var) <= 1e-9).all(), var
    # projections are centered up to the 1e-4 quantization grid (the
    # fold is over floor(x*1e4) ints, so the mean carries a <=1e-4 bias)
    assert np.abs(pcs.mean(axis=0)).max() < 2e-4
    # cross-component correlation ~ 0 (orthogonal axes of the covariance)
    c = np.corrcoef(pcs.T)
    off = c[~np.eye(8, dtype=bool)]
    assert np.abs(off).max() < 0.05

    # partition-invariance is EXACT: the covariance fold is integer
    import os
    import tempfile

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    with tempfile.TemporaryDirectory() as d:
        t2 = t.take(list(reversed(range(t.num_rows))))
        pq.write_table(t2, os.path.join(d, "embeddings.parquet"))
        out2 = (
            Q.embedding_pca_projection(d).to_pandas().sort_values("vec_id")
        )
    a = out.reset_index(drop=True)
    b = out2.reset_index(drop=True)
    assert np.allclose(
        a[[f"pc{j}" for j in range(1, 9)]].to_numpy(),
        b[[f"pc{j}" for j in range(1, 9)]].to_numpy(),
        atol=1e-12,
    )


def test_minhash_recall_report_planted(tmp_path):
    """Planted near-dup pairs: the LSH path must find every exact
    Jaccard>=0.3 pair (recall 100) and verify truly (precision 100)."""
    import pyarrow.parquet as pq2

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = []
    for i in range(12):
        # fully distinct fillers: below 0.3 exact Jaccard to everything
        rows.append((i, " ".join(f"w{i}t{j}" for j in range(40))))
    # two planted near-identical pairs (one token changed)
    rows.append((100, base * 4 + "ending one"))
    rows.append((101, base * 4 + "ending two"))
    rows.append((200, "alpha beta gamma delta " * 10 + "x"))
    rows.append((201, "alpha beta gamma delta " * 10 + "y"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    pq2.write_table(t, str(tmp_path / "documents.parquet"))
    rep = Q.minhash_recall_report(str(tmp_path)).to_pandas().iloc[0]
    assert rep["n_exact"] >= 2  # both planted pairs are true positives
    assert rep["recall_pct"] == 100
    assert rep["precision_pct"] == 100
    assert rep["n_hit"] == rep["n_lsh"] == rep["n_exact"]


def test_session_final_doc_ops_empty_documents_no_crash(tmp_path):
    """Empty corpus: the final-session doc operators return 0 rows (or
    a typed all-zero report), no crash — the empty-block schema class."""
    import pandas as pd
    import pyarrow.parquet as pq2

    pq2.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    d = str(tmp_path)
    for name in ("phrase_search", "vocab_coverage_curve", "source_unigram_kl",
                 "chunk_dedup_reassembly"):
        r = getattr(Q, name)(d)
        if isinstance(r, pd.DataFrame):
            n = len(r)
        elif isinstance(r, pa.Table):
            n = r.num_rows
        else:
            n = r.count()
        assert n == 0, name
    rep = Q.minhash_recall_report(d).to_pandas().iloc[0]
    assert rep["n_exact"] == 0 and rep["recall_pct"] == 100


def test_session_final_event_ops_empty_events_no_crash(tmp_path):
    """Empty events table: the final-session event operators return a
    typed empty (or all-zero scalar) result, no crash."""
    import pandas as pd
    import pyarrow.parquet as pq2

    pq2.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    d = str(tmp_path)
    for name in (
        "events_running_max",
        "user_event_entropy",
        "events_value_winsorized",
        "user_value_twap",
    ):
        r = getattr(Q, name)(d)
        n = len(r) if isinstance(r, pd.DataFrame) else r.count()
        assert n == 0, name
    chi = Q.events_type_day_chi2(d)
    assert len(chi) == 1 and int(chi["n"].iloc[0]) == 0


# -------------------------------------------------- global prefix-sum packing


def test_doc_packing_global_duckdb_parity(sf_dir):
    import duckdb

    got = (
        Q.doc_packing_global(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.execute(
            r"""
            SELECT doc_id, n_tokens,
                   ((SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                    // 4096)::BIGINT AS seq_id
            FROM (SELECT doc_id,
                         len(regexp_split_to_array(text, '\s+'))::BIGINT
                           AS n_tokens
                  FROM documents)
            ORDER BY doc_id
            """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["seq_id"].is_monotonic_increasing


def test_global_exclusive_prefix_sum_partition_independent():
    import ray.data as rd

    from deepie_ray.ops.analytic import global_exclusive_prefix_sum

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    rng.shuffle(df.values)  # arrival order != key order
    a = (
        global_exclusive_prefix_sum(rd.from_pandas(df), "k", "v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    b = (
        global_exclusive_prefix_sum(rd.from_pandas(df).repartition(7), "k", "v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    want = df.sort_values("k")["v"].cumsum().shift(fill_value=0).to_numpy()
    np.testing.assert_array_equal(a["cum_before"].to_numpy(), want)
    # empty input: typed empty, no crash
    e = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                      "v": pd.Series([], dtype=np.int64)})
    assert global_exclusive_prefix_sum(rd.from_pandas(e), "k", "v").count() == 0


def test_interleaved_pack_invariants(sf_dir):
    import ray

    from deepie_ray import pipeline
    from deepie_ray.hashing import ws_tokens

    got = (
        Q.interleaved_pack(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # pure-Python expectation straight off the interleaved reader
    rows = pipeline.read_documents(sf_dir).take_all()
    exp = {}
    for r in rows:
        cost = 0
        nm = 0
        for s in r["spans"]:
            if s["kind"] == "text":
                cost += len(ws_tokens(s["text"] or ""))
            else:
                nm += 1
                cost += 64
        exp[r["doc_id"]] = (len(r["spans"]), nm, cost)
    assert len(got) == len(exp)
    for _, row in got.iterrows():
        ns, nm, cost = exp[row["doc_id"]]
        assert (row["n_spans"], row["n_media"], row["cost"]) == (ns, nm, cost)
    # seq ids: monotone in doc order, 0-based, contiguous, and every
    # sequence's fill matches the exclusive-prefix rule
    cum = got["cost"].cumsum().shift(fill_value=0).to_numpy()
    np.testing.assert_array_equal(got["seq_id"].to_numpy(), cum // 4096)
    assert got["seq_id"].iloc[0] == 0
    u = np.unique(got["seq_id"].to_numpy())
    np.testing.assert_array_equal(u, np.arange(len(u)))
