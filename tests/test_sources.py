"""ACE TSV source (S1/M1-M6) + embedding readers (S2/S3) conformance
tests on synthetic fixture data (FIXTURES.md F2 — no reference data is
copied; lines are built to the documented spec)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from deepie_ray.sources import ace, embeddings


def make_ace_line_14(rel_id="7", label="PHYS(e1,e2)"):
    """A 14-field test-layout line per rnnRE/data/readMe.md:17-41."""
    sent = "the/O officials/B-PER.NOM#1 visited/O the/O station/B-ORG.NAM#2 today/O"
    n = 6
    constit = " ".join(["NP--VP"] * n)
    pos = "DT NNS VBD DT NN RB"
    chunk = "B-NP I-NP B-VP B-NP I-NP B-ADVP"
    dep = "officials-2 nsubj visited-3 dobj station-5"
    deprels = " ".join(["nsubj@det"] * n)
    govs = " ".join(["visited"] * n)
    deptriples = "nsubj(visited-3, officials-2)######dobj(visited-3, station-5)"
    kernel = "PHYS(e1,e2) PHYS(e1,e2):0.7 NONE:0.3"
    return "\t".join(
        [
            rel_id, label, "(S (NP ...))", "PER@ORG",
            "qid:7 HM1=officials HM2=station", sent, constit, pos, chunk,
            dep, deprels, govs, deptriples, kernel,
        ]
    )


def make_ace_line_12(rel_id="9", label="NONE"):
    """12-field fold layout: binary features in field 2, no tree."""
    sent = "a/O report/B-ORG.NOM#1 about/O hospitals/B-FAC.NOM#2"
    n = 4
    return "\t".join(
        [
            rel_id, label, "qid:9 WBO=about", "ORG@FAC", sent,
            " ".join(["NP--PP"] * n), "DT NN IN NNS",
            "B-NP I-NP B-PP B-NP", "report-2 prep hospitals-4",
            " ".join(["det@prep"] * n), " ".join(["about"] * n),
            "prep(report-2, hospitals-4)",
        ]
    )


def test_parse_14_field_line():
    row = ace.parse_ace_line(make_ace_line_14())
    assert row["error"] == ""
    assert row["gold_label"] == "PHYS"  # direction collapse M2
    assert row["tokens"][1] == "officials"
    assert row["pos1"] == 1 and row["pos2"] == 4  # head = last mention token
    assert row["type1"] == "PER" and row["type2"] == "ORG"
    assert row["binary_features"] == ["HM1=officials", "HM2=station"]  # qid dropped
    assert row["constit1"][0] == "NP" and row["constit2"][0] == "VP"
    assert row["dep_idxs"][0] == row["pos1"] and row["dep_idxs"][-1] == row["pos2"]
    assert row["kernel_pred"] == "PHYS(e1,e2)"


def test_parse_12_field_line():
    row = ace.parse_ace_line(make_ace_line_12())
    assert row["error"] == ""
    assert row["gold_label"] == "NONE"
    assert row["binary_features"] == ["WBO=about"]
    assert row["pos1"] == 1 and row["pos2"] == 3


def test_dep_path_reversal():
    # descending path must be reversed so idxs[0] == pos1 (M5/O1)
    w, r, i = ace.parse_dep_path("station-5 dobj visited-3 nsubj officials-2", 1, 4)
    assert i == [1, 2, 4]
    assert w[0] == "officials"
    # __NULL__ fallback
    w, r, i = ace.parse_dep_path("__NULL__", 3, 7)
    assert i == [3, 7] and r == ["__fallback__"]


def test_malformed_line_becomes_error_row_not_crash():
    bad = "1\tNONE\tonly\tfour\tfields"
    row = ace.parse_ace_line(bad)
    assert row["error"] != ""
    with pytest.raises(ValueError):
        ace.parse_ace_line(bad, strict=True)


def test_misaligned_sequences_flagged():
    line = make_ace_line_14()
    parts = line.split("\t")
    parts[7] = "DT NNS"  # POS shorter than tokens
    row = ace.parse_ace_line("\t".join(parts))
    assert "pos_seq" in row["error"]


def test_read_ace_dataset(tmp_path):
    p = tmp_path / "corpus.full.txt"
    p.write_text(make_ace_line_14() + "\n" + make_ace_line_12() + "\n")
    ds = ace.read_ace(str(p))
    rows = ds.take_all()
    assert len(rows) == 2
    assert {r["rel_id"] for r in rows} == {"7", "9"}


def test_underscore_normalization():
    sent = "new_york/B-GPE.NAM#1 hosts/O the_un/B-ORG.NAM#2"
    toks, m1, m2, t1, t2 = ace.parse_annotated_sentence(sent)
    assert toks[0] == "new york" and toks[2] == "the un"  # M11


# ---------------------------------------------------------- embeddings


def test_word2vec_bin_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vecs = {f"w{i}": rng.standard_normal(8).astype(np.float32) for i in range(20)}
    p = tmp_path / "emb.bin"
    embeddings.save_word2vec_bin(str(p), vecs)
    loaded = embeddings.load_word2vec_bin(str(p))
    assert set(loaded) == set(vecs)
    for w in vecs:
        assert np.allclose(loaded[w], vecs[w])
    sub = embeddings.load_word2vec_bin(str(p), vocab={"w3", "w7", "nope"})
    assert set(sub) == {"w3", "w7"}


def test_text_vectors(tmp_path):
    p = tmp_path / "emb.txt"
    p.write_text("a 1.0 2.0\nb 3.0 4.0\n")
    v = embeddings.load_text_vectors(str(p))
    assert np.allclose(v["b"], [3.0, 4.0])
    p2 = tmp_path / "bad.txt"
    p2.write_text("a 1.0 2.0\nb 3.0\n")
    with pytest.raises(ValueError):
        embeddings.load_text_vectors(str(p2))


def test_unknown_words_and_matrix():
    vecs = {"b": np.ones(4, np.float32)}
    embeddings.add_unknown_words(vecs, {"a", "b", "c"}, dim=4, seed=1)
    assert set(vecs) == {"a", "b", "c"}
    # deterministic across calls
    vecs2 = {"b": np.ones(4, np.float32)}
    embeddings.add_unknown_words(vecs2, {"a", "b", "c"}, dim=4, seed=1)
    assert np.allclose(vecs["a"], vecs2["a"])
    W, idx = embeddings.build_word_matrix(vecs)
    assert np.all(W[0] == 0)  # padding row pinned
    assert W.shape == (4, 4)
    assert idx == {"a": 1, "b": 2, "c": 3}  # sorted deterministic ids


# ------------------------------------------------------------ jsonl.gz


def test_jsonl_gz_roundtrip_adversarial_text(tmp_path):
    import gzip
    import glob

    import ray.data as rd

    from deepie_ray.sources import jsonl

    texts = [
        'quotes " and \\ backslash',
        "newline\ninside and tab\tinside",
        "non-ascii: café 中文 \U0001f600",
        "",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = str(tmp_path / "gz")
    manifest = jsonl.write_jsonl_gz(rd.from_arrow(t), out)
    assert manifest.to_pandas()["n"].sum() == len(texts)
    # files on disk are really gzip (magic bytes)
    files = glob.glob(out + "/*.jsonl.gz")
    assert files
    with open(files[0], "rb") as f:
        assert f.read(2) == b"\x1f\x8b"
    with gzip.open(files[0], "rt", encoding="utf-8") as f:
        assert f.readline().startswith("{")
    back = (
        jsonl.read_jsonl_gz(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(back["text"]) == texts
