"""Property-based tests (hypothesis) for the invariants SURVEY §5 calls
out: span-sequence preservation, parser determinism/order-independence,
featurizer purity, minhash similarity monotonicity."""

import numpy as np
import pyarrow as pa
import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from deepie_ray import synth
from deepie_ray.features import entity_type_of, pair_feature_ids, token_hash
from deepie_ray.ops import dedup
from deepie_ray.ops.parse import doc_to_pair_rows, extract_pairs_fn
from deepie_ray.sources import ace

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x7F),
    min_size=1,
    max_size=8,
)
sentences = st.lists(words, min_size=0, max_size=30)


@settings(max_examples=50, deadline=None)
@given(sentences)
def test_featurizer_pure_and_sorted(tokens):
    hashes = [token_hash(w) for w in tokens]
    ments = [(i, w, entity_type_of(w)) for i, w in enumerate(tokens)]
    ments = [(i, w, t) for i, w, t in ments if t]
    if len(ments) < 2:
        return
    (p1, w1, t1), (p2, w2, t2) = ments[0], ments[1]
    a = pair_feature_ids(tokens, hashes, p1, p2, t1, t2)
    b = pair_feature_ids(tokens, hashes, p1, p2, t1, t2)
    assert a == b
    assert a == sorted(a) and len(a) == len(set(a))
    assert all(0 <= f < (1 << 18) for f in a)


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=1, max_value=60), st.integers(min_value=0, max_value=2**31))
def test_synth_doc_pure_and_span_invariants(n_tokens, seed):
    t = synth.generate_documents(3, seed=seed % 1000)
    for spans in t["spans"].to_pylist():
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs)
        for s in spans:
            assert (s["kind"] == "text") == (s["media_ref"] == "")


@settings(max_examples=30, deadline=None)
@given(sentences, sentences)
def test_parse_rows_independent_of_other_docs(toks_a, toks_b):
    """Parsing doc A must not depend on what else is in the batch —
    the partition-independence property distribution relies on."""
    sa = " ".join(toks_a)
    sb = " ".join(toks_b)
    spans_a = [{"kind": "text", "text": sa, "media_ref": "", "offset": 0}]
    spans_b = [{"kind": "text", "text": sb, "media_ref": "", "offset": 0}]
    alone = doc_to_pair_rows("d1", spans_a)
    together_tbl = extract_pairs_fn(
        pa.table(
            {
                "doc_id": pa.array(["d1", "d2"]),
                "spans": pa.array(
                    [spans_a, spans_b],
                    pa.list_(synth.SPAN_STRUCT),
                ),
            }
        )
    )
    together = [
        r
        for r in together_tbl.to_pylist()
        if r["doc_id"] == "d1"
    ]
    assert len(alone) == len(together)
    for row, r2 in zip(alone, together):
        assert row[1] == r2["pair_id"]
        assert row[10] == r2["feat_ids"]


@settings(max_examples=20, deadline=None)
@given(st.lists(words, min_size=10, max_size=40), st.integers(0, 9))
def test_minhash_similarity_monotone(tokens, cut):
    """More shared shingles -> minhash signatures agree on more perms."""
    a, b = dedup._perm_params()
    base = " ".join(tokens)
    # mutate `cut` tokens
    mut = list(tokens)
    for i in range(min(cut, len(mut))):
        mut[i] = mut[i] + "x"
    other = " ".join(mut)
    s_base = dedup.minhash_signature(dedup.shingles(base), a, b)
    s_same = dedup.minhash_signature(dedup.shingles(base), a, b)
    s_other = dedup.minhash_signature(dedup.shingles(other), a, b)
    assert np.array_equal(s_base, s_same)
    agree_self = (s_base == s_same).mean()
    agree_other = (s_base == s_other).mean()
    assert agree_self == 1.0
    assert agree_other <= 1.0


@settings(max_examples=40, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_simhash_deterministic_and_bounded(text):
    a = dedup.simhash64(text)
    assert a == dedup.simhash64(text)
    assert -(1 << 63) <= a < (1 << 63)


LABELS = st.sampled_from(
    ["NONE", "PHYS(e1,e2)", "PHYS(e2,e1)", "PER-SOC(e1,e2)", "ART(e2,e1)", "ORG-AFF(e1,e2)"]
)


@settings(max_examples=50, deadline=None)
@given(LABELS)
def test_ace_label_normalization_idempotent(label):
    n1 = ace.normalize_label(label)
    assert ace.normalize_label(n1) == n1
    if label.startswith("PHYS"):
        assert n1 == "PHYS"


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    quality=st.integers(30, 95),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_shape_and_bounded_error(h, w, quality, seed):
    """decode(encode(img)) preserves dtype/shape for ANY dims and
    quality, and the per-pixel error of a blockwise-constant image is
    bounded (such an image is DC-only per 8x8 block, so quantization
    error collapses to DC rounding: <=1.75/channel at quality>=30 DC
    steps, compounded <=~5 through the Cr/Cb->RGB transform)."""
    from deepie_ray.ops import media

    rng = np.random.default_rng(seed)
    # blockwise-constant: one color per 8x8 tile
    tiles = rng.integers(0, 256, ((h + 7) // 8, (w + 7) // 8, 3), np.int64)
    img = np.kron(tiles, np.ones((8, 8, 1), np.int64))[:h, :w].astype(np.uint8)
    out = media.decode_jpeg(media.encode_jpeg(img, quality))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


@settings(max_examples=60, deadline=None)
@given(garbage=st.binary(min_size=0, max_size=400), soi=st.booleans())
def test_jpeg_decode_garbage_never_escapes_valueerror(garbage, soi):
    """The quarantine contract under fuzz: decode_jpeg on arbitrary
    bytes (with or without a valid SOI prefix) either raises ValueError
    or returns a decoded array — never any other exception, never a
    hang (bounded by the 100M-pixel guard and marker-walk advance)."""
    from deepie_ray.ops import media

    data = (b"\xff\xd8" + garbage) if soi else garbage
    try:
        out = media.decode_jpeg(data)
        assert out.dtype == np.uint8
    except ValueError:
        pass


# ------------------------------------------- sorted-agg (ops/agg) properties



@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(-1000, 1000)),
        min_size=1,
        max_size=300,
    ),
    st.integers(1, 6),
    st.sampled_from(["sum", "max", "min"]),
)
def test_sorted_grouped_sum_property_vs_pandas(pairs, nparts, op):
    """The load-bearing aggregation path (ops/agg.sorted_grouped_sum)
    must equal pandas groupby for ANY key distribution, value mix,
    block layout and reduction op — hypothesis sweeps the space the
    hand-written boundary tests sample."""
    from deepie_ray.ops.agg import sorted_grouped_sum

    df = pd.DataFrame(pairs, columns=["k", "v"])
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(df["k"], pa.int64()),
                "v": pa.array(df["v"], pa.int64()),
            }
        )
    ).repartition(nparts)
    got = (
        sorted_grouped_sum(ds, ["k"], "v", "r", op=op)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        getattr(df.groupby("k")["v"], op)()
        .reset_index()
        .rename(columns={"v": "r"})
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == want["k"].tolist()
    assert got["r"].tolist() == want["r"].tolist()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(-50, 50)),
        min_size=1,
        max_size=200,
    ),
    st.integers(1, 5),
    st.integers(1, 4),
)
def test_sorted_grouped_head_property_vs_pandas(pairs, nparts, k):
    """Per-key top-k through the sort-shuffle path must equal the
    pandas window row_number()<=k (value desc, then value asc ties are
    resolved by the sort's total order on (k, v) — compare SETS of
    kept values per key to stay tie-agnostic)."""
    from deepie_ray.ops.agg import sorted_grouped_head

    df = pd.DataFrame(pairs, columns=["k", "v"])
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(df["k"], pa.int64()),
                "v": pa.array(df["v"], pa.int64()),
            }
        )
    ).repartition(nparts)
    got = sorted_grouped_head(
        ds, ["k"], ["v"], [True], k
    ).to_pandas()
    want_vals = df.sort_values("v", ascending=False).groupby("k")["v"].apply(
        lambda s: sorted(s.head(k).tolist())
    )
    got_vals = got.groupby("k")["v"].apply(lambda s: sorted(s.tolist()))
    assert got_vals.to_dict() == want_vals.to_dict()


# ---------------------------------------------------- vectorized parse fuzz

_span_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Zs", "Cc"),
    ),
    max_size=80,
)


@given(
    st.lists(
        st.lists(
            st.tuples(st.sampled_from(["text", "image", "audio"]), _span_text),
            max_size=4,
        ),
        min_size=0,
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_vectorized_parse_matches_row_path_fuzz(docs_spec):
    """Round-5 vectorized parse == row-oriented twin on arbitrary
    span structures and unicode/control-character text (tokenization,
    sentence numbering, window/cap enumeration, feature sets, token
    ids — full-table equality, both with_tokens modes)."""
    from deepie_ray.ops import parse
    from deepie_ray.schema import DOCUMENTS, SPAN_STRUCT

    rows = []
    for d, spans in enumerate(docs_spec):
        span_dicts = [
            {
                "kind": kind,
                "text": text if kind == "text" else "",
                "media_ref": "" if kind == "text" else f"m{j}",
                "offset": j,
            }
            for j, (kind, text) in enumerate(spans)
        ]
        rows.append((f"d{d}", span_dicts))
    tbl = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.string()),
            pa.array([r[1] for r in rows], pa.list_(SPAN_STRUCT)),
        ],
        schema=DOCUMENTS,
    )
    for wt in (False, True):
        a = parse.extract_pairs_rows_fn(tbl, wt)
        b = parse.extract_pairs_fn(tbl, wt)
        assert a.equals(b), f"with_tokens={wt}"
