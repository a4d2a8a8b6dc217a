"""synth.py: determinism + shape of the interleaved corpus (FIXTURES F1)."""

import pyarrow as pa
import pyarrow.parquet as pq

from deepie_ray import synth
from deepie_ray.schema import DOCUMENTS


def test_generate_documents_deterministic():
    a = synth.generate_documents(50, seed=42)
    b = synth.generate_documents(50, seed=42)
    assert a.equals(b)
    c = synth.generate_documents(50, seed=7)
    assert not a.equals(c)


def test_schema_and_offsets_monotonic():
    t = synth.generate_documents(40)
    assert t.schema.equals(DOCUMENTS)
    for spans in t["spans"].to_pylist():
        assert 1 <= len(spans)
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        for s in spans:
            if s["kind"] == "text":
                assert s["media_ref"] == ""
            else:
                assert s["text"] == "" and s["media_ref"].startswith("media://sha/")


def test_interleave_batch_order_independent():
    flat = pq.read_table("/root/testdata/sf0.001/documents.parquet").select(
        ["doc_id", "text"]
    )
    full = synth.interleave_batch(flat)
    # same rows through different batchings / orderings -> same per-doc spans
    rev = synth.interleave_batch(
        flat.take(list(range(len(flat) - 1, -1, -1)))
    )
    by_id = {d: s for d, s in zip(full["doc_id"].to_pylist(), full["spans"].to_pylist())}
    for d, s in zip(rev["doc_id"].to_pylist(), rev["spans"].to_pylist()):
        assert by_id[d] == s


def test_media_fraction_reasonable():
    t = synth.generate_documents(200)
    kinds = [s["kind"] for spans in t["spans"].to_pylist() for s in spans]
    text_frac = sum(k == "text" for k in kinds) / len(kinds)
    assert 0.6 < text_frac < 0.9
