"""End-to-end semantics of the composed llm_corpus_prep pipeline on a
planted corpus: each gate (length bounds, exact-dedup semi-join,
decontamination anti-join, split assignment) must act on exactly the
docs planted to trigger it."""

import numpy as np
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
