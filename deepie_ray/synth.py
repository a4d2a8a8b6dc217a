"""Deterministic synthetic interleaved-document corpus (FIXTURES.md F1).

Two entry points, both pure functions of their inputs:

* ``interleave_batch`` — turns the driver's flat ``documents`` parquet
  rows (doc_id:int64, text, ...) into the authoritative input shape
  (BASELINE.json ``input_hint``): 1-8 spans per doc, ~70% text, media
  spans interleaved, ``offset`` strictly increasing.  Per-doc RNG is
  seeded from the doc content hash, so the mapping is independent of
  row order, batching and partitioning.

* ``generate_documents`` — standalone corpus generator (seed, n_rows)
  for tests/bench without the driver testdata.

No wall-clock, no global RNG (FIXTURES.md: generators are pure
functions of (seed, n_rows)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import md5_hex, stable_u32
from .schema import DOCUMENTS, SPAN_STRUCT

_MEDIA_KINDS = ("image", "audio", "table", "video")

_VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "spark group query row data slow filter customer line batch value stream "
    "index plan cost page block cache disk read write shard split chunk node "
    "graph edge label token text span media link rank score model train"
).split()


def _doc_spans(doc_key: str, tokens: list[str], sent_lo: int = 4, sent_hi: int = 12):
    """Chunk tokens into sentence text-spans and interleave media spans.

    Deterministic per document: rng seeded from md5(doc_key).
    Returns a list of (kind, text, media_ref, offset) tuples with
    strictly increasing offsets (the per-row invariant the whole
    pipeline must preserve).
    """
    rng = np.random.default_rng(stable_u32(doc_key, "doc:"))
    spans = []
    offset = 0
    i = 0
    n = len(tokens)
    while i < n:
        k = int(rng.integers(sent_lo, sent_hi + 1))
        sent = tokens[i : i + k]
        i += k
        spans.append(("text", " ".join(sent), "", offset))
        offset += len(sent)
        if rng.random() < 0.3:
            kind = _MEDIA_KINDS[int(rng.integers(0, len(_MEDIA_KINDS)))]
            ref = "media://sha/" + md5_hex(doc_key + ":" + str(offset))
            spans.append((kind, "", ref, offset))
            offset += 1
    if not spans:
        spans.append(("text", "", "", 0))
    return spans


def spans_to_arrow(all_spans: list[list[tuple]]) -> pa.Array:
    """list-of-span-tuples per doc -> Arrow list<struct> column."""
    kinds, texts, refs, offs = [], [], [], []
    offsets = np.empty(len(all_spans) + 1, dtype=np.int32)
    offsets[0] = 0
    for i, spans in enumerate(all_spans):
        offsets[i + 1] = offsets[i] + len(spans)
        for k, t, r, o in spans:
            kinds.append(k)
            texts.append(t)
            refs.append(r)
            offs.append(o)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(refs, pa.string()),
            pa.array(offs, pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    return pa.ListArray.from_arrays(pa.array(offsets), struct)


def interleave_batch(batch: pa.Table) -> pa.Table:
    """Flat driver documents table -> interleaved-span documents table.

    Runs inside ``map_batches(batch_format='pyarrow')``; stateless.
    """
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    ids, all_spans = [], []
    for did, text in zip(doc_ids, texts):
        key = f"doc-{did:08d}" if isinstance(did, int) else str(did)
        ids.append(key)
        all_spans.append(_doc_spans(key, (text or "").split()))
    return pa.Table.from_arrays(
        [pa.array(ids, pa.string()), spans_to_arrow(all_spans)],
        schema=DOCUMENTS,
    )


_ACE_TYPES = ("PER", "ORG", "GPE", "LOC", "FAC")
_ACE_LABELS = (
    "NONE", "NONE", "NONE",  # weighted toward NONE like real corpora
    "PHYS(e1,e2)", "PART-WHOLE(e2,e1)", "ORG-AFF(e1,e2)", "PER-SOC(e1,e2)",
    "GEN-AFF(e2,e1)", "ART(e1,e2)",
)


def synth_ace_lines(
    n_rows: int,
    seed: int = 42,
    layout14: bool = True,
    id_offset: int = 0,
    with_kernel: bool = False,
) -> list[str]:
    """Deterministic ACE-format relation-mention lines (FIXTURES.md F2;
    format spec rnnRE/data/readMe.md:17-41).  All per-line alignment
    invariants hold (token/POS/chunk/constit/deprel/governor lengths,
    #1/#2 markers, dep-path endpoints = mention heads)."""
    lines = []
    for i in range(n_rows):
        rid = i + id_offset
        rng = np.random.default_rng(stable_u32(f"ace-{i}", f"as{seed}:"))
        n = int(rng.integers(5, 13))
        toks = [_VOCAB[int(j)] for j in rng.integers(0, len(_VOCAB), n)]
        p1 = int(rng.integers(0, n - 1))
        p2 = int(rng.integers(p1 + 1, n))
        t1, t2 = (
            _ACE_TYPES[int(rng.integers(0, len(_ACE_TYPES)))],
            _ACE_TYPES[int(rng.integers(0, len(_ACE_TYPES)))],
        )
        label = _ACE_LABELS[int(rng.integers(0, len(_ACE_LABELS)))]
        ann = []
        for k, w in enumerate(toks):
            if k == p1:
                ann.append(f"{w}/B-{t1}.NAM#1")
            elif k == p2:
                ann.append(f"{w}/B-{t2}.NOM#2")
            else:
                ann.append(f"{w}/O")
        feats = sorted(
            {
                f"qid:{rid}",
                f"HM1={toks[p1]}",
                f"HM2={toks[p2]}",
                f"ET12={t1}--{t2}",
                f"NUMWB={p2 - p1 - 1}",
            }
            | {f"WBO={w}" for w in toks[p1 + 1 : p2]}
        )
        constit = " ".join(["NP--VP"] * n)
        pos_seq = " ".join(["NN"] * n)
        chunk = " ".join(["B-NP"] * n)
        dep = f"{toks[p1]}-{p1 + 1} dep {toks[p2]}-{p2 + 1}"
        deprels = " ".join(["nsubj@det"] * n)
        govs = " ".join([toks[0]] * n)
        triples = f"dep({toks[p1]}-{p1 + 1}, {toks[p2]}-{p2 + 1})"
        if layout14:
            fields = [
                str(rid), label, "(S (NP placeholder))", f"{t1}@{t2}",
                " ".join(feats), " ".join(ann), constit, pos_seq, chunk,
                dep, deprels, govs, triples,
            ]
            if with_kernel:
                # field 13: 'PRED  label:score ...' (data/readMe.md; the
                # kernel SVM's per-class scores, J3)
                from .model import LABELS

                kpred = LABELS[int(rng.integers(0, len(LABELS)))]
                scores = " ".join(
                    f"{l}:{rng.uniform(-2, 2):.4f}" for l in LABELS
                )
                fields.append(f"{kpred} {scores}")
        else:
            fields = [
                str(rid), label, " ".join(feats), f"{t1}@{t2}", " ".join(ann),
                constit, pos_seq, chunk, dep, deprels, govs, triples,
            ]
        lines.append("\t".join(fields))
    return lines


def generate_documents(n_rows: int, seed: int = 42) -> pa.Table:
    """Standalone deterministic corpus: word-salad docs over a fixed
    vocabulary, then interleaved exactly like ``interleave_batch``."""
    ids, all_spans = [], []
    for i in range(n_rows):
        key = f"doc-{i:08d}"
        rng = np.random.default_rng(stable_u32(key, f"gen{seed}:"))
        n_tok = int(rng.integers(10, 90))
        toks = [_VOCAB[int(j)] for j in rng.integers(0, len(_VOCAB), n_tok)]
        ids.append(key)
        all_spans.append(_doc_spans(key, toks))
    return pa.Table.from_arrays(
        [pa.array(ids, pa.string()), spans_to_arrow(all_spans)],
        schema=DOCUMENTS,
    )
