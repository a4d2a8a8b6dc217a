"""Stage 1: interleaved documents -> candidate mention-pair table.

Replaces the reference's TSV parser + mention extractor (M1-M6,
``rnn_process_onlyExtra.py:283-463``): here the input is the graft's
interleaved span documents, media spans are passed over untouched (the
north-rule span invariant is "never mutate spans"; this stage only
*reads* text spans), text spans are tokenized and mentions detected by
the deterministic lexicon tagger (features.py).

Stateless ``map_batches`` stage, Arrow in / Arrow out.  Per-row work is
a Python loop over sentences — the tokenizer and featurizer are
string-level NLP, not a vectorizable kernel — but all hashing is
memoized per task and the stage is embarrassingly parallel with no
shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..features import (
    FEAT_BUCKETS,
    hash_head,
    mention_pairs,
    pair_feature_strings,
    sentence_mentions,
)
from ..hashing import MemoHasher
from ..schema import PAIRS


def doc_to_pair_rows(doc_id: str, spans: list[dict], hasher=None) -> list[tuple]:
    """One document -> list of pair tuples (column order = PAIRS schema).

    ``pair_id`` = "<doc_id>:<sent_id>:<k>" — stable per document, so
    the id is independent of partitioning (unlike the reference's
    sequential line ids).
    """
    rows = []
    sent_id = -1
    for span in spans:
        if span["kind"] != "text" or not span["text"]:
            continue
        sent_id += 1
        tokens = span["text"].split()
        mentions = sentence_mentions(tokens)
        if len(mentions) < 2:
            continue
        for k, (m1, m2) in enumerate(mention_pairs(mentions)):
            pos1, w1, t1 = m1
            pos2, w2, t2 = m2
            feats = pair_feature_strings(tokens, pos1, pos2, t1, t2)
            if hasher is not None:
                fids = [hasher(f) for f in feats]
            else:
                from ..features import hash_features

                fids = hash_features(feats)
            rows.append(
                (
                    doc_id,
                    f"{doc_id}:{sent_id}:{k}",
                    sent_id,
                    w1,
                    t1,
                    w2,
                    t2,
                    pos1,
                    pos2,
                    len(tokens),
                    fids,
                    hash_head(w1),
                    hash_head(w2),
                )
            )
    return rows


def rows_to_pairs_table(rows: list[tuple]) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in PAIRS]
    arrays = []
    for field, col in zip(PAIRS, cols):
        arrays.append(pa.array(list(col), type=field.type))
    return pa.Table.from_arrays(arrays, schema=PAIRS)


class ExtractPairs:
    """Actor-pool stage: holds the memoized feature hasher across
    batches (stateful setup once per actor, SURVEY §7.4)."""

    def __init__(self):
        self.hasher = MemoHasher(FEAT_BUCKETS, "feat:")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        rows: list[tuple] = []
        for did, spans in zip(doc_ids, spans_col):
            rows.extend(doc_to_pair_rows(did, spans or [], self.hasher))
        return rows_to_pairs_table(rows)


def extract_pairs_fn(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of ExtractPairs (no memo warmup)."""
    doc_ids = batch["doc_id"].to_pylist()
    spans_col = batch["spans"].to_pylist()
    rows: list[tuple] = []
    for did, spans in zip(doc_ids, spans_col):
        rows.extend(doc_to_pair_rows(did, spans or []))
    return rows_to_pairs_table(rows)
