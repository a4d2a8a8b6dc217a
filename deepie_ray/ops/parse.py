"""Stage 1: interleaved documents -> candidate mention-pair table.

Replaces the reference's TSV parser + mention extractor (M1-M6,
``rnn_process_onlyExtra.py:283-463``): here the input is the graft's
interleaved span documents, media spans are passed over untouched (the
north-rule span invariant is "never mutate spans"; this stage only
*reads* text spans), text spans are tokenized and mentions detected by
the deterministic lexicon tagger (features.py).

Hot-path layout: the spans column is consumed through its Arrow child
arrays (doc index from list offsets + text child values) — no
per-span Python dicts; token/entity/feature hashing is memoized at
module level (vocabulary-sized caches shared across batches within a
worker process).  The stage is embarrassingly parallel with no
shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..features import (
    WORD_BUCKETS,
    entity_type_of,
    hash_head,
    mention_pairs,
    pair_feature_ids,
    token_hash,
)
from ..schema import PAIRS

# pairs schema extended with the token-id sequence (GRU/CNN encoder path)
PAIRS_TOK = PAIRS.append(pa.field("token_ids", pa.list_(pa.int32())))


def sentence_rows(
    doc_id: str, sent_id: int, tokens: list[str], with_tokens: bool = False
) -> list[tuple]:
    """One tokenized sentence -> pair tuples (column order = PAIRS).

    ``pair_id`` = "<doc_id>:<sent_id>:<k>" — stable per document, so
    ids are independent of partitioning (unlike the reference's
    sequential line ids).
    """
    mentions = []
    for i, w in enumerate(tokens):
        t = entity_type_of(w)
        if t is not None:
            mentions.append((i, w, t))
    if len(mentions) < 2:
        return []
    hashes = [token_hash(w) for w in tokens]
    token_ids = (
        [h % WORD_BUCKETS for h in hashes] if with_tokens else None
    )
    rows = []
    for k, (m1, m2) in enumerate(mention_pairs(mentions)):
        pos1, w1, t1 = m1
        pos2, w2, t2 = m2
        fids = pair_feature_ids(tokens, hashes, pos1, pos2, t1, t2)
        row = (
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
        rows.append(row + (token_ids,) if with_tokens else row)
    return rows


def doc_to_pair_rows(doc_id: str, spans: list[dict]) -> list[tuple]:
    """Row-oriented entry (oracle / tests): document dict -> pair rows."""
    rows: list[tuple] = []
    sent_id = -1
    for span in spans:
        if span["kind"] != "text" or not span["text"]:
            continue
        sent_id += 1
        rows.extend(sentence_rows(doc_id, sent_id, span["text"].split()))
    return rows


def rows_to_pairs_table(rows: list[tuple], with_tokens: bool = False) -> pa.Table:
    schema = PAIRS_TOK if with_tokens else PAIRS
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    arrays = []
    for field, col in zip(schema, cols):
        arrays.append(pa.array(list(col), type=field.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def extract_pairs_fn(batch: pa.Table, with_tokens: bool = False) -> pa.Table:
    """Batch entry: documents batch -> pairs batch, via Arrow child
    arrays (no per-span dict materialization)."""
    doc_ids = batch["doc_id"].to_pylist()
    spans = batch["spans"].combine_chunks()
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    structs = spans.values
    base = offsets[0]
    kinds = structs.field("kind").to_pylist()
    texts = structs.field("text").to_pylist()

    rows: list[tuple] = []
    for d, doc_id in enumerate(doc_ids):
        lo, hi = offsets[d] - base, offsets[d + 1] - base
        sent_id = -1
        for s in range(lo, hi):
            if kinds[s] != "text":
                continue
            text = texts[s]
            if not text:
                continue
            sent_id += 1
            rows.extend(sentence_rows(doc_id, sent_id, text.split(), with_tokens))
    return rows_to_pairs_table(rows, with_tokens)


def extract_pairs_tokens_fn(batch: pa.Table) -> pa.Table:
    return extract_pairs_fn(batch, with_tokens=True)


class ExtractPairs:
    """Actor-pool variant (same function; the hash memos live at module
    level so tasks and actors share the warm-cache benefit)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_pairs_fn(batch)
