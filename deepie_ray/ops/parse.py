"""Stage 1: interleaved documents -> candidate mention-pair table.

Replaces the reference's TSV parser + mention extractor (M1-M6,
``rnn_process_onlyExtra.py:283-463``): here the input is the graft's
interleaved span documents, media spans are passed over untouched (the
north-rule span invariant is "never mutate spans"; this stage only
*reads* text spans), text spans are tokenized and mentions detected by
the deterministic lexicon tagger (features.py).

Hot-path layout (round-4 verdict #2 — fully vectorized):

* tokenize every selected text span with ONE Arrow
  ``utf8_split_whitespace`` kernel, then drop empty tokens with one
  boolean mask + offset remap (``str.split()`` semantics);
* hash once per BATCH-DISTINCT token (``dictionary_encode`` + a
  module-level memo), then fan out to per-token arrays by ``take`` —
  per-token Python is gone, and an adversarial 100%-unique vocabulary
  costs one crc per distinct token per batch (verdict #8);
* mention-pair enumeration (window + per-sentence cap, M8) is numpy
  segment arithmetic over mention offsets — searchsorted for the
  distance window, capped segment cumsum for the first-K rule;
* feature ids are numpy uint64 mixes: fixed-arity families vectorize
  across all pairs at once; the variable-length families (WBO,
  BIGRAM) are per-token precomputes gathered by ragged offset
  arithmetic; per-pair set-dedup + sort is ONE global lexsort +
  run-boundary mask, emitted straight into an Arrow ListArray.

The row-oriented implementation is kept as ``sentence_rows`` /
``doc_to_pair_rows`` / ``extract_pairs_rows_fn`` — it is the oracle
twin and the parity pin for the vectorized path (tests/test_synth.py,
tests/test_kg_pipeline.py).  The stage is embarrassingly parallel with
no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..features import (
    _ENTITY_KEEP,
    _ENTITY_MOD,
    ENTITY_TYPES,
    F_BIGRAM,
    F_ET1,
    F_ET2,
    F_ET12,
    F_HM1,
    F_HM2,
    F_HM12,
    F_NUMWB,
    F_WBF,
    F_WBL,
    F_WBO,
    FEAT_BUCKETS,
    MAX_PAIR_DIST,
    MAX_PAIRS_PER_SENT,
    WORD_BUCKETS,
    _TYPE_HASH,
    entity_type_of,
    hash_head,
    mention_pairs,
    pair_feature_ids,
    token_hash,
)
from ..hashing import stable_u32
from ..schema import PAIRS

# pairs schema extended with the token-id sequence (GRU/CNN encoder path)
PAIRS_TOK = PAIRS.append(pa.field("token_ids", pa.list_(pa.int32())))


# ---------------------------------------------------------------- row path
# (oracle twin; single-threaded reference semantics)


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


def extract_pairs_rows_fn(batch: pa.Table, with_tokens: bool = False) -> pa.Table:
    """Row-oriented batch entry (the pre-round-5 hot path, kept as the
    parity twin of the vectorized ``extract_pairs_fn``)."""
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


# ----------------------------------------------------------- vectorized path

_M32 = np.uint64(0xFFFFFFFF)
_P = np.uint64(1000003)

# batch-distinct token memo: token -> (crc32 "tok:", lexicon code
# 0..6 or -1).  Bounded like the features.py caches; on overflow the
# cost is one crc per distinct token per batch, never per token.
_vocab_memo: dict[str, tuple[int, int]] = {}
_VOCAB_MEMO_MAX = 4_000_000

_TYPE_H_ARR = np.array([_TYPE_HASH[t] for t in ENTITY_TYPES], np.uint64)
_ENTITY_TYPES_ARR = pa.array(ENTITY_TYPES, pa.string())


def _vmix(salt: int, a: np.ndarray) -> np.ndarray:
    """Vectorized features._mix(salt, a) (single-round)."""
    h = np.uint64((salt * 1000003) & 0xFFFFFFFF)
    h = ((h ^ a.astype(np.uint64)) * _P) & _M32
    return (h % np.uint64(FEAT_BUCKETS)).astype(np.int64)


def _vmix2(salt: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized features._mix(salt, a, b) — including its ``if b:``
    quirk: when b == 0 the second round is skipped (exact parity with
    the scalar path)."""
    h0 = np.uint64((salt * 1000003) & 0xFFFFFFFF)
    h1 = ((h0 ^ a.astype(np.uint64)) * _P) & _M32
    h2 = ((h1 ^ b.astype(np.uint64)) * _P) & _M32
    h = np.where(b.astype(np.uint64) == 0, h1, h2)
    return (h % np.uint64(FEAT_BUCKETS)).astype(np.int64)


def _distinct_token_tables(tokens: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """tokens -> (tok_hash uint32-as-uint64 per token, lexicon code
    int64 per token) via dictionary-encode + module memo."""
    dic = tokens.dictionary_encode()
    vocab = dic.dictionary.to_pylist()
    idx = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    th = np.empty(len(vocab), np.uint64)
    lc = np.empty(len(vocab), np.int64)
    memo = _vocab_memo
    for vi, w in enumerate(vocab):
        hit = memo.get(w)
        if hit is None:
            t = stable_u32(w, "tok:")
            h = stable_u32(w, "lex:")
            c = (
                -1
                if h % _ENTITY_MOD >= _ENTITY_KEEP
                else h % len(ENTITY_TYPES)
            )
            hit = (t, c)
            if len(memo) < _VOCAB_MEMO_MAX:
                memo[w] = hit
        th[vi], lc[vi] = hit
    return th[idx], lc[idx]


def _ragged_gather(
    src: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Gather src[starts[i] : starts[i]+lens[i]] for all i ->
    (values, segment_index) flat arrays."""
    tot = int(lens.sum())
    if tot == 0:
        return np.empty(0, src.dtype), np.empty(0, np.int64)
    off = np.concatenate([[0], np.cumsum(lens)])[:-1]
    local = np.arange(tot, dtype=np.int64) - np.repeat(off, lens)
    flat = np.repeat(starts, lens) + local
    seg = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return src[flat], seg


def _empty(with_tokens: bool) -> pa.Table:
    return rows_to_pairs_table([], with_tokens)


def extract_pairs_fn(batch: pa.Table, with_tokens: bool = False) -> pa.Table:
    """Vectorized batch entry: documents batch -> pairs batch.  One
    Arrow split kernel + numpy segment arithmetic; Python only over
    batch-distinct tokens.  Pinned row-identical to
    ``extract_pairs_rows_fn``."""
    n_docs = len(batch)
    if n_docs == 0:
        return _empty(with_tokens)
    spans = batch["spans"].combine_chunks()
    span_lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    structs = spans.flatten()
    kinds = structs.field("kind")
    texts = structs.field("text")

    is_text = pc.fill_null(
        pc.and_kleene(pc.equal(kinds, "text"), pc.not_equal(texts, "")),
        False,
    ).to_numpy(zero_copy_only=False)
    sel = np.flatnonzero(is_text)
    if len(sel) == 0:
        return _empty(with_tokens)

    doc_of_span = np.repeat(np.arange(n_docs, dtype=np.int64), span_lens)
    doc_of_sent = doc_of_span[sel]
    n_sents = len(sel)
    sent_counts = np.bincount(doc_of_sent, minlength=n_docs)
    first_sent_of_doc = np.concatenate([[0], np.cumsum(sent_counts)])[:-1]
    sent_id_arr = np.arange(n_sents, dtype=np.int64) - first_sent_of_doc[doc_of_sent]

    # ---- tokenize (str.split() semantics: split on whitespace, drop
    # empty tokens via mask + offset remap)
    sel_texts = texts.take(pa.array(sel, pa.int64()))
    toklists = pc.utf8_split_whitespace(sel_texts)
    raw_tokens = toklists.flatten()
    raw_off = toklists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(raw_tokens, "").to_numpy(zero_copy_only=False)
    tokens = raw_tokens.filter(pa.array(nonempty))
    cum = np.concatenate([[0], np.cumsum(nonempty)])
    sent_tok_off = cum[raw_off]  # new offsets per sentence boundary
    n_tok = np.diff(sent_tok_off)
    n_all = int(sent_tok_off[-1])
    if n_all == 0:
        return _empty(with_tokens)

    tok_h, lex = _distinct_token_tables(tokens)
    sent_of_tok = np.repeat(np.arange(n_sents, dtype=np.int64), n_tok)
    pos_of_tok = np.arange(n_all, dtype=np.int64) - sent_tok_off[sent_of_tok]

    # ---- mentions + window/cap pair enumeration (M8)
    mg = np.flatnonzero(lex >= 0)
    if len(mg) == 0:
        return _empty(with_tokens)
    ms = sent_of_tok[mg]
    mpos = pos_of_tok[mg]
    K = np.int64(int(n_tok.max()) + MAX_PAIR_DIST + 2)
    key = ms * K + mpos
    j_hi = np.searchsorted(key, key + MAX_PAIR_DIST, side="right")
    c = j_hi - np.arange(len(mg), dtype=np.int64) - 1  # valid successors
    # per-sentence exclusive cumsum of c, capped at MAX_PAIRS_PER_SENT
    base_cs = np.cumsum(c) - c
    first_mention_of_sent = np.searchsorted(ms, np.arange(n_sents))
    o = base_cs - base_cs[first_mention_of_sent[ms]]
    n_i = np.clip(np.minimum(c, MAX_PAIRS_PER_SENT - o), 0, None)
    # sentences with a single mention produce c=0 everywhere; <2-mention
    # sentences therefore emit nothing, like the row path
    P = int(n_i.sum())
    if P == 0:
        return _empty(with_tokens)
    pair_a = np.repeat(np.arange(len(mg), dtype=np.int64), n_i)
    starts = np.concatenate([[0], np.cumsum(n_i)])[:-1]
    local = np.arange(P, dtype=np.int64) - np.repeat(starts, n_i)
    pair_b = pair_a + 1 + local
    k_in_sent = np.repeat(o, n_i) + local

    ga, gb = mg[pair_a], mg[pair_b]
    ps = ms[pair_a]
    pos1, pos2 = mpos[pair_a], mpos[pair_b]
    h1, h2 = tok_h[ga], tok_h[gb]
    lex1, lex2 = lex[ga], lex[gb]
    ty1, ty2 = _TYPE_H_ARR[lex1], _TYPE_H_ARR[lex2]
    nb = pos2 - pos1 - 1

    # ---- features: fixed-arity families across all pairs at once
    fixed = np.stack(
        [
            _vmix(F_HM1, h1),
            _vmix(F_HM2, h2),
            _vmix2(F_HM12, h1, h2),
            _vmix(F_ET1, ty1),
            _vmix(F_ET2, ty2),
            _vmix2(F_ET12, ty1, ty2),
            _vmix(F_NUMWB, np.minimum(nb, 8) + 1),
        ],
        axis=1,
    )  # (P, 7)
    all_pidx = [np.repeat(np.arange(P, dtype=np.int64), 7)]
    all_vals = [fixed.ravel()]

    nbpos = np.flatnonzero(nb > 0)
    if len(nbpos):
        wbf_a = _vmix(F_WBF, tok_h)
        wbl_a = _vmix(F_WBL, tok_h)
        all_pidx.append(np.concatenate([nbpos, nbpos]))
        all_vals.append(
            np.concatenate([wbf_a[ga[nbpos] + 1], wbl_a[gb[nbpos] - 1]])
        )

    # WBO: tokens pos1+2 .. pos2-2 (length max(0, n_between-2))
    L1 = np.maximum(nb - 2, 0)
    if L1.any():
        wbo_a = _vmix(F_WBO, tok_h)
        v, seg = _ragged_gather(wbo_a, ga + 2, L1)
        all_vals.append(v)
        all_pidx.append(seg)

    # BIGRAM: adjacent-token mixes over pos1 .. pos2-1 (length pos2-pos1)
    big_a = np.zeros(n_all, np.int64)
    if n_all > 1:
        big_a[:-1] = _vmix2(F_BIGRAM, tok_h[:-1], tok_h[1:])
    v, seg = _ragged_gather(big_a, ga, pos2 - pos1)
    all_vals.append(v)
    all_pidx.append(seg)

    pidx = np.concatenate(all_pidx)
    vals = np.concatenate(all_vals)
    order = np.lexsort((vals, pidx))
    pv, vv = pidx[order], vals[order]
    keep = np.empty(len(pv), bool)
    keep[0] = True
    keep[1:] = (pv[1:] != pv[:-1]) | (vv[1:] != vv[:-1])
    pv2, vv2 = pv[keep], vv[keep]
    fid_counts = np.bincount(pv2, minlength=P)
    fid_off = np.concatenate([[0], np.cumsum(fid_counts)]).astype(np.int32)
    fids = pa.ListArray.from_arrays(
        pa.array(fid_off, pa.int32()), pa.array(vv2.astype(np.int32), pa.int32())
    )

    # ---- output columns
    doc_idx = doc_of_sent[ps]
    doc_col = batch["doc_id"].combine_chunks().take(pa.array(doc_idx, pa.int64()))
    sent_str = pc.cast(pa.array(sent_id_arr[ps], pa.int64()), pa.string())
    k_str = pc.cast(pa.array(k_in_sent, pa.int64()), pa.string())
    pair_id = pc.binary_join_element_wise(doc_col, sent_str, k_str, ":")
    subj = tokens.take(pa.array(ga, pa.int64()))
    obj = tokens.take(pa.array(gb, pa.int64()))
    subj_type = _ENTITY_TYPES_ARR.take(pa.array(lex1, pa.int64()))
    obj_type = _ENTITY_TYPES_ARR.take(pa.array(lex2, pa.int64()))
    head_ids = (tok_h % np.uint64(WORD_BUCKETS)).astype(np.int32)

    arrays = [
        doc_col,
        pair_id,
        pa.array(sent_id_arr[ps].astype(np.int32), pa.int32()),
        subj,
        subj_type,
        obj,
        obj_type,
        pa.array(pos1.astype(np.int32), pa.int32()),
        pa.array(pos2.astype(np.int32), pa.int32()),
        pa.array(n_tok[ps].astype(np.int32), pa.int32()),
        fids,
        pa.array(head_ids[ga], pa.int32()),
        pa.array(head_ids[gb], pa.int32()),
    ]
    if with_tokens:
        tv, _ = _ragged_gather(head_ids, sent_tok_off[:-1][ps], n_tok[ps])
        toff = np.concatenate([[0], np.cumsum(n_tok[ps])]).astype(np.int32)
        arrays.append(
            pa.ListArray.from_arrays(
                pa.array(toff, pa.int32()), pa.array(tv, pa.int32())
            )
        )
        return pa.Table.from_arrays(arrays, schema=PAIRS_TOK)
    return pa.Table.from_arrays(arrays, schema=PAIRS)


def extract_pairs_tokens_fn(batch: pa.Table) -> pa.Table:
    return extract_pairs_fn(batch, with_tokens=True)


class ExtractPairs:
    """Actor-pool variant (same function; the hash memos live at module
    level so tasks and actors share the warm-cache benefit)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_pairs_fn(batch)
