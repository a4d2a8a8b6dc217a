"""Text-analysis operators over the flat ``documents`` table — the
training-data-pipeline staples: token counting, quality scoring,
fingerprinting, language ID.

All are stateless/stateful ``map_batches`` stages.  Token counting and
quality ratios are defined to be exactly SQL-expressible (DuckDB
oracle parity): whitespace-regex tokenization, punctuation counted by
character class, stopwords from a fixed list.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import md5_hex

STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it", "for")

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s]")


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens) — whitespace tokenization, vectorized via the
    Arrow split kernel (zero Python-per-row)."""
    toks = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
    n = pc.list_value_length(toks)
    return pa.table({"doc_id": batch["doc_id"], "n_tokens": pc.cast(n, pa.int64())})


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality-scoring features as exact integer counts (ratios are a
    trivial division downstream; integers value-hash-match the SQL
    oracle with no float-rounding hazard): text length, punctuation
    chars, word count, stopword count.

    Fully Arrow-vectorized — char/punct/word counts are single compute
    kernels; the stopword count splits to a list column once and
    reduces per row with ``np.cumsum`` over the list offsets (no
    per-row Python).  RE2 (Arrow) and DuckDB share regex semantics, so
    the counts stay oracle-hash-exact.

    Character-class contract (RE2 on both sides): punctuation is any
    char that is not a Unicode letter/digit, underscore, or ASCII
    whitespace (``[^\\p{L}\\p{N}_\\s]`` — accented letters are NOT
    punctuation); word boundaries are RE2 ``\\s`` = ASCII whitespace
    only, so Unicode spaces (NBSP etc.) count as punctuation rather
    than separators.  This is a deliberate, documented deviation from
    Python's fully-Unicode ``\\w``/``\\s``."""
    text = pc.fill_null(batch["text"], "")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_punct = pc.cast(
        pc.count_substring_regex(text, pattern=r"[^\p{L}\p{N}_\s]"), pa.int64()
    )
    toks = pc.split_pattern_regex(pc.utf8_lower(text), pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    stop = pc.is_in(
        flat, value_set=pa.array(STOPWORDS, pa.string())
    ).to_numpy(zero_copy_only=False)
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    base = offs[0]  # offsets of a sliced ListArray need not start at 0
    cum_ne = np.concatenate(([0], np.cumsum(nonempty)))
    cum_st = np.concatenate(([0], np.cumsum(stop & nonempty)))
    n_words = cum_ne[offs[1:] - base] - cum_ne[offs[:-1] - base]
    n_stop = cum_st[offs[1:] - base] - cum_st[offs[:-1] - base]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars_m": n_chars,
            "n_punct": n_punct,
            "n_words": pa.array(n_words, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint = md5 of the lower-cased text (content
    addressing for exact dedup; DuckDB md5() parity)."""
    fps = [md5_hex((t or "").lower()) for t in batch["text"].to_pylist()]
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.string())}
    )


class LangId:
    """Language ID by character-n-gram profile similarity — a stateful
    stage: profiles are built once per actor in ``__init__``.

    Heuristic (no external models): score each language by overlap of
    the doc's top character trigrams with per-language seed profiles;
    back off to ASCII-range statistics.  On the synthetic corpus
    (English word salad with a ``lang`` column assigned independently)
    this is a *plumbing* operator — the prediction is deterministic but
    not meaningful, so its correctness check is rows-only.
    """

    PROFILES = {
        "en": ("the", "ing", "and", " th", "he ", "ion", " of", "ed "),
        "de": ("der", "ein", "ich", "sch", "und", "die", "en ", "ch "),
        "fr": ("les", "de ", "ion", "ent", "que", " le", "es ", "la "),
        "es": ("de ", "la ", "que", "ión", "los", "ar ", "el ", "en "),
        "zh": (),  # non-ASCII ratio fallback
    }

    def __init__(self):
        self.profiles = {
            lang: set(grams) for lang, grams in self.PROFILES.items() if grams
        }

    def _predict(self, text: str) -> str:
        if not text:
            return "unknown"
        non_ascii = sum(ord(c) > 127 for c in text) / len(text)
        if non_ascii > 0.3:
            return "zh"
        grams = {text[i : i + 3] for i in range(len(text) - 2)}
        best, best_score = "en", -1
        for lang, prof in sorted(self.profiles.items()):
            score = len(grams & prof)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._predict(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, pa.string())}
        )


_BPE_ISH = re.compile(r"\w+|[^\w\s]")


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-ish token counting: words + punctuation as separate tokens
    (the regex pre-tokenizer most BPE vocabularies use)."""
    texts = batch["text"].to_pylist()
    n = np.fromiter(
        (len(_BPE_ISH.findall(t or "")) for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    return pa.table({"doc_id": batch["doc_id"], "n_bpe_tokens": n})


def split_batch(batch: pa.Table, salt: str = "split-v1", val_pct: int = 5, test_pct: int = 5) -> pa.Table:
    """Deterministic train/val/test splitter: bucket = first 8 hex
    chars of md5(doc_id || ':' || salt) mod 100.  Content-addressed, so
    any partitioning of the corpus over any number of workers assigns
    every doc the same split — and the rule is ANSI-SQL-expressible, so
    the DuckDB oracle value-hash-verifies it end to end."""
    ids = batch["doc_id"].to_pylist()
    buckets = np.fromiter(
        (int(md5_hex(f"{d}:{salt}")[:8], 16) % 100 for d in ids),
        dtype=np.int64,
        count=len(ids),
    )
    split = np.where(
        buckets < test_pct,
        "test",
        np.where(buckets < test_pct + val_pct, "val", "train"),
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "bucket": pa.array(buckets, pa.int64()),
            "split": pa.array(split.tolist(), pa.string()),
        }
    )


def pack_sequences(
    ds, budget_tokens: int = 4096, id_col: str = "doc_id", text_col: str = "text"
):
    """Sequence packing (training-shard assembly): greedily bin docs
    into packs of <= ``budget_tokens`` whitespace tokens, one pack id
    per doc -> (doc_id, n_tokens, pack_id:string, pack_slot:int).

    Scale shape: packing is BLOCK-LOCAL (each block's docs pack into
    that block's own pack sequence, pack ids namespaced by a stable
    block fingerprint) — global packing would be an all-to-all sort for
    no training benefit, since shards only need bounded token budgets,
    not any particular global order.  Oversized docs get a singleton
    pack (flagged by n_tokens > budget) rather than being dropped.
    """
    import pyarrow.compute as pc_

    def pack(batch: pa.Table) -> pa.Table:
        toks = pc_.split_pattern_regex(batch[text_col], pattern=r"\s+")
        n = pc_.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_pylist()
        block_fp = md5_hex("|".join(str(i) for i in ids))[:12]
        pack_ids, slots = [], []
        cur_pack, cur_tokens, cur_slot = 0, 0, 0
        for ni in n:
            if cur_tokens and cur_tokens + ni > budget_tokens:
                cur_pack += 1
                cur_tokens, cur_slot = 0, 0
            pack_ids.append(f"{block_fp}:{cur_pack}")
            slots.append(cur_slot)
            cur_tokens += int(ni)
            cur_slot += 1
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n, pa.int64()),
                "pack_id": pa.array(pack_ids, pa.string()),
                "pack_slot": pa.array(slots, pa.int64()),
            }
        )

    return ds.map_batches(pack, batch_format="pyarrow")


def _nonempty_token_lists(text_col) -> pa.ListArray:
    """list<string> of lower-cased NONEMPTY whitespace tokens per row,
    tokenized with RE2 ``\\s`` semantics (oracle parity) — built from
    one Arrow split kernel plus numpy offset arithmetic, no per-row
    Python."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(text_col, "")), pattern=r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    ne = pc.not_equal(flat, "")
    ne_np = ne.to_numpy(zero_copy_only=False)
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    base = offs[0]  # offsets of a sliced ListArray need not start at 0
    cum = np.concatenate(([0], np.cumsum(ne_np)))
    new_offs = cum[offs - base]
    return pa.ListArray.from_arrays(
        pa.array(new_offs, pa.int32()), flat.filter(ne)
    )


def chunk_batch(batch: pa.Table, size: int = 32, stride: int = 24) -> pa.Table:
    """Overlapping fixed-size token chunking (LLM context-window prep):
    each doc explodes into chunks of ``size`` tokens starting every
    ``stride`` tokens (overlap = size - stride); the final chunk is the
    (possibly short) tail.  -> (doc_id, chunk_id, n_tokens, chunk_text).

    Fully vectorized: one Arrow split kernel, numpy explode arithmetic,
    one ``take`` of the flat token buffer, one ``binary_join`` — no
    Python loop at any fan-out level.  ``n_chunks = 1 + ceil(max(0,
    n - size)/stride)`` uses the add-then-floor form so the DuckDB
    oracle can reproduce it with ``//`` on non-negative operands
    (DuckDB ``//`` truncates toward zero — only safe for positives).
    Zero-token docs emit no chunks."""
    tok_list = _nonempty_token_lists(batch["text"])
    offs = tok_list.offsets.to_numpy(zero_copy_only=False)
    n = np.diff(offs).astype(np.int64)
    n_chunks = np.where(n > 0, 1 + (np.maximum(0, n - size) + stride - 1) // stride, 0)
    doc_idx = np.repeat(np.arange(len(n)), n_chunks)
    total_chunks = int(n_chunks.sum())
    cend = np.cumsum(n_chunks)
    chunk_id = np.arange(total_chunks) - np.repeat(cend - n_chunks, n_chunks)
    starts = chunk_id * stride
    lens = np.minimum(n[doc_idx] - starts, size)
    flat_start = offs[:-1][doc_idx] + starts
    total_toks = int(lens.sum())
    within = np.arange(total_toks) - np.repeat(np.cumsum(lens) - lens, lens)
    take_idx = np.repeat(flat_start, lens) + within
    taken = tok_list.values.take(pa.array(take_idx, pa.int64()))
    chunks = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(lens))), pa.int32()), taken
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"].take(pa.array(doc_idx, pa.int64())),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "chunk_text": pc.binary_join(chunks, " "),
        }
    )


# (name, RE2 pattern, replacement) — applied in ORDER for redaction;
# counts are taken on the original text.  Patterns are deliberately
# RE2-only constructs so the DuckDB oracle runs the identical regexes.
PII_PATTERNS = (
    ("email", r"[\w.+-]+@[\w-]+\.[\w.-]+", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d()\s-]{7,}\d", "<PHONE>"),
)


def pii_scan_batch(batch: pa.Table) -> pa.Table:
    """PII detection + redaction (training-data scrubbing staple):
    per-doc match counts for email/IPv4/phone patterns plus the
    redacted text.  One RE2 kernel per pattern (count on the original,
    replace sequentially in PII_PATTERNS order) — no per-row Python.
    The synthetic corpus contains no PII (counts are all zero there);
    the operator's real behavior is pinned by the pytest DuckDB oracle
    over a PII-laden table (test_pii_scan_matches_duckdb)."""
    text_col = pc.fill_null(batch["text"], "")
    cols: dict = {"doc_id": batch["doc_id"]}
    red = text_col
    for name, pat, tok in PII_PATTERNS:
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(text_col, pattern=pat), pa.int64()
        )
        red = pc.replace_substring_regex(red, pattern=pat, replacement=tok)
    cols["redacted"] = red
    return pa.table(cols)


def term_frequencies(batch: pa.Table) -> pa.Table:
    """(doc_id, term, tf) per-doc term counts.  Docs are rows, so each
    doc's counts are COMPLETE within its own batch — the explode needs
    no shuffle; one Arrow hash-group per batch does all the counting."""
    tok_list = _nonempty_token_lists(batch["text"])
    offs = tok_list.offsets.to_numpy(zero_copy_only=False)
    n = np.diff(offs)
    doc_idx = pa.array(np.repeat(np.arange(len(n)), n), pa.int64())
    g = (
        pa.table({"doc_id": batch["doc_id"].take(doc_idx), "term": tok_list.values})
        .group_by(["doc_id", "term"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {
            "doc_id": g["doc_id"],
            "term": g["term"],
            "tf": pc.cast(g["count_all"], pa.int64()),
        }
    )


def inverted_index_partials(batch: pa.Table, postings_cap: int = 100) -> pa.Table:
    """Per-batch inverted-index partials -> (term, df_partial,
    postings_partial).  ``postings_partial`` is the batch's lowest
    ``postings_cap`` doc_ids per term, sorted — the global lowest-cap
    is a subset of the union of per-batch lowest-caps, so the merge
    stage (sort + head) is exact while every shuffled row stays
    bounded at cap ids.  df is an exact distinct-doc count (term
    frequencies are per-doc distinct by construction)."""
    tf = term_frequencies(batch).to_pandas()
    if tf.empty:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "df_partial": pa.array([], pa.int64()),
                "postings_partial": pa.array([], pa.list_(pa.int64())),
            }
        )
    g = tf.sort_values(["term", "doc_id"]).groupby("term", sort=True)["doc_id"]
    terms, dfs, posts = [], [], []
    for term, ids in g:
        terms.append(term)
        dfs.append(len(ids))
        posts.append(ids.to_numpy()[:postings_cap])
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "df_partial": pa.array(dfs, pa.int64()),
            "postings_partial": pa.array(posts, pa.list_(pa.int64())),
        }
    )


def merge_inverted_index(df, postings_cap: int = 100):
    """map_groups merge of per-batch partials for ONE term:
    df = sum of partials; postings = lowest ``postings_cap`` of the
    union, comma-joined (strings value-hash exactly against the SQL
    oracle's ``string_agg``)."""
    import pandas as pd

    ids = np.sort(np.concatenate(df["postings_partial"].to_numpy()))[:postings_cap]
    return pd.DataFrame(
        {
            "term": [df["term"].iloc[0]],
            "df": [int(df["df_partial"].sum())],
            "postings": [",".join(str(i) for i in ids)],
        }
    )


def rolling_fingerprint_batch(batch: pa.Table, window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: min rolling hash over
    ``window``-token shingles (robust to small edits, unlike md5)."""
    from ..hashing import stable_u32, ws_tokens

    texts = batch["text"].to_pylist()
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = ws_tokens((t or "").lower())
        if len(toks) < window:
            out[i] = stable_u32(" ".join(toks), "roll:")
        else:
            out[i] = min(
                stable_u32(" ".join(toks[j : j + window]), "roll:")
                for j in range(len(toks) - window + 1)
            )
    return pa.table({"doc_id": batch["doc_id"], "roll_fp": out})


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Unicode text normalization (LLM-prep staple) -> (doc_id,
    norm_text, changed): Unicode lowercase, whitespace runs collapsed
    to one space, outer whitespace trimmed, then NFC canonical
    composition — bit-exact with the SQL twin because the operation
    ORDER matches AND both trims are the same RE2 ``\\s`` class (NOT
    Arrow's utf8_trim_whitespace, whose Unicode whitespace set strips
    U+2028-style spaces that RE2's ASCII ``\\s`` — and therefore the
    DuckDB twin — keeps).  Probed on combining accents and sharp-s.

    Lower/collapse/trim are Arrow kernels.  NFC composition is NOT:
    this Arrow build's ``utf8_normalize`` decomposes but never composes
    (measured: NFC of e+U+0301 stays decomposed), so composition falls
    back to ``unicodedata`` — applied ONLY to rows containing non-ASCII
    bytes (ASCII is NFC by construction), so the typical corpus batch
    never leaves the vectorized path."""
    import unicodedata

    norm = pc.replace_substring_regex(
        pc.replace_substring_regex(
            pc.utf8_lower(batch["text"]),
            pattern=r"\s+",
            replacement=" ",
        ),
        pattern=r"^\s+|\s+$",
        replacement="",
    )
    nonascii = pc.match_substring_regex(norm, pattern=r"[^\x00-\x7F]")
    if pc.any(nonascii).as_py():
        vals = norm.to_pylist()
        mask = nonascii.to_pylist()
        vals = [
            unicodedata.normalize("NFC", v) if (m and v is not None) else v
            for v, m in zip(vals, mask)
        ]
        norm = pa.array(vals, pa.string())
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "norm_text": norm,
            "changed": pc.invert(pc.equal(norm, batch["text"])),
        }
    )


def feature_hash_batch(
    batch: pa.Table, n_dims: int = 16, salt: str = "fh-v1"
) -> pa.Table:
    """Hashing-trick vectorizer partial (Weinberger et al. 2009): per
    doc, bag-of-words counts folded into ``n_dims`` hashed dimensions
    -> long-format (doc_id, dim, n) partial counts.  dim =
    int(md5(salt:token)[:8], 16) % n_dims — the repo's stable md5
    bucket convention, so the DuckDB twin reproduces it exactly.

    Vectorization: Arrow regex split + explode; md5 runs once per
    DISTINCT token in the batch (dictionary encode, hash the
    dictionary, ``take`` back) — the same trick as the entity-link
    lookup (ops/link.py)."""
    toks = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
    flat = pc.list_flatten(toks)
    reps = pc.list_parent_indices(toks)
    ids = batch["doc_id"].take(reps)
    keep = pc.not_equal(flat, "")
    flat, ids = flat.filter(keep), ids.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    d = flat.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    dict_dims = pa.array(
        [
            int(md5_hex(f"{salt}:{t}")[:8], 16) % n_dims
            for t in d.dictionary.to_pylist()
        ],
        pa.int64(),
    )
    dims = dict_dims.take(d.indices)
    g = (
        pa.table({"doc_id": ids, "dim": dims})
        .group_by(["doc_id", "dim"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {
            "doc_id": g["doc_id"],
            "dim": g["dim"],
            "n": pc.cast(g["count_all"], pa.int64()),
        }
    )


# ------------------------------------------------- unigram-LM quality score


def _explode_tokens(batch: pa.Table, text_col: str, id_col: str):
    """(flat nonempty token array, row-aligned id array) for a batch —
    one Arrow split kernel + parent-index fan-out, no per-row Python."""
    toks = pc.split_pattern_regex(
        pc.fill_null(batch[text_col], ""), pattern=r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    ids = batch[id_col].take(pc.list_parent_indices(toks))
    keep = pc.not_equal(flat, "")
    flat, ids = flat.filter(keep), ids.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, ids


def unigram_nll(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
):
    """Corpus-derived unigram-LM negative log-likelihood per document
    (the SQL-exact reduction of the CCNet/KenLM perplexity quality
    filter): pass 1 counts every token corpus-wide (combiner-first
    groupby), pass 2 scores each doc as ``mean(-ln(count(w)/total))``
    -> (doc_id, n_tokens:int64, nll:double).

    Scale shape: the vocabulary (sublinear in corpus bytes) is the only
    driver materialization; it ships via ``ray.put`` ONCE and each
    scoring actor reads it in ``__init__``.  At 100 TB set
    ``min_count`` > 1: tokens below the cutoff are dropped from the
    broadcast table and score at the floor probability
    ``min_count/total`` (documented approximation; the default 1 is
    exact and is what the DuckDB oracle mirrors).  Scoring looks up
    each batch's DISTINCT tokens once (dictionary encode + take), the
    per-doc mean is one Arrow group_by — docs never straddle batches,
    so the mean is final per batch and nothing shuffles.

    Reference parity: the reference has no corpus-LM scoring (engine
    brief surface); the vocab pass is A1 (rnnRE/rnn_process_onlyExtra.py
    word-count) re-used as a model, not copied.
    """
    import math

    import ray
    import ray.data as rd  # noqa: F401  (type only)
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ids = _explode_tokens(batch, text_col, id_col)
        g = pa.table({"w": flat}).group_by("w").aggregate([([], "count_all")])
        return pa.table(
            {"w": g["w"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("n", alias_name="n"))
    ).materialize()  # total + (filtered) vocab both consume it
    # total over ALL tokens (distributed fold), THEN prune: the driver
    # only ever holds the kept head of the vocabulary — with
    # min_count > 1 the rare tail (the big side of a Zipf vocab) is
    # filtered in the plan, not on the driver
    total = float(counts.sum("n") or 0)
    kept_ds = (
        counts
        if min_count <= 1
        else counts.map_batches(
            lambda t, mc=min_count: t.filter(
                pc.greater_equal(t["n"], mc)
            ),
            batch_format="pyarrow",
        )
    )
    kept = kept_ds.to_pandas()
    if "w" not in kept.columns:  # empty corpus: 0-row ds drops schema
        kept = pd.DataFrame({"w": [], "n": []})
    lp = dict(
        zip(kept["w"], (-np.log(kept["n"].to_numpy() / total)).tolist())
    )
    floor = -math.log(min_count / total) if total else 0.0
    lp_ref = ray.put((lp, floor))

    class Score:
        def __init__(self):
            self.lp, self.floor = ray.get(lp_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, ids = _explode_tokens(batch, text_col, id_col)
            if len(flat) == 0:
                return pa.table(
                    {
                        id_col: pa.array([], batch[id_col].type),
                        "n_tokens": pa.array([], pa.int64()),
                        "nll": pa.array([], pa.float64()),
                    }
                )
            d = flat.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            lut = pa.array(
                [self.lp.get(w, self.floor) for w in d.dictionary.to_pylist()],
                pa.float64(),
            )
            nll = lut.take(d.indices)
            g = (
                pa.table({id_col: ids, "nll": nll})
                .group_by(id_col)
                .aggregate([("nll", "mean"), ([], "count_all")])
            )
            return pa.table(
                {
                    id_col: g[id_col],
                    "n_tokens": pc.cast(g["count_all"], pa.int64()),
                    "nll": g["nll_mean"],
                }
            )

    from ..tuning import POOL_REMOTE_ARGS

    return ds.map_batches(
        Score, batch_format="pyarrow", concurrency=(1, 8), **POOL_REMOTE_ARGS
    )


# ------------------------------------------ Gopher-style repetition signals


def line_repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-doc duplicate-line signals (Gopher repetition rules, Rae et
    al. 2021 Table A1): fraction of lines that are repeats of an
    earlier line, and fraction of line characters inside duplicated
    lines -> (doc_id, n_lines:int64, dup_line_frac:double,
    dup_line_char_frac:double).

    One Arrow split on newline + explode + two batch-local group_bys;
    every division is over integers identical to the DuckDB twin's, so
    the doubles are bit-equal.  Docs never straddle batches — no
    shuffle."""
    lines = pc.split_pattern(pc.fill_null(batch["text"], ""), pattern="\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = pc.list_flatten(lines)
    ids = batch["doc_id"].take(pc.list_parent_indices(lines))
    g = (
        pa.table({"doc_id": ids, "line": flat})
        .group_by(["doc_id", "line"])
        .aggregate([([], "count_all")])
    )
    c = pc.cast(g["count_all"], pa.int64())
    ln = pc.cast(pc.utf8_length(g["line"]), pa.int64())
    chars = pc.multiply(c, ln)
    dup = pc.greater(c, 1)
    zero = pa.array(np.zeros(len(g), dtype=np.int64))
    g2 = (
        pa.table(
            {
                "doc_id": g["doc_id"],
                "c": c,
                "one": pa.array(np.ones(len(g), dtype=np.int64)),
                "chars": chars,
                "dup_chars": pc.if_else(dup, chars, zero),
            }
        )
        .group_by("doc_id")
        .aggregate([("c", "sum"), ("one", "sum"), ("chars", "sum"), ("dup_chars", "sum")])
    )
    n_lines = g2["c_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    distinct = g2["one_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    tot_chars = g2["chars_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    dup_chars = g2["dup_chars_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(
        {
            "doc_id": g2["doc_id"],
            "n_lines": pc.cast(g2["c_sum"], pa.int64()),
            "dup_line_frac": pa.array((n_lines - distinct) / n_lines),
            "dup_line_char_frac": pa.array(
                np.divide(
                    dup_chars,
                    tot_chars,
                    out=np.zeros_like(dup_chars),
                    where=tot_chars > 0,
                )
            ),
        }
    )


def top_bigram_frac_batch(batch: pa.Table) -> pa.Table:
    """Per-doc most-frequent word-2-gram coverage (the Gopher
    ``top_2gram_char_frac`` rule): chars covered by the single most
    common bigram over total token chars -> (doc_id, top_bigram,
    bg_count:int64, top_bigram_char_frac:double).  Ties break to the
    lexicographically smallest bigram (both sides).  Docs with <2
    nonempty tokens emit nothing (no bigram exists).

    Vectorized explode: numpy repeat/cumsum index arithmetic builds the
    (n_i - 1)-per-doc left-token indices, one ``binary_join_element_wise``
    materializes the bigram strings, the per-doc argmax is a
    batch-bounded pandas sort + drop_duplicates."""
    toks = pc.split_pattern_regex(
        pc.fill_null(batch["text"], ""), pattern=r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    base = offs[0]
    cum = np.concatenate(([0], np.cumsum(keep_np)))
    new_offs = cum[offs - base]  # nonempty-token offsets per doc
    flat = flat.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = np.diff(new_offs)
    tok_chars = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    # total token chars per doc (ALL tokens, the Gopher denominator)
    csum = np.concatenate(([0], np.cumsum(tok_chars, dtype=np.int64)))
    total_chars = csum[new_offs[1:]] - csum[new_offs[:-1]]
    # explode bigram left indices: n_i - 1 per doc
    nb = np.maximum(lens - 1, 0)
    doc_rep = np.repeat(np.arange(len(lens)), nb)
    within = np.arange(int(nb.sum())) - np.repeat(
        np.concatenate(([0], np.cumsum(nb)))[:-1], nb
    )
    left = new_offs[:-1][doc_rep] + within
    if len(left) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], batch["doc_id"].type),
                "top_bigram": pa.array([], pa.string()),
                "bg_count": pa.array([], pa.int64()),
                "top_bigram_char_frac": pa.array([], pa.float64()),
            }
        )
    li = pa.array(left, pa.int64())
    ri = pa.array(left + 1, pa.int64())
    bigrams = pc.binary_join_element_wise(flat.take(li), flat.take(ri), " ")
    ids = batch["doc_id"].take(pa.array(doc_rep, pa.int64()))
    g = (
        pa.table({"doc_id": ids, "bigram": bigrams})
        .group_by(["doc_id", "bigram"])
        .aggregate([([], "count_all")])
    )
    df = g.to_pandas()
    df = df.sort_values(
        ["doc_id", "count_all", "bigram"], ascending=[True, False, True]
    ).drop_duplicates("doc_id")
    tc = dict(
        zip(
            batch["doc_id"].to_pylist(),
            (doc_tc for doc_tc in total_chars.tolist()),
        )
    )
    denom = df["doc_id"].map(tc).to_numpy(dtype=np.float64)
    # bl = length(bigram) - 1 (tokens contain no whitespace)
    covered = (
        df["count_all"].to_numpy(dtype=np.int64)
        * (df["bigram"].str.len().to_numpy(dtype=np.int64) - 1)
    ).astype(np.float64)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy()),
            "top_bigram": pa.array(df["bigram"], pa.string()),
            "bg_count": pa.array(
                df["count_all"].to_numpy(dtype=np.int64), pa.int64()
            ),
            "top_bigram_char_frac": pa.array(covered / denom),
        }
    )


def _explode_bigrams(batch: pa.Table, text_col: str, id_col: str):
    """(row-aligned id array, bigram 'w1 w2' array, left-token array)
    for a batch — the repeat/cumsum explode of
    ``top_bigram_frac_batch`` factored for reuse.  Docs with <2
    nonempty tokens contribute nothing."""
    toks = pc.split_pattern_regex(
        pc.fill_null(batch[text_col], ""), pattern=r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    base = offs[0]
    cum = np.concatenate(([0], np.cumsum(keep_np)))
    new_offs = cum[offs - base]
    flat = flat.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = np.diff(new_offs)
    nb = np.maximum(lens - 1, 0)
    doc_rep = np.repeat(np.arange(len(lens)), nb)
    within = np.arange(int(nb.sum())) - np.repeat(
        np.concatenate(([0], np.cumsum(nb)))[:-1], nb
    )
    left = new_offs[:-1][doc_rep] + within
    if len(left) == 0:
        empty = pa.array([], pa.string())
        return pa.array([], batch[id_col].type), empty, empty
    li = pa.array(left, pa.int64())
    w1 = flat.take(li)
    bigrams = pc.binary_join_element_wise(
        w1, flat.take(pa.array(left + 1, pa.int64())), " "
    )
    ids = batch[id_col].take(pa.array(doc_rep, pa.int64()))
    return ids, bigrams, w1


def bigram_nll(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
):
    """Corpus-derived BIGRAM-LM negative log-likelihood per doc (the
    conditional upgrade of ``unigram_nll``; catches token-order
    scrambling that unigram perplexity cannot): score =
    ``mean(-ln(c(w1 w2) / c_left(w1)))`` over the doc's adjacent
    pairs, where both counts come from the same corpus-wide bigram
    pass -> (doc_id, n_bigrams:int64, nll2:double); docs with <2
    tokens emit nothing.

    One distributed combiner-first pass builds the bigram vocabulary;
    the left-token denominators derive from it on the driver (split on
    the first space — no second pass), and the broadcast table ships
    once via ``ray.put``.  ``min_count`` prunes the broadcast at 100 TB
    exactly as in ``unigram_nll`` (floor = min_count / c_left; the
    default 1 is exact and oracle-checked)."""
    import math  # noqa: F401

    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _ids, bigrams, _w1 = _explode_bigrams(batch, text_col, id_col)
        g = (
            pa.table({"bg": bigrams})
            .group_by("bg")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"bg": g["bg"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bg")
        .aggregate(Sum("n", alias_name="n"))
    )
    vocab = counts.to_pandas()  # bigram-vocabulary-bounded driver fold
    if len(vocab):
        w1 = vocab["bg"].str.split(" ", n=1).str[0]
        left_tot = vocab.groupby(w1)["n"].transform("sum")
        kept = vocab["n"] >= min_count
        nll = -np.log(vocab["n"].to_numpy() / left_tot.to_numpy())
        lp = dict(zip(vocab["bg"][kept], nll[kept].tolist()))
        floors = dict(
            zip(w1[kept], (-np.log(min_count / left_tot.to_numpy()))[kept])
        )
    else:
        lp, floors = {}, {}
    lp_ref = ray.put((lp, floors))

    class Score:
        def __init__(self):
            self.lp, self.floors = ray.get(lp_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, bigrams, w1 = _explode_bigrams(batch, text_col, id_col)
            if len(bigrams) == 0:
                return pa.table(
                    {
                        id_col: pa.array([], batch[id_col].type),
                        "n_bigrams": pa.array([], pa.int64()),
                        "nll2": pa.array([], pa.float64()),
                    }
                )
            d = bigrams.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            # distinct-bigram lookup; unknown bigram -> its left token's
            # floor (0.0 only if the left token itself was never seen,
            # which cannot happen scoring the training corpus)
            dict_bgs = d.dictionary.to_pylist()
            lut = pa.array(
                [
                    self.lp.get(
                        bg, self.floors.get(bg.split(" ", 1)[0], 0.0)
                    )
                    for bg in dict_bgs
                ],
                pa.float64(),
            )
            nll = lut.take(d.indices)
            g = (
                pa.table({id_col: ids, "nll2": nll})
                .group_by(id_col)
                .aggregate([("nll2", "mean"), ([], "count_all")])
            )
            return pa.table(
                {
                    id_col: g[id_col],
                    "n_bigrams": pc.cast(g["count_all"], pa.int64()),
                    "nll2": g["nll2_mean"],
                }
            )

    from ..tuning import POOL_REMOTE_ARGS

    return ds.map_batches(
        Score, batch_format="pyarrow", concurrency=(1, 8), **POOL_REMOTE_ARGS
    )


def oov_rate(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 3,
):
    """Per-doc out-of-vocabulary rate against the corpus vocabulary of
    tokens occurring >= ``min_count`` times (gibberish / OCR-noise
    quality signal) -> (doc_id, n_tokens:int64, n_oov:int64,
    oov_rate:double).

    The broadcast side is the KEPT vocabulary (count >= min_count) —
    the head of the Zipf curve, which is the SMALL side at any corpus
    size; the rare tail (the big side) never ships.  Membership is a
    distinct-token dictionary probe per batch."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ids = _explode_tokens(batch, text_col, id_col)
        g = pa.table({"w": flat}).group_by("w").aggregate([([], "count_all")])
        return pa.table(
            {"w": g["w"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("n", alias_name="n"))
    )
    # prune to the kept head IN THE PLAN — the driver never holds the
    # rare tail (the big side of a Zipf vocabulary)
    vocab = counts.map_batches(
        lambda t, mc=min_count: t.filter(pc.greater_equal(t["n"], mc)),
        batch_format="pyarrow",
    ).to_pandas()
    kept = set(vocab["w"]) if "w" in vocab.columns else set()
    kept_ref = ray.put(kept)

    class Score:
        def __init__(self):
            self.kept = ray.get(kept_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, ids = _explode_tokens(batch, text_col, id_col)
            if len(flat) == 0:
                return pa.table(
                    {
                        id_col: pa.array([], batch[id_col].type),
                        "n_tokens": pa.array([], pa.int64()),
                        "n_oov": pa.array([], pa.int64()),
                        "oov_rate": pa.array([], pa.float64()),
                    }
                )
            d = flat.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            is_oov = pa.array(
                [w not in self.kept for w in d.dictionary.to_pylist()],
                pa.bool_(),
            )
            oov = pc.cast(is_oov.take(d.indices), pa.int64())
            g = (
                pa.table({id_col: ids, "oov": oov})
                .group_by(id_col)
                .aggregate([("oov", "sum"), ([], "count_all")])
            )
            n_tok = pc.cast(g["count_all"], pa.int64())
            n_oov = pc.cast(g["oov_sum"], pa.int64())
            return pa.table(
                {
                    id_col: g[id_col],
                    "n_tokens": n_tok,
                    "n_oov": n_oov,
                    "oov_rate": pc.divide(
                        pc.cast(n_oov, pa.float64()),
                        pc.cast(n_tok, pa.float64()),
                    ),
                }
            )

    from ..tuning import POOL_REMOTE_ARGS

    return ds.map_batches(
        Score, batch_format="pyarrow", concurrency=(1, 8), **POOL_REMOTE_ARGS
    )


def unigram_signals(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count_oov: int = 3,
):
    """Fused single-pass variant of ``unigram_nll`` + ``oov_rate`` for
    gate pipelines: ONE corpus counts pass and ONE scoring pool emit
    both signals -> (doc_id, n_tokens:int64, nll:double,
    oov_rate:double).  Semantics identical to the standalone ops at
    min_count=1 (nll exact) / min_count_oov (oov).

    Scale note: exact nll keeps the FULL vocabulary logprob table on
    the driver/broadcast (the oracle-exact mode); at 100 TB use the
    standalone ``unigram_nll(min_count>1)``, whose vocab prune runs in
    the plan."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ids = _explode_tokens(batch, text_col, id_col)
        g = pa.table({"w": flat}).group_by("w").aggregate([([], "count_all")])
        return pa.table(
            {"w": g["w"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("n", alias_name="n"))
    )
    vocab = counts.to_pandas()
    if "w" not in vocab.columns:  # empty corpus: 0-row ds drops schema
        vocab = pd.DataFrame({"w": [], "n": []})
    total = float(vocab["n"].sum())
    lp = dict(
        zip(vocab["w"], (-np.log(vocab["n"].to_numpy() / total)).tolist())
    )
    kept = set(vocab.loc[vocab["n"] >= min_count_oov, "w"])
    ref = ray.put((lp, kept))

    class Score:
        def __init__(self):
            self.lp, self.kept = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, ids = _explode_tokens(batch, text_col, id_col)
            if len(flat) == 0:
                return pa.table(
                    {
                        id_col: pa.array([], batch[id_col].type),
                        "n_tokens": pa.array([], pa.int64()),
                        "nll": pa.array([], pa.float64()),
                        "oov_rate": pa.array([], pa.float64()),
                    }
                )
            d = flat.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            words = d.dictionary.to_pylist()
            lut_nll = pa.array(
                [self.lp.get(w, 0.0) for w in words], pa.float64()
            )
            lut_oov = pa.array(
                [w not in self.kept for w in words], pa.bool_()
            )
            idx = d.indices
            g = (
                pa.table(
                    {
                        id_col: ids,
                        "nll": lut_nll.take(idx),
                        "oov": pc.cast(lut_oov.take(idx), pa.int64()),
                    }
                )
                .group_by(id_col)
                .aggregate([("nll", "mean"), ("oov", "sum"), ([], "count_all")])
            )
            n_tok = pc.cast(g["count_all"], pa.int64())
            return pa.table(
                {
                    id_col: g[id_col],
                    "n_tokens": n_tok,
                    "nll": g["nll_mean"],
                    "oov_rate": pc.divide(
                        pc.cast(g["oov_sum"], pa.float64()),
                        pc.cast(n_tok, pa.float64()),
                    ),
                }
            )

    from ..tuning import POOL_REMOTE_ARGS

    return ds.map_batches(
        Score, batch_format="pyarrow", concurrency=(1, 8), **POOL_REMOTE_ARGS
    )


# ------------------------------------------------- DSIR importance weights


def dsir_importance(
    ds,
    target_source: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    n_buckets: int = 256,
    salt: str = "dsir-v1",
):
    """DSIR-style importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): per
    doc, the log importance weight of a hashed-unigram bag-of-words
    model of the TARGET domain (rows with ``source == target_source``)
    against the RAW corpus distribution
    -> (doc_id, n_tokens:int64, log_w:double).

        log_w(doc) = sum over tokens of
            ln((ct_b + 1) / (N_t + B)) - ln((cr_b + 1) / (N_r + B))

    where b is the token's md5 bucket (the repo's stable
    ``int(md5(salt:token)[:8], 16) % B`` convention, so the DuckDB
    twin reproduces bucket assignment exactly), ct/cr are target/raw
    bucket counts, N_t/N_r the target/raw token totals, and add-one
    smoothing runs over the B buckets.  The per-token term is computed
    in the SAME associativity as the SQL twin (two ``ln`` of ratios),
    so only summation order differs (~1e-15 relative).

    Scale shape: pass 1 is a combiner-first bucket-count aggregate
    whose output is EXACTLY B rows regardless of corpus size — the
    driver materialization is bounded by the constant B, not the data.
    Pass 2 streams documents against the broadcast B-float log-ratio
    vector (a few KB).  md5 runs once per DISTINCT token per batch
    (dictionary encode + ``take``), never per occurrence."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    def _explode_with_source(batch: pa.Table):
        toks = pc.split_pattern_regex(
            pc.fill_null(batch[text_col], ""), pattern=r"\s+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        ids = batch[id_col].take(par)
        src = batch[source_col].take(par)
        keep = pc.not_equal(flat, "")
        flat, ids, src = flat.filter(keep), ids.filter(keep), src.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        return flat, ids, src

    def _buckets(flat: pa.Array) -> pa.Array:
        d = flat.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        dict_b = pa.array(
            [
                int(md5_hex(f"{salt}:{t}")[:8], 16) % n_buckets
                for t in d.dictionary.to_pylist()
            ],
            pa.int64(),
        )
        return dict_b.take(d.indices)

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ids, src = _explode_with_source(batch)
        if len(flat) == 0:
            return pa.table(
                {
                    "b": pa.array([], pa.int64()),
                    "ct": pa.array([], pa.int64()),
                    "cr": pa.array([], pa.int64()),
                }
            )
        is_t = pc.cast(pc.equal(src, target_source), pa.int64())
        g = (
            pa.table({"b": _buckets(flat), "t": is_t})
            .group_by("b")
            .aggregate([("t", "sum"), ([], "count_all")])
        )
        return pa.table(
            {
                "b": g["b"],
                "ct": pc.cast(g["t_sum"], pa.int64()),
                "cr": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("ct", alias_name="ct"), Sum("cr", alias_name="cr"))
        .to_pandas()
    )  # bounded: <= n_buckets rows by construction
    ct = np.zeros(n_buckets, dtype=np.float64)
    cr = np.zeros(n_buckets, dtype=np.float64)
    if len(counts):
        ct[counts["b"].to_numpy()] = counts["ct"].to_numpy()
        cr[counts["b"].to_numpy()] = counts["cr"].to_numpy()
    n_t, n_r = float(ct.sum()), float(cr.sum())
    # same associativity as the SQL per-token term: ln of each ratio
    ratio = np.log((ct + 1.0) / (n_t + n_buckets)) - np.log(
        (cr + 1.0) / (n_r + n_buckets)
    )
    ratio_ref = ray.put(ratio)

    class Score:
        def __init__(self):
            self.ratio = ray.get(ratio_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, ids, _src = _explode_with_source(batch)
            if len(flat) == 0:
                return pa.table(
                    {
                        id_col: pa.array([], batch[id_col].type),
                        "n_tokens": pa.array([], pa.int64()),
                        "log_w": pa.array([], pa.float64()),
                    }
                )
            vals = pa.array(
                self.ratio[_buckets(flat).to_numpy()], pa.float64()
            )
            g = (
                pa.table({id_col: ids, "v": vals})
                .group_by(id_col)
                .aggregate([("v", "sum"), ([], "count_all")])
            )
            return pa.table(
                {
                    id_col: g[id_col],
                    "n_tokens": pc.cast(g["count_all"], pa.int64()),
                    "log_w": g["v_sum"],
                }
            )

    from ..tuning import POOL_REMOTE_ARGS

    return ds.map_batches(
        Score, batch_format="pyarrow", concurrency=(1, 8), **POOL_REMOTE_ARGS
    )


# ---------------------------------------- repeated-n-gram span removal


def repeated_ngram_removal(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_threshold: int = 5,
):
    """Cross-document boilerplate REMOVAL (the cleanup step on top of
    the ``repeated_ngrams`` detector; the RefinedWeb/CCNet-style
    recipe adapted to this corpus's one-line docs): every token
    covered by a word-3-gram that occurs in >= ``df_threshold``
    distinct documents is dropped, and the surviving tokens are
    re-joined -> (doc_id, n_kept:int64, n_dropped:int64,
    text_clean:string, NULL when every token was covered).  Documents
    with zero non-empty tokens produce no row (the SQL twin's
    token-relation semantics).

    Scale shape: pass 1 reduces to per-gram distinct-doc counts with a
    per-batch combiner (docs are row-atomic, so within-batch distinct
    (gram, doc) IS globally distinct) and keeps only the >= threshold
    HEAD — the boilerplate head is the small side at any corpus size.
    Pass 2 streams docs against the broadcast hot set; gram membership
    is probed once per DISTINCT gram per batch.  The final
    ``' '.join`` per doc is output assembly (the twin's string_agg),
    not a scan loop."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    def _tok(batch: pa.Table):
        toks = pc.split_pattern_regex(
            pc.fill_null(batch[text_col], ""), pattern=r"\s+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if isinstance(par, pa.ChunkedArray):
            par = par.combine_chunks()
        return flat, par.to_numpy().astype(np.int64)

    def _grams(flat: pa.Array, par: np.ndarray):
        n = len(flat)
        if n < 3:
            return None, None
        valid = (par[:-2] == par[1:-1]) & (par[:-2] == par[2:])
        grams = pc.binary_join_element_wise(
            flat.slice(0, n - 2),
            flat.slice(1, n - 2),
            flat.slice(2, n - 2),
            " ",
        )
        return grams, valid

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"gram": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
        flat, par = _tok(batch)
        grams, valid = _grams(flat, par)
        if grams is None:
            return empty
        g = grams.filter(pa.array(valid))
        p = pa.array(par[:-2][valid])
        if len(g) == 0:
            return empty
        d = pa.table({"gram": g, "p": p}).group_by(["gram", "p"]).aggregate([])
        c = d.group_by("gram").aggregate([([], "count_all")])
        return pa.table(
            {"gram": c["gram"], "df": pc.cast(c["count_all"], pa.int64())}
        )

    hot_df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("df", alias_name="df"))
        .map_batches(
            lambda t, th=df_threshold: t.select(["gram"]).filter(
                pc.greater_equal(t["df"], th)
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )  # bounded: the >= threshold boilerplate head only
    hot_ref = ray.put(
        set(hot_df["gram"]) if "gram" in hot_df.columns else set()
    )

    class Clean:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, par = _tok(batch)
            nrows = len(batch)
            n = len(flat)
            drop = np.zeros(n, dtype=bool)
            if n >= 3:
                grams, valid = _grams(flat, par)
                d = grams.dictionary_encode()
                if isinstance(d, pa.ChunkedArray):
                    d = d.combine_chunks()
                hit_dict = np.array(
                    [g in self.hot for g in d.dictionary.to_pylist()],
                    dtype=bool,
                )
                hit = hit_dict[d.indices.to_numpy()] & valid
                drop[:-2] |= hit
                drop[1:-1] |= hit
                drop[2:] |= hit
            kept_cnt = np.bincount(par[~drop], minlength=nrows).astype(
                np.int64
            )
            drop_cnt = np.bincount(par[drop], minlength=nrows).astype(
                np.int64
            )
            tot = kept_cnt + drop_cnt
            words = flat.filter(pa.array(~drop)).to_pylist()
            kept_par = par[~drop]
            texts: list = [None] * nrows
            if len(kept_par):
                starts = np.flatnonzero(np.r_[True, np.diff(kept_par) != 0])
                bounds = np.r_[starts, len(kept_par)]
                for si in range(len(starts)):
                    texts[kept_par[starts[si]]] = " ".join(
                        words[bounds[si] : bounds[si + 1]]
                    )
            rows = np.flatnonzero(tot > 0)
            ids_all = batch[id_col].to_numpy()
            return pa.table(
                {
                    id_col: pa.array(ids_all[rows], batch[id_col].type),
                    "n_kept": pa.array(kept_cnt[rows], pa.int64()),
                    "n_dropped": pa.array(drop_cnt[rows], pa.int64()),
                    "text_clean": pa.array(
                        [texts[i] for i in rows], pa.string()
                    ),
                }
            )

    from ..tuning import POOL_REMOTE_ARGS

    return ds.map_batches(
        Clean, batch_format="pyarrow", concurrency=(1, 8), **POOL_REMOTE_ARGS
    )


def intra_doc_repetition(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """WITHIN-document duplicated-n-gram signal (the Gopher quality
    rule family's 'duplicate n-gram fraction', Rae et al. 2021) ->
    (doc_id, n_grams, n_dup_grams): per doc, the total word-3-gram
    occurrence count and the number of occurrences whose gram appears
    >= 2 times in the SAME doc.  Docs with < 3 tokens emit no row
    (they have no 3-grams).  Integer outputs keep the DuckDB twin
    hash-exact; the fraction is a trivial ratio downstream.

    Purely batch-local (a doc's text is one row), so this is a
    shuffle-free streaming map: one Arrow split kernel, one
    binary_join_element_wise over three slices of the flat token
    array, two Arrow group_by passes per batch — no per-row Python."""

    def per_batch(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], batch[id_col].type),
                "n_grams": pa.array([], pa.int64()),
                "n_dup_grams": pa.array([], pa.int64()),
            }
        )
        toks = _nonempty_token_lists(batch[text_col])
        flat = toks.values
        n = len(flat)
        if n < 3:
            return empty
        par = np.repeat(
            np.arange(len(toks), dtype=np.int64),
            np.diff(toks.offsets.to_numpy(zero_copy_only=False)),
        )
        valid = (par[:-2] == par[1:-1]) & (par[:-2] == par[2:])
        if not valid.any():
            return empty
        grams = pc.binary_join_element_wise(
            flat.slice(0, n - 2), flat.slice(1, n - 2), flat.slice(2, n - 2), " "
        )
        c = (
            pa.table(
                {"p": pa.array(par[:-2][valid]), "gram": grams.filter(pa.array(valid))}
            )
            .group_by(["p", "gram"])
            .aggregate([([], "count_all")])
        )
        cnt = pc.cast(c["count_all"], pa.int64())
        dup = pc.if_else(
            pc.greater_equal(cnt, 2), cnt, pa.scalar(0, pa.int64())
        )
        agg = (
            pa.table({"p": c["p"], "n": cnt, "d": dup})
            .group_by("p")
            .aggregate([("n", "sum"), ("d", "sum")])
        )
        return pa.table(
            {
                id_col: pc.take(batch[id_col], agg["p"]),
                "n_grams": pc.cast(agg["n_sum"], pa.int64()),
                "n_dup_grams": pc.cast(agg["d_sum"], pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")
