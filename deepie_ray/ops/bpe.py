"""BPE tokenizer training (Sennrich et al. 2016) — vocabulary
induction, the step that builds the tokenizer every LLM pipeline
assumes exists.

Shape: the corpus-sized work is ONE distributed word-frequency pass
(combiner-first groupby, the same pattern as the unigram LM); merge
induction then runs over the WORD VOCABULARY (freq-weighted), which is
sublinear in corpus bytes and prunable with ``min_freq`` in the plan —
this is the standard vocabulary-level formulation (what HF tokenizers
does), not a per-document scan per merge.  Determinism: best pair =
(count desc, pair lexicographic asc); fixed merge count.

Encoding applies the learned ranks greedily (lowest rank first) per
word, memoized per DISTINCT word in a batch.

Reference parity: the reference consumes pre-tokenized TSV (no
tokenizer training anywhere in rnnRE); engine-brief surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..tuning import POOL_REMOTE_ARGS


def word_frequencies(ds, text_col: str = "text", min_freq: int = 1) -> pd.DataFrame:
    """Distributed word-frequency table -> pandas (w, n), pruned to
    ``min_freq`` IN THE PLAN (the driver holds the kept head only)."""
    from ray.data.aggregate import Sum

    from .text import _explode_tokens

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ids = _explode_tokens(batch, text_col, "doc_id")
        g = pa.table({"w": flat}).group_by("w").aggregate([([], "count_all")])
        return pa.table({"w": g["w"], "n": pc.cast(g["count_all"], pa.int64())})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("n", alias_name="n"))
    )
    if min_freq > 1:
        counts = counts.map_batches(
            lambda t, mf=min_freq: t.filter(pc.greater_equal(t["n"], mf)),
            batch_format="pyarrow",
        )
    df = counts.to_pandas()
    if "w" not in df.columns:  # empty corpus: 0-row ds drops schema
        df = pd.DataFrame({"w": [], "n": []})
    return df


def learn_merges(vocab: pd.DataFrame, n_merges: int = 50) -> list[tuple[str, str]]:
    """Freq-weighted BPE merge induction over a (w, n) vocabulary.
    Pure and deterministic — the single-process reference the pytest
    parity check also calls."""
    seqs: list[list[str]] = [list(w) for w in vocab["w"]]
    freqs = vocab["n"].to_numpy()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for s, f in zip(seqs, freqs):
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(f)
        if not pair_counts:
            break
        # deterministic tie-break: count desc, pair lexicographic asc
        best_count = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best)
        a, b = best
        ab = a + b
        for s in seqs:
            i = 0
            while i < len(s) - 1:
                if s[i] == a and s[i + 1] == b:
                    s[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def train_bpe(
    ds, n_merges: int = 50, min_freq: int = 1, text_col: str = "text"
) -> list[tuple[str, str]]:
    """documents -> learned merge list (rank order)."""
    return learn_merges(word_frequencies(ds, text_col, min_freq), n_merges)


def _encode_word(w: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE symbols for one word under the learned ranks
    (greedy lowest-rank-first, the standard BPE apply loop)."""
    s = list(w)
    while len(s) > 1:
        best_rank, best_i = None, -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return len(s)


def bpe_token_counts(ds, merges: list[tuple[str, str]], text_col: str = "text"):
    """Apply learned merges -> (doc_id, n_bpe_tokens:int64) per doc.
    The merge table broadcasts once; encoding runs once per DISTINCT
    word in a batch (dictionary encode + take — same memoization trick
    as the entity-link lookup)."""
    import ray

    from .text import _explode_tokens

    ranks_ref = ray.put({p: i for i, p in enumerate(merges)})

    class Encode:
        def __init__(self):
            self.ranks = ray.get(ranks_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, ids = _explode_tokens(batch, text_col, "doc_id")
            if len(flat) == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], batch["doc_id"].type),
                        "n_bpe_tokens": pa.array([], pa.int64()),
                    }
                )
            d = flat.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            lut = pa.array(
                [_encode_word(w, self.ranks) for w in d.dictionary.to_pylist()],
                pa.int64(),
            )
            g = (
                pa.table({"doc_id": ids, "n": lut.take(d.indices)})
                .group_by("doc_id")
                .aggregate([("n", "sum")])
            )
            return pa.table(
                {
                    "doc_id": g["doc_id"],
                    "n_bpe_tokens": pc.cast(g["n_sum"], pa.int64()),
                }
            )

    return ds.map_batches(
        Encode, batch_format="pyarrow", concurrency=(1, 8), **POOL_REMOTE_ARGS
    )
