"""Reference-shaped ACE workflow end-to-end (the reference's own E1+E3
composition, SURVEY §3, run Ray-Data-first):

    read ACE TSV (S1)
      -> validate/normalize rows (M1-M6, error side-channel)
      -> binary-feature dictionary with count cutoff on the corpus
         (A5, deterministic sorted ids)  [broadcast small side]
      -> dict-encode features (M12 second pass)
      -> MultiNN scorer actor pool (T3) over encoded features + head
         words
      -> emitted predictions + micro-P/R/F1 vs gold (A6)

This is the path a user of the reference would run on their own ACE
files; the graft's interleaved-document pipeline shares every stage
type but detects its own mentions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from . import model as M
from .features import hash_head
from .ops.dicts import binary_feature_dict, encode_column
from .ops.metrics import micro_prf_distributed
from .sources.ace import read_ace


def _to_pairs_like(batch: pa.Table) -> pa.Table:
    """ACE rows -> the scorer's input columns (heads hashed like the
    flagship path; features already dict-encoded in 'feat_ids')."""
    toks = batch["tokens"].to_pylist()
    p1 = batch["pos1"].to_pylist()
    p2 = batch["pos2"].to_pylist()
    h1 = [hash_head(t[a]) for t, a in zip(toks, p1)]
    h2 = [hash_head(t[b]) for t, b in zip(toks, p2)]
    cols = {
        "pair_id": batch["rel_id"],
        "gold_label": batch["gold_label"],
        "subj": pa.array([t[a] for t, a in zip(toks, p1)], pa.string()),
        "obj": pa.array([t[b] for t, b in zip(toks, p2)], pa.string()),
        "feat_ids": batch["feat_ids"],
        "head1_id": pa.array(h1, pa.int32()),
        "head2_id": pa.array(h2, pa.int32()),
    }
    if "kernel_scores" in batch.column_names:
        cols["kernel_scores"] = batch["kernel_scores"]
    return pa.table(cols)


def kernel_score_matrix(kernel_scores: list[str]) -> np.ndarray:
    """J3 kernel-score align (reference ``rnn_process_onlyExtra.py:
    465-472,262-279``): parse per-row ``label:score ...`` strings and
    re-key through the label dictionary into a fixed-order (B, n_labels)
    float matrix; unknown/absent labels -> 0 (the reference's
    zero-fill)."""
    out = np.zeros((len(kernel_scores), M.N_LABELS), dtype=np.float32)
    for i, s in enumerate(kernel_scores):
        if not s:
            continue
        for part in s.split():
            cut = part.rfind(":")
            if cut <= 0:
                continue
            lid = M.LABEL_TO_ID.get(part[:cut])
            if lid is not None:
                out[i, lid] = float(part[cut + 1 :])
    return out


class AceScorer:
    """MultiNN over dict-encoded binary features (id 0 = unseen/cutoff
    feature = zero embedding row, the reference's padding semantics)."""

    def __init__(self, seed: int = M.DEFAULT_SEED):
        self.weights = M.init_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ops.score import _list_column_to_numpy

        flat, offsets = _list_column_to_numpy(batch["feat_ids"])
        h1 = batch["head1_id"].to_numpy().astype(np.int64)
        h2 = batch["head2_id"].to_numpy().astype(np.int64)
        preds, probs = M.multinn_forward(
            self.weights, flat.astype(np.int64), offsets, h1, h2
        )
        labels = pa.array(np.asarray(M.LABELS)[preds], pa.string())
        return batch.append_column("pred_label", labels)


def ace_dep_view(batch: pa.Table):
    """M6 ``retrieveDepFeatures`` over REAL parsed dep paths: gather
    sentence-aligned (hashed) token ids at each row's ``dep_idxs``
    (rnn_process_onlyExtra.py:474-489).  Returns (token_ids padded,
    lengths, pos1, pos2, (dep_token_ids padded, dep_lengths))."""
    from .features import WORD_BUCKETS, token_hash

    toks = batch["tokens"].to_pylist()
    dep_idxs = batch["dep_idxs"].to_pylist()
    pos1 = batch["pos1"].to_numpy().astype(np.int64)
    pos2 = batch["pos2"].to_numpy().astype(np.int64)
    ids = [[token_hash(w) % WORD_BUCKETS for w in t] for t in toks]
    lengths = np.array([len(t) for t in toks], dtype=np.int64)
    token_ids = M.pad_token_batch(ids)
    B = len(toks)
    Td = max((len(d) for d in dep_idxs), default=1)
    idx = np.zeros((B, Td), dtype=np.int64)
    valid = np.zeros((B, Td), dtype=bool)
    dep_len = np.ones(B, dtype=np.int64)
    for i, d in enumerate(dep_idxs):
        k = max(len(d), 1)
        dep_len[i] = k
        idx[i, : len(d)] = d
        valid[i, : len(d)] = True
    dep_ids = M.gather_at_indices(token_ids, idx, valid)
    return token_ids, lengths, pos1, pos2, (dep_ids, dep_len)


class AceDualChannelScorer:
    """Dual-channel ``-dep`` scorer over ACE rows with REAL dependency
    paths (the reference's default seqType, rnnRE.py:701-744): channel
    2 consumes the parsed dep-path view, not the span fallback."""

    def __init__(self, seed: int = M.DEFAULT_SEED + 6):
        self.weights = M.init_dual_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        token_ids, lengths, pos1, pos2, dep_view = ace_dep_view(batch)
        preds, _ = M.dual_channel_forward(
            self.weights, token_ids, pos1, pos2, lengths, dep_view=dep_view
        )
        labels = pa.array(np.asarray(M.LABELS)[preds], pa.string())
        return batch.append_column("pred_label", labels)


class AceOneHotCNNScorer:
    """M13 ``features==1`` mode over ACE rows: the per-token POS
    sequence is dict-encoded upstream (index form in Arrow), expanded
    to one-hot INSIDE the actor per batch, concatenated with word
    embeddings, and fed to the multi-window CNN (rnnRE.py:82-118 +
    convolute).  ``pos_dict`` is the broadcast small side (sorted
    deterministic ids from 1; 0 = unseen/pad)."""

    def __init__(self, pos_dict: dict[str, int], seed: int = M.DEFAULT_SEED + 8):
        from .features import WORD_BUCKETS  # noqa: F401  (hash space doc)

        self.pos_dict = pos_dict
        self.weights = M.init_onehot_cnn_weights(seed, n_classes=len(pos_dict) + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .features import WORD_BUCKETS, token_hash

        toks = batch["tokens"].to_pylist()
        pos_seq = batch["pos_seq"].to_pylist()
        lengths = np.array([len(t) for t in toks], dtype=np.int64)
        token_ids = M.pad_token_batch(
            [[token_hash(w) % WORD_BUCKETS for w in t] for t in toks]
        )
        T = token_ids.shape[1]
        class_ids = np.zeros_like(token_ids)
        for i, seq in enumerate(pos_seq):
            for j, p in enumerate(seq[:T]):
                class_ids[i, j] = self.pos_dict.get(p, 0)
        preds, _ = M.onehot_cnn_forward(self.weights, token_ids, class_ids, lengths)
        labels = pa.array(np.asarray(M.LABELS)[preds], pa.string())
        return batch.append_column("pred_label", labels)


def build_ace_channel_dicts(rows: rd.Dataset) -> dict[str, dict[str, int]]:
    """Deterministic sorted-id dictionaries for every per-token
    categorical channel (M12 second pass for the M13 channel set):
    POS (preter), chunk (prepreter), constituent labels, dep-relation
    sets (grammar).  Broadcast small sides."""
    from .ops.dicts import build_dict

    return {
        "pos": build_dict(rows, "pos_seq"),
        "chunk": build_dict(rows, "chunk_seq"),
        "constit1": build_dict(rows, "constit1"),
        "constit2": build_dict(rows, "constit2"),
        "grammar": build_dict(rows, "dep_rel_sets"),
    }


class AceFullChannelScorer:
    """The FULL M13 per-token channel set, vectorized (rnnRE.py:31-210
    ``_generatePartialDataInstance``): word embeddings (+) one-hot POS,
    chunk, constit1/2 (+) multi-hot grammar (dep-relation sets), fed to
    the multi-window CNN.  Index form rides in Arrow; expansion to
    one-/multi-hot happens per batch inside the actor (SURVEY §7.6.8)."""

    def __init__(self, dicts: dict[str, dict[str, int]], seed: int = M.DEFAULT_SEED + 9):
        self.d = dicts
        self.dims = {k: len(v) + 1 for k, v in dicts.items()}
        extra = sum(self.dims.values())
        self.weights = M.init_channel_cnn_weights(seed, extra_dim=extra)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .features import WORD_BUCKETS, token_hash

        toks = batch["tokens"].to_pylist()
        lengths = np.array([len(t) for t in toks], dtype=np.int64)
        token_ids = M.pad_token_batch(
            [[token_hash(w) % WORD_BUCKETS for w in t] for t in toks]
        )
        B, T = token_ids.shape

        def ids_of(col: str, d: dict[str, int]) -> np.ndarray:
            out = np.zeros((B, T), dtype=np.int64)
            for i, seq in enumerate(batch[col].to_pylist()):
                for j, v in enumerate(seq[:T]):
                    out[i, j] = d.get(v, 0)
            return out

        x = [self.weights["E_word"][token_ids]]
        for col, key in (
            ("pos_seq", "pos"), ("chunk_seq", "chunk"),
            ("constit1", "constit1"), ("constit2", "constit2"),
        ):
            x.append(M.onehot_expand(ids_of(col, self.d[key]), self.dims[key]))
        gram = [
            [[self.d["grammar"].get(g, 0) for g in tok_set] for tok_set in row]
            for row in batch["dep_rel_sets"].to_pylist()
        ]
        x.append(M.multihot_expand(gram, T, self.dims["grammar"]))
        rep = np.concatenate(x, axis=2)
        preds, _ = M.channel_cnn_forward(self.weights, rep, lengths)
        labels = pa.array(np.asarray(M.LABELS)[preds], pa.string())
        return batch.append_column("pred_label", labels)


class AceKernelHybridScorer(AceScorer):
    """Hybrid with the optional kernel-score expert (reference
    ``hybridModel`` with ``kernelFets`` on, rnnReModels.py:1049-1146:
    the total score adds ``kernelScore`` inside the exp, i.e. the
    product of experts gains a fixed ``exp(kernelScore)`` factor)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ops.score import _list_column_to_numpy

        flat, offsets = _list_column_to_numpy(batch["feat_ids"])
        h1 = batch["head1_id"].to_numpy().astype(np.int64)
        h2 = batch["head2_id"].to_numpy().astype(np.int64)
        _, p_multi = M.multinn_forward(
            self.weights, flat.astype(np.int64), offsets, h1, h2
        )
        K = kernel_score_matrix(batch["kernel_scores"].to_pylist())
        logp = np.log(np.clip(p_multi, 1e-12, 1.0)) + K
        from . import nn

        probs = nn.softmax(logp)
        preds = probs.argmax(axis=1)
        labels = pa.array(np.asarray(M.LABELS)[preds], pa.string())
        return batch.append_column("pred_label", labels)


def score_ace_corpus(
    paths,
    cutoff: int = 2,
    score_concurrency: int | tuple = (1, 4),
    use_kernel: bool = False,
) -> tuple[rd.Dataset, dict[str, float], dict[str, int]]:
    """-> (predictions dataset, micro-P/R/F1 vs gold, feature dict)."""
    rows = read_ace(paths)
    clean = rows.map_batches(
        lambda t: t.filter(pc.equal(t["error"], "")), batch_format="pyarrow"
    ).materialize()  # consumed twice: dict build + scoring

    feat_dict = binary_feature_dict(clean, "binary_features", cutoff)
    encoded = encode_column(clean, "binary_features", feat_dict, "feat_ids", default=0)
    pairs = encoded.map_batches(_to_pairs_like, batch_format="pyarrow")
    scored = pairs.map_batches(
        AceKernelHybridScorer if use_kernel else AceScorer,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=score_concurrency,
    ).materialize()
    prf = micro_prf_distributed(scored, "pred_label", "gold_label")
    return scored, prf, feat_dict


def oracle_score_ace(
    lines: list[str], cutoff: int = 2, use_kernel: bool = False
) -> pa.Table:
    """Single-threaded oracle twin of ``score_ace_corpus`` (reference
    execution model: one process, dict state in memory)."""
    from collections import Counter

    from . import nn
    from .sources.ace import parse_ace_line

    rows = [parse_ace_line(l) for l in lines if l.strip()]
    rows = [r for r in rows if r["error"] == ""]
    counts = Counter()
    for r in rows:
        counts.update(set(r["binary_features"]))
    kept = sorted(f for f, c in counts.items() if c >= cutoff)
    fdict = {f: i for i, f in enumerate(kept, 1)}
    weights = M.init_weights()
    out = []
    for r in rows:
        fids = [fdict.get(f, 0) for f in r["binary_features"]]
        flat = np.asarray(fids, dtype=np.int64)
        offsets = np.array([0, len(flat)], dtype=np.int64)
        h1 = np.array([hash_head(r["tokens"][r["pos1"]])], dtype=np.int64)
        h2 = np.array([hash_head(r["tokens"][r["pos2"]])], dtype=np.int64)
        preds, probs = M.multinn_forward(weights, flat, offsets, h1, h2)
        if use_kernel:
            K = kernel_score_matrix([r["kernel_scores"]])
            probs = nn.softmax(np.log(np.clip(probs, 1e-12, 1.0)) + K)
            preds = probs.argmax(axis=1)
        out.append(
            {
                "pair_id": r["rel_id"],
                "gold_label": r["gold_label"],
                "pred_label": M.LABELS[int(preds[0])],
            }
        )
    return pa.Table.from_pylist(out)
