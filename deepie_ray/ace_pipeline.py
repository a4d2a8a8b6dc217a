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
    return pa.table(
        {
            "pair_id": batch["rel_id"],
            "gold_label": batch["gold_label"],
            "subj": pa.array([t[a] for t, a in zip(toks, p1)], pa.string()),
            "obj": pa.array([t[b] for t, b in zip(toks, p2)], pa.string()),
            "feat_ids": batch["feat_ids"],
            "head1_id": pa.array(h1, pa.int32()),
            "head2_id": pa.array(h2, pa.int32()),
        }
    )


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


def score_ace_corpus(
    paths,
    cutoff: int = 2,
    score_concurrency: int | tuple = (1, 4),
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
        AceScorer,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=score_concurrency,
    ).materialize()
    prf = micro_prf_distributed(scored, "pred_label", "gold_label")
    return scored, prf, feat_dict


def oracle_score_ace(lines: list[str], cutoff: int = 2) -> pa.Table:
    """Single-threaded oracle twin of ``score_ace_corpus`` (reference
    execution model: one process, dict state in memory)."""
    from collections import Counter

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
        preds, _ = M.multinn_forward(weights, flat, offsets, h1, h2)
        out.append(
            {
                "pair_id": r["rel_id"],
                "gold_label": r["gold_label"],
                "pred_label": M.LABELS[int(preds[0])],
            }
        )
    return pa.Table.from_pylist(out)
