"""Stage 2: neural relation scoring as an actor-pool ``map_batches``.

The reference's predict path (``rnnRE.py:512-562``): assemble model
inputs per minibatch, run the compiled classify function, argmax +
probability matrix.  Here the model is a numpy forward pass held in
actor state (weights built once per actor in ``__init__`` — the
load-once-per-worker archetype of the Theano models, SURVEY §2.3), and
the ragged feature lists stay in Arrow until the last moment: the
list column's offsets/values buffers feed ``np.add.reduceat`` directly
— no per-row Python.

No wrap-padding to a batch multiple (reference M18): the forward pass
is row-wise, so ragged final batches are exact by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import model as M
from ..schema import TRIPLES

_LABELS_ARR = np.asarray(M.LABELS)


def _list_column_to_numpy(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """list<int32> column -> (flat_values, offsets) without Python rows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # strip any slice offset so offsets index into values correctly
    arr = col
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values.to_numpy(zero_copy_only=False)
    start = offsets[0]
    if start != 0:
        offsets = offsets - start
        values = values[start:]
    return values, offsets


def score_batch(weights: dict[str, np.ndarray], batch: pa.Table) -> pa.Table:
    """Pure function: PAIRS batch -> TRIPLES batch (all rows, incl NONE)."""
    flat, offsets = _list_column_to_numpy(batch["feat_ids"])
    head1 = batch["head1_id"].to_numpy().astype(np.int64)
    head2 = batch["head2_id"].to_numpy().astype(np.int64)
    preds, probs = M.multinn_forward(weights, flat, offsets, head1, head2)
    labels = pa.array(_LABELS_ARR[preds], pa.string())
    n = len(batch)
    prob_offsets = np.arange(0, (n + 1) * M.N_LABELS, M.N_LABELS, dtype=np.int32)
    prob_col = pa.ListArray.from_arrays(
        pa.array(prob_offsets), pa.array(probs.ravel(), pa.float32())
    )
    return pa.Table.from_arrays(
        [
            batch["doc_id"],
            batch["pair_id"],
            batch["subj"],
            batch["subj_type"],
            labels,
            batch["obj"],
            batch["obj_type"],
            prob_col,
        ],
        schema=TRIPLES,
    )


class MultiNNScorer:
    """Callable class for ``map_batches(MultiNNScorer, concurrency=N)``.

    Weights: pass a ``ray.put`` ObjectRef to share one copy through the
    object store (broadcast, J1 pattern), or None to rebuild from the
    seed in each actor (identical arrays either way — init is a pure
    function of the seed).
    """

    def __init__(self, weights_ref=None, seed: int = M.DEFAULT_SEED):
        if weights_ref is not None:
            import ray

            self.weights = ray.get(weights_ref)
        else:
            self.weights = M.init_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_batch(self.weights, batch)


def drop_none(batch: pa.Table) -> pa.Table:
    """Keep only emitted triples (label NONE = no prediction,
    ``rnnRE.py:564-581``)."""
    import pyarrow.compute as pc

    return batch.filter(pc.not_equal(batch["pred_label"], "NONE"))


# ------------------------------------------------ encoder-variant scorers


def _token_ids_padded(batch: pa.Table) -> np.ndarray:
    lists = batch["token_ids"].to_pylist()
    return M.pad_token_batch(lists)


def _emit(batch: pa.Table, preds: np.ndarray, probs: np.ndarray) -> pa.Table:
    labels = pa.array(_LABELS_ARR[preds], pa.string())
    n = len(batch)
    prob_offsets = np.arange(0, (n + 1) * M.N_LABELS, M.N_LABELS, dtype=np.int32)
    prob_col = pa.ListArray.from_arrays(
        pa.array(prob_offsets), pa.array(probs.ravel(), pa.float32())
    )
    return pa.Table.from_arrays(
        [
            batch["doc_id"], batch["pair_id"], batch["subj"], batch["subj_type"],
            labels, batch["obj"], batch["obj_type"], prob_col,
        ],
        schema=TRIPLES,
    )


class GRUHeadScorer:
    """biGRU encoder, head-state readout (reference ``rnnHead`` family,
    rnnReModels.py:1353-1388).  Needs the token-id pairs table
    (parse with_tokens=True); padding is per-batch (pad id 0 = zero
    embedding row)."""

    def __init__(self, seed: int = M.DEFAULT_SEED + 1):
        self.weights = M.init_gru_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = _token_ids_padded(batch)
        pos1 = batch["pos1"].to_numpy().astype(np.int64)
        pos2 = batch["pos2"].to_numpy().astype(np.int64)
        lengths = batch["n_tokens"].to_numpy().astype(np.int64)
        preds, probs = M.gru_head_forward(self.weights, toks, pos1, pos2, lengths)
        return _emit(batch, preds, probs)


class CNNScorer:
    """Multi-window CNN + max-pool encoder (reference ``convolute``,
    rnnReModels.py:1315-1322)."""

    def __init__(self, seed: int = M.DEFAULT_SEED + 2):
        self.weights = M.init_cnn_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = _token_ids_padded(batch)
        pos1 = batch["pos1"].to_numpy().astype(np.int64)
        pos2 = batch["pos2"].to_numpy().astype(np.int64)
        lengths = batch["n_tokens"].to_numpy().astype(np.int64)
        preds, probs = M.cnn_forward(self.weights, toks, pos1, pos2, lengths)
        return _emit(batch, preds, probs)


class HybridScorer:
    """Product-of-experts: log-linear (MultiNN) x CNN, renormalized —
    the reference's hybrid model shape (``hybridModel``,
    rnnReModels.py:1049-1146)."""

    def __init__(self, seed: int = M.DEFAULT_SEED):
        self.w_multi = M.init_weights(seed)
        self.w_cnn = M.init_cnn_weights(seed + 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offsets = _list_column_to_numpy(batch["feat_ids"])
        head1 = batch["head1_id"].to_numpy().astype(np.int64)
        head2 = batch["head2_id"].to_numpy().astype(np.int64)
        _, p_multi = M.multinn_forward(self.w_multi, flat, offsets, head1, head2)
        toks = _token_ids_padded(batch)
        pos1 = batch["pos1"].to_numpy().astype(np.int64)
        pos2 = batch["pos2"].to_numpy().astype(np.int64)
        lengths = batch["n_tokens"].to_numpy().astype(np.int64)
        _, p_cnn = M.cnn_forward(self.w_cnn, toks, pos1, pos2, lengths)
        preds, probs = M.product_of_experts([p_multi, p_cnn])
        return _emit(batch, preds, probs)


# §2.10: explicit registry (the reference selects models by string +
# eval; the engine maps names to classes — no eval)
MODELS: dict[str, type] = {
    "multinn": MultiNNScorer,
    "gru_head": GRUHeadScorer,
    "cnn": CNNScorer,
    "hybrid": HybridScorer,
}

# which models need the token-id pairs table (parse with_tokens=True)
NEEDS_TOKENS = {"gru_head", "cnn", "hybrid"}
