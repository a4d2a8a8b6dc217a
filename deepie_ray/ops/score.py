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
