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
from ..schema import TRIPLES, TRIPLES_NOPROB

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


def score_batch(
    weights: dict[str, np.ndarray], batch: pa.Table, with_prob: bool = True
) -> pa.Table:
    """Pure function: PAIRS batch -> TRIPLES batch (all rows, incl NONE).

    ``with_prob=False`` omits the per-class probability column (the
    .prob sink S7) — the extraction output narrows by ~1/3, which is
    the lever that closes the single-node plasma-bandwidth scaling gap
    (BASELINE.md); downstream link/canon/graph stages never read it.
    """
    flat, offsets = _list_column_to_numpy(batch["feat_ids"])
    head1 = batch["head1_id"].to_numpy().astype(np.int64)
    head2 = batch["head2_id"].to_numpy().astype(np.int64)
    preds, probs = M.multinn_forward(weights, flat, offsets, head1, head2)
    return _emit(batch, preds, probs, with_prob)


def score_batch_emitted_narrow(
    weights: dict[str, np.ndarray], batch: pa.Table
) -> pa.Table:
    """PAIRS batch -> EMITTED triples only (NONE filtered before any
    column is built), with low-cardinality string columns
    dictionary-encoded.  Same logical rows as ``score_batch`` +
    ``drop_none``; the physical layout is ~2x narrower: labels/types
    ship as int32 indices into a tiny per-batch dictionary and each
    doc_id is stored once per batch instead of once per pair.  This is
    the high-throughput stateless path — on a single shared plasma
    store, output bytes are the measured scaling bottleneck
    (BASELINE.md), and at cluster scale narrower blocks are less
    object-store traffic per node."""
    flat, offsets = _list_column_to_numpy(batch["feat_ids"])
    head1 = batch["head1_id"].to_numpy().astype(np.int64)
    head2 = batch["head2_id"].to_numpy().astype(np.int64)
    preds, _ = M.multinn_forward(weights, flat, offsets, head1, head2)
    keep = np.nonzero(preds != 0)[0]  # label 0 = NONE = no prediction
    sub = batch.take(pa.array(keep, pa.int32()))
    import pyarrow.compute as pc

    labels = pa.DictionaryArray.from_arrays(
        pa.array(preds[keep].astype(np.int32)), pa.array(_LABELS_ARR, pa.string())
    )

    def enc(name: str):
        col = sub[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pc.dictionary_encode(col)

    return pa.table(
        {
            "doc_id": enc("doc_id"),
            "pair_id": sub["pair_id"],
            "subj": enc("subj"),
            "subj_type": enc("subj_type"),
            "pred_label": labels,
            "obj": enc("obj"),
            "obj_type": enc("obj_type"),
        }
    )


class MultiNNScorer:
    """Callable class for ``map_batches(MultiNNScorer, concurrency=N)``.

    Weights: pass a ``ray.put`` ObjectRef to share one copy through the
    object store (broadcast, J1 pattern), or None to rebuild from the
    seed in each actor (identical arrays either way — init is a pure
    function of the seed).
    """

    def __init__(
        self,
        weights_ref=None,
        seed: int = M.DEFAULT_SEED,
        with_prob: bool = True,
        weights_path: str | None = None,
    ):
        if weights_path is not None:  # S8: trained-weight checkpoint
            self.weights = M.load_weights(weights_path)
        elif weights_ref is not None:
            import ray

            self.weights = ray.get(weights_ref)
        else:
            self.weights = M.init_weights(seed)
        self.with_prob = with_prob

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_batch(self.weights, batch, self.with_prob)


def drop_none(batch: pa.Table) -> pa.Table:
    """Keep only emitted triples (label NONE = no prediction,
    ``rnnRE.py:564-581``)."""
    import pyarrow.compute as pc

    return batch.filter(pc.not_equal(batch["pred_label"], "NONE"))


# ------------------------------------------------ encoder-variant scorers


def _token_ids_padded(batch: pa.Table) -> np.ndarray:
    lists = batch["token_ids"].to_pylist()
    return M.pad_token_batch(lists)


def _emit(
    batch: pa.Table, preds: np.ndarray, probs: np.ndarray, with_prob: bool = True
) -> pa.Table:
    labels = pa.array(_LABELS_ARR[preds], pa.string())
    cols = [
        batch["doc_id"], batch["pair_id"], batch["subj"], batch["subj_type"],
        labels, batch["obj"], batch["obj_type"],
    ]
    if not with_prob:
        return pa.Table.from_arrays(cols, schema=TRIPLES_NOPROB)
    n = len(batch)
    prob_offsets = np.arange(0, (n + 1) * M.N_LABELS, M.N_LABELS, dtype=np.int32)
    prob_col = pa.ListArray.from_arrays(
        pa.array(prob_offsets), pa.array(probs.ravel(), pa.float32())
    )
    return pa.Table.from_arrays(cols + [prob_col], schema=TRIPLES)


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
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


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
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class HybridScorer:
    """Product-of-experts: log-linear (MultiNN) x CNN, renormalized —
    the reference's hybrid model shape (``hybridModel``,
    rnnReModels.py:1049-1146).

    Kernel-score expert (J3/T6, rnnReModels.py:1144-1146): when the
    batch carries a ``kernel_scores`` list<float32> column (fixed
    label order = model.LABELS, the rnn_process_onlyExtra.py:267-275
    re-key), the product is multiplied by ``exp(kernelScore)`` — a
    log-space additive bias.  The reference zeroes that input to a
    constant vector, and a constant cancels in the stabilized
    softmax, so the zeroed case matches a batch without the column:
    identical predictions, probabilities to float rounding
    (test-pinned)."""

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
        log_bias = None
        if "kernel_scores" in batch.column_names:
            kern, _ = _list_column_to_numpy(batch["kernel_scores"])
            log_bias = np.asarray(kern, np.float64).reshape(len(batch), M.N_LABELS)
        preds, probs = M.product_of_experts([p_multi, p_cnn], log_bias=log_bias)
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


def attach_kernel_scores(batch: pa.Table, salt: str = "kern:") -> pa.Table:
    """Deterministic stand-in for the kernel SVM's per-class score
    vector (no kernel SVM in this environment — SURVEY §7.6.5): per
    (pair_id, label) a stable-hash uniform score in [-2, 2), the same
    range synth.py's field-13 generator emits.  Content-addressed, so
    any partitioning yields identical scores.  Hashing is pandas'
    C-level ``hash_array`` (fixed-key siphash — process-stable), not
    a Python call per row: pair_ids are unique, so this runs in a hot
    scorer stage with no memoization possible."""
    import pandas as pd

    n = len(batch)
    col = batch["pair_id"].combine_chunks()
    base = pd.util.hash_array(
        col.to_numpy(zero_copy_only=False), hash_key=salt.ljust(16, "#")
    ).astype(np.uint64)
    lab = np.arange(M.N_LABELS, dtype=np.uint64)
    mix = (base[:, None] * np.uint64(2654435761) + lab[None, :] * np.uint64(40503)) & np.uint64(
        0xFFFFFFFF
    )
    scores = (mix % np.uint64(4000)).astype(np.float32) / 1000.0 - 2.0
    off = np.arange(0, (n + 1) * M.N_LABELS, M.N_LABELS, dtype=np.int32)
    col = pa.ListArray.from_arrays(
        pa.array(off, pa.int32()), pa.array(scores.ravel(), pa.float32())
    )
    return batch.append_column("kernel_scores", col)


class HybridKernelScorer(HybridScorer):
    """T6 with the kernel-score expert LIVE (closes J3 — the single
    reference component round 4 left out; the reference itself zeroes
    the input at rnn_process_onlyExtra.py:267-275, so this is the
    config no reference run exercises).  If the batch has no
    ``kernel_scores`` column it attaches the deterministic stand-in
    kernel output first."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "kernel_scores" not in batch.column_names:
            batch = attach_kernel_scores(batch)
        return super().__call__(batch)


class _TokenScorer:
    """Base for encoder scorers over the token-id pairs table: reads
    (token_ids, pos1, pos2, n_tokens), delegates to a model forward."""

    def _inputs(self, batch: pa.Table):
        toks = _token_ids_padded(batch)
        pos1 = batch["pos1"].to_numpy().astype(np.int64)
        pos2 = batch["pos2"].to_numpy().astype(np.int64)
        lengths = batch["n_tokens"].to_numpy().astype(np.int64)
        return toks, pos1, pos2, lengths


class GRUMaxScorer(_TokenScorer):
    """biGRU + max-pool readout (reference ``rnnMax`` family,
    rnnReModels.py:1390-1419)."""

    def __init__(self, seed: int = M.DEFAULT_SEED + 3):
        self.weights = M.init_gru_pool_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, probs = M.gru_max_forward(self.weights, *self._inputs(batch))
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class GRUSumScorer(_TokenScorer):
    """biGRU + mean-pool readout (reference ``rnnSum``,
    rnnReModels.py:1421-1442)."""

    def __init__(self, seed: int = M.DEFAULT_SEED + 3):
        self.weights = M.init_gru_pool_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, probs = M.gru_sum_forward(self.weights, *self._inputs(batch))
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class GRUHeadFwdScorer(_TokenScorer):
    """Forward-only GRU head readout (single-direction ``rnnHead``
    member, rnnReModels.py:1353-1375)."""

    def __init__(self, seed: int = M.DEFAULT_SEED + 1):
        self.weights = M.init_gru_fwd_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, probs = M.gru_head_fwd_forward(self.weights, *self._inputs(batch))
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class GRUSumDepScorer(_TokenScorer):
    """biGRU + dep-span-masked mean-pool (reference ``rnnSumDep``,
    rnnReModels.py:1432-1442); the mask is the [pos1, pos2] span
    (model.span_mask), the dep-path stand-in for plain text."""

    def __init__(self, seed: int = M.DEFAULT_SEED + 3):
        self.weights = M.init_gru_pool_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, pos1, pos2, lengths = self._inputs(batch)
        mask = M.span_mask(toks.shape[1], pos1, pos2)
        preds, probs = M.gru_sum_forward(
            self.weights, toks, pos1, pos2, lengths, dep_mask=mask
        )
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class GRUAttScorer(_TokenScorer):
    """biGRU + learned attention pooling (reference ``rnnAtt``,
    rnnReModels.py:1444-1476)."""

    head = False

    def __init__(self, seed: int = M.DEFAULT_SEED + 4):
        self.weights = M.init_gru_att_weights(seed, head=self.head)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, pos1, pos2, lengths = self._inputs(batch)
        preds, probs = M.gru_att_forward(
            self.weights, toks, pos1, pos2, lengths, head=self.head
        )
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class GRUAttHeadScorer(GRUAttScorer):
    """Attention pooling + head-state concat (reference ``rnnAttHead``,
    rnnReModels.py:1478-1497)."""

    head = True


class ConvSumScorer(_TokenScorer):
    """Same-length CNN + span-masked sum pooling (reference
    ``convoluteSum``/``convoluteSumDep``, rnnReModels.py:1324-1351);
    the mask is the [pos1, pos2] span — the dep-path stand-in for
    plain text (model.span_mask)."""

    def __init__(self, seed: int = M.DEFAULT_SEED + 5):
        self.weights = M.init_conv_sum_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, pos1, pos2, lengths = self._inputs(batch)
        mask = M.span_mask(toks.shape[1], pos1, pos2)
        preds, probs = M.conv_sum_forward(
            self.weights, toks, pos1, pos2, lengths, dep_mask=mask
        )
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class DualChannelScorer(_TokenScorer):
    """Dual-channel ``-dep`` scorer (M14): sentence biGRU-head readout
    concat dep-path-view biGRU-head readout (reference ``mainModel``
    with seqType ``-dep``, rnnReModels.py:729-770, vectorizer
    rnnRE.py:212-372)."""

    def __init__(self, seed: int = M.DEFAULT_SEED + 6):
        self.weights = M.init_dual_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, probs = M.dual_channel_forward(self.weights, *self._inputs(batch))
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class PoE3Scorer(_TokenScorer):
    """Three-expert product of experts: exp(GRU-head) x exp(CNN) x
    exp(log-linear) renormalized — the reference's full
    ``rnnHeadMultiExpNN`` (rnnReModels.py:835-936), completing the
    round-1 two-expert partial."""

    def __init__(self, seed: int = M.DEFAULT_SEED):
        self.w_multi = M.init_weights(seed)
        self.w_gru = M.init_gru_weights(seed + 1)
        self.w_cnn = M.init_cnn_weights(seed + 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offsets = _list_column_to_numpy(batch["feat_ids"])
        head1 = batch["head1_id"].to_numpy().astype(np.int64)
        head2 = batch["head2_id"].to_numpy().astype(np.int64)
        _, p_multi = M.multinn_forward(self.w_multi, flat, offsets, head1, head2)
        toks, pos1, pos2, lengths = self._inputs(batch)
        _, p_gru = M.gru_head_forward(self.w_gru, toks, pos1, pos2, lengths)
        _, p_cnn = M.cnn_forward(self.w_cnn, toks, pos1, pos2, lengths)
        preds, probs = M.product_of_experts([p_gru, p_cnn, p_multi])
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class GRUHeadBwdScorer(_TokenScorer):
    """Backward-only GRU head readout (reference ``rnnHeadBackward``,
    rnnReModels.py:1361-1363)."""

    def __init__(self, seed: int = M.DEFAULT_SEED + 1):
        self.weights = M.init_gru_fwd_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, probs = M.gru_head_bwd_forward(self.weights, *self._inputs(batch))
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class _GRUMaxDirScorer(_TokenScorer):
    """Single-direction GRU + max-pool members (reference
    ``rnnMaxForward``/``rnnMaxBackward``, rnnReModels.py:1394-1400)."""

    direction = "fwd"

    def __init__(self, seed: int = M.DEFAULT_SEED + 3):
        self.weights = M.init_gru_pool_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, probs = M.gru_max_forward(
            self.weights, *self._inputs(batch), direction=self.direction
        )
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class GRUMaxFwdScorer(_GRUMaxDirScorer):
    direction = "fwd"


class GRUMaxBwdScorer(_GRUMaxDirScorer):
    direction = "bwd"


class _FfHeadScorer(_TokenScorer):
    """Sigmoid FF-RNN head-readout members (reference ``rnnHeadFf``/
    ``rnnHeadFfForward``/``rnnHeadFfBackward``,
    rnnReModels.py:1365-1375; cell ``rnn_ff`` :213-230)."""

    direction = "bi"

    def __init__(self, seed: int = M.DEFAULT_SEED + 8):
        self.weights = M.init_ffrnn_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, probs = M.ffrnn_head_forward(
            self.weights, *self._inputs(batch), direction=self.direction
        )
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class FfHeadScorer(_FfHeadScorer):
    direction = "bi"


class FfHeadFwdScorer(_FfHeadScorer):
    direction = "fwd"


class FfHeadBwdScorer(_FfHeadScorer):
    direction = "bwd"


class _FfMaxScorer(_TokenScorer):
    """Sigmoid FF-RNN max-pool members (reference ``rnnMaxFf``/
    ``rnnMaxFfForward``/``rnnMaxFfBackward``, rnnReModels.py:1402-1413)."""

    direction = "bi"

    def __init__(self, seed: int = M.DEFAULT_SEED + 8):
        self.weights = M.init_ffrnn_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, probs = M.ffrnn_max_forward(
            self.weights, *self._inputs(batch), direction=self.direction
        )
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class FfMaxScorer(_FfMaxScorer):
    direction = "bi"


class FfMaxFwdScorer(_FfMaxScorer):
    direction = "fwd"


class FfMaxBwdScorer(_FfMaxScorer):
    direction = "bwd"


class DualCNNScorer(_TokenScorer):
    """Dual-channel CNN scorer (M14 beyond the GRU member: the
    reference's ``-`` grammar pairs any encoder with the dep channel,
    rnnRE.py:701-744)."""

    def __init__(self, seed: int = M.DEFAULT_SEED + 10):
        self.weights = M.init_dual_cnn_weights(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, probs = M.dual_cnn_forward(self.weights, *self._inputs(batch))
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class _StackedScorer(_TokenScorer):
    """Stacked CNN->GRU family (reference ``alternateHead``/
    ``alternateMax`` + Forward/Backward/Deep members,
    rnnReModels.py:1148-1277)."""

    readout = "head"
    direction = "bi"
    depth = 1

    def __init__(self, seed: int = M.DEFAULT_SEED + 7):
        self.weights = M.init_stacked_weights(
            seed, readout=self.readout, direction=self.direction, depth=self.depth
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        fwd = (
            M.stacked_head_forward if self.readout == "head" else M.stacked_max_forward
        )
        preds, probs = fwd(
            self.weights,
            *self._inputs(batch),
            direction=self.direction,
            depth=self.depth,
        )
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class StackedHeadScorer(_StackedScorer):
    readout = "head"


class StackedMaxScorer(_StackedScorer):
    readout = "max"


class StackedHeadFwdScorer(_StackedScorer):
    readout, direction = "head", "fwd"


class StackedHeadBwdScorer(_StackedScorer):
    readout, direction = "head", "bwd"


class StackedMaxFwdScorer(_StackedScorer):
    readout, direction = "max", "fwd"


class StackedMaxBwdScorer(_StackedScorer):
    readout, direction = "max", "bwd"


class StackedHeadDeepScorer(_StackedScorer):
    readout, depth = "head", 2


class StackedMaxDeepScorer(_StackedScorer):
    readout, depth = "max", 2


class _AltConvScorer(_TokenScorer):
    """GRU->CNN alternate family (reference ``alternateConv``/
    ``alternateConvForward``/``alternateConvBackward``,
    rnnReModels.py:1279-1313)."""

    direction = "bi"

    def __init__(self, seed: int = M.DEFAULT_SEED + 9):
        self.weights = M.init_altconv_weights(seed, direction=self.direction)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, probs = M.altconv_forward(
            self.weights, *self._inputs(batch), direction=self.direction
        )
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


class AltConvScorer(_AltConvScorer):
    direction = "bi"


class AltConvFwdScorer(_AltConvScorer):
    direction = "fwd"


class AltConvBwdScorer(_AltConvScorer):
    direction = "bwd"


class EnsembleScorer(_TokenScorer):
    """Two-encoder product of experts (reference ``ensembleModel``,
    ``a_b`` model names, rnnReModels.py:938-1047): renormalized product
    of the biGRU-head and CNN expert distributions."""

    def __init__(self, seed: int = M.DEFAULT_SEED):
        self.w_gru = M.init_gru_weights(seed + 1)
        self.w_cnn = M.init_cnn_weights(seed + 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, pos1, pos2, lengths = self._inputs(batch)
        _, p_gru = M.gru_head_forward(self.w_gru, toks, pos1, pos2, lengths)
        _, p_cnn = M.cnn_forward(self.w_cnn, toks, pos1, pos2, lengths)
        preds, probs = M.product_of_experts([p_gru, p_cnn])
        return _emit(batch, preds, probs, getattr(self, "with_prob", True))


# §2.10: explicit registry (the reference selects models by string +
# eval; the engine maps names to classes — no eval).  Names mirror the
# reference's selector grammar: '#'-hybrids -> 'hybrid', 'a_b'
# ensembles -> 'ensemble_*', '-dep' dual channel -> 'dual_dep'.
MODELS: dict[str, type] = {
    "multinn": MultiNNScorer,
    "gru_head": GRUHeadScorer,
    "gru_head_fwd": GRUHeadFwdScorer,
    "gru_head_bwd": GRUHeadBwdScorer,
    "cnn": CNNScorer,
    "hybrid": HybridScorer,
    "hybrid_kernel": HybridKernelScorer,
    "gru_max": GRUMaxScorer,
    "gru_max_fwd": GRUMaxFwdScorer,
    "gru_max_bwd": GRUMaxBwdScorer,
    "gru_sum": GRUSumScorer,
    "gru_sum_dep": GRUSumDepScorer,
    "gru_att": GRUAttScorer,
    "gru_att_head": GRUAttHeadScorer,
    "ffrnn_head": FfHeadScorer,
    "ffrnn_head_fwd": FfHeadFwdScorer,
    "ffrnn_head_bwd": FfHeadBwdScorer,
    "ffrnn_max": FfMaxScorer,
    "ffrnn_max_fwd": FfMaxFwdScorer,
    "ffrnn_max_bwd": FfMaxBwdScorer,
    "conv_sum": ConvSumScorer,
    "dual_dep": DualChannelScorer,
    "dual_dep_cnn": DualCNNScorer,
    "ensemble_gru_cnn": EnsembleScorer,
    "stacked_head": StackedHeadScorer,
    "stacked_head_fwd": StackedHeadFwdScorer,
    "stacked_head_bwd": StackedHeadBwdScorer,
    "stacked_head_deep": StackedHeadDeepScorer,
    "stacked_max": StackedMaxScorer,
    "stacked_max_fwd": StackedMaxFwdScorer,
    "stacked_max_bwd": StackedMaxBwdScorer,
    "stacked_max_deep": StackedMaxDeepScorer,
    "altconv": AltConvScorer,
    "altconv_fwd": AltConvFwdScorer,
    "altconv_bwd": AltConvBwdScorer,
    "poe3": PoE3Scorer,
}

# which models need the token-id pairs table (parse with_tokens=True):
# every encoder except the sparse-feature log-linear MultiNN
NEEDS_TOKENS = set(MODELS) - {"multinn"}
