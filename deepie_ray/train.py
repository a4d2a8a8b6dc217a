"""T16/A7 — the reference's TRAINING loop, re-expressed data-parallel
on Ray Data.

Reference semantics (cited for parity): optimizer ``adadelta`` with
rho=0.95, eps=1e-6 and the zipped-gradient update
``ud = -sqrt(ru2+eps)/sqrt(rg2+eps) * g`` (`rnnRE/rnnReModels.py:38-56`);
default ``optimizer='adadelta', batch=50`` in ``train()``
(`rnnRE/rnnRE.py:660-668`); best-epoch selection on validation F1 with
the chosen epoch's weights kept (`rnnRE/rnnRE.py:909-994`).

Distributed design (NOT a port of the Theano graph):

* Each epoch is ONE ``map_batches`` pass over the featurized pair
  table: every block computes its gradient PARTIAL in numpy (the same
  closed-form backprop through embedding-sum -> sigmoid MLP -> softmax
  that ``model.multinn_forward`` runs forward) and returns one
  model-sized row — dense grads for the small matrices, SPARSE
  (touched-row ids + rows) grads for the two embedding tables, so a
  block's payload is bounded by the block's vocabulary, never by
  ``FEAT_BUCKETS``.
* The driver folds the partials (sum — the data-parallel allreduce
  analogue, here a bounded driver fold because parameters are
  vocabulary-bounded, the same argument as the flagship's alias map)
  and applies ONE adadelta step per epoch.  Untouched embedding rows
  have g = 0, so their accumulators only decay: the dense decay is a
  single vectorized multiply, and the touched rows get the (1-rho)
  corrections — exactly the reference's dense update restricted to
  its non-zero support.
* Weights re-broadcast per epoch via ``ray.put`` (one object-store
  copy per epoch, zero-copy reads in every task).

Deviation from the reference, stated honestly: the reference steps
adadelta once per 50-row minibatch; data-parallel training steps once
per EPOCH on the summed gradient (large-batch adadelta — adadelta's
update magnitude is scale-invariant, which is why it tolerates the
batch-size change).  The selection rule (best valid F1, ties to the
earlier epoch) is the reference's.
"""

from __future__ import annotations

import io
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from . import model as M
from . import nn

RHO = 0.95
EPS = 1e-6

_DENSE = ("W1", "b1", "W_out", "b_out")
_SPARSE = ("E_feat", "E_word")


def dropout_mask(
    row_keys: np.ndarray, epoch: int, n_units: int, p: float
) -> np.ndarray:
    """Inverted-dropout keep mask (reference `_dropout_from_layer`,
    `rnnReModels.py:89-99`), made CONTENT-ADDRESSED: mask[i, j] is a
    splitmix64 hash of (row key, unit, epoch), so the same row draws
    the same mask in any block layout — dropout without sacrificing
    partition-invariance (the Theano original uses a shared RNG stream,
    which is exactly what breaks under data parallelism)."""
    # epoch term folded in Python ints (explicit mod-2^64) — the
    # np.uint64 scalar*scalar form warns on the intended wraparound
    epoch_term = np.uint64(((epoch + 1) * 0xD1B54A32D192ED03) & 0xFFFFFFFFFFFFFFFF)
    x = (
        row_keys[:, None].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + np.arange(n_units, dtype=np.uint64)[None, :]
        + epoch_term
    )
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x.astype(np.float64) / 2.0**64) >= p


def multinn_loss_grads(
    weights: dict[str, np.ndarray],
    flat: np.ndarray,
    offsets: np.ndarray,
    h1: np.ndarray,
    h2: np.ndarray,
    y: np.ndarray,
    keep_mask: np.ndarray | None = None,
    keep_p: float = 1.0,
) -> tuple[float, dict[str, np.ndarray]]:
    """Summed cross-entropy loss + closed-form gradients for one batch.

    Forward math mirrors ``model.multinn_forward`` (ragged
    embedding-sum via ``np.add.reduceat``); backprop is the standard
    chain through sigmoid MLP + softmax; embedding grads are returned
    SPARSE as (ids, rows) pairs aggregated over the batch with
    ``np.add.at`` on the batch-local unique ids.
    """
    n = len(h1)
    gathered = weights["E_feat"][flat]
    sums = np.zeros((n, M.FEAT_DIM), dtype=np.float32)
    starts = offsets[:-1]
    nonempty = offsets[1:] > starts
    if gathered.shape[0]:
        red = np.add.reduceat(gathered, starts[nonempty], axis=0)
        sums[nonempty] = red[: int(nonempty.sum())]
    x = np.concatenate(
        [sums, weights["E_word"][h1], weights["E_word"][h2]], axis=1
    )
    h = nn.sigmoid_mlp(x, [(weights["W1"], weights["b1"])])
    if keep_mask is not None:
        h_eff = h * keep_mask / keep_p  # inverted dropout on the hidden layer
    else:
        h_eff = h
    logits = h_eff @ weights["W_out"] + weights["b_out"]
    p = nn.softmax(logits)
    eps_p = 1e-12
    loss = float(-np.log(np.maximum(p[np.arange(n), y], eps_p)).sum())

    dlogits = p.astype(np.float32)
    dlogits[np.arange(n), y] -= 1.0
    g: dict[str, np.ndarray] = {}
    g["W_out"] = h_eff.T @ dlogits
    g["b_out"] = dlogits.sum(axis=0)
    dh = dlogits @ weights["W_out"].T
    if keep_mask is not None:
        dh = dh * keep_mask / keep_p
    dz1 = dh * h * (1.0 - h)
    g["W1"] = x.T @ dz1
    g["b1"] = dz1.sum(axis=0)
    dx = dz1 @ weights["W1"].T
    dsum = dx[:, : M.FEAT_DIM]
    dh1 = dx[:, M.FEAT_DIM : M.FEAT_DIM + M.WORD_DIM]
    dh2 = dx[:, M.FEAT_DIM + M.WORD_DIM :]

    # sparse E_feat grad over the batch's touched ids
    if len(flat):
        row_of = np.repeat(np.arange(n), np.diff(offsets))
        fu, finv = np.unique(flat, return_inverse=True)
        gf = np.zeros((len(fu), M.FEAT_DIM), dtype=np.float32)
        np.add.at(gf, finv, dsum[row_of])
    else:
        fu = np.zeros(0, np.int64)
        gf = np.zeros((0, M.FEAT_DIM), np.float32)
    g["E_feat_ids"], g["E_feat_rows"] = fu.astype(np.int64), gf

    wids = np.concatenate([h1, h2])
    wrows = np.concatenate([dh1, dh2], axis=0)
    wu, winv = np.unique(wids, return_inverse=True)
    gw = np.zeros((len(wu), M.WORD_DIM), dtype=np.float32)
    np.add.at(gw, winv, wrows)
    g["E_word_ids"], g["E_word_rows"] = wu.astype(np.int64), gw
    return loss, g


def _pack(loss: float, n: int, g: dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(
        buf,
        loss=np.array([loss], np.float64),
        n=np.array([n], np.int64),
        **g,
    )
    return buf.getvalue()


def _grad_pass(
    pairs: rd.Dataset, weights_ref, epoch: int = 0, dropout: float = 0.0
) -> pd.DataFrame:
    """One epoch's gradient map: each block -> one binary partial row."""
    from zlib import crc32

    from .ops.score import _list_column_to_numpy

    def grad_batch(t: pa.Table) -> pa.Table:
        w = ray.get(weights_ref)
        flat, offsets = _list_column_to_numpy(t["feat_ids"])
        h1 = t["head1_id"].to_numpy().astype(np.int64)
        h2 = t["head2_id"].to_numpy().astype(np.int64)
        y = t["label_id"].to_numpy().astype(np.int64)
        mask, keep_p = None, 1.0
        if dropout > 0.0:
            keys = np.array(
                [crc32(str(p).encode()) for p in t["pair_id"].to_pylist()],
                np.uint64,
            )
            mask = dropout_mask(keys, epoch, w["W1"].shape[1], dropout)
            keep_p = 1.0 - dropout
        loss, g = multinn_loss_grads(
            w, flat.astype(np.int64), offsets, h1, h2, y, mask, keep_p
        )
        return pa.table({"payload": pa.array([_pack(loss, len(y), g)], pa.binary())})

    # one partial row per block crosses to the driver — model-sized,
    # never corpus-sized
    return pairs.map_batches(
        grad_batch, batch_format="pyarrow", batch_size=None
    ).to_pandas()


def _fold(parts: pd.DataFrame, weights: dict[str, np.ndarray]):
    """Sum the per-block partials (float64 fold) -> (loss_sum, n_total,
    dense grad dict, sparse {name: (ids, rows)})."""
    loss_sum, n_total = 0.0, 0
    dense = {k: np.zeros_like(weights[k], dtype=np.float64) for k in _DENSE}
    sparse: dict[str, dict[int, np.ndarray]] = {}
    acc: dict[str, tuple[list, list]] = {k: ([], []) for k in _SPARSE}
    for payload in parts["payload"]:
        z = np.load(io.BytesIO(payload))
        loss_sum += float(z["loss"][0])
        n_total += int(z["n"][0])
        for k in _DENSE:
            dense[k] += z[k].astype(np.float64)
        for k in _SPARSE:
            acc[k][0].append(z[f"{k}_ids"])
            acc[k][1].append(z[f"{k}_rows"].astype(np.float64))
    for k in _SPARSE:
        ids = np.concatenate(acc[k][0]) if acc[k][0] else np.zeros(0, np.int64)
        rows = (
            np.concatenate(acc[k][1], axis=0)
            if acc[k][1]
            else np.zeros((0, weights[k].shape[1]), np.float64)
        )
        u, inv = np.unique(ids, return_inverse=True)
        folded = np.zeros((len(u), weights[k].shape[1]), np.float64)
        np.add.at(folded, inv, rows)
        sparse[k] = (u, folded)  # type: ignore[assignment]
    return loss_sum, n_total, dense, sparse


class Adadelta:
    """The reference's adadelta (`rnnReModels.py:38-56`), rho=0.95,
    eps=1e-6; dense accumulators with sparse-support application for
    the embedding tables (untouched rows: pure decay, update 0)."""

    def __init__(self, weights: dict[str, np.ndarray]):
        self.rg2 = {
            k: np.zeros_like(v, dtype=np.float32)
            for k, v in weights.items()
            if k in _DENSE or k in _SPARSE
        }
        self.ru2 = {k: np.zeros_like(v) for k, v in self.rg2.items()}

    def step(self, weights, dense, sparse):
        for k in _DENSE:
            g = dense[k].astype(np.float32)
            self.rg2[k] = RHO * self.rg2[k] + (1.0 - RHO) * g * g
            ud = -np.sqrt(self.ru2[k] + EPS) / np.sqrt(self.rg2[k] + EPS) * g
            self.ru2[k] = RHO * self.ru2[k] + (1.0 - RHO) * ud * ud
            weights[k] = (weights[k] + ud).astype(np.float32)
        for k in _SPARSE:
            ids, rows = sparse[k]
            # dense decay (g = 0 off-support), corrections on support
            self.rg2[k] *= RHO
            self.ru2[k] *= RHO
            if len(ids):
                g = rows.astype(np.float32)
                self.rg2[k][ids] += (1.0 - RHO) * g * g
                ud = (
                    -np.sqrt(self.ru2[k][ids] / RHO + EPS)
                    / np.sqrt(self.rg2[k][ids] + EPS)
                    * g
                )
                # ru2 was pre-decayed; add the correction then fix the
                # double decay on support: ru2 = rho*old + (1-rho)ud^2
                self.ru2[k][ids] += (1.0 - RHO) * ud * ud
                weights[k][ids] = (weights[k][ids] + ud).astype(np.float32)


class Sgd:
    """The reference's plain SGD (`rnnReModels.py:58-71`):
    ``p -= lr * g`` (sparse-support application for embeddings)."""

    def __init__(self, weights: dict[str, np.ndarray], lr: float = 0.01):
        self.lr = np.float32(lr)

    def step(self, weights, dense, sparse):
        for k in _DENSE:
            weights[k] = (weights[k] - self.lr * dense[k].astype(np.float32)).astype(
                np.float32
            )
        for k in _SPARSE:
            ids, rows = sparse[k]
            if len(ids):
                weights[k][ids] = (
                    weights[k][ids] - self.lr * rows.astype(np.float32)
                ).astype(np.float32)


def clip_param_columns(weights: dict[str, np.ndarray], norm_lim: float) -> None:
    """The reference's ``clipGradient`` (`rnnReModels.py:73-86`) — a
    max-norm CONSTRAINT on updated parameter columns: each column of a
    2-dim non-embedding matrix is rescaled to L2 norm <= sqrt(norm_lim)
    (embedding tables are excluded, mirroring the reference's
    ``startswith('word') / 'multi'`` exclusions; here that is
    E_word/E_feat)."""
    if norm_lim <= 0:
        return
    cap = np.sqrt(norm_lim)
    for k in ("W1", "W_out"):
        w = weights[k]
        col_norms = np.sqrt((w * w).sum(axis=0))
        desired = np.clip(col_norms, 0, cap)
        weights[k] = (w * (desired / (1e-7 + col_norms))).astype(np.float32)


def _save_train_checkpoint(ckdir, epoch, weights, opt, lr, hist, best):
    """Atomic per-epoch trainer checkpoint (the reference dumps the
    best model's .npy per parameter, `rnnReModels.py:725-727`; here one
    npz holds weights + optimizer accumulators + the best-epoch weights
    so a killed run resumes EXACTLY — write-tmp-then-rename, same
    atomicity rule as checkpoint.py's stage manifests)."""
    state: dict[str, np.ndarray] = {}
    for k, v in weights.items():
        state[f"w_{k}"] = v
    if isinstance(opt, Adadelta):
        for k, v in opt.rg2.items():
            state[f"rg2_{k}"] = v
        for k, v in opt.ru2.items():
            state[f"ru2_{k}"] = v
    for k, v in (best[2] or {}).items():
        state[f"best_{k}"] = v
    tmp = os.path.join(ckdir, ".state.tmp.npz")
    np.savez_compressed(tmp, **state)
    os.replace(tmp, os.path.join(ckdir, "state.npz"))
    meta = {
        "epoch": epoch,
        "lr": float(lr),
        "hist": hist,
        "best_f1": float(best[0]),
        "best_epoch": int(best[1]),
        "optimizer": "adadelta" if isinstance(opt, Adadelta) else "sgd",
    }
    tmpm = os.path.join(ckdir, ".meta.tmp.json")
    with open(tmpm, "w") as f:
        json.dump(meta, f)
    os.replace(tmpm, os.path.join(ckdir, "meta.json"))


def _load_train_checkpoint(ckdir, weights, opt):
    """-> (next_epoch, lr, hist, best) or None if no checkpoint."""
    meta_path = os.path.join(ckdir, "meta.json")
    state_path = os.path.join(ckdir, "state.npz")
    if not (os.path.exists(meta_path) and os.path.exists(state_path)):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    with np.load(state_path) as z:
        best_w = {}
        for k in z.files:
            if k.startswith("w_"):
                weights[k[2:]] = z[k]
            elif k.startswith("rg2_") and isinstance(opt, Adadelta):
                opt.rg2[k[4:]] = z[k]
            elif k.startswith("ru2_") and isinstance(opt, Adadelta):
                opt.ru2[k[4:]] = z[k]
            elif k.startswith("best_"):
                best_w[k[5:]] = z[k]
    best = (meta["best_f1"], meta["best_epoch"], best_w or None)
    return meta["epoch"] + 1, meta["lr"], list(meta["hist"]), best


def score_pairs(ds: rd.Dataset, weights_ref) -> rd.Dataset:
    """Forward-score a featurized pair table with broadcast weights ->
    the table plus ``pred_label`` (shared by the trainer's validation
    pass and the train-evaluate protocol query)."""
    from .ops.score import _list_column_to_numpy

    def score(t: pa.Table) -> pa.Table:
        ww = ray.get(weights_ref)
        flat, offsets = _list_column_to_numpy(t["feat_ids"])
        h1 = t["head1_id"].to_numpy().astype(np.int64)
        h2 = t["head2_id"].to_numpy().astype(np.int64)
        preds, _ = M.multinn_forward(ww, flat.astype(np.int64), offsets, h1, h2)
        return t.append_column(
            "pred_label", pa.array(np.asarray(M.LABELS)[preds], pa.string())
        )

    return ds.map_batches(score, batch_format="pyarrow")


def encode_labels(t: pa.Table) -> pa.Table:
    ids = np.array(
        [M.LABEL_TO_ID.get(s, 0) for s in t["gold_label"].to_pylist()],
        np.int64,
    )
    return t.append_column("label_id", pa.array(ids, pa.int64()))


def train_multinn(
    pairs: rd.Dataset,
    epochs: int = 5,
    seed: int = M.DEFAULT_SEED + 99,
    valid_mod: int = 5,
    num_blocks: int = 8,
    optimizer: str = "adadelta",
    lr: float = 0.01,
    norm_lim: float = -1.0,
    dropout: float = 0.0,
    decay: bool = False,
    decay_after: int = 10,
    checkpoint_dir: str | None = None,
) -> tuple[dict[str, np.ndarray], pd.DataFrame]:
    """Train MultiNN on a featurized pair table (columns ``feat_ids``,
    ``head1_id``, ``head2_id``, ``gold_label``) -> (best-epoch weights,
    history).  Rows with ``crc32(str(pair_id)) % valid_mod == 0`` form
    the validation split (content-addressed — pair ids are strings, so
    a plain modulo would not even be defined; deterministic and
    independent of block layout); best epoch = max validation micro-F1,
    ties to the earlier epoch (the reference's selection,
    `rnnRE.py:979-994`)."""
    from zlib import crc32

    from .ops.metrics import micro_prf_distributed

    # pin: BOTH splits consume enc — without materializing, each
    # .materialize() below re-executes encode_labels AND the caller's
    # entire upstream (featurization) once per split
    enc = pairs.map_batches(encode_labels, batch_format="pyarrow").materialize()

    def split_tbl(want_valid: bool):
        # content-addressed split on the pair id (string-safe crc32) —
        # independent of block layout, the repo's split convention
        def f(t: pa.Table) -> pa.Table:
            pid = t["pair_id"].to_pylist()
            mask = np.array(
                [crc32(str(p).encode()) % valid_mod == 0 for p in pid], bool
            )
            if not want_valid:
                mask = ~mask
            return t.take(pa.array(np.nonzero(mask)[0], pa.int64()))

        return f

    train_ds = (
        enc.map_batches(split_tbl(False), batch_format="pyarrow")
        .repartition(num_blocks)
        .materialize()
    )
    valid_ds = (
        enc.map_batches(split_tbl(True), batch_format="pyarrow")
        .repartition(max(2, num_blocks // 4))
        .materialize()
    )

    weights = M.init_weights(seed)
    opt = Adadelta(weights) if optimizer == "adadelta" else Sgd(weights, lr)
    hist: list[dict] = []
    best = (-1.0, -1, None)  # (f1, epoch, weights copy)
    start_epoch = 1
    if checkpoint_dir is not None:
        os.makedirs(checkpoint_dir, exist_ok=True)
        resumed = _load_train_checkpoint(checkpoint_dir, weights, opt)
        if resumed is not None:
            start_epoch, lr, hist, best = resumed
            if isinstance(opt, Sgd):
                opt.lr = np.float32(lr)

    def _put() -> object:
        return ray.put({k: v.copy() for k, v in weights.items()})

    # ONE object-store broadcast per weight VERSION: the same ref
    # serves the epoch's gradient pass and the post-step validation
    # (putting twice shipped a redundant full-model copy every epoch)
    wref = _put()

    def valid_f1(ref) -> float:
        scored = score_pairs(valid_ds, ref)
        prf = micro_prf_distributed(scored, "pred_label", "gold_label")
        return float(prf["f1"])

    if start_epoch == 1:
        f0 = valid_f1(wref)
        hist.append({"epoch": 0, "loss_mean": float("nan"), "valid_f1": f0})
        best = (f0, 0, {k: v.copy() for k, v in weights.items()})

    for epoch in range(start_epoch, epochs + 1):
        parts = _grad_pass(train_ds, wref, epoch=epoch, dropout=dropout)
        loss_sum, n_total, dense, sparse = _fold(parts, weights)
        scale = 1.0 / max(1, n_total)  # mean gradient (adadelta's
        # update magnitude is scale-invariant; the mean keeps the
        # accumulators comparable across corpus sizes)
        for k in _DENSE:
            dense[k] *= scale
        sparse = {k: (ids, rows * scale) for k, (ids, rows) in sparse.items()}
        opt.step(weights, dense, sparse)
        clip_param_columns(weights, norm_lim)
        wref = _put()  # new weight version -> one new broadcast
        f1 = valid_f1(wref)
        hist.append(
            {
                "epoch": epoch,
                "loss_mean": loss_sum / max(1, n_total),
                "valid_f1": f1,
            }
        )
        if f1 > best[0]:
            best = (f1, epoch, {k: v.copy() for k, v in weights.items()})
        # the reference's stale-epoch decay (`rnnRE.py:998-1000`):
        # halve lr after `decay_after` epochs without improvement,
        # stop when lr underflows (only observable under sgd —
        # adadelta ignores lr, as in the reference)
        if decay and (epoch - best[1]) >= decay_after:
            lr *= 0.5
            if isinstance(opt, Sgd):
                opt.lr = np.float32(lr)
            if lr < 1e-5:
                break
        if checkpoint_dir is not None:
            _save_train_checkpoint(
                checkpoint_dir, epoch, weights, opt, lr, hist, best
            )

    h = pd.DataFrame(hist)
    h["is_best"] = h["epoch"] == best[1]
    return best[2], h
