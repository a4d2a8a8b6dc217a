"""Distributed document-quality classifier: logistic regression over
hashed bag-of-words features (the fastText-style quality filter of
CCNet / DCLM-ish pipelines, reduced to its deterministic core).

Training is FULL-BATCH gradient descent, which distributes exactly:
the gradient is a sum over documents, so each block contributes a
(D+1)-float partial ``X^T (sigmoid(Xw) - y)`` and the driver folds
k_blocks partials per iteration — the only driver state is the weight
vector and one partial per block.  No shuffle at any point; each
iteration is one embarrassingly-parallel pass.  At 100 TB: featurize
once and persist (17 floats/doc ~ 0.1% of corpus bytes), subsample
the training pass (the scorer streams over everything), keep D small
(hashing trick bounds it regardless of vocabulary).

Determinism note: partials are folded in sorted block-key order, so a
fixed dataset gives bit-stable weights across runs; different
PARTITIONINGS regroup float sums and may differ by ulps (tests use
tolerances for that axis, exact pins for the fixed-layout axis).

Reference parity: the reference trains Theano models with
minibatch SGD (rnnRE/rnnRE.py main loop) — out of the serving scope
per SURVEY §2.3; this operator is engine-brief surface (quality
scoring for training-data curation), not a port.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..hashing import md5_hex
from ..tuning import POOL_REMOTE_ARGS

N_DIMS = 16  # hashed feature dims (+1 bias appended)


def featurize_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_dims: int = N_DIMS,
    salt: str = "fh-v1",
) -> pa.Table:
    """-> (id, f:binary[(n_dims+1)*8]) dense hashed-BoW features:
    per-dim token counts normalized by the doc's token count (so long
    docs don't dominate), bias lane = 1.0.  Same md5 bucket convention
    as ``text.feature_hash_batch``; md5 runs once per DISTINCT token
    (dictionary encode).  Packed binary because Arrow joins/shuffles
    reject list payloads (house convention)."""
    toks = pc.split_pattern_regex(
        pc.fill_null(batch[text_col], ""), pattern=r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    reps = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    reps = reps[keep_np]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(batch)
    M = np.zeros((n, n_dims + 1), dtype=np.float64)
    if len(flat):
        d = flat.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        dims = np.array(
            [
                int(md5_hex(f"{salt}:{t}")[:8], 16) % n_dims
                for t in d.dictionary.to_pylist()
            ],
            dtype=np.int64,
        )[d.indices.to_numpy(zero_copy_only=False)]
        np.add.at(M, (reps, dims), 1.0)
        tok_counts = np.bincount(reps, minlength=n).astype(np.float64)
        nz = tok_counts > 0
        M[nz, :n_dims] /= tok_counts[nz, None]
    M[:, n_dims] = 1.0  # bias
    return pa.table(
        {
            id_col: batch[id_col],
            "f": pa.array([row.tobytes() for row in M], pa.binary()),
        }
    )


def _feat_matrix(col) -> np.ndarray:
    """(n, N_DIMS+1) float64 view over the packed feature column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, N_DIMS + 1))
    width = N_DIMS + 1
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(bufs[2], dtype=np.float64)
    if not np.all(np.diff(offs) == width * 8):  # pragma: no cover
        return np.stack([np.frombuffer(v.as_py(), dtype=np.float64) for v in arr])
    start = offs[0] // 8
    return data[start : start + len(arr) * width].reshape(len(arr), width)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def train_logreg(
    feats: rd.Dataset,
    label_col: str = "label",
    n_iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> np.ndarray:
    """Full-batch GD over a (f, label) dataset -> weight vector
    (N_DIMS+1,).  Per iteration: broadcast w, one streaming pass of
    per-block partial gradients ``(X^T (p - y), sum, n, block_key)``,
    driver fold in sorted block-key order (run-to-run determinism on a
    fixed layout).  ``feats`` should be ``.materialize()``d by the
    caller — every iteration re-consumes it."""
    D = N_DIMS + 1
    w = np.zeros(D, dtype=np.float64)

    for _ in range(n_iters):
        w_ref = ray.put(w)

        def grad_partial(batch: pa.Table, _wr=w_ref) -> pa.Table:
            wv = ray.get(_wr)
            X = _feat_matrix(batch["f"])
            y = batch[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            p = _sigmoid(X @ wv)
            g = X.T @ (p - y)
            # block key: content-derived (crc32 — Python's hash() is
            # process-salted and would break cross-run determinism)
            from zlib import crc32

            key = crc32(batch["f"][0].as_py()) if len(batch) else 0
            return pa.table(
                {
                    "g": pa.array([g.tobytes()], pa.binary()),
                    "n": pa.array([len(batch)], pa.int64()),
                    "key": pa.array([key], pa.int64()),
                }
            )

        parts = feats.map_batches(grad_partial, batch_format="pyarrow").to_pandas()
        if "key" not in parts.columns:  # empty corpus: 0-row schema loss
            break
        parts = parts.sort_values(["key", "n"]).reset_index(drop=True)
        g = np.zeros(D, dtype=np.float64)
        n_total = 0
        for _, row in parts.iterrows():
            g += np.frombuffer(row["g"], dtype=np.float64)
            n_total += int(row["n"])
        if n_total == 0:
            break
        w = w - lr * (g / n_total + l2 * w)
    return w


def score_logreg(
    feats: rd.Dataset, w: np.ndarray, id_col: str = "doc_id"
) -> rd.Dataset:
    """(id, f) + weights -> (id, prob:double), one broadcast + one
    streaming pass."""
    w_ref = ray.put(np.asarray(w, dtype=np.float64))

    class Score:
        def __init__(self):
            self.w = ray.get(w_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _feat_matrix(batch["f"])
            p = _sigmoid(X @ self.w)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "prob": pa.array(np.round(p, 9), pa.float64()),
                }
            )

    return feats.map_batches(
        Score, batch_format="pyarrow", concurrency=(1, 8), **POOL_REMOTE_ARGS
    )


def quality_classifier(
    docs: rd.Dataset,
    label_fn,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> tuple[np.ndarray, rd.Dataset]:
    """End-to-end: featurize once (persisted — consumed n_iters+1
    times), attach labels via ``label_fn(batch) -> pa.Array`` (weak
    supervision, e.g. a lang or source column), train, score ALL docs
    -> (weights, (id, prob) dataset)."""

    def fz(batch: pa.Table) -> pa.Table:
        t = featurize_batch(batch, text_col, id_col)
        return t.append_column(
            "label", pc.cast(label_fn(batch), pa.float64())
        )

    feats = docs.map_batches(fz, batch_format="pyarrow").materialize()
    w = train_logreg(feats, n_iters=n_iters, lr=lr, l2=l2)
    return w, score_logreg(feats, w, id_col)
