"""Distributed logistic-regression quality classifier: exact parity
with a single-process numpy reference (same featurization, same GD),
learnability on separable planted labels, and partitioning
robustness."""

import numpy as np
import pyarrow as pa

from deepie_ray.ops import classifier as C


def _docs_table(n=80, seed=7):
    rng = np.random.default_rng(seed)
    texts, labels = [], []
    for i in range(n):
        if i % 2 == 0:  # "good": common words
            toks = rng.choice(["alpha", "beta", "gamma", "delta"], size=20)
            labels.append(1)
        else:  # "bad": junk words
            toks = rng.choice(["zz1", "zz2", "zz3", "zz4"], size=20)
            labels.append(0)
        texts.append(" ".join(toks))
    return (
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "label": pa.array(labels, pa.int64()),
            }
        ),
        np.array(labels, dtype=np.float64),
    )


def _numpy_reference(t, y, n_iters, lr, l2):
    X = C._feat_matrix(C.featurize_batch(t)["f"])
    w = np.zeros(C.N_DIMS + 1)
    for _ in range(n_iters):
        p = C._sigmoid(X @ w)
        g = X.T @ (p - y)
        w = w - lr * (g / len(y) + l2 * w)
    return w, C._sigmoid(X @ w)


def test_logreg_matches_numpy_reference_single_block():
    import ray.data as rd

    t, y = _docs_table()
    ds = rd.from_arrow(t)  # one block -> identical fold order
    w, scored = C.quality_classifier(
        ds, label_fn=lambda b: b["label"], n_iters=15, lr=2.0, l2=1e-4
    )
    w_ref, p_ref = _numpy_reference(t, y, 15, 2.0, 1e-4)
    assert np.allclose(w, w_ref, atol=1e-12)
    got = scored.to_pandas().sort_values("doc_id")["prob"].to_numpy()
    assert np.allclose(got, np.round(p_ref, 9), atol=1e-9)


def test_logreg_learns_separable_labels():
    import ray.data as rd

    t, y = _docs_table(n=120)
    ds = rd.from_arrow(t).repartition(4)
    w, scored = C.quality_classifier(
        ds, label_fn=lambda b: b["label"], n_iters=40, lr=2.0, l2=1e-5
    )
    df = scored.to_pandas().sort_values("doc_id")
    pred = (df["prob"].to_numpy() >= 0.5).astype(int)
    acc = (pred == y.astype(int)).mean()
    assert acc >= 0.95


def test_logreg_partitioning_tolerance():
    import ray.data as rd

    t, _ = _docs_table(n=60)
    probs = []
    for parts in (2, 5):
        ds = rd.from_arrow(t).repartition(parts)
        _, scored = C.quality_classifier(
            ds, label_fn=lambda b: b["label"], n_iters=10, lr=1.0, l2=1e-4
        )
        probs.append(
            scored.to_pandas().sort_values("doc_id")["prob"].to_numpy()
        )
    # gradient partials regroup float sums across layouts: ulp-level
    assert np.allclose(probs[0], probs[1], atol=1e-9)
