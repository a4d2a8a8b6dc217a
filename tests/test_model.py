"""model.py: determinism, batching-invariance, padding-row pinning."""

import numpy as np

from deepie_ray import model as M


def _toy_batch(n=7, seed=1):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 6, n)
    counts[2] = 0  # exercise the empty-feature-row path
    flat = rng.integers(1, M.FEAT_BUCKETS, counts.sum()).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    h1 = rng.integers(1, M.WORD_BUCKETS, n).astype(np.int64)
    h2 = rng.integers(1, M.WORD_BUCKETS, n).astype(np.int64)
    return flat, offsets, h1, h2


def test_weights_deterministic_and_zero_row():
    a = M.init_weights(3435)
    b = M.init_weights(3435)
    for k in a:
        assert np.array_equal(a[k], b[k]), k
    assert not np.array_equal(M.init_weights(1)["W1"], a["W1"])
    assert np.all(a["E_feat"][0] == 0) and np.all(a["E_word"][0] == 0)


def test_forward_rowwise_equals_batched():
    w = M.init_weights()
    flat, offsets, h1, h2 = _toy_batch()
    preds, probs = M.multinn_forward(w, flat, offsets, h1, h2)
    assert probs.shape == (7, M.N_LABELS)
    assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    for i in range(7):
        fi = flat[offsets[i] : offsets[i + 1]]
        oi = np.array([0, len(fi)], dtype=np.int64)
        p1, pr1 = M.multinn_forward(w, fi, oi, h1[i : i + 1], h2[i : i + 1])
        assert p1[0] == preds[i]
        assert np.allclose(pr1[0], probs[i], atol=1e-5)


def test_empty_feature_row_uses_heads_only():
    w = M.init_weights()
    _, _, h1, h2 = _toy_batch()
    empty = np.array([], dtype=np.int64)
    off = np.array([0, 0], dtype=np.int64)
    _, probs = M.multinn_forward(w, empty, off, h1[:1], h2[:1])
    assert np.isfinite(probs).all()


def test_label_mix_includes_none_and_relations():
    w = M.init_weights()
    rng = np.random.default_rng(0)
    n = 500
    counts = rng.integers(3, 15, n)
    flat = rng.integers(1, M.FEAT_BUCKETS, counts.sum()).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    preds, _ = M.multinn_forward(
        w,
        flat,
        offsets,
        rng.integers(1, M.WORD_BUCKETS, n),
        rng.integers(1, M.WORD_BUCKETS, n),
    )
    frac_none = (preds == 0).mean()
    assert 0.01 < frac_none < 0.99  # both triples and NONE occur
    assert len(np.unique(preds)) >= 3


def test_gru_head_forward_shapes():
    w = M.init_gru_weights()
    rng = np.random.default_rng(2)
    toks = rng.integers(0, M.WORD_BUCKETS, (4, 9))
    preds, probs = M.gru_head_forward(w, toks, np.array([0, 1, 2, 3]), np.array([5, 6, 7, 8]))
    assert preds.shape == (4,) and probs.shape == (4, M.N_LABELS)
    assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-5)


def test_variant_forwards_padding_independent():
    """A row's prediction must not depend on how much trailing padding
    its batch carries (per-batch padding is semantics-free)."""
    rng = np.random.default_rng(5)
    L = 9
    toks_row = rng.integers(1, M.WORD_BUCKETS, L).astype(np.int64)
    pos1, pos2 = np.array([2]), np.array([6])
    lengths = np.array([L])

    cw = M.init_cnn_weights()
    short = M.pad_token_batch([list(toks_row)], max_len=L)
    long = M.pad_token_batch([list(toks_row)], max_len=L + 13)
    _, p_short = M.cnn_forward(cw, short, pos1, pos2, lengths)
    _, p_long = M.cnn_forward(cw, long, pos1, pos2, lengths)
    assert np.allclose(p_short, p_long, atol=1e-6)

    gw = M.init_gru_weights()
    _, g_short = M.gru_head_forward(gw, short, pos1, pos2, lengths)
    _, g_long = M.gru_head_forward(gw, long, pos1, pos2, lengths)
    assert np.allclose(g_short, g_long, atol=1e-6)


def test_cnn_position_channel_changes_output():
    rng = np.random.default_rng(6)
    toks = rng.integers(1, M.WORD_BUCKETS, (3, 8)).astype(np.int64)
    lengths = np.full(3, 8, dtype=np.int64)
    cw = M.init_cnn_weights()
    _, with_pos = M.cnn_forward(cw, toks, np.array([0, 1, 2]), np.array([5, 6, 7]), lengths)
    _, no_pos = M.cnn_forward(cw, toks, None, None, lengths)
    assert not np.allclose(with_pos, no_pos)
    # different head positions -> different distributions
    _, other_pos = M.cnn_forward(cw, toks, np.array([1, 2, 3]), np.array([4, 5, 6]), lengths)
    assert not np.allclose(with_pos, other_pos)
