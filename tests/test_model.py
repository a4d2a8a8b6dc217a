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


def test_weight_save_load_roundtrip(tmp_path):
    """S8: weights survive a checkpoint round-trip bit-exactly, and a
    scorer built from the file scores identically to one built from
    the in-memory dict."""
    w = M.init_weights(123)
    p = str(tmp_path / "ckpt")
    M.save_weights(w, p)
    w2 = M.load_weights(p)
    assert set(w) == set(w2)
    for k in w:
        assert np.array_equal(w[k], w2[k]), k
    flat, offsets, h1, h2 = _toy_batch()
    a = M.multinn_forward(w, flat, offsets, h1, h2)
    b = M.multinn_forward(w2, flat, offsets, h1, h2)
    assert np.array_equal(a[0], b[0]) and np.allclose(a[1], b[1])


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


def test_pooled_and_attention_variants_padding_independent():
    """Every encoder readout must be invariant to trailing batch padding
    (per-batch padding is semantics-free: pad id 0 = zero embedding,
    pools masked to true length)."""
    rng = np.random.default_rng(7)
    L = 11
    toks_row = rng.integers(1, M.WORD_BUCKETS, L).astype(np.int64)
    pos1, pos2 = np.array([1]), np.array([7])
    lengths = np.array([L])
    short = M.pad_token_batch([list(toks_row)], max_len=L)
    long = M.pad_token_batch([list(toks_row)], max_len=L + 9)

    cases = [
        (M.init_gru_pool_weights(), M.gru_max_forward, {}),
        (M.init_gru_pool_weights(), M.gru_max_forward, {"direction": "fwd"}),
        (M.init_gru_pool_weights(), M.gru_max_forward, {"direction": "bwd"}),
        (M.init_gru_pool_weights(), M.gru_sum_forward, {}),
        (M.init_gru_fwd_weights(), M.gru_head_bwd_forward, {}),
        (M.init_gru_att_weights(), M.gru_att_forward, {"head": False}),
        (M.init_gru_att_weights(head=True), M.gru_att_forward, {"head": True}),
        (M.init_conv_sum_weights(), M.conv_sum_forward, {}),
        (M.init_dual_weights(), M.dual_channel_forward, {}),
        (M.init_dual_cnn_weights(), M.dual_cnn_forward, {}),
        (M.init_stacked_weights(), M.stacked_head_forward, {}),
        (M.init_stacked_weights(readout="max"), M.stacked_max_forward, {}),
    ]
    for d in ("bi", "fwd", "bwd"):
        cases.append((M.init_ffrnn_weights(), M.ffrnn_head_forward, {"direction": d}))
        cases.append((M.init_ffrnn_weights(), M.ffrnn_max_forward, {"direction": d}))
        cases.append(
            (M.init_altconv_weights(direction=d), M.altconv_forward, {"direction": d})
        )
        if d != "bi":
            for ro in ("head", "max"):
                fwd = M.stacked_head_forward if ro == "head" else M.stacked_max_forward
                cases.append(
                    (
                        M.init_stacked_weights(readout=ro, direction=d),
                        fwd,
                        {"direction": d},
                    )
                )
    for ro in ("head", "max"):
        fwd = M.stacked_head_forward if ro == "head" else M.stacked_max_forward
        cases.append(
            (M.init_stacked_weights(readout=ro, depth=2), fwd, {"depth": 2})
        )
    for w, fwd, kw in cases:
        _, p_short = fwd(w, short, pos1, pos2, lengths, **kw)
        _, p_long = fwd(w, long, pos1, pos2, lengths, **kw)
        assert np.allclose(p_short, p_long, atol=1e-6), (fwd.__name__, kw)
        assert np.allclose(p_short.sum(axis=1), 1.0, atol=1e-5), (fwd.__name__, kw)


def test_variant_readouts_differ():
    """The pooled/attention/dual readouts are genuinely different
    functions — same inputs, different distributions."""
    rng = np.random.default_rng(8)
    toks = rng.integers(1, M.WORD_BUCKETS, (5, 10)).astype(np.int64)
    pos1 = np.array([0, 1, 2, 0, 1])
    pos2 = np.array([5, 6, 7, 8, 9])
    lengths = np.full(5, 10, dtype=np.int64)
    w_pool = M.init_gru_pool_weights()
    _, p_max = M.gru_max_forward(w_pool, toks, pos1, pos2, lengths)
    _, p_sum = M.gru_sum_forward(w_pool, toks, pos1, pos2, lengths)
    assert not np.allclose(p_max, p_sum)
    w_att = M.init_gru_att_weights(head=True)
    _, p_att = M.gru_att_forward(w_att, toks, pos1, pos2, lengths, head=True)
    # attention-head readout must depend on the head positions
    _, p_att2 = M.gru_att_forward(
        w_att, toks, pos1 + 1, pos2 - 1, lengths, head=True
    )
    assert not np.allclose(p_att, p_att2)


def test_sumdep_is_raw_masked_sum():
    """rnnSumDep pools with a RAW masked sum — no length normalization
    (reference rnnReModels.py:1432-1442; ADVICE r2).  Check via a
    hand-computed readout: rep(dep_mask) == rep(full) * T when the mask
    covers everything, i.e. doubling the masked span doubles the
    pre-softmax readout, which a mean would leave unchanged."""
    rng = np.random.default_rng(21)
    toks = rng.integers(1, M.WORD_BUCKETS, (1, 8)).astype(np.int64)
    lengths = np.array([8])
    w = M.init_gru_pool_weights()
    full = np.ones((1, 8), dtype=bool)
    narrow = np.zeros((1, 8), dtype=bool)
    narrow[0, 2:6] = True
    # compute reps directly through the internals the fwd uses
    hf, hb, valid = M._bigru_states(w, toks, lengths)
    h = np.concatenate([hf, hb], axis=2)
    rep_full = np.where(full[:, :, None], h, 0.0).sum(axis=1)
    rep_narrow = np.where(narrow[:, :, None], h, 0.0).sum(axis=1)
    import deepie_ray.nn as nn_

    _, p_full = M.gru_sum_forward(w, toks, dep_mask=full, lengths=lengths)
    _, p_narrow = M.gru_sum_forward(w, toks, dep_mask=narrow, lengths=lengths)
    assert np.allclose(
        p_full, nn_.softmax(rep_full @ w["W_out"] + w["b_out"]), atol=1e-6
    )
    assert np.allclose(
        p_narrow, nn_.softmax(rep_narrow @ w["W_out"] + w["b_out"]), atol=1e-6
    )


def test_att_scoring_is_linear():
    """rnnAtt scores with a plain linear exp(h.IW + Ib) softmax
    (reference rnnReModels.py:1452-1461; ADVICE r2) — verified by
    recomputing attention by hand from the weight dict."""
    rng = np.random.default_rng(22)
    toks = rng.integers(1, M.WORD_BUCKETS, (2, 6)).astype(np.int64)
    lengths = np.array([6, 6])
    w = M.init_gru_att_weights()
    assert w["IW"].shape == (2 * M.GRU_HIDDEN,) and w["Ib"].shape == (1,)
    hf, hb, valid = M._bigru_states(w, toks, lengths)
    h = np.concatenate([hf, hb], axis=2)
    import deepie_ray.nn as nn_

    alpha = nn_.softmax(h @ w["IW"] + w["Ib"][0])
    rep = (alpha[:, :, None] * h).sum(axis=1)
    want = nn_.softmax(rep @ w["W_out"] + w["b_out"])
    _, got = M.gru_att_forward(w, toks, lengths=lengths)
    assert np.allclose(got, want, atol=1e-6)


def test_direction_variants_differ():
    """Forward-only, backward-only and bidirectional members are
    genuinely different functions of the same input."""
    rng = np.random.default_rng(23)
    toks = rng.integers(1, M.WORD_BUCKETS, (4, 9)).astype(np.int64)
    pos1, pos2 = np.array([0, 1, 2, 3]), np.array([5, 6, 7, 8])
    lengths = np.full(4, 9, dtype=np.int64)
    w = M.init_ffrnn_weights()
    _, p_bi = M.ffrnn_head_forward(w, toks, pos1, pos2, lengths, direction="bi")
    _, p_f = M.ffrnn_head_forward(w, toks, pos1, pos2, lengths, direction="fwd")
    _, p_b = M.ffrnn_head_forward(w, toks, pos1, pos2, lengths, direction="bwd")
    assert not np.allclose(p_bi, p_f) and not np.allclose(p_f, p_b)
    wp = M.init_gru_pool_weights()
    _, m_f = M.gru_max_forward(wp, toks, pos1, pos2, lengths, direction="fwd")
    _, m_b = M.gru_max_forward(wp, toks, pos1, pos2, lengths, direction="bwd")
    assert not np.allclose(m_f, m_b)
    wa = M.init_altconv_weights()
    _, a_bi = M.altconv_forward(wa, toks, pos1, pos2, lengths)
    assert np.allclose(a_bi.sum(axis=1), 1.0, atol=1e-5)


def test_model_registry_scores_every_member():
    """Every MODELS registry entry (the full selector grammar of the
    reference's evaluate.py — head/max/sum/att x GRU/FF-RNN x
    bi/fwd/bwd, CNN, dual channels, stacked alternates, hybrids) scores
    a small pairs batch: valid distributions, emitted schema."""
    import pyarrow as pa

    from deepie_ray.ops.score import MODELS

    rng = np.random.default_rng(31)
    n, L = 6, 10
    toks = [list(rng.integers(1, M.WORD_BUCKETS, L)) for _ in range(n)]
    batch = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n)], pa.string()),
            "pair_id": pa.array([f"p{i}" for i in range(n)], pa.string()),
            "subj": pa.array(["s"] * n, pa.string()),
            "subj_type": pa.array(["PER"] * n, pa.string()),
            "obj": pa.array(["o"] * n, pa.string()),
            "obj_type": pa.array(["ORG"] * n, pa.string()),
            "pos1": pa.array(rng.integers(0, 3, n), pa.int32()),
            "pos2": pa.array(rng.integers(5, L, n), pa.int32()),
            "n_tokens": pa.array([L] * n, pa.int32()),
            "token_ids": pa.array(toks, pa.list_(pa.int32())),
            "feat_ids": pa.array(
                [list(rng.integers(1, 1000, 5)) for _ in range(n)],
                pa.list_(pa.int32()),
            ),
            "head1_id": pa.array(rng.integers(1, M.WORD_BUCKETS, n), pa.int32()),
            "head2_id": pa.array(rng.integers(1, M.WORD_BUCKETS, n), pa.int32()),
        }
    )
    for name, cls in MODELS.items():
        out = cls()(batch)
        assert len(out) == n, name
        assert "pred_label" in out.column_names, name
        probs = np.array(out["prob"].to_pylist())
        assert probs.shape == (n, M.N_LABELS), name
        assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-4), name


def test_dep_view_gather_matches_rowwise_slice():
    rng = np.random.default_rng(9)
    toks = rng.integers(1, M.WORD_BUCKETS, (4, 12)).astype(np.int64)
    pos1 = np.array([0, 2, 5, 1])
    pos2 = np.array([3, 8, 6, 10])
    dep, dep_len = M.dep_view_gather(toks, pos1, pos2)
    assert dep_len.tolist() == [4, 7, 2, 10]
    for i in range(4):
        row = toks[i, pos1[i] : pos2[i] + 1]
        assert dep[i, : len(row)].tolist() == row.tolist()
        assert (dep[i, len(row):] == 0).all()  # right-padded with 0


def test_dual_channel_uses_dep_view():
    """Changing a token INSIDE the [pos1,pos2] span shifts both
    channels; changing one OUTSIDE shifts only channel 1 — the dual
    output must differ from the single-channel output in both cases."""
    rng = np.random.default_rng(10)
    toks = rng.integers(1, M.WORD_BUCKETS, (1, 10)).astype(np.int64)
    pos1, pos2 = np.array([2]), np.array([6])
    lengths = np.array([10])
    w = M.init_dual_weights()
    _, base = M.dual_channel_forward(w, toks, pos1, pos2, lengths)
    inside = toks.copy(); inside[0, 4] = (inside[0, 4] + 7) % M.WORD_BUCKETS or 1
    _, p_in = M.dual_channel_forward(w, inside, pos1, pos2, lengths)
    assert not np.allclose(base, p_in)


def test_onehot_expansion_and_cnn_mode():
    """M13 features==1: index form expands to one-hot inside the actor;
    id 0 -> zero row; the categorical channel changes predictions; the
    forward is padding-independent."""
    ids = np.array([[1, 3, 0], [2, 0, 0]])
    oh = M.onehot_expand(ids, 4)
    assert oh.shape == (2, 3, 4)
    assert oh[0, 0].tolist() == [1, 0, 0, 0]
    assert oh[0, 1].tolist() == [0, 0, 1, 0]
    assert (oh[0, 2] == 0).all() and (oh[1, 1] == 0).all()
    mh = M.multihot_expand([[[1, 2], []], [[4]]], T=2, n_classes=4)
    assert mh[0, 0].tolist() == [1, 1, 0, 0]
    assert (mh[0, 1] == 0).all()
    assert mh[1, 0].tolist() == [0, 0, 0, 1]

    rng = np.random.default_rng(11)
    toks = rng.integers(1, M.WORD_BUCKETS, (3, 8)).astype(np.int64)
    classes = rng.integers(1, 5, (3, 8)).astype(np.int64)
    lengths = np.full(3, 8, dtype=np.int64)
    w = M.init_onehot_cnn_weights(1, n_classes=5)
    _, p = M.onehot_cnn_forward(w, toks, classes, lengths)
    assert np.allclose(p.sum(axis=1), 1.0, atol=1e-5)
    _, p2 = M.onehot_cnn_forward(w, toks, (classes % 4) + 1, lengths)
    assert not np.allclose(p, p2)  # categorical channel matters
    # padding independence
    toks_pad = np.concatenate([toks, np.zeros((3, 5), np.int64)], axis=1)
    cls_pad = np.concatenate([classes, np.zeros((3, 5), np.int64)], axis=1)
    _, p3 = M.onehot_cnn_forward(w, toks_pad, cls_pad, lengths)
    assert np.allclose(p, p3, atol=1e-6)


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
