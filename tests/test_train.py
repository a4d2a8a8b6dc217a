"""T16/A7 trainer: gradient correctness (finite differences), adadelta
step math, loss descent + best-epoch selection, partition invariance."""

import numpy as np
import pyarrow as pa

from deepie_ray import model as M
from deepie_ray import train


def _tiny_batch(seed=5, n=6, feats_per_row=3):
    rng = np.random.default_rng(seed)
    offsets = np.arange(0, (n + 1) * feats_per_row, feats_per_row, dtype=np.int64)
    flat = rng.integers(1, 50, n * feats_per_row).astype(np.int64)
    h1 = rng.integers(1, 40, n).astype(np.int64)
    h2 = rng.integers(1, 40, n).astype(np.int64)
    y = rng.integers(0, M.N_LABELS, n).astype(np.int64)
    return flat, offsets, h1, h2, y


def _loss_only(w, flat, offsets, h1, h2, y):
    loss, _ = train.multinn_loss_grads(w, flat, offsets, h1, h2, y)
    return loss


def test_multinn_grads_match_finite_differences():
    w = M.init_weights(seed=11)
    # float64 weights for a clean numerical check
    w = {k: v.astype(np.float64) for k, v in w.items()}
    flat, offsets, h1, h2, y = _tiny_batch()
    _, g = train.multinn_loss_grads(w, flat, offsets, h1, h2, y)
    eps = 1e-5

    def num_grad(name, idx):
        w2 = {k: v.copy() for k, v in w.items()}
        w2[name][idx] += eps
        up = _loss_only(w2, flat, offsets, h1, h2, y)
        w2[name][idx] -= 2 * eps
        dn = _loss_only(w2, flat, offsets, h1, h2, y)
        return (up - dn) / (2 * eps)

    rng = np.random.default_rng(0)
    # dense params: spot-check random coordinates
    for name in ("W1", "b1", "W_out", "b_out"):
        for _ in range(4):
            idx = tuple(rng.integers(0, s) for s in w[name].shape)
            assert abs(g[name][idx] - num_grad(name, idx)) < 1e-4, name

    # sparse embedding grads: check a touched feature row and head row
    fid = int(g["E_feat_ids"][0])
    col = int(rng.integers(0, M.FEAT_DIM))
    got = g["E_feat_rows"][0, col]
    assert abs(got - num_grad("E_feat", (fid, col))) < 1e-4
    wid = int(g["E_word_ids"][0])
    col = int(rng.integers(0, M.WORD_DIM))
    got = g["E_word_rows"][0, col]
    assert abs(got - num_grad("E_word", (wid, col))) < 1e-4


def test_adadelta_sparse_step_matches_dense_reference():
    """The sparse-support embedding update must equal the reference's
    dense rule (rg2/ru2 decay everywhere, update on the support)."""
    rng = np.random.default_rng(7)
    w = M.init_weights(seed=3)
    opt = train.Adadelta(w)
    # two steps with sparse E_word grads; mirror with a dense numpy copy
    E0 = w["E_word"].copy().astype(np.float64)
    rg2 = np.zeros_like(E0)
    ru2 = np.zeros_like(E0)
    dense_zero = {
        k: np.zeros_like(w[k], np.float64) for k in ("W1", "b1", "W_out", "b_out")
    }
    for step in range(2):
        ids = np.array([2, 9, 40], np.int64)
        rows = rng.normal(size=(3, M.WORD_DIM))
        g = np.zeros_like(E0)
        g[ids] = rows
        # reference dense rule
        rg2 = train.RHO * rg2 + (1 - train.RHO) * g * g
        ud = -np.sqrt(ru2 + train.EPS) / np.sqrt(rg2 + train.EPS) * g
        ru2 = train.RHO * ru2 + (1 - train.RHO) * ud * ud
        E0 = E0 + ud
        opt.step(
            w,
            dense_zero,
            {
                "E_feat": (np.zeros(0, np.int64), np.zeros((0, M.FEAT_DIM))),
                "E_word": (ids, rows),
            },
        )
    assert np.allclose(w["E_word"].astype(np.float64), E0, atol=1e-5)
    assert np.allclose(opt.rg2["E_word"].astype(np.float64), rg2, atol=1e-6)
    assert np.allclose(opt.ru2["E_word"].astype(np.float64), ru2, atol=1e-6)


def _pairs_table(n=300, seed=9):
    rng = np.random.default_rng(seed)
    feat_ids = [[int(x) for x in rng.integers(1, 200, 4)] for _ in range(n)]
    return pa.table(
        {
            "pair_id": pa.array([f"r{i}" for i in range(n)], pa.string()),
            "gold_label": pa.array(
                [M.LABELS[int(rng.integers(0, M.N_LABELS))] for _ in range(n)]
            ),
            "feat_ids": pa.array(feat_ids, pa.list_(pa.int32())),
            "head1_id": pa.array(rng.integers(1, 99, n), pa.int32()),
            "head2_id": pa.array(rng.integers(1, 99, n), pa.int32()),
        }
    )


def test_train_loss_descends_and_selects_best_epoch():
    import ray.data as rd

    t = _pairs_table()
    w, hist = train.train_multinn(rd.from_arrow(t), epochs=3, num_blocks=3)
    losses = hist["loss_mean"].to_numpy()[1:]
    assert (np.diff(losses) < 0).all(), losses
    # best-epoch flag marks the max valid F1 (ties to the earlier epoch)
    f1 = hist["valid_f1"].to_numpy()
    assert hist.loc[hist["is_best"], "epoch"].iloc[0] == int(np.argmax(f1))
    assert set(w) == set(M.init_weights())


def test_train_partition_invariant_first_epoch():
    """Gradient partials fold in float64, so the first epoch's summed
    loss and updated weights agree across block layouts (float32
    forward noise bounded by atol)."""
    import ray.data as rd

    t = _pairs_table()
    outs = []
    for blocks in (1, 4):
        w, hist = train.train_multinn(
            rd.from_arrow(t), epochs=1, num_blocks=blocks
        )
        outs.append((w, hist["loss_mean"].to_numpy()[1]))
    assert abs(outs[0][1] - outs[1][1]) < 1e-6
    for k in outs[0][0]:
        assert np.allclose(outs[0][0][k], outs[1][0][k], atol=1e-5), k


def test_sgd_and_norm_clip_variants():
    import ray.data as rd

    # SGD: loss must also descend under the plain update
    t = _pairs_table(seed=12)
    _, hist = train.train_multinn(
        rd.from_arrow(t), epochs=2, num_blocks=2, optimizer="sgd", lr=0.05
    )
    losses = hist["loss_mean"].to_numpy()[1:]
    assert (np.diff(losses) < 0).all(), losses

    # norm clip: a planted oversized column is rescaled to exactly
    # sqrt(norm_lim); embeddings are untouched
    w = M.init_weights(seed=2)
    w["W1"][:, 3] = 10.0
    e_before = w["E_word"].copy()
    train.clip_param_columns(w, norm_lim=9.0)
    n = np.sqrt((w["W1"][:, 3] ** 2).sum())
    assert abs(n - 3.0) < 1e-3
    assert np.array_equal(w["E_word"], e_before)
    # columns already under the cap shrink by at most the 1e-7 fudge
    small = np.sqrt((w["W_out"] ** 2).sum(axis=0))
    assert (small <= 3.0 + 1e-6).all()


def test_dropout_mask_rate_and_partition_invariance():
    import ray.data as rd

    # keep rate ~= 1-p
    keys = np.arange(10_000, dtype=np.uint64)
    m = train.dropout_mask(keys, epoch=2, n_units=64, p=0.3)
    assert abs(m.mean() - 0.7) < 0.01
    # different epoch -> different mask; same inputs -> identical
    m2 = train.dropout_mask(keys, epoch=3, n_units=64, p=0.3)
    assert (m != m2).any()
    assert np.array_equal(m, train.dropout_mask(keys, epoch=2, n_units=64, p=0.3))

    # masks are content-addressed (row key, not block position): the
    # first dropout epoch's loss and weights match across block layouts
    t = _pairs_table(seed=15)
    outs = []
    for blocks in (1, 4):
        w, hist = train.train_multinn(
            rd.from_arrow(t), epochs=1, num_blocks=blocks, dropout=0.5
        )
        outs.append((w, hist["loss_mean"].to_numpy()[1]))
    assert abs(outs[0][1] - outs[1][1]) < 1e-6
    for k in outs[0][0]:
        assert np.allclose(outs[0][0][k], outs[1][0][k], atol=1e-5), k


def test_sgd_stale_decay_halves_lr():
    import ray.data as rd

    t = _pairs_table(seed=20, n=120)
    # decay_after=1: any epoch that fails to beat the best halves lr
    w, hist = train.train_multinn(
        rd.from_arrow(t),
        epochs=3,
        num_blocks=2,
        optimizer="sgd",
        lr=0.04,
        decay=True,
        decay_after=1,
    )
    # loss still descends and the run completes with history intact
    losses = hist["loss_mean"].to_numpy()[1:]
    assert len(hist) >= 2 and (np.diff(losses) < 0).all()


def test_train_checkpoint_resume_exact_equality(tmp_path):
    """Kill-and-resume parity: 1 epoch with a checkpoint, then a resumed
    run to 3 epochs must equal a straight 3-epoch run EXACTLY (weights,
    optimizer accumulators and history are all checkpointed; training
    is deterministic)."""
    import ray.data as rd

    t = _pairs_table(seed=33)
    w_straight, h_straight = train.train_multinn(
        rd.from_arrow(t), epochs=3, num_blocks=2
    )

    ck = str(tmp_path / "ck")
    train.train_multinn(
        rd.from_arrow(t), epochs=1, num_blocks=2, checkpoint_dir=ck
    )
    w_resumed, h_resumed = train.train_multinn(
        rd.from_arrow(t), epochs=3, num_blocks=2, checkpoint_dir=ck
    )
    for k in w_straight:
        assert np.array_equal(w_straight[k], w_resumed[k]), k
    assert len(h_resumed) == len(h_straight)
    a = h_straight[["epoch", "valid_f1"]].to_numpy()
    b = h_resumed[["epoch", "valid_f1"]].to_numpy()
    assert np.allclose(a.astype(float), b.astype(float))
