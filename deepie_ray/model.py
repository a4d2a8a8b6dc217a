"""Relation-classification models with seeded deterministic weights.

The default scorer mirrors the reference's paper-default ``#MultiNN``
log-linear model (``rnnReModels.py:772-833``, selected at
``evaluate.py:56``): an embedding-sum over sparse binary features
(Theano ``scan`` over index lists == a gather-sum) plus a head-word
pair term, then a sigmoid MLP and softmax.  Label 0 is ``NONE`` = "no
relation" (``labelDict`` seed ``{'NONE': 0}``,
``rnn_process_onlyExtra.py:17``); scoring treats it as no-prediction
(``rnnRE.py:564-581``).

A GRU-head variant (``rnnHead`` family, ``rnnReModels.py:1353-1388``)
is provided for encoder-config parity: token embeddings -> biGRU ->
concat hidden states at (pos1, pos2) -> MLP -> softmax.

Weights come from ``init_weights(seed)`` — a pure function, identical
in the oracle and in every Ray actor, which is what makes distributed
output == oracle output exactly (P=R=1.0).  Embedding row 0 is pinned
to zero like the reference's padding row (``rnn_process_onlyExtra.py:
566-567``, re-zeroed at ``rnnRE.py:957-960``).
"""

from __future__ import annotations

import numpy as np

from . import nn
from .features import FEAT_BUCKETS, WORD_BUCKETS

# NONE first (id 0), directed labels sorted — deterministic replacement for
# the reference's encounter-order labelDict; PHYS / PER-SOC are undirected
# after the reference's prefix collapse (rnn_process_onlyExtra.py:312-313).
LABELS = ["NONE"] + sorted(
    [
        "ART(e1,e2)", "ART(e2,e1)",
        "GEN-AFF(e1,e2)", "GEN-AFF(e2,e1)",
        "ORG-AFF(e1,e2)", "ORG-AFF(e2,e1)",
        "PART-WHOLE(e1,e2)", "PART-WHOLE(e2,e1)",
        "PER-SOC", "PHYS",
    ]
)
N_LABELS = len(LABELS)
LABEL_TO_ID = {l: i for i, l in enumerate(LABELS)}

FEAT_DIM = 32     # binary-feature embedding width
WORD_DIM = 32     # head-word embedding width
HIDDEN = 64
DEFAULT_SEED = 3435  # the reference's model seed (rnnRE.py:872-873)


def init_weights(seed: int = DEFAULT_SEED) -> dict[str, np.ndarray]:
    """Seeded MultiNN weights. float32 throughout; embedding row 0 = 0."""
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    w = {
        "E_feat": u(FEAT_BUCKETS, FEAT_DIM),
        "E_word": u(WORD_BUCKETS, WORD_DIM),
        "W1": u(FEAT_DIM + 2 * WORD_DIM, HIDDEN),
        "b1": np.zeros(HIDDEN, dtype=np.float32),
        "W_out": u(HIDDEN, N_LABELS),
        "b_out": np.zeros(N_LABELS, dtype=np.float32),
    }
    w["E_feat"][0] = 0.0
    w["E_word"][0] = 0.0
    # nudge NONE so it wins often enough for a realistic label mix
    w["b_out"][0] = 0.5
    return w


def multinn_forward(
    weights: dict[str, np.ndarray],
    flat_feat_ids: np.ndarray,
    feat_offsets: np.ndarray,
    head1: np.ndarray,
    head2: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized batch forward.

    flat_feat_ids: int array, all rows' feature ids concatenated.
    feat_offsets:  int array (n_rows + 1), row i owns
                   flat_feat_ids[feat_offsets[i]:feat_offsets[i+1]].
    head1/head2:   int arrays (n_rows,) of hashed head-word ids.

    Returns (pred_label_ids, probs) with probs (n_rows, N_LABELS).
    The ragged embedding-sum (Theano scan in the reference) is a
    gather + ``np.add.reduceat`` — no Python loop over rows.
    """
    n = len(head1)
    gathered = weights["E_feat"][flat_feat_ids]            # (total, FEAT_DIM)
    sums = np.zeros((n, FEAT_DIM), dtype=np.float32)
    starts = feat_offsets[:-1]
    nonempty = feat_offsets[1:] > starts
    if gathered.shape[0]:
        red = np.add.reduceat(gathered, starts[nonempty], axis=0)
        # reduceat with duplicate start points (empty rows) is avoided by
        # masking; scatter results back to their rows
        sums[nonempty] = red[: nonempty.sum()]
    x = np.concatenate(
        [sums, weights["E_word"][head1], weights["E_word"][head2]], axis=1
    )
    h = nn.sigmoid_mlp(x, [(weights["W1"], weights["b1"])])
    probs = nn.softmax(h @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


# ------------------------------------------------------- GRU-head variant

GRU_HIDDEN = 32


def init_gru_weights(seed: int = DEFAULT_SEED + 1) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    w = {"E_word": u(WORD_BUCKETS, WORD_DIM)}
    w["E_word"][0] = 0.0
    for d in ("f", "b"):  # forward / backward GRU params
        for g in ("z", "r", "h"):
            w[f"{d}W{g}"] = u(WORD_DIM, GRU_HIDDEN)
            w[f"{d}U{g}"] = u(GRU_HIDDEN, GRU_HIDDEN)
            w[f"{d}b{g}"] = np.zeros(GRU_HIDDEN, dtype=np.float32)
    w["W_out"] = u(4 * GRU_HIDDEN, N_LABELS)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def pad_token_batch(
    token_lists: list[list[int]], max_len: int | None = None
) -> np.ndarray:
    """Right-pad with id 0 (zero embedding row) to the BATCH max — not
    a global max (M13 note in SURVEY §2.2: semantics preserved because
    pad id 0 contributes zero vectors)."""
    n = len(token_lists)
    L = max_len or max((len(t) for t in token_lists), default=1)
    out = np.zeros((n, L), dtype=np.int64)
    for i, toks in enumerate(token_lists):
        k = min(len(toks), L)
        out[i, :k] = toks[:k]
    return out


def gru_head_forward(
    weights: dict[str, np.ndarray],
    token_ids: np.ndarray,   # (B, T) right-padded with 0 (zero embedding row)
    pos1: np.ndarray,
    pos2: np.ndarray,
    lengths: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """biGRU over token embeddings; readout = [fwd;bwd] states at the
    two head positions (reference ``rnnHeadIn``, rnnReModels.py:1377-88).

    The backward pass runs from each row's TRUE last token (``lengths``)
    — running it from the padded end would make a row's states depend
    on how much padding its batch carries (per-batch padding must be
    semantics-free, SURVEY M13 note).
    """
    x = weights["E_word"][token_ids]  # (B, T, D)
    B, T, _ = x.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    pf = {k[1:]: weights[k] for k in weights if k.startswith("f")}
    pb = {k[1:]: weights[k] for k in weights if k.startswith("b") and len(k) == 3}
    hf = nn.gru_forward(x, pf)
    # per-row reversal of the valid region only
    idx = lengths[:, None] - 1 - np.arange(T)[None, :]
    valid = idx >= 0
    rows2d = np.arange(B)[:, None]
    x_rev = np.where(valid[:, :, None], x[rows2d, np.clip(idx, 0, T - 1)], 0.0)
    hb_rev = nn.gru_forward(x_rev, pb)
    rows = np.arange(B)
    hb_p1 = hb_rev[rows, lengths - 1 - pos1]
    hb_p2 = hb_rev[rows, lengths - 1 - pos2]
    rep = np.concatenate([hf[rows, pos1], hb_p1, hf[rows, pos2], hb_p2], axis=1)
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


# ------------------------------------------------------- CNN variant (T7)

CNN_WINDOWS = (2, 3)
CNN_MAPS = 32

# relative-position embeddings (reference dist1/dist2 tables sized
# 2*maxLen-1 x 50, rnn_process_onlyExtra.py:687-699).  The reference
# sizes the table from a global max-length aggregate (SURVEY §7.6.3);
# the engine uses a configured cap instead — positions clip into
# [-MAX_REL_POS, MAX_REL_POS], so no global pass gates the stream.
MAX_REL_POS = 64
DIST_DIM = WORD_DIM  # summed into the token channel


def init_cnn_weights(seed: int = DEFAULT_SEED + 2) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    w = {"E_word": u(WORD_BUCKETS, WORD_DIM)}
    w["E_word"][0] = 0.0
    w["E_dist1"] = u(2 * MAX_REL_POS + 1, DIST_DIM)
    w["E_dist2"] = u(2 * MAX_REL_POS + 1, DIST_DIM)
    for win in CNN_WINDOWS:
        w[f"convW{win}"] = u(win * WORD_DIM, CNN_MAPS)
        w[f"convb{win}"] = np.zeros(CNN_MAPS, dtype=np.float32)
    w["W_out"] = u(len(CNN_WINDOWS) * CNN_MAPS, N_LABELS)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def rel_pos_ids(T: int, pos: np.ndarray) -> np.ndarray:
    """(B,) head positions -> (B, T) clipped relative-position ids
    (reference ``numPosition/2 + id - pos`` indexing, rnnRE.py:109-110,
    with the engine's configured cap instead of the global max)."""
    idx = np.arange(T)[None, :] - pos[:, None]
    return np.clip(idx, -MAX_REL_POS, MAX_REL_POS) + MAX_REL_POS


def cnn_forward(
    weights: dict[str, np.ndarray],
    token_ids: np.ndarray,
    pos1: np.ndarray | None = None,
    pos2: np.ndarray | None = None,
    lengths: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Multi-window CNN + tanh + global max-pool over token embeddings
    (reference ``convolute``/``convContext``, rnnReModels.py:443-489),
    with the reference's relative-position channels added in when head
    positions are given (dist1/dist2 embeddings summed into the token
    representation, masked beyond each row's true length).  ``lengths``
    makes the max-pool padding-independent (nn.conv_maxpool)."""
    x = weights["E_word"][token_ids]
    T = token_ids.shape[1]
    if lengths is None:
        lengths = np.full(len(token_ids), T, dtype=np.int64)
    if pos1 is not None and pos2 is not None:
        mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)[:, :, None]
        x = x + (
            weights["E_dist1"][rel_pos_ids(T, pos1)]
            + weights["E_dist2"][rel_pos_ids(T, pos2)]
        ) * mask
    filters = {
        win: (weights[f"convW{win}"], weights[f"convb{win}"]) for win in CNN_WINDOWS
    }
    rep = nn.conv_maxpool(x, filters, lengths)
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


def product_of_experts(prob_list: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Hybrid combiner (T4/T6): renormalized product of expert
    distributions (reference exp-sum formulation, rnnReModels.py:
    1049-1146, in probability space)."""
    logp = sum(np.log(np.clip(p, 1e-12, 1.0)) for p in prob_list)
    probs = nn.softmax(logp)
    return probs.argmax(axis=1), probs.astype(np.float32)
