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


def gru_head_fwd_forward(
    weights, token_ids, pos1, pos2, lengths=None
) -> tuple[np.ndarray, np.ndarray]:
    """FORWARD-only GRU head readout (the reference's single-direction
    ``rnnHead`` members, rnnReModels.py:1353-1375): states at (pos1,
    pos2) of the forward pass only.  Reuses the biGRU weight set
    (ignores the backward half; W_out_fwd covers the 2H readout)."""
    x = weights["E_word"][token_ids]
    B, T, _ = x.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    pf = {k[1:]: weights[k] for k in weights if k.startswith("f") and len(k) == 3}
    hf = nn.gru_forward(x, pf)
    rows = np.arange(B)
    rep = np.concatenate([hf[rows, pos1], hf[rows, pos2]], axis=1)
    probs = nn.softmax(rep @ weights["W_out_fwd"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


def init_gru_fwd_weights(seed: int = DEFAULT_SEED + 1) -> dict[str, np.ndarray]:
    """init_gru_weights plus the 2H single-direction readout matrices
    (forward-only ``rnnHeadForward`` and backward-only
    ``rnnHeadBackward``, rnnReModels.py:1357-1363)."""
    w = init_gru_weights(seed)
    rng = np.random.default_rng(seed + 1000)
    w["W_out_fwd"] = rng.uniform(
        -0.25, 0.25, size=(2 * GRU_HIDDEN, N_LABELS)
    ).astype(np.float32)
    w["W_out_bwd"] = rng.uniform(
        -0.25, 0.25, size=(2 * GRU_HIDDEN, N_LABELS)
    ).astype(np.float32)
    return w


def gru_head_bwd_forward(
    weights, token_ids, pos1, pos2, lengths=None
) -> tuple[np.ndarray, np.ndarray]:
    """BACKWARD-only GRU head readout (reference ``rnnHeadBackward``,
    rnnReModels.py:1361-1363): states at (pos1, pos2) of the backward
    pass only — the backward GRU runs from each row's TRUE last token
    (padding-independent, see gru_head_forward)."""
    B, T = token_ids.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    _, hb, _ = _bigru_states(weights, token_ids, lengths, direction="bwd")
    rows = np.arange(B)
    rep = np.concatenate([hb[rows, pos1], hb[rows, pos2]], axis=1)
    probs = nn.softmax(rep @ weights["W_out_bwd"] + weights["b_out"])
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


# ------------------------------------------------- weight save/load (S8)


def save_weights(weights: dict[str, np.ndarray], path: str) -> None:
    """S8 model-weight sink (reference: one .npy per named parameter,
    ``rnnReModels.py:725-727``): one compressed npz holding every named
    array — the checkpoint a *trained* weight set would arrive in."""
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz", **weights)


def load_weights(path: str) -> dict[str, np.ndarray]:
    """S8 source: load a named-parameter checkpoint saved by
    ``save_weights``; scorer actors accept the result anywhere a
    seeded ``init_weights()`` dict is accepted."""
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        return {k: z[k] for k in z.files}


# ----------------------------------------- pooled-GRU readouts (T10/T11)


def _gru_params(rng_u, prefix_pairs=("f", "b"), in_dim=WORD_DIM, hid=GRU_HIDDEN):
    w = {}
    for d in prefix_pairs:
        for g in ("z", "r", "h"):
            w[f"{d}W{g}"] = rng_u(in_dim, hid)
            w[f"{d}U{g}"] = rng_u(hid, hid)
            w[f"{d}b{g}"] = np.zeros(hid, dtype=np.float32)
    return w


def _bigru_states(weights, token_ids, lengths, direction: str = "bi"):
    """Shared biGRU machinery: returns (hf, hb, valid) — ``hb`` is the
    backward pass (run from each row's TRUE last token; see
    gru_head_forward for why padding must not feed the backward GRU)
    RE-ALIGNED to forward time order, so ``hb[rows, pos]`` is position
    ``pos``'s backward state directly (``_stacked_states`` re-aligns
    the same way).  ``direction``: 'fwd'/'bwd' skip the unused
    recurrence entirely — the per-timestep GRU loop dominates encoder
    cost, so single-direction members must not pay for both passes —
    returning None in the skipped slot."""
    x = weights["E_word"][token_ids]
    B, T, _ = x.shape
    idx = lengths[:, None] - 1 - np.arange(T)[None, :]
    valid = idx >= 0
    hf = hb = None
    if direction in ("bi", "fwd"):
        pf = {k[1:]: weights[k] for k in weights if k.startswith("f") and len(k) == 3}
        hf = nn.gru_forward(x, pf)
    if direction in ("bi", "bwd"):
        pb = {k[1:]: weights[k] for k in weights if k.startswith("b") and len(k) == 3}
        rows2d = np.arange(B)[:, None]
        x_rev = np.where(valid[:, :, None], x[rows2d, np.clip(idx, 0, T - 1)], 0.0)
        hb_rev = nn.gru_forward(x_rev, pb)
        # re-align backward states to forward time order (position t of
        # row i lives at reversed index lengths[i]-1-t); padding -> 0
        hb = np.where(
            valid[:, :, None], hb_rev[rows2d, np.clip(idx, 0, T - 1)], 0.0
        )
    return hf, hb, valid


def init_gru_pool_weights(seed: int = DEFAULT_SEED + 3) -> dict[str, np.ndarray]:
    """Weights for the max/mean-pooled biGRU readouts (reference
    ``rnnMax``/``rnnSum`` families, rnnReModels.py:1390-1442)."""
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    w = {"E_word": u(WORD_BUCKETS, WORD_DIM)}
    w["E_word"][0] = 0.0
    w.update(_gru_params(u))
    w["W_out"] = u(2 * GRU_HIDDEN, N_LABELS)
    w["W_out_f"] = u(GRU_HIDDEN, N_LABELS)  # single-direction readouts
    w["W_out_b"] = u(GRU_HIDDEN, N_LABELS)  # (rnnMaxForward/Backward)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def gru_max_forward(
    weights, token_ids, pos1=None, pos2=None, lengths=None,
    direction: str = "bi",
) -> tuple[np.ndarray, np.ndarray]:
    """biGRU + elementwise max-pool over the valid positions (reference
    ``rnnMaxIn``, rnnReModels.py:1414-1419), padded positions masked to
    -inf so pooling is padding-independent.  ``direction``: 'bi' (2H,
    ``rnnMax``), 'fwd' (H, ``rnnMaxForward``) or 'bwd' (H,
    ``rnnMaxBackward``, :1390-1400)."""
    B, T = token_ids.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    hf, hb, valid = _bigru_states(weights, token_ids, lengths, direction)
    if direction == "bi":
        h, W = np.concatenate([hf, hb], axis=2), weights["W_out"]
    elif direction == "fwd":
        h, W = hf, weights["W_out_f"]
    else:
        h, W = hb, weights["W_out_b"]
    h = np.where(valid[:, :, None], h, -np.inf)
    rep = h.max(axis=1)
    probs = nn.softmax(rep @ W + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


def gru_sum_forward(
    weights, token_ids, pos1=None, pos2=None, lengths=None,
    dep_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """biGRU + mean-pool over the valid positions (reference ``rnnSum``,
    rnnReModels.py:1421-1430 — ``_x.mean(1)``).  With ``dep_mask``
    (B, T) the pool is the RAW masked sum over the span — reference
    ``rnnSumDep`` pools ``(x_i * dep_i).sum(0)`` with NO length
    normalization (:1432-1442); only the plain rnnSum is a mean."""
    B, T = token_ids.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    hf, hb, valid = _bigru_states(weights, token_ids, lengths)
    h = np.concatenate([hf, hb], axis=2)
    if dep_mask is None:
        h = np.where(valid[:, :, None], h, 0.0)
        denom = np.maximum(valid.sum(axis=1), 1)[:, None]
        rep = h.sum(axis=1) / denom
    else:
        mask = valid & dep_mask.astype(bool)
        rep = np.where(mask[:, :, None], h, 0.0).sum(axis=1)
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


# ----------------------------------------- FF-RNN (sigmoid) family (T9/T10)


def init_ffrnn_weights(seed: int = DEFAULT_SEED + 8) -> dict[str, np.ndarray]:
    """Weights for the sigmoid feed-forward-RNN encoder members
    (reference ``rnnHeadFf*``/``rnnMaxFf*``, rnnReModels.py:1365-1375,
    1402-1413; cell ``rnn_ff`` :213-230): one FF-RNN per direction plus
    readout matrices for every member's output width (4H bi-head, 2H
    single-direction head / bi max, H single-direction max)."""
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    w = {"E_word": u(WORD_BUCKETS, WORD_DIM)}
    w["E_word"][0] = 0.0
    for d in ("fw", "bw"):
        w[f"{d}W"] = u(WORD_DIM, GRU_HIDDEN)
        w[f"{d}U"] = u(GRU_HIDDEN, GRU_HIDDEN)
        w[f"{d}b"] = np.zeros(GRU_HIDDEN, dtype=np.float32)
    w["W_out4"] = u(4 * GRU_HIDDEN, N_LABELS)
    w["W_out2f"] = u(2 * GRU_HIDDEN, N_LABELS)
    w["W_out2b"] = u(2 * GRU_HIDDEN, N_LABELS)
    w["W_out2m"] = u(2 * GRU_HIDDEN, N_LABELS)
    w["W_out1f"] = u(GRU_HIDDEN, N_LABELS)
    w["W_out1b"] = u(GRU_HIDDEN, N_LABELS)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def _ffrnn_states(weights, token_ids, lengths, direction: str = "bi"):
    """Shared FF-RNN machinery, mirroring ``_bigru_states``: forward
    states plus backward states run from each row's TRUE last token and
    re-aligned to forward time order (padding-independent).
    'fwd'/'bwd' skip the unused recurrence (None in its slot)."""
    x = weights["E_word"][token_ids]
    B, T, _ = x.shape
    idx = lengths[:, None] - 1 - np.arange(T)[None, :]
    valid = idx >= 0
    hf = hb = None
    if direction in ("bi", "fwd"):
        hf = nn.ffrnn_forward(x, weights["fwW"], weights["fwU"], weights["fwb"])
    if direction in ("bi", "bwd"):
        rows2d = np.arange(B)[:, None]
        x_rev = np.where(valid[:, :, None], x[rows2d, np.clip(idx, 0, T - 1)], 0.0)
        hb_rev = nn.ffrnn_forward(x_rev, weights["bwW"], weights["bwU"], weights["bwb"])
        hb = np.where(valid[:, :, None], hb_rev[rows2d, np.clip(idx, 0, T - 1)], 0.0)
    return hf, hb, valid


def ffrnn_head_forward(
    weights, token_ids, pos1, pos2, lengths=None, direction: str = "bi"
) -> tuple[np.ndarray, np.ndarray]:
    """FF-RNN head-state readout (reference ``rnnHeadFf`` 4H /
    ``rnnHeadFfForward`` / ``rnnHeadFfBackward`` 2H,
    rnnReModels.py:1365-1375 via ``rnnHeadIn``)."""
    B, T = token_ids.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    hf, hb, _ = _ffrnn_states(weights, token_ids, lengths, direction)
    rows = np.arange(B)
    if direction == "bi":
        rep = np.concatenate(
            [hf[rows, pos1], hb[rows, pos1], hf[rows, pos2], hb[rows, pos2]], axis=1
        )
        W = weights["W_out4"]
    elif direction == "fwd":
        rep = np.concatenate([hf[rows, pos1], hf[rows, pos2]], axis=1)
        W = weights["W_out2f"]
    else:
        rep = np.concatenate([hb[rows, pos1], hb[rows, pos2]], axis=1)
        W = weights["W_out2b"]
    probs = nn.softmax(rep @ W + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


def ffrnn_max_forward(
    weights, token_ids, pos1=None, pos2=None, lengths=None, direction: str = "bi"
) -> tuple[np.ndarray, np.ndarray]:
    """FF-RNN + length-masked max-pool (reference ``rnnMaxFf`` 2H /
    ``rnnMaxFfForward`` / ``rnnMaxFfBackward`` H,
    rnnReModels.py:1402-1413 via ``rnnMaxIn``)."""
    B, T = token_ids.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    hf, hb, valid = _ffrnn_states(weights, token_ids, lengths, direction)
    if direction == "bi":
        h, W = np.concatenate([hf, hb], axis=2), weights["W_out2m"]
    elif direction == "fwd":
        h, W = hf, weights["W_out1f"]
    else:
        h, W = hb, weights["W_out1b"]
    h = np.where(valid[:, :, None], h, -np.inf)
    rep = h.max(axis=1)
    probs = nn.softmax(rep @ W + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


# --------------------------------------------- attention readouts (T12)


def init_gru_att_weights(seed: int = DEFAULT_SEED + 4, head: bool = False):
    """Weights for the attention-pooled biGRU (reference ``rnnAtt`` /
    ``rnnAttHead``, rnnReModels.py:1444-1497): a plain LINEAR score —
    ``IW`` (2H -> 1) + scalar ``Ib``, exponentiated and normalized over
    time — exactly the reference's ``alpha = exp(x_i.IW + Ib)`` (not a
    Bahdanau projection+context form)."""
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    w = {"E_word": u(WORD_BUCKETS, WORD_DIM)}
    w["E_word"][0] = 0.0
    w.update(_gru_params(u))
    w["IW"] = u(2 * GRU_HIDDEN)
    w["Ib"] = np.zeros(1, dtype=np.float32)
    out_dim = 2 * GRU_HIDDEN * (3 if head else 1)
    w["W_out"] = u(out_dim, N_LABELS)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def gru_att_forward(
    weights, token_ids, pos1=None, pos2=None, lengths=None, head: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """biGRU + linear-scored softmax attention pooling (reference
    ``rnnAtt``: ``alpha = softmax(x_i . IW + Ib)`` over time,
    rnnReModels.py:1452-1461); ``head=True`` concats the attended
    vector with the hidden states at (pos1, pos2) — ``rnnAttHead``."""
    B, T = token_ids.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    hf, hb, valid = _bigru_states(weights, token_ids, lengths)
    h = np.concatenate([hf, hb], axis=2)  # (B, T, 2H)
    scores = h @ weights["IW"] + weights["Ib"][0]  # (B, T) linear score
    scores = np.where(valid, scores, -np.inf)
    alpha = nn.softmax(scores)  # (B, T), zero on padding
    rep = (alpha[:, :, None] * np.where(valid[:, :, None], h, 0.0)).sum(axis=1)
    if head:
        rows = np.arange(B)
        rep = np.concatenate([rep, h[rows, pos1], h[rows, pos2]], axis=1)
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


# ------------------------------------- same-length CNN + sum pool (T8)


def init_conv_sum_weights(seed: int = DEFAULT_SEED + 5):
    """Weights for ``convoluteSum``/``convoluteSumDep`` (reference
    rnnReModels.py:1324-1351): one same-length window-3 convolution,
    mean- or span-masked-pooled."""
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    w = {"E_word": u(WORD_BUCKETS, WORD_DIM)}
    w["E_word"][0] = 0.0
    w["convW"] = u(3 * WORD_DIM, CNN_MAPS)
    w["convb"] = np.zeros(CNN_MAPS, dtype=np.float32)
    w["W_out"] = u(CNN_MAPS, N_LABELS)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def conv_sum_forward(
    weights, token_ids, pos1=None, pos2=None, lengths=None,
    dep_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Same-length CNN (zero-padded window 3, one feature map column per
    position — reference ``convContextLs``, rnnReModels.py:431-441) +
    mean-pool over valid positions; with ``dep_mask`` (B, T) the pool
    sums over the masked span only (``convoluteSumDep``'s dep-path
    masked pooling, :1338-1351)."""
    x = weights["E_word"][token_ids]
    B, T, D = x.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    # same-length conv: pad one zero frame each side, window 3
    pad = np.zeros((B, 1, D), dtype=x.dtype)
    xp = np.concatenate([pad, x, pad], axis=1)  # (B, T+2, D)
    cols = np.concatenate([xp[:, 0:T], xp[:, 1 : T + 1], xp[:, 2 : T + 2]], axis=2)
    conv = np.tanh(cols @ weights["convW"] + weights["convb"])  # (B, T, M)
    valid = np.arange(T)[None, :] < lengths[:, None]
    mask = valid if dep_mask is None else (valid & dep_mask.astype(bool))
    m = mask.astype(conv.dtype)[:, :, None]
    denom = np.maximum(mask.sum(axis=1), 1)[:, None]
    rep = (conv * m).sum(axis=1) / denom
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


def span_mask(T: int, pos1: np.ndarray, pos2: np.ndarray) -> np.ndarray:
    """(B, T) mask of the inclusive [pos1, pos2] token span — the
    engine's dep-path stand-in for plain text (the reference's fallback
    path when no dependency parse exists is exactly the head-pair span,
    rnn_process_onlyExtra.py:437-452)."""
    idx = np.arange(T)[None, :]
    return (idx >= pos1[:, None]) & (idx <= pos2[:, None])


# --------------------------------- one-hot feature mode (M13 features==1)
#
# The reference expands categorical per-token features to one-hot /
# multi-hot tensors when a feature's flag is 1 (rnnRE.py:82-118).  The
# engine keeps INDEX form in Arrow end-to-end (SURVEY §7.6.8 — dense
# one-hot would explode block sizes) and expands per batch inside the
# actor, immediately before the matmul that consumes it.


def onehot_expand(ids: np.ndarray, n_classes: int) -> np.ndarray:
    """(B, T) int ids -> (B, T, n_classes) float32 one-hot; id 0 is the
    reserved padding id and expands to the all-zero vector (the same
    contract as embedding row 0)."""
    B, T = ids.shape
    out = np.zeros((B, T, n_classes), dtype=np.float32)
    rows, cols = np.nonzero(ids > 0)
    out[rows, cols, ids[rows, cols] - 1] = 1.0
    return out


def multihot_expand(
    id_lists: list[list[list[int]]], T: int, n_classes: int
) -> np.ndarray:
    """Per-token id SETS -> (B, T, n_classes) multi-hot (the reference's
    ``grammar`` dep-relation channel, rnnRE.py:95-118); ids are 1-based,
    0/absent -> zero row."""
    B = len(id_lists)
    out = np.zeros((B, T, n_classes), dtype=np.float32)
    for b, toks in enumerate(id_lists):
        for t, ids in enumerate(toks[:T]):
            for i in ids:
                if i > 0:
                    out[b, t, i - 1] = 1.0
    return out


def init_channel_cnn_weights(seed: int, extra_dim: int):
    """CNN weights over [word embedding (+) ``extra_dim`` categorical
    channels] — the full M13 channel set (type/POS/chunk/constit one-hot
    + grammar multi-hot, rnnRE.py:82-118) expanded per batch inside the
    actor."""
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    D = WORD_DIM + extra_dim
    w = {"E_word": u(WORD_BUCKETS, WORD_DIM)}
    w["E_word"][0] = 0.0
    for win in CNN_WINDOWS:
        w[f"convW{win}"] = u(win * D, CNN_MAPS)
        w[f"convb{win}"] = np.zeros(CNN_MAPS, dtype=np.float32)
    w["W_out"] = u(len(CNN_WINDOWS) * CNN_MAPS, N_LABELS)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def channel_cnn_forward(weights, x: np.ndarray, lengths=None):
    """Multi-window CNN + max-pool over a PRE-ASSEMBLED (B, T, D) token
    representation (word embeddings + expanded categorical channels)."""
    B, T, _ = x.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    filters = {
        win: (weights[f"convW{win}"], weights[f"convb{win}"]) for win in CNN_WINDOWS
    }
    rep = nn.conv_maxpool(x, filters, lengths)
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


def init_onehot_cnn_weights(seed: int, n_classes: int):
    """CNN weights over [word embedding (+) one-hot categorical]
    channels (the M13 ``features==1`` mode feeding the reference's
    convolutional encoder)."""
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    D = WORD_DIM + n_classes
    w = {"E_word": u(WORD_BUCKETS, WORD_DIM), "n_classes": np.array([n_classes])}
    w["E_word"][0] = 0.0
    for win in CNN_WINDOWS:
        w[f"convW{win}"] = u(win * D, CNN_MAPS)
        w[f"convb{win}"] = np.zeros(CNN_MAPS, dtype=np.float32)
    w["W_out"] = u(len(CNN_WINDOWS) * CNN_MAPS, N_LABELS)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def onehot_cnn_forward(
    weights, token_ids, class_ids, lengths=None
) -> tuple[np.ndarray, np.ndarray]:
    """Multi-window CNN + max-pool over [embedding ; one-hot] token
    representations; one-hot expansion happens HERE, per batch."""
    n_classes = int(weights["n_classes"][0])
    x = np.concatenate(
        [weights["E_word"][token_ids], onehot_expand(class_ids, n_classes)],
        axis=2,
    )
    B, T, _ = x.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    filters = {
        win: (weights[f"convW{win}"], weights[f"convb{win}"]) for win in CNN_WINDOWS
    }
    rep = nn.conv_maxpool(x, filters, lengths)
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


# ------------------------------- stacked alternate family (T13, sample)


def _dir_width(direction: str) -> int:
    return 2 if direction == "bi" else 1


def init_stacked_weights(
    seed: int = DEFAULT_SEED + 7,
    readout: str = "head",
    direction: str = "bi",
    depth: int = 1,
):
    """Weights for the stacked CNN->GRU encoders — the reference's full
    ``alternateHead``/``alternateMax`` families (rnnReModels.py:
    1148-1277): per level, a same-length convolution re-represents each
    token from its window, then the GRU runs over conv features instead
    of raw embeddings.  ``direction``: 'bi'/'fwd'/'bwd' (the
    ``*Forward``/``*Backward`` members run one GRU direction only);
    ``depth=2`` repeats the conv->GRU block (``alternateHeadDeep``/
    ``alternateMaxDeep``, :1200-1216,1260-1277).  ``readout``: 'head'
    (states at pos1/pos2) or 'max' (masked max-pool over time)."""
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    w = {"E_word": u(WORD_BUCKETS, WORD_DIM)}
    w["E_word"][0] = 0.0
    in_dim = WORD_DIM
    for lvl in range(depth):
        w[f"convW{lvl}"] = u(3 * in_dim, CNN_MAPS)
        w[f"convb{lvl}"] = np.zeros(CNN_MAPS, dtype=np.float32)
        w.update(
            {f"L{lvl}{k}": v for k, v in _gru_params(u, in_dim=CNN_MAPS).items()}
        )
        in_dim = _dir_width(direction) * GRU_HIDDEN
    per_pos = _dir_width(direction) * GRU_HIDDEN
    out_dim = 2 * per_pos if readout == "head" else per_pos
    w["W_out"] = u(out_dim, N_LABELS)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def _samelen_conv(x: np.ndarray, W: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Same-length window-3 convolution (zero-padded one frame per
    side, positions stay aligned — reference ``convContextLs``,
    rnnReModels.py:431-441)."""
    B, T, D = x.shape
    pad = np.zeros((B, 1, D), dtype=x.dtype)
    xp = np.concatenate([pad, x, pad], axis=1)
    cols = np.concatenate([xp[:, 0:T], xp[:, 1 : T + 1], xp[:, 2 : T + 2]], axis=2)
    return np.tanh(cols @ W + b)


def _stacked_states(weights, token_ids, lengths, direction="bi", depth=1):
    """Shared stacked machinery: ``depth`` x (same-length conv ->
    GRU), positions beyond a row's true length zeroed before each GRU
    so readouts are padding-independent.  Returns (h, valid) with the
    backward pass re-aligned to forward time order; h is (B, T, 2H)
    for 'bi', (B, T, H) for single directions."""
    x = weights["E_word"][token_ids]
    B, T, _ = x.shape
    valid = np.arange(T)[None, :] < lengths[:, None]
    idx = lengths[:, None] - 1 - np.arange(T)[None, :]
    rows2d = np.arange(B)[:, None]
    h = x
    for lvl in range(depth):
        conv = _samelen_conv(h, weights[f"convW{lvl}"], weights[f"convb{lvl}"])
        conv = np.where(valid[:, :, None], conv, 0.0)
        parts = []
        if direction in ("bi", "fwd"):
            pf = {
                k[len(f"L{lvl}f"):]: v
                for k, v in weights.items()
                if k.startswith(f"L{lvl}f")
            }
            parts.append(nn.gru_forward(conv, pf))
        if direction in ("bi", "bwd"):
            pb = {
                k[len(f"L{lvl}b"):]: v
                for k, v in weights.items()
                if k.startswith(f"L{lvl}b")
            }
            c_rev = np.where(
                (idx >= 0)[:, :, None], conv[rows2d, np.clip(idx, 0, T - 1)], 0.0
            )
            hb_rev = nn.gru_forward(c_rev, pb)
            parts.append(
                np.where(
                    (idx >= 0)[:, :, None], hb_rev[rows2d, np.clip(idx, 0, T - 1)], 0.0
                )
            )
        h = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=2)
        # zero padded positions: the forward GRU keeps evolving into the
        # padded tail, and the NEXT level's conv window at the last
        # valid position would otherwise see padding-dependent values
        h = np.where(valid[:, :, None], h, 0.0)
    return h, valid


def stacked_head_forward(
    weights, token_ids, pos1, pos2, lengths=None, direction="bi", depth=1
) -> tuple[np.ndarray, np.ndarray]:
    """Stacked CNN->GRU, head-state readout (``alternateHead`` and its
    Forward/Backward/Deep members, rnnReModels.py:1148-1216)."""
    B, T = token_ids.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    h, _ = _stacked_states(weights, token_ids, lengths, direction, depth)
    rows = np.arange(B)
    rep = np.concatenate([h[rows, pos1], h[rows, pos2]], axis=1)
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


def stacked_max_forward(
    weights, token_ids, pos1=None, pos2=None, lengths=None, direction="bi", depth=1
) -> tuple[np.ndarray, np.ndarray]:
    """Stacked CNN->GRU, length-masked max-pool readout
    (``alternateMax`` and its Forward/Backward/Deep members,
    rnnReModels.py:1218-1277)."""
    B, T = token_ids.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    h, valid = _stacked_states(weights, token_ids, lengths, direction, depth)
    h = np.where(valid[:, :, None], h, -np.inf)
    rep = h.max(axis=1)
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


# ------------------------------- GRU->CNN alternate family (T13 cont.)


def init_altconv_weights(seed: int = DEFAULT_SEED + 9, direction: str = "bi"):
    """Weights for ``alternateConv``/``alternateConvForward``/
    ``alternateConvBackward`` (rnnReModels.py:1279-1313): the OPPOSITE
    stacking order — GRU states first, then a multi-window convolution
    + max-pool over them."""
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    w = {"E_word": u(WORD_BUCKETS, WORD_DIM)}
    w["E_word"][0] = 0.0
    w.update(_gru_params(u))
    in_dim = _dir_width(direction) * GRU_HIDDEN
    for win in CNN_WINDOWS:
        w[f"convW{win}"] = u(win * in_dim, CNN_MAPS)
        w[f"convb{win}"] = np.zeros(CNN_MAPS, dtype=np.float32)
    w["W_out"] = u(len(CNN_WINDOWS) * CNN_MAPS, N_LABELS)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def altconv_forward(
    weights, token_ids, pos1=None, pos2=None, lengths=None, direction="bi"
) -> tuple[np.ndarray, np.ndarray]:
    """GRU -> multi-window CNN + masked max-pool (reference
    ``alternateConv*``, rnnReModels.py:1279-1313).  Windows straddling
    a row's padded tail are masked out of the pool (nn.conv_maxpool),
    so the readout is padding-independent."""
    B, T = token_ids.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    hf, hb, valid = _bigru_states(weights, token_ids, lengths, direction)
    if direction == "bi":
        h = np.concatenate([hf, hb], axis=2)
    elif direction == "fwd":
        h = hf
    else:
        h = hb
    h = np.where(valid[:, :, None], h, 0.0)
    filters = {
        win: (weights[f"convW{win}"], weights[f"convb{win}"]) for win in CNN_WINDOWS
    }
    rep = nn.conv_maxpool(h, filters, lengths)
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


# ------------------------------------- dep-path second channel (M14/T2)


def dep_view_gather(
    token_ids: np.ndarray, pos1: np.ndarray, pos2: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized M6/M14 gather: per row, the sentence-aligned token ids
    at the dep-path indices.  For plain text the dep path is the
    contiguous [pos1, pos2] span (the reference's __NULL__-path fallback
    semantics); for parsed corpora pass real ``dep_idxs`` through
    ``gather_at_indices`` instead.  Returns (dep_token_ids right-padded
    with 0, dep_lengths); dep head positions are (0, len-1) by
    construction (rnn_process_onlyExtra.py:474-489)."""
    B, T = token_ids.shape
    dep_len = pos2 - pos1 + 1
    Td = int(dep_len.max()) if B else 1
    idx = pos1[:, None] + np.arange(Td)[None, :]
    valid = idx <= pos2[:, None]
    rows2d = np.arange(B)[:, None]
    dep = np.where(valid, token_ids[rows2d, np.clip(idx, 0, T - 1)], 0)
    return dep, dep_len.astype(np.int64)


def gather_at_indices(
    features: np.ndarray, idxs: np.ndarray, valid: np.ndarray
) -> np.ndarray:
    """General M6 gather: sentence-aligned feature rows taken at
    (padded) dep-path index matrix ``idxs``; invalid slots -> 0."""
    rows2d = np.arange(len(features))[:, None]
    out = features[rows2d, np.clip(idxs, 0, features.shape[1] - 1)]
    return np.where(valid[..., None] if out.ndim == 3 else valid, out, 0)


def init_dual_weights(seed: int = DEFAULT_SEED + 6) -> dict[str, np.ndarray]:
    """Dual-channel weights (reference ``mainModel`` with seqType
    ``-dep``, rnnReModels.py:729-770 + rnnRE.py:701-744): one biGRU per
    channel (word embeddings TIED across channels like the reference's
    ``sharedEmbs`` option), concat of both head readouts -> softmax."""
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    w = {"E_word": u(WORD_BUCKETS, WORD_DIM)}
    w["E_word"][0] = 0.0
    w.update(_gru_params(u))                       # channel 1 (sentence)
    w.update({"d" + k: v for k, v in _gru_params(u).items()})  # channel 2 (dep)
    w["W_out"] = u(8 * GRU_HIDDEN, N_LABELS)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def dual_channel_forward(
    weights, token_ids, pos1, pos2, lengths=None, dep_view=None
) -> tuple[np.ndarray, np.ndarray]:
    """Channel 1: biGRU-head readout over the sentence.  Channel 2: the
    same readout over the dep-path view (M14) — by default the span
    gather of ``dep_view_gather``; pass ``dep_view=(dep_token_ids,
    dep_lengths)`` to use a REAL parsed dependency path (the ACE
    corpus path, M6 ``retrieveDepFeatures``).  Dep head positions are
    (0, len-1) in both cases (rnn_process_onlyExtra.py:474-489).
    Concat -> softmax — the reference's dual-channel concat
    (`concatRep`, rnnReModels.py:103-150)."""
    B, T = token_ids.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)
    rows = np.arange(B)

    def head_rep(w_prefixed, toks, p1, p2, lens):
        sub = {"E_word": weights["E_word"]}
        sub.update(w_prefixed)
        hf, hb, _ = _bigru_states(sub, toks, lens)
        return np.concatenate(
            [hf[rows, p1], hb[rows, p1], hf[rows, p2], hb[rows, p2]], axis=1
        )

    ch1 = head_rep(
        {k: v for k, v in weights.items() if len(k) == 3 and k[0] in "fb"},
        token_ids, pos1, pos2, lengths,
    )
    if dep_view is not None:
        dep, dep_len = dep_view
        dep_len = np.asarray(dep_len, dtype=np.int64)
    else:
        dep, dep_len = dep_view_gather(token_ids, pos1, pos2)
    ch2 = head_rep(
        {k[1:]: v for k, v in weights.items() if k.startswith("d") and len(k) == 4},
        dep, np.zeros(B, dtype=np.int64), dep_len - 1, dep_len,
    )
    rep = np.concatenate([ch1, ch2], axis=1)
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


def init_dual_cnn_weights(seed: int = DEFAULT_SEED + 10) -> dict[str, np.ndarray]:
    """Dual-channel CNN weights (the reference's ``-`` grammar pairs
    ANY encoder with the dep channel, rnnRE.py:701-744 — this is the
    CNN member of that matrix): one multi-window conv stack per
    channel, word embeddings tied, concat of both max-pooled reps."""
    rng = np.random.default_rng(seed)

    def u(*shape):
        return rng.uniform(-0.25, 0.25, size=shape).astype(np.float32)

    w = {"E_word": u(WORD_BUCKETS, WORD_DIM)}
    w["E_word"][0] = 0.0
    for ch in ("s", "d"):  # sentence / dep-path channels
        for win in CNN_WINDOWS:
            w[f"{ch}convW{win}"] = u(win * WORD_DIM, CNN_MAPS)
            w[f"{ch}convb{win}"] = np.zeros(CNN_MAPS, dtype=np.float32)
    w["W_out"] = u(2 * len(CNN_WINDOWS) * CNN_MAPS, N_LABELS)
    w["b_out"] = np.zeros(N_LABELS, dtype=np.float32)
    w["b_out"][0] = 0.5
    return w


def dual_cnn_forward(
    weights, token_ids, pos1, pos2, lengths=None, dep_view=None
) -> tuple[np.ndarray, np.ndarray]:
    """Dual-channel CNN scorer: channel 1 = multi-window CNN + masked
    max-pool over the sentence; channel 2 = the same over the dep-path
    view (span gather by default, real parsed path via ``dep_view``),
    concat -> softmax — completing the dual-channel matrix beyond the
    GRU-head member (reference ``mainModel`` seqType ``-dep`` with a
    convolutional model1/model2, rnnReModels.py:729-770)."""
    B, T = token_ids.shape
    if lengths is None:
        lengths = np.full(B, T, dtype=np.int64)

    def chan(prefix: str, toks, lens):
        x = weights["E_word"][toks]
        filters = {
            win: (weights[f"{prefix}convW{win}"], weights[f"{prefix}convb{win}"])
            for win in CNN_WINDOWS
        }
        return nn.conv_maxpool(x, filters, lens)

    ch1 = chan("s", token_ids, lengths)
    if dep_view is not None:
        dep, dep_len = dep_view
        dep_len = np.asarray(dep_len, dtype=np.int64)
    else:
        dep, dep_len = dep_view_gather(token_ids, pos1, pos2)
    ch2 = chan("d", dep, dep_len)
    rep = np.concatenate([ch1, ch2], axis=1)
    probs = nn.softmax(rep @ weights["W_out"] + weights["b_out"])
    return probs.argmax(axis=1), probs.astype(np.float32)


def product_of_experts(
    prob_list: list[np.ndarray], log_bias: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Hybrid combiner (T4/T6): renormalized product of expert
    distributions (reference exp-sum formulation, rnnReModels.py:
    1049-1146, in probability space).

    ``log_bias``: optional (n, n_labels) additive log-space term — the
    kernel-score expert (J3): the reference multiplies
    ``exp(kernelScore)`` into the product (rnnReModels.py:1144-1146),
    which is exactly adding kernelScore to the log-product here.  A
    per-row CONSTANT bias (the reference's zeroed ``[-1.0]*nc``
    vector) cancels in the stabilized softmax — the disabled case
    keeps identical predictions and probabilities up to one float
    rounding of the shift (test-pinned)."""
    logp = sum(np.log(np.clip(p, 1e-12, 1.0)) for p in prob_list)
    if log_bias is not None:
        logp = logp + log_bias
    probs = nn.softmax(logp)
    return probs.argmax(axis=1), probs.astype(np.float32)
