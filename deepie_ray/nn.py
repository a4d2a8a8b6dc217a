"""Numpy neural cells (reference model zoo T14, ``rnnReModels.py``).

Pure-numpy forward passes shared by the single-threaded oracle and the
Ray scorer actors — same arrays, same math, so distributed == oracle
bit-for-bit.  Cells mirror the reference's Theano graph semantics:

* ``gru_forward``   — standard GRU (reset/update gates, tanh candidate),
  reference ``rnn_gru`` (``rnnReModels.py:272-308``).
* ``ffrnn_forward`` — sigmoid feed-forward RNN, reference ``rnn_ff``
  (``rnnReModels.py:213-270``).
* ``conv_maxpool``  — multi-window 1-D convolution + tanh + global
  max-pool, reference ``convolute``/``LeNetConvPoolLayer``
  (``rnnReModels.py:443-489,1315-1322``).
* ``sigmoid_mlp``   — sigmoid hidden layers, reference ``HiddenLayer``
  (``rnnReModels.py:493-516``).
* ``softmax``       — row softmax, numerically stabilized.

No training (SURVEY.md §2.3 T16: serving pipeline only; fixed seeded
weights suffice for parity).
"""

from __future__ import annotations

import numpy as np


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def softmax(x: np.ndarray) -> np.ndarray:
    """Row-wise softmax over the last axis, stabilized."""
    z = x - x.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def gru_step(h, x_t, Wz, Uz, bz, Wr, Ur, br, Wh, Uh, bh):
    z = sigmoid(x_t @ Wz + h @ Uz + bz)
    r = sigmoid(x_t @ Wr + h @ Ur + br)
    c = np.tanh(x_t @ Wh + (r * h) @ Uh + bh)
    return (1.0 - z) * h + z * c


def gru_forward(x: np.ndarray, params: dict, reverse: bool = False) -> np.ndarray:
    """x: (T, D) or (B, T, D) -> hidden states (..., T, H).

    ``reverse=True`` runs right-to-left and re-reverses the output —
    the reference's backward-pass trick (``rnnReModels.py:310-388``).
    """
    single = x.ndim == 2
    if single:
        x = x[None]
    if reverse:
        x = x[:, ::-1]
    B, T, _ = x.shape
    H = params["Uz"].shape[0]
    h = np.zeros((B, H), dtype=x.dtype)
    out = np.empty((B, T, H), dtype=x.dtype)
    for t in range(T):
        h = gru_step(
            h, x[:, t],
            params["Wz"], params["Uz"], params["bz"],
            params["Wr"], params["Ur"], params["br"],
            params["Wh"], params["Uh"], params["bh"],
        )
        out[:, t] = h
    if reverse:
        out = out[:, ::-1]
    return out[0] if single else out


def ffrnn_forward(x: np.ndarray, W: np.ndarray, U: np.ndarray, b: np.ndarray,
                  reverse: bool = False) -> np.ndarray:
    """Sigmoid RNN: h_t = sigmoid(x_t W + h_{t-1} U + b)."""
    single = x.ndim == 2
    if single:
        x = x[None]
    if reverse:
        x = x[:, ::-1]
    B, T, _ = x.shape
    H = U.shape[0]
    h = np.zeros((B, H), dtype=x.dtype)
    out = np.empty((B, T, H), dtype=x.dtype)
    for t in range(T):
        h = sigmoid(x[:, t] @ W + h @ U + b)
        out[:, t] = h
    if reverse:
        out = out[:, ::-1]
    return out[0] if single else out


def conv_maxpool(
    x: np.ndarray,
    filters: dict[int, tuple[np.ndarray, np.ndarray]],
    lengths: np.ndarray | None = None,
) -> np.ndarray:
    """Multi-window CNN + tanh + global max-pool over time.

    x: (B, T, D).  ``filters``: window -> (W of shape (win*D, M), b of
    shape (M,)).  Output: (B, sum(M)) — concatenation over windows,
    reference ``convContext`` (``rnnReModels.py:478-489``).
    Implemented as im2col matmul (vectorized over batch and time).

    ``lengths`` (B,) masks padded window positions out of the max-pool
    so a row's output is independent of how much trailing padding its
    batch happens to carry (per-batch padding determinism; rows
    shorter than ``win`` use the single partially-padded window 0,
    whose content is also batch-independent).
    """
    B, T, D = x.shape
    outs = []
    for win, (W, b) in sorted(filters.items()):
        if T < win:
            pad = np.zeros((B, win - T, D), dtype=x.dtype)
            xw = np.concatenate([x, pad], axis=1)
            Tw = win
        else:
            xw, Tw = x, T
        n_pos = Tw - win + 1
        # im2col: (B, n_pos, win*D)
        cols = np.stack([xw[:, i : i + n_pos] for i in range(win)], axis=2)
        cols = cols.reshape(B, n_pos, win * D)
        conv = np.tanh(cols @ W + b)          # (B, n_pos, M)
        if lengths is not None:
            n_valid = np.maximum(1, np.minimum(lengths, Tw) - win + 1)
            mask = np.arange(n_pos)[None, :] < n_valid[:, None]
            conv = np.where(mask[:, :, None], conv, -np.inf)
        outs.append(conv.max(axis=1))          # global max-pool
    return np.concatenate(outs, axis=1)


def sigmoid_mlp(x: np.ndarray, layers: list[tuple[np.ndarray, np.ndarray]]) -> np.ndarray:
    for W, b in layers:
        x = sigmoid(x @ W + b)
    return x
