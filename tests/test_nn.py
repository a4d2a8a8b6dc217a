"""nn.py cells vs hand-computed values (SURVEY §5: unit tests per
operator, GRU/CNN cells vs hand-computed)."""

import numpy as np

from deepie_ray import nn


def test_sigmoid_softmax():
    assert np.isclose(nn.sigmoid(np.array(0.0)), 0.5)
    p = nn.softmax(np.array([[0.0, 0.0], [1.0, 1.0]]))
    assert np.allclose(p, 0.5)
    p2 = nn.softmax(np.array([1000.0, 1000.0]))  # stability
    assert np.allclose(p2, 0.5)


def test_gru_step_hand_computed():
    # 1-d everything, weights chosen so gates are analytic
    h = np.array([[0.0]])
    x = np.array([[1.0]])
    one = np.array([[1.0]])
    zero_b = np.array([0.0])
    # z = sigmoid(1) ; r = sigmoid(1) ; c = tanh(1 + r*0) = tanh(1)
    out = nn.gru_step(h, x, one, one, zero_b, one, one, zero_b, one, one, zero_b)
    z = 1 / (1 + np.exp(-1))
    expected = z * np.tanh(1.0)
    assert np.allclose(out, expected)


def test_gru_forward_reverse_is_mirror():
    rng = np.random.default_rng(0)
    D, H, T = 3, 4, 5
    params = {
        f"{w}{g}": rng.standard_normal((D if w == "W" else H, H)).astype(np.float64)
        for w in "WU"
        for g in "zrh"
    }
    params.update({f"b{g}": np.zeros(H) for g in "zrh"})
    x = rng.standard_normal((T, D))
    fwd_on_flipped = nn.gru_forward(x[::-1].copy(), params)
    bwd = nn.gru_forward(x, params, reverse=True)
    assert np.allclose(bwd, fwd_on_flipped[::-1])


def test_ffrnn_hand_computed():
    # h1 = sig(x1), h2 = sig(x2 + h1) with identity weights
    x = np.array([[0.0], [1.0]])
    W = np.array([[1.0]])
    U = np.array([[1.0]])
    b = np.array([0.0])
    out = nn.ffrnn_forward(x, W, U, b)
    h1 = 1 / (1 + np.exp(0.0))
    h2 = 1 / (1 + np.exp(-(1.0 + h1)))
    assert np.allclose(out.ravel(), [h1, h2])


def test_conv_maxpool_hand_computed():
    # window 2, 1 map, weights = sum of window -> tanh -> max over positions
    x = np.array([[[1.0], [2.0], [3.0]]])  # (B=1, T=3, D=1)
    W = np.array([[1.0], [1.0]])  # (win*D, M)
    b = np.array([0.0])
    out = nn.conv_maxpool(x, {2: (W, b)})
    assert np.allclose(out, np.tanh(5.0))  # max(tanh(3), tanh(5))


def test_conv_maxpool_short_sequence_padded():
    x = np.ones((1, 1, 2))
    W = np.zeros((3 * 2, 1))
    out = nn.conv_maxpool(x, {3: (W, np.array([0.5]))})
    assert np.allclose(out, np.tanh(0.5))


def test_mlp():
    x = np.array([[1.0, -1.0]])
    W = np.eye(2)
    b = np.zeros(2)
    out = nn.sigmoid_mlp(x, [(W, b)])
    assert np.allclose(out, nn.sigmoid(x))
