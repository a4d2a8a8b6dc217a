"""Embedding-table readers (reference S2/S3).

* ``load_word2vec_bin`` — Mikolov binary format: ASCII header
  "<vocab> <dim>\\n", then per word: space-terminated token bytes +
  dim float32s (reference ``load_bin_vec``,
  ``rnn_process_onlyExtra.py:576-601``).
* ``load_text_vectors`` — glove-style text: "word v1 v2 ...", with a
  dimension consistency check (reference ``load_text_vec``,
  ``:603-627``).
* ``add_unknown_words`` — seeded uniform(-0.25, 0.25) init for OOV
  words (reference ``:629-636``).
* ``build_word_matrix`` — id map + matrix with row 0 pinned to zeros
  (the padding row, reference ``get_W`` ``:558-574``).

Driver-side one-shot loads (the table is a broadcast small side,
shipped via ``ray.put`` — SURVEY §2.1 S2 mapping); a ``vocab`` filter
keeps only corpus words, like the reference.
"""

from __future__ import annotations

import struct

import numpy as np


def load_word2vec_bin(path: str, vocab: set[str] | None = None) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        header = f.readline().decode("utf-8")
        n_words, dim = (int(x) for x in header.split())
        row_bytes = 4 * dim
        for _ in range(n_words):
            word_bytes = bytearray()
            while True:
                ch = f.read(1)
                if ch == b" ":
                    break
                if ch == b"":
                    raise ValueError("truncated word2vec binary file")
                if ch != b"\n":
                    word_bytes.extend(ch)
            word = word_bytes.decode("utf-8", errors="replace")
            vec = np.frombuffer(f.read(row_bytes), dtype=np.float32)
            if len(vec) != dim:
                raise ValueError("truncated vector payload")
            if vocab is None or word in vocab:
                out[word] = vec.copy()
    return out


def save_word2vec_bin(path: str, vectors: dict[str, np.ndarray]) -> None:
    """Writer twin (round-trip tests / fixture generation)."""
    dim = len(next(iter(vectors.values())))
    with open(path, "wb") as f:
        f.write(f"{len(vectors)} {dim}\n".encode())
        for w, v in vectors.items():
            f.write(w.encode("utf-8") + b" ")
            f.write(np.asarray(v, np.float32).tobytes())


def load_text_vectors(path: str, vocab: set[str] | None = None) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    dim = None
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split()
            if len(parts) < 2:
                continue
            if len(parts) == 2 and dim is None:
                continue  # optional "<n> <dim>" header
            word, vals = parts[0], parts[1:]
            if dim is None:
                dim = len(vals)
            elif len(vals) != dim:
                raise ValueError(
                    f"inconsistent dimension for {word!r}: {len(vals)} != {dim}"
                )
            if vocab is None or word in vocab:
                out[word] = np.asarray([float(v) for v in vals], np.float32)
    return out


def add_unknown_words(
    vectors: dict[str, np.ndarray],
    vocab: set[str],
    dim: int = 300,
    seed: int = 8989,
) -> None:
    """Seeded uniform(-0.25, 0.25) for OOV words, in deterministic
    (sorted) vocab order — the reference seeds numpy globally and
    relies on iteration order; sorting makes it partition-independent."""
    rng = np.random.default_rng(seed)
    for w in sorted(vocab):
        if w not in vectors:
            vectors[w] = rng.uniform(-0.25, 0.25, dim).astype(np.float32)


def build_word_matrix(
    vectors: dict[str, np.ndarray],
) -> tuple[np.ndarray, dict[str, int]]:
    """-> (matrix with zero row 0, word->id map); ids are 1..N in
    sorted word order (deterministic replacement for encounter order)."""
    words = sorted(vectors)
    dim = len(vectors[words[0]]) if words else 0
    W = np.zeros((len(words) + 1, dim), dtype=np.float32)
    idx = {}
    for i, w in enumerate(words, start=1):
        W[i] = vectors[w]
        idx[w] = i
    return W, idx
