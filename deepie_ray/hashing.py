"""Stable, process-independent hashing used everywhere ids must be
deterministic across workers, runs and machines.

The reference builds string->int dictionaries by first-encounter order
(``rnn_process_onlyExtra.py:99-205``) — unreproducible under
parallelism (SURVEY.md §7.6).  This engine replaces encounter-order ids
with (a) content hashing (the hashing trick) for unbounded feature
spaces and (b) sorted-distinct rank assignment (ops/dicts.py) for small
dictionaries.  Both are order-independent, so any partitioning of the
corpus yields identical ids.

Python's builtin ``hash`` is salted per process (PYTHONHASHSEED) and
MUST NOT be used for data ids; we use crc32 (fast, stable) for bucketed
ids and blake2b for fingerprints.
"""

from __future__ import annotations

import hashlib
import re
from zlib import crc32

import numpy as np

# RE2's \s is exactly [\t\n\f\r ] (ASCII, no VT, no Unicode spaces) in
# both pyarrow and DuckDB — verified empirically.  Oracle-checked n-gram
# operators must tokenize with THIS class, not str.split(), whose
# Unicode whitespace rule (NBSP, VT, ...) silently diverges from the
# regexp_split_to_array('\s+') the SQL oracles use.
_RE2_WS = re.compile(r"[\t\n\f\r ]+")


def ws_tokens(text: str) -> list[str]:
    """Whitespace tokens under RE2 ``\\s`` semantics (oracle-exact)."""
    return [t for t in _RE2_WS.split(text) if t]


def stable_u32(s: str, salt: str = "") -> int:
    """crc32 of salt+s as an unsigned 32-bit int. Stable across runs."""
    return crc32((salt + s).encode("utf-8")) & 0xFFFFFFFF


def stable_bucket(s: str, n_buckets: int, salt: str = "") -> int:
    return stable_u32(s, salt) % n_buckets


def fingerprint64(s: str) -> int:
    """64-bit content fingerprint (blake2b), signed-int64 range."""
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little", signed=True)


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


class MemoHasher:
    """Memoized string->bucket hasher for hot per-token loops.

    Vocabularies in text corpora are heavy-tailed: a plain dict cache
    turns the per-feature crc32 into a dict lookup after warmup.  One
    instance per actor (built in ``__init__``), never shared.
    """

    __slots__ = ("n_buckets", "salt", "_cache")

    def __init__(self, n_buckets: int, salt: str = ""):
        self.n_buckets = n_buckets
        self.salt = salt
        self._cache: dict[str, int] = {}

    def __call__(self, s: str) -> int:
        v = self._cache.get(s)
        if v is None:
            v = stable_u32(s, self.salt) % self.n_buckets
            if len(self._cache) < 4_000_000:  # bound memory on adversarial input
                self._cache[s] = v
        return v


def hash_tokens_u64(tokens: list[str], salt: str = "") -> np.ndarray:
    """Vectorizable helper: crc32 per token -> uint64 array."""
    return np.fromiter(
        (crc32((salt + t).encode("utf-8")) & 0xFFFFFFFF for t in tokens),
        dtype=np.uint64,
        count=len(tokens),
    )
