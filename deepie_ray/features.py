"""Mention detection + mention-pair featurization.

Semantics modeled on the reference's per-line record assembly
(``rnn_process_onlyExtra.py:283-463``): a sentence with two marked
entity mentions yields one candidate record whose head words are the
mention positions (``data/readMe.md:31`` — head = last token of the
mention) and whose model inputs are sparse binary features in the style
of field 4 (``data/readMe.md`` field 4: HM1/HM2/EnType12/WBO/BIGRAM/
NUMWB features) plus the two head-word embeddings (MultiNN's extra
head-word term, ``rnnReModels.py:772-833``).

The reference consumes pre-annotated mentions (``word/B-PER.NAM#1``
markup).  The graft input is plain interleaved text spans, so mention
detection is a stage of its own; the north-star slot for a CNN/BiLSTM-
CRF tagger is filled by a deterministic lexicon tagger (no torch in
this environment — SURVEY.md §7.6.5) behind the same interface: the
scorer actor only sees ``(tokens, pos1, pos2, types)``.

Everything here is a pure function of its inputs (content hashing, no
per-process state), so any partitioning of the corpus over any number
of workers yields identical features — the property the reference's
encounter-order dictionaries lack (SURVEY.md §7.6.1).
"""

from __future__ import annotations

from .hashing import stable_u32

# ---------------------------------------------------------------- lexicon

ENTITY_TYPES = ("PER", "ORG", "GPE", "LOC", "FAC", "VEH", "WEA")
# fraction of vocabulary treated as entity surfaces (deterministic by hash)
_ENTITY_MOD = 10
_ENTITY_KEEP = 4

FEAT_BUCKETS = 1 << 18   # hashed binary-feature space (replaces A5 dict+cutoff)
WORD_BUCKETS = 1 << 16   # hashed head-word vocabulary (replaces word dict, J1)

MAX_PAIR_DIST = 10       # reference maximumDistance is a no-op (1e8); the graft bounds pair fan-out
MAX_PAIRS_PER_SENT = 20


_etype_cache: dict[str, str | None] = {}


def entity_type_of(word: str) -> str | None:
    """Deterministic lexicon: ~40% of surface forms are entities; the
    type is a stable function of the surface.  Memoized (vocabulary-
    sized cache) — this runs once per token in the hot parse loop."""
    try:
        return _etype_cache[word]
    except KeyError:
        h = stable_u32(word, "lex:")
        t = None if h % _ENTITY_MOD >= _ENTITY_KEEP else ENTITY_TYPES[h % len(ENTITY_TYPES)]
        if len(_etype_cache) < 4_000_000:
            _etype_cache[word] = t
        return t


def sentence_mentions(tokens: list[str]) -> list[tuple[int, str, str]]:
    """-> [(token_index, surface, entity_type)], in token order."""
    out = []
    for i, w in enumerate(tokens):
        t = entity_type_of(w)
        if t is not None:
            out.append((i, w, t))
    return out


def mention_pairs(
    mentions: list[tuple[int, str, str]],
    max_dist: int = MAX_PAIR_DIST,
    cap: int = MAX_PAIRS_PER_SENT,
) -> list[tuple[tuple[int, str, str], tuple[int, str, str]]]:
    """All ordered-by-position mention pairs within ``max_dist`` tokens,
    capped per sentence (distance filter M8 made real; cap bounds the
    quadratic fan-out on mention-dense sentences)."""
    pairs = []
    n = len(mentions)
    for a in range(n):
        for b in range(a + 1, n):
            if mentions[b][0] - mentions[a][0] > max_dist:
                break
            pairs.append((mentions[a], mentions[b]))
            if len(pairs) >= cap:
                return pairs
    return pairs


# ------------------------------------------------------------- featurizer
#
# Features are the reference's field-4 binary-feature families
# (HM1/HM2/HM12, EnType, WBF/WBL/WBO, BIGRAM, NUMWB — ``data/readMe.md``
# field 4), realized directly as hashed ids: each family has a salt
# constant and the feature id is a stable integer mix of the salt with
# the (memoized) token hashes.  Equivalent to hashing the feature
# *string* but with zero string building in the hot loop — the per-pair
# cost is integer arithmetic over cached token hashes.

_MASK32 = 0xFFFFFFFF
# per-family salt constants (arbitrary fixed values, part of the schema)
F_HM1, F_HM2, F_HM12 = 0x1000001, 0x1000002, 0x1000003
F_ET1, F_ET2, F_ET12 = 0x1000004, 0x1000005, 0x1000006
F_NUMWB, F_WBF, F_WBL, F_WBO, F_BIGRAM = (
    0x1000007, 0x1000008, 0x1000009, 0x100000A, 0x100000B,
)

_token_hash_cache: dict[str, int] = {}


def token_hash(w: str) -> int:
    """Memoized crc32 of a token (module-level cache: vocabulary-sized,
    shared across batches within a worker process)."""
    h = _token_hash_cache.get(w)
    if h is None:
        h = stable_u32(w, "tok:")
        if len(_token_hash_cache) < 4_000_000:
            _token_hash_cache[w] = h
    return h


def _mix(salt: int, a: int, b: int = 0) -> int:
    """Stable 32-bit mix of (salt, a, b) -> feature bucket id."""
    h = (salt * 1000003) & _MASK32
    h = ((h ^ a) * 1000003) & _MASK32
    if b:
        h = ((h ^ b) * 1000003) & _MASK32
    return h % FEAT_BUCKETS


_TYPE_HASH = {t: stable_u32(t, "ty:") for t in ENTITY_TYPES}


def pair_feature_ids(
    tokens: list[str],
    hashes: list[int],
    pos1: int,
    pos2: int,
    t1: str,
    t2: str,
) -> list[int]:
    """Hashed sparse binary features for one mention pair (set
    semantics: deduplicated, sorted — the model input is the feature
    SET, like the reference's feature-dict lookup)."""
    h1, h2 = hashes[pos1], hashes[pos2]
    ty1, ty2 = _TYPE_HASH[t1], _TYPE_HASH[t2]
    n_between = pos2 - pos1 - 1
    feats = {
        _mix(F_HM1, h1),
        _mix(F_HM2, h2),
        _mix(F_HM12, h1, h2),
        _mix(F_ET1, ty1),
        _mix(F_ET2, ty2),
        _mix(F_ET12, ty1, ty2),
        _mix(F_NUMWB, min(n_between, 8) + 1),
    }
    if n_between > 0:
        feats.add(_mix(F_WBF, hashes[pos1 + 1]))
        feats.add(_mix(F_WBL, hashes[pos2 - 1]))
        for i in range(pos1 + 2, pos2 - 1):
            feats.add(_mix(F_WBO, hashes[i]))
    prev = h1
    for i in range(pos1 + 1, pos2 + 1):
        h = hashes[i]
        feats.add(_mix(F_BIGRAM, prev, h))
        prev = h
    return sorted(feats)


def hash_head(word: str) -> int:
    return token_hash(word) % WORD_BUCKETS
