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


def entity_type_of(word: str) -> str | None:
    """Deterministic lexicon: ~40% of surface forms are entities; the
    type is a stable function of the surface."""
    h = stable_u32(word, "lex:")
    if h % _ENTITY_MOD >= _ENTITY_KEEP:
        return None
    return ENTITY_TYPES[h % len(ENTITY_TYPES)]


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

def pair_feature_strings(
    tokens: list[str], pos1: int, pos2: int, t1: str, t2: str
) -> list[str]:
    """Sparse binary features for one mention pair, field-4 style
    (HM*/EnType/WBO/BIGRAM/NUMWB families, ``data/readMe.md`` field 4).
    Deduplicated and order-normalized (sorted) so the feature *set* is
    the model input, like the reference's feature dict lookup."""
    w1, w2 = tokens[pos1], tokens[pos2]
    between = tokens[pos1 + 1 : pos2]
    feats = {
        "HM1=" + w1,
        "HM2=" + w2,
        "HM12=" + w1 + "--" + w2,
        "ET12=" + t1 + "--" + t2,
        "ET1=" + t1,
        "ET2=" + t2,
        "NUMWB=" + str(min(len(between), 8)),
    }
    if between:
        feats.add("WBF=" + between[0])
        feats.add("WBL=" + between[-1])
        for w in between[1:-1]:
            feats.add("WBO=" + w)
    prev = w1
    for w in between + [w2]:
        feats.add("BIGRAM_" + prev + "," + w)
        prev = w
    return sorted(feats)


def hash_features(feat_strings: list[str], hasher=None) -> list[int]:
    """Feature string -> bucket id (hashing trick).  ``hasher`` may be a
    MemoHasher instance for hot loops; falls back to direct crc32."""
    if hasher is not None:
        return [hasher(f) for f in feat_strings]
    return [stable_u32(f, "feat:") % FEAT_BUCKETS for f in feat_strings]


def hash_head(word: str) -> int:
    return stable_u32(word, "word:") % WORD_BUCKETS
