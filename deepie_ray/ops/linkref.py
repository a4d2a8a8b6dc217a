"""Alias knowledge base + link scoring (pure functions, no Ray).

The graft has no external KB (no network, FIXTURES.md F3 is synthetic),
so the alias dictionary is a deterministic function of the surface
form — the *table* is still materialized and broadcast (ops/link.py)
because that is the pattern under test (J4: broadcast alias dict +
embedding scoring); these functions define its contents.

Skew knob (FIXTURES.md F3): surfaces with ``crc32 % 7 == 0`` also
alias the single hot entity ``E000000`` — at corpus scale a large
fraction of all mentions collapse onto one canonical entity, which is
what the salted groupby in canonicalization/dedup exists for.
"""

from __future__ import annotations

import numpy as np

from ..features import entity_type_of
from ..hashing import stable_u32

N_ENTITIES = 5000
HOT_ENTITY = "E000000"
EMB_DIM = 16


def entity_embedding(entity_id: str) -> np.ndarray:
    """Seeded unit vector per entity (ANN scoring side, F4)."""
    rng = np.random.default_rng(stable_u32(entity_id, "ev:"))
    v = rng.standard_normal(EMB_DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def surface_embedding(surface: str) -> np.ndarray:
    """Seeded unit context vector per surface form."""
    rng = np.random.default_rng(stable_u32(surface, "sv:"))
    v = rng.standard_normal(EMB_DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def alias_candidates(surface: str) -> list[tuple[str, str, float]]:
    """-> [(entity_id, entity_type, prior)], primary candidate first.

    Primary entity = hash bucket of the surface; hot surfaces get the
    shared hot entity as a second candidate.
    """
    etype = entity_type_of(surface) or "Other"
    primary = "E%06d" % (1 + stable_u32(surface, "ent:") % (N_ENTITIES - 1))
    prior = 0.6 + 0.4 * ((stable_u32(surface, "prior:") % 1000) / 1000.0)
    cands = [(primary, etype, round(prior, 6))]
    if stable_u32(surface, "hot:") % 7 == 0:
        cands.append((HOT_ENTITY, etype, 0.5))
    return cands


def best_link(surface: str) -> tuple[str, str, float]:
    """argmax over candidates of prior * (0.5 + 0.5 * cosine(ctx, ent)).

    Pure function of the surface -> precomputable at alias-table build
    time; the per-mention "join" is then a broadcast dict lookup.
    Ties broken by entity_id (deterministic).
    """
    ctx = surface_embedding(surface)
    best = None
    for ent, etype, prior in alias_candidates(surface):
        cos = float(np.dot(ctx, entity_embedding(ent)))
        score = prior * (0.5 + 0.5 * cos)
        key = (round(score, 6), ent)
        if best is None or key > best[0]:
            best = (key, (ent, etype, round(score, 6)))
    return best[1]


def component_edges(surfaces: list[str]) -> list[tuple[str, str]]:
    """Equivalence edges for canonicalization: all candidate entities of
    one alias surface are the same real-world entity."""
    edges = []
    for s in surfaces:
        cands = alias_candidates(s)
        for i in range(1, len(cands)):
            edges.append((cands[0][0], cands[i][0]))
    return edges
