"""TransE knowledge-graph embeddings over the deduplicated KG edge
table (Bordes et al. 2013, "Translating Embeddings for Modeling
Multi-relational Data"), trained data-parallel the same way
``deepie_ray/train.py`` trains the extraction classifier.

The reference (``rnnRE``) extracts relation triples but never embeds
the resulting graph; link prediction over the built KG is first-class
engine surface at this tier.  Scale design:

* **epoch = one ``map_batches`` pass** over the edge table; each block
  emits ONE binary npz partial (loss sum, triple count, touched
  entity/relation ids + their gradient rows).  Partials are
  model-sized — bounded by (distinct ids touched in the block) × dim —
  never corpus-sized, so the per-epoch exchange is blocks × model,
  like ``train.py:_grad_pass``.
* **weights cross the cluster once per epoch** (``ray.put`` in the
  driver step loop, ``ray.get`` once per task), not once per batch.
* **deterministic, partitioning-independent negatives**: the corrupted
  entity for (h, r, t, epoch) is a stable 64-bit hash of the triple
  ids and the epoch — reruns, repartitions and different block
  boundaries all see identical negative samples.  The float64 driver
  fold makes the summed gradient independent of block boundaries up
  to addition order (tested to 1e-9).
* **vocabulary is the distinct entity/relation set** (sorted -> rank,
  the M12 id convention, ``ops/dicts.py``) — bounded by distinct
  surfaces, not corpus size, exactly like the node dictionary the KG
  linker already holds on the driver.

The final tail-scoring scan for link prediction is a brute-force
distance over the entity matrix.  That matrix is the same
vocabulary-bounded object the driver already holds; for an
entity set too large for one machine the scan shape is identical to
``ops/ann.py:brute_force_topk`` (broadcast query rows, stream the
entity table, local top-k + grouped merge) and we reuse it above a
row threshold.
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

# distributed tail-scan threshold: below this the entity matrix is
# trivially driver-sized (it already lives there as the vocab)
_DRIVER_SCAN_MAX = 2_000_000


# --------------------------------------------------------------------
# deterministic hashing (splitmix64 — same mixer family as ops/dedup)
# --------------------------------------------------------------------


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _neg_entities(
    h: np.ndarray, r: np.ndarray, t: np.ndarray, epoch: int, n_ent: int
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic negative sampling (Bernoulli-free uniform variant
    of the paper's protocol): hash(h,r,t,epoch) picks BOTH which side
    to corrupt and the replacement entity.  Pure function of the triple
    ids — identical under any partitioning.  Returns (neg_h, neg_t)."""
    with np.errstate(over="ignore"):
        key = (
            h.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + r.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
            + t.astype(np.uint64) * np.uint64(0x165667B19E3779F9)
            + np.uint64(epoch + 1)
        )
    z = _mix64(key)
    corrupt_head = (z & np.uint64(1)).astype(bool)
    repl = (_mix64(z) % np.uint64(n_ent)).astype(np.int64)
    # avoid sampling the true entity (shift by 1 mod n on collision)
    true_side = np.where(corrupt_head, h, t)
    repl = np.where(repl == true_side, (repl + 1) % n_ent, repl)
    neg_h = np.where(corrupt_head, repl, h)
    neg_t = np.where(corrupt_head, t, repl)
    return neg_h, neg_t


# --------------------------------------------------------------------
# vocabulary
# --------------------------------------------------------------------


def edge_vocab(edges: rd.Dataset) -> tuple[list[str], list[str]]:
    """(sorted distinct entities, sorted distinct relations) from the
    edge table.  Per-batch distinct partials -> driver set union; the
    crossing rows are bounded by distinct surfaces per block."""

    def partial(t: pa.Table) -> pa.Table:
        ents = pc.unique(
            pa.concat_arrays(
                [
                    t["subj_entity"].combine_chunks().cast(pa.string()),
                    t["obj_entity"].combine_chunks().cast(pa.string()),
                ]
            )
        )
        rels = pc.unique(t["pred_label"].combine_chunks().cast(pa.string()))
        return pa.table(
            {
                "v": pa.concat_arrays([ents, rels]),
                "kind": pa.array(
                    ["e"] * len(ents) + ["r"] * len(rels), pa.string()
                ),
            }
        )

    parts = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:  # pandas of an empty ds drops columns
        return [], []
    ents = sorted(set(parts.loc[parts["kind"] == "e", "v"]))
    rels = sorted(set(parts.loc[parts["kind"] == "r", "v"]))
    return ents, rels


def _init_weights(n_ent: int, n_rel: int, dim: int, seed: int):
    """TransE init: uniform(-6/sqrt(dim), 6/sqrt(dim)), relations
    L2-normalized once, entities normalized every epoch (paper §3).
    Seeded rng over the sorted vocab -> deterministic."""
    rng = np.random.default_rng(seed)
    b = 6.0 / np.sqrt(dim)
    E = rng.uniform(-b, b, size=(n_ent, dim)).astype(np.float64)
    R = rng.uniform(-b, b, size=(n_rel, dim)).astype(np.float64)
    R /= np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-12)
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
    return E, R


# --------------------------------------------------------------------
# one epoch: map_batches grad partials -> driver fold -> SGD step
# --------------------------------------------------------------------


def _grad_transe(
    h: np.ndarray,
    r: np.ndarray,
    t: np.ndarray,
    E: np.ndarray,
    R: np.ndarray,
    epoch: int,
    margin: float,
) -> tuple[float, int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Margin-ranking subgradient for one block of triples under the
    L1 TransE score d(h,r,t) = ||E[h] + R[r] - E[t]||_1.  Returns
    (loss_sum, n, ent_ids, ent_rows, rel_ids, rel_rows) with ids
    deduplicated via np.add.at."""
    nh, nt = _neg_entities(h, r, t, epoch, len(E))
    d_pos_vec = E[h] + R[r] - E[t]
    d_neg_vec = E[nh] + R[r] - E[nt]
    d_pos = np.abs(d_pos_vec).sum(axis=1)
    d_neg = np.abs(d_neg_vec).sum(axis=1)
    viol = margin + d_pos - d_neg
    active = viol > 0.0
    loss_sum = float(viol[active].sum())
    if not active.any():
        z = np.zeros(0, np.int64)
        zr = np.zeros((0, E.shape[1]), np.float64)
        return loss_sum, len(h), z, zr, z, zr
    ha, ra, ta = h[active], r[active], t[active]
    nha, nta = nh[active], nt[active]
    gp = np.sign(d_pos_vec[active])  # d d_pos / d (E[h]+R[r]-E[t])
    gn = np.sign(d_neg_vec[active])
    # accumulate: +gp to h and r, -gp to t; -gn to nh and r, +gn to nt
    ids = np.concatenate([ha, ta, nha, nta])
    rows = np.concatenate([gp, -gp, -gn, gn], axis=0)
    u, inv = np.unique(ids, return_inverse=True)
    ent_rows = np.zeros((len(u), E.shape[1]), np.float64)
    np.add.at(ent_rows, inv, rows)
    ur, invr = np.unique(ra, return_inverse=True)
    rel_rows = np.zeros((len(ur), R.shape[1]), np.float64)
    np.add.at(rel_rows, invr, gp - gn)
    return loss_sum, len(h), u, ent_rows, ur, rel_rows


def _grad_distmult(
    h: np.ndarray,
    r: np.ndarray,
    t: np.ndarray,
    E: np.ndarray,
    R: np.ndarray,
    epoch: int,
    margin: float,
) -> tuple[float, int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Margin-ranking gradient under the DistMult bilinear-diagonal
    score s(h,r,t) = <E[h], R[r], E[t]> (Yang et al. 2015; higher is
    more plausible).  Loss = max(0, margin - s_pos + s_neg); same
    partial layout as the TransE twin."""
    nh, nt = _neg_entities(h, r, t, epoch, len(E))
    Eh, Rr, Et = E[h], R[r], E[t]
    Enh, Ent = E[nh], E[nt]
    s_pos = (Eh * Rr * Et).sum(axis=1)
    s_neg = (Enh * Rr * Ent).sum(axis=1)
    viol = margin - s_pos + s_neg
    active = viol > 0.0
    loss_sum = float(viol[active].sum())
    if not active.any():
        z = np.zeros(0, np.int64)
        zr = np.zeros((0, E.shape[1]), np.float64)
        return loss_sum, len(h), z, zr, z, zr
    ha, ra, ta = h[active], r[active], t[active]
    nha, nta = nh[active], nt[active]
    Eh, Rr, Et = Eh[active], Rr[active], Et[active]
    Enh, Ent = Enh[active], Ent[active]
    # d loss / d s_pos = -1, d loss / d s_neg = +1
    ids = np.concatenate([ha, ta, nha, nta])
    rows = np.concatenate(
        [-(Rr * Et), -(Eh * Rr), Rr * Ent, Enh * Rr], axis=0
    )
    u, inv = np.unique(ids, return_inverse=True)
    ent_rows = np.zeros((len(u), E.shape[1]), np.float64)
    np.add.at(ent_rows, inv, rows)
    ur, invr = np.unique(ra, return_inverse=True)
    rel_rows = np.zeros((len(ur), R.shape[1]), np.float64)
    np.add.at(rel_rows, invr, -(Eh * Et) + Enh * Ent)
    return loss_sum, len(h), u, ent_rows, ur, rel_rows


# scorer registry: name -> (grad_fn, higher_is_better).  The encoder-
# registry convention (ops/score.py) applied to KGE: one training
# harness, pluggable scoring geometry.
_KGE_MODELS = {
    "transe": (_grad_transe, False),
    "distmult": (_grad_distmult, True),
}


def _epoch_pass(
    ids_ds: rd.Dataset,
    weights_ref,
    epoch: int,
    margin: float,
    model: str = "transe",
) -> pd.DataFrame:
    """One epoch's gradient map over the integer-id edge table; each
    block -> one binary partial row (the train.py:_grad_pass shape)."""

    def grad_batch(t: pa.Table) -> pa.Table:
        grad_fn = _KGE_MODELS[model][0]
        w = ray.get(weights_ref)
        h = t["h"].to_numpy().astype(np.int64)
        r = t["r"].to_numpy().astype(np.int64)
        tt = t["t"].to_numpy().astype(np.int64)
        loss, n, eids, erows, rids, rrows = grad_fn(
            h, r, tt, w["E"], w["R"], epoch, margin
        )
        buf = io.BytesIO()
        np.savez(
            buf,
            loss=np.array([loss], np.float64),
            n=np.array([n], np.int64),
            eids=eids,
            erows=erows,
            rids=rids,
            rrows=rrows,
        )
        return pa.table({"payload": pa.array([buf.getvalue()], pa.binary())})

    return ids_ds.map_batches(
        grad_batch, batch_format="pyarrow", batch_size=None
    ).to_pandas()


def _fold_step(
    parts: pd.DataFrame, E: np.ndarray, R: np.ndarray, lr: float
) -> tuple[float, int]:
    """Sum per-block sparse partials in float64, apply one SGD step,
    re-normalize touched entity rows to unit L2 (the TransE
    constraint).  Returns (loss_sum, n_triples)."""
    loss_sum, n_total = 0.0, 0
    eids_all: list[np.ndarray] = []
    erows_all: list[np.ndarray] = []
    rids_all: list[np.ndarray] = []
    rrows_all: list[np.ndarray] = []
    for payload in parts["payload"]:
        z = np.load(io.BytesIO(payload))
        loss_sum += float(z["loss"][0])
        n_total += int(z["n"][0])
        eids_all.append(z["eids"])
        erows_all.append(z["erows"])
        rids_all.append(z["rids"])
        rrows_all.append(z["rrows"])

    def fold(ids_l, rows_l, W):
        ids = np.concatenate(ids_l) if ids_l else np.zeros(0, np.int64)
        rows = (
            np.concatenate(rows_l, axis=0)
            if rows_l
            else np.zeros((0, W.shape[1]), np.float64)
        )
        if len(ids) == 0:
            return ids
        u, inv = np.unique(ids, return_inverse=True)
        g = np.zeros((len(u), W.shape[1]), np.float64)
        np.add.at(g, inv, rows)
        W[u] -= lr * g
        return u

    touched = fold(eids_all, erows_all, E)
    fold(rids_all, rrows_all, R)
    if len(touched):
        norms = np.maximum(
            np.linalg.norm(E[touched], axis=1, keepdims=True), 1e-12
        )
        E[touched] /= norms
    return loss_sum, n_total


def train_kge(
    edges: rd.Dataset,
    model: str = "transe",
    dim: int = 32,
    epochs: int = 50,
    lr: float = 0.02,
    margin: float = 1.0,
    seed: int = 0,
    lr_decay: float = 0.98,
    warm_start: dict | None = None,
) -> dict:
    """Train a KG embedding model (``transe`` / ``distmult`` /
    ``complex`` / ``rotate``) over an edge table with columns
    (subj_entity, pred_label, obj_entity).  Returns
    {"model", "E", "R", "entities", "relations", "loss_history"}.

    ``warm_start``: a previously returned model dict — rows for
    entities/relations it already knows are copied in, only NEW vocab
    entries get fresh seeded init (the incremental-ingest story:
    re-embedding after a KG delta converges in a fraction of the
    cold-start epochs, pinned by test).  Scorer and width must match.

    Edge weights are intentionally ignored: the deduplicated KG edge
    table is a distinct-triple set and all protocols train on the
    triple set, one negative per positive per epoch."""
    if model not in _KGE_MODELS:
        raise ValueError(f"unknown KGE model {model!r}")
    if model in ("complex", "rotate") and dim % 2:
        raise ValueError(f"{model} scorer needs an even embedding width")
    if warm_start is not None and (
        warm_start.get("model", "transe") != model
        or (len(warm_start["E"]) and warm_start["E"].shape[1] != dim)
    ):
        raise ValueError("warm_start scorer/width mismatch")
    ents, rels = edge_vocab(edges)
    if not ents or not rels:
        d = dim
        return {
            "model": model,
            "E": np.zeros((0, d)),
            "R": np.zeros((0, d)),
            "entities": ents,
            "relations": rels,
            "loss_history": [],
        }
    E, R = _init_weights(len(ents), len(rels), dim, seed)
    if model == "rotate":
        # phases live in the first half; the second half is unused by
        # the scorer and gets zero gradient — zero it so the model dict
        # has no frozen noise
        R[:, dim // 2 :] = 0.0
    if warm_start is not None:
        for names, W, old_names, oldW in (
            (ents, E, warm_start["entities"], warm_start["E"]),
            (rels, R, warm_start["relations"], warm_start["R"]),
        ):
            old_idx = {n: i for i, n in enumerate(old_names)}
            for i, n in enumerate(names):  # vocabulary-bounded loop
                j = old_idx.get(n)
                if j is not None:
                    W[i] = oldW[j]
    ent_arr = pa.array(ents, pa.string())
    rel_arr = pa.array(rels, pa.string())

    def encode(t: pa.Table) -> pa.Table:
        # vectorized string->rank via Arrow index_in against the
        # broadcast sorted vocab (the kg_entity_neighborhood pattern)
        return pa.table(
            {
                "h": pc.index_in(
                    t["subj_entity"].cast(pa.string()), value_set=ent_arr
                ).cast(pa.int64()),
                "r": pc.index_in(
                    t["pred_label"].cast(pa.string()), value_set=rel_arr
                ).cast(pa.int64()),
                "t": pc.index_in(
                    t["obj_entity"].cast(pa.string()), value_set=ent_arr
                ).cast(pa.int64()),
            }
        )

    # encode once, materialize the narrow (3 × int64) id table so the
    # per-epoch pass re-reads ids, not strings
    ids_ds = edges.map_batches(encode, batch_format="pyarrow").materialize()

    hist: list[float] = []
    cur_lr = lr
    for epoch in range(epochs):
        ref = ray.put({"E": E, "R": R})
        parts = _epoch_pass(ids_ds, ref, epoch, margin, model)
        loss_sum, n = _fold_step(parts, E, R, cur_lr)
        hist.append(loss_sum / max(n, 1))
        cur_lr *= lr_decay
    return {
        "model": model,
        "E": E,
        "R": R,
        "entities": ents,
        "relations": rels,
        "loss_history": hist,
    }


def train_transe(edges: rd.Dataset, **kw) -> dict:
    """TransE convenience wrapper over :func:`train_kge`."""
    return train_kge(edges, model="transe", **kw)


# --------------------------------------------------------------------
# link prediction
# --------------------------------------------------------------------


def _rank_keys_vs(
    kind: str, Ecand: np.ndarray, h: np.ndarray, r: np.ndarray
) -> np.ndarray:
    """Ranking keys of an arbitrary candidate-tail matrix ``Ecand``
    against one (head vector, relation vector) query, LOWER = better.
    TransE: L1 distance ||h+r-t||.  DistMult: negated bilinear score
    -<h,r,t>.  ComplEx: -Re(<h,r,conj(t)>) over [real | imag] halves.
    RotatE: L1 distance ||rot(h, theta_r) - t||.  Factored out of the
    driver scan so the distributed block scan computes the SAME keys
    per entity block (round-4 verdict #3)."""
    if kind == "distmult":
        return -(Ecand @ (h * r))
    if kind == "rotate":
        d = Ecand.shape[1] // 2
        theta = r[:d]
        c, s = np.cos(theta), np.sin(theta)
        hr, hh = h[:d], h[d:]
        pr, pi2 = hr * c - hh * s, hr * s + hh * c
        return (
            np.abs(Ecand[:, :d] - pr).sum(axis=1)
            + np.abs(Ecand[:, d:] - pi2).sum(axis=1)
        )
    if kind == "complex":
        d = Ecand.shape[1] // 2
        hr, hh = h[:d], h[d:]
        rr, ri2 = r[:d], r[d:]
        a = hr * rr + hh * ri2  # coefficient of Re(t)
        b = hr * ri2 - hh * rr  # coefficient of Im(t)
        return -(Ecand[:, :d] @ a + Ecand[:, d:] @ b)
    return np.abs(Ecand - (h + r)).sum(axis=1)


def _tail_rank_keys(model: dict, hi: int, ri: int) -> np.ndarray:
    """Per-entity ranking key for tail prediction over the full entity
    matrix (driver scan path); see :func:`_rank_keys_vs`."""
    E, R = model["E"], model["R"]
    return _rank_keys_vs(model.get("model", "transe"), E, E[hi], R[ri])


_EMPTY_TAILS = pa.table(
    {
        "head": pa.array([], pa.string()),
        "rel": pa.array([], pa.string()),
        "rank": pa.array([], pa.int64()),
        "tail": pa.array([], pa.string()),
        "score": pa.array([], pa.float64()),
    }
)


def predict_tails_distributed(
    model: dict,
    queries: list[tuple[str, str]],
    k: int = 3,
    block_rows: int = 200_000,
) -> pa.Table:
    """Tail prediction as the ops/ann broadcast-queries/stream-corpus
    shape: the per-query (head vector, relation vector) pairs are the
    broadcast small side (``ray.put`` once); the entity matrix streams
    as blocks through ``map_batches``; each block emits its local top-k
    per query and the driver merges the query-bounded partials.

    Per-task work = block_rows x queries, never entities x queries on
    one machine; partial volume = queries x k x blocks rows.  Here the
    entity matrix is fed from the model dict (it is the vocabulary the
    driver holds at bench scale) — at true scale the same ``block_topk``
    maps over an entity-table Dataset instead.

    Matches the driver scan (pytest): same ranking keys
    (:func:`_rank_keys_vs`), same head-exclusion-by-inf rule, same
    (key, tail-string) lexicographic tie-break, same row order —
    ranks/tails exact, scores equal to ulp (BLAS block-shape
    summation order)."""
    kind = model.get("model", "transe")
    ents, rels = model["entities"], model["relations"]
    eidx = {e: i for i, e in enumerate(ents)}
    ridx = {r: i for i, r in enumerate(rels)}
    valid = [(h, r) for h, r in queries if h in eidx and r in ridx]
    if not valid or len(ents) == 0:
        return _EMPTY_TAILS
    n = len(ents)
    kk = min(k, n - 1 if n > 1 else n)
    H = np.stack([model["E"][eidx[h]] for h, _ in valid])
    Rv = np.stack([model["R"][ridx[r]] for _, r in valid])
    qref = ray.put((kind, [h for h, _ in valid], H, Rv, kk))

    E = np.ascontiguousarray(np.asarray(model["E"], dtype=np.float64))
    ent_arr = np.asarray(ents)
    dim = E.shape[1]

    def _block(lo: int) -> pa.Table:
        blk = E[lo : lo + block_rows]
        m = len(blk)
        # numpy -> Arrow list column without boxing a Python float per
        # cell (the driver holds >2M rows on exactly this path)
        off = np.arange(0, (m + 1) * dim, dim, dtype=np.int32)
        emb = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()), pa.array(blk.ravel(), pa.float64())
        )
        return pa.table(
            {"ent": pa.array(ent_arr[lo : lo + block_rows], pa.string()), "emb": emb}
        )

    blocks = [_block(lo) for lo in range(0, n, block_rows)]

    def block_topk(t: pa.Table) -> pa.Table:
        bkind, heads, bH, bR, bk = ray.get(qref)
        ents_blk = np.asarray(t["ent"].to_pylist())
        arr = t["emb"].combine_chunks()
        # offset-safe list decode (the score.py _list_column_to_numpy
        # convention): strip any slice offset before reshaping
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values.to_numpy(zero_copy_only=False)
        Eb = vals[offs[0] : offs[-1]].reshape(len(arr), -1)
        q_out, t_out, s_out = [], [], []
        for qi in range(len(heads)):
            d = _rank_keys_vs(bkind, Eb, bH[qi], bR[qi])
            d = np.where(ents_blk == heads[qi], np.inf, d)
            m = min(bk, len(d))
            order = np.lexsort((ents_blk, d))[:m]
            q_out.extend([qi] * m)
            t_out.extend(ents_blk[order])
            s_out.extend(d[order])
        return pa.table(
            {
                "q": pa.array(q_out, pa.int64()),
                "tail": pa.array(t_out, pa.string()),
                "score": pa.array(s_out, pa.float64()),
            }
        )

    partials = (
        rd.from_arrow(blocks)
        .map_batches(block_topk, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    by_q: dict[int, list[tuple[float, str]]] = {}
    for row in partials:
        by_q.setdefault(int(row["q"]), []).append((row["score"], row["tail"]))
    heads_o, rels_o, ranks, tails, scores = [], [], [], [], []
    for qi, (head, rel) in enumerate(valid):
        cand = sorted(by_q.get(qi, []))[:kk]
        for rank, (s, tail) in enumerate(cand, 1):
            heads_o.append(head)
            rels_o.append(rel)
            ranks.append(rank)
            tails.append(tail)
            scores.append(float(s))
    return pa.table(
        {
            "head": pa.array(heads_o, pa.string()),
            "rel": pa.array(rels_o, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "tail": pa.array(tails, pa.string()),
            "score": pa.array(scores, pa.float64()),
        }
    )


def predict_tails(
    model: dict, queries: list[tuple[str, str]], k: int = 3
) -> pa.Table:
    """Top-k tail entities per (head, relation) query by the model's
    ranking key (ascending; TransE L1 distance, DistMult negated
    bilinear score) -> (head, rel, rank, tail, score).

    The scan is over the entity matrix the driver already holds (it IS
    the vocabulary); above ``_DRIVER_SCAN_MAX`` rows the identical scan
    routes through :func:`predict_tails_distributed` — the ops/ann.py
    broadcast-queries/stream-corpus shape, pinned rank-identical to
    the driver scan by pytest."""
    E = model["E"]
    ents, rels = model["entities"], model["relations"]
    if len(E) > _DRIVER_SCAN_MAX:
        return predict_tails_distributed(model, queries, k)
    eidx = {e: i for i, e in enumerate(ents)}
    ridx = {r: i for i, r in enumerate(rels)}
    heads, rl, ranks, tails, scores = [], [], [], [], []
    for head, rel in queries:
        if head not in eidx or rel not in ridx:
            continue
        d = _tail_rank_keys(model, eidx[head], ridx[rel])
        d[eidx[head]] = np.inf  # a triple's tail is never its head
        kk = min(k, len(d) - 1 if len(d) > 1 else len(d))
        # deterministic ties: (distance, entity string) lexicographic
        order = np.lexsort((np.array(ents), d))[:kk]
        for rank, j in enumerate(order, 1):
            heads.append(head)
            rl.append(rel)
            ranks.append(rank)
            tails.append(ents[j])
            scores.append(float(d[j]))
    return pa.table(
        {
            "head": pa.array(heads, pa.string()),
            "rel": pa.array(rl, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "tail": pa.array(tails, pa.string()),
            "score": pa.array(scores, pa.float64()),
        }
    )


def mean_rank(model: dict, triples: list[tuple[str, str, str]]) -> float:
    """Mean rank of the true tail among all entities (lower is better;
    the TransE paper's raw metric).  Evaluation helper for
    tests/benchmarks; dispatches on the model's ranking key."""
    eidx = {e: i for i, e in enumerate(model["entities"])}
    ridx = {r: i for i, r in enumerate(model["relations"])}
    ranks = []
    for h, r, t in triples:
        if h not in eidx or r not in ridx or t not in eidx:
            continue
        d = _tail_rank_keys(model, eidx[h], ridx[r])
        ranks.append(1 + int((d < d[eidx[t]]).sum()))
    return float(np.mean(ranks)) if ranks else float("nan")


# --------------------------------------------------------------------
# held-out evaluation (filtered protocol)
# --------------------------------------------------------------------


def split_edges_holdout(
    edges: rd.Dataset, mod: int = 5, salt: str = "kge-holdout"
) -> tuple[rd.Dataset, rd.Dataset]:
    """Deterministic content-addressed train/test split of the edge
    table: a triple lands in TEST iff a stable hash of its
    (h, r, t) strings is 0 mod ``mod`` (~1/mod of edges) — pure
    function of the triple, partitioning-independent (the
    train_val_test_split convention applied to edges)."""
    from ..hashing import fingerprint64

    def tag(t: pa.Table) -> pa.Table:
        hs = np.fromiter(
            (
                fingerprint64(f"{salt}:{a}\x00{b}\x00{c}")
                for a, b, c in zip(
                    t["subj_entity"].to_pylist(),
                    t["pred_label"].to_pylist(),
                    t["obj_entity"].to_pylist(),
                )
            ),
            dtype=np.int64,
            count=t.num_rows,
        )
        return t.append_column(
            "_is_test", pa.array((hs % mod) == 0, pa.bool_())
        )

    tagged = edges.map_batches(tag, batch_format="pyarrow").materialize()

    def keep(want: bool):
        def f(t: pa.Table) -> pa.Table:
            out = t.filter(pc.equal(t["_is_test"], want))
            return out.drop_columns(["_is_test"])

        return f

    return (
        tagged.map_batches(keep(False), batch_format="pyarrow"),
        tagged.map_batches(keep(True), batch_format="pyarrow"),
    )


def evaluate_link_prediction(
    model: dict,
    all_triples: list[tuple[str, str, str]],
    test_triples: list[tuple[str, str, str]],
    max_eval: int = 2000,
) -> dict:
    """Filtered-protocol tail ranking (Bordes et al. 2013 §4): for each
    test triple, rank the true tail among all entities EXCLUDING other
    known-true tails of the same (head, relation).  Returns
    {"n_eval", "mean_rank", "mrr", "hits1", "hits3", "hits10"}.

    ``all_triples``/``test_triples`` are driver lists — the evaluation
    set is bounded by ``max_eval`` (sorted for determinism), the
    standard sampled-eval protocol at corpus scale."""
    eidx = {e: i for i, e in enumerate(model["entities"])}
    ridx = {r: i for i, r in enumerate(model["relations"])}
    known: dict[tuple[str, str], set[str]] = {}
    for h, r, t in all_triples:
        known.setdefault((h, r), set()).add(t)
    ranks: list[int] = []
    for h, r, t in sorted(test_triples)[:max_eval]:
        if h not in eidx or r not in ridx or t not in eidx:
            continue
        d = _tail_rank_keys(model, eidx[h], ridx[r])
        d_true = d[eidx[t]]
        mask = np.zeros(len(d), dtype=bool)
        for other in known.get((h, r), ()):  # filtered protocol
            if other != t and other in eidx:
                mask[eidx[other]] = True
        better = int(((d < d_true) & ~mask).sum())
        ranks.append(1 + better)
    if not ranks:
        return {
            "n_eval": 0,
            "mean_rank": float("nan"),
            "mrr": float("nan"),
            "hits1": float("nan"),
            "hits3": float("nan"),
            "hits10": float("nan"),
        }
    a = np.asarray(ranks, dtype=np.float64)
    return {
        "n_eval": len(ranks),
        "mean_rank": float(a.mean()),
        "mrr": float((1.0 / a).mean()),
        "hits1": float((a <= 1).mean()),
        "hits3": float((a <= 3).mean()),
        "hits10": float((a <= 10).mean()),
    }


def _grad_complex(
    h: np.ndarray,
    r: np.ndarray,
    t: np.ndarray,
    E: np.ndarray,
    R: np.ndarray,
    epoch: int,
    margin: float,
) -> tuple[float, int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Margin-ranking gradient under the ComplEx score (Trouillon et
    al. 2016) s(h,r,t) = Re(<E[h], R[r], conj(E[t])>), higher is more
    plausible.  Rows store complex vectors as [real | imag] halves of
    an even-width float matrix, so the partial layout and the fold are
    unchanged.  Unlike DistMult the score is ANTISYMMETRIC-capable
    (Im(R) breaks s(h,r,t)=s(t,r,h)) — the scorer that can fit
    directional relations like a successor ring."""
    d2 = E.shape[1]
    if d2 % 2:
        raise ValueError("complex scorer needs an even embedding width")
    d = d2 // 2
    nh, nt = _neg_entities(h, r, t, epoch, len(E))

    def parts(W, idx):
        return W[idx, :d], W[idx, d:]

    def score_and_grads(hh, tt2):
        hr, hi = parts(E, hh)
        rr, ri = parts(R, r)
        tr, ti = parts(E, tt2)
        s = (
            hr * rr * tr + hi * ri * tr + hr * ri * ti - hi * rr * ti
        ).sum(axis=1)
        g_h = np.concatenate(
            [rr * tr + ri * ti, ri * tr - rr * ti], axis=1
        )
        g_r = np.concatenate(
            [hr * tr - hi * ti, hi * tr + hr * ti], axis=1
        )
        g_t = np.concatenate(
            [hr * rr + hi * ri, hr * ri - hi * rr], axis=1
        )
        return s, g_h, g_r, g_t

    s_pos, gph, gpr, gpt = score_and_grads(h, t)
    s_neg, gnh, gnr, gnt = score_and_grads(nh, nt)
    viol = margin - s_pos + s_neg
    active = viol > 0.0
    loss_sum = float(viol[active].sum())
    if not active.any():
        z = np.zeros(0, np.int64)
        zr = np.zeros((0, d2), np.float64)
        return loss_sum, len(h), z, zr, z, zr
    ids = np.concatenate([h[active], t[active], nh[active], nt[active]])
    rows = np.concatenate(
        [-gph[active], -gpt[active], gnh[active], gnt[active]], axis=0
    )
    u, inv = np.unique(ids, return_inverse=True)
    ent_rows = np.zeros((len(u), d2), np.float64)
    np.add.at(ent_rows, inv, rows)
    ur, invr = np.unique(r[active], return_inverse=True)
    rel_rows = np.zeros((len(ur), d2), np.float64)
    np.add.at(rel_rows, invr, -gpr[active] + gnr[active])
    return loss_sum, len(h), u, ent_rows, ur, rel_rows


# registered below its definition (the dict above is created before
# this function exists at import time)
_KGE_MODELS["complex"] = (_grad_complex, True)


def _rotate_rotated(
    E: np.ndarray, idx: np.ndarray, cos: np.ndarray, sin: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Element-wise complex rotation of entity rows ``idx`` by the
    per-triple phase vectors (cos, sin): returns (real, imag) halves of
    rot(E[idx], theta)."""
    d = E.shape[1] // 2
    hr, hi = E[idx, :d], E[idx, d:]
    return hr * cos - hi * sin, hr * sin + hi * cos


def _grad_rotate(
    h: np.ndarray,
    r: np.ndarray,
    t: np.ndarray,
    E: np.ndarray,
    R: np.ndarray,
    epoch: int,
    margin: float,
) -> tuple[float, int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Margin-ranking subgradient under the RotatE score (Sun et al.
    2019, arXiv:1902.10197) d(h,r,t) = ||rot(E[h], theta_r) - E[t]||_1,
    lower is more plausible.  Entity rows are complex vectors stored as
    [real | imag] halves of an even-width matrix (the ComplEx layout);
    relation rows store the rotation PHASES theta in their FIRST half
    and keep the second half at zero — the paper's unit-modulus
    constraint is enforced structurally by the phase parameterization
    rather than by post-step projection, so the generic SGD fold
    applies unchanged (the phase gradient lands in the first half; the
    second half's gradient is identically zero, so its zeros persist).
    RotatE models symmetry, antisymmetry, inversion AND composition —
    the composition-capable member of the scorer registry (a successor
    ring is literally one rotation)."""
    d2 = E.shape[1]
    if d2 % 2:
        raise ValueError("rotate scorer needs an even embedding width")
    d = d2 // 2
    nh, nt = _neg_entities(h, r, t, epoch, len(E))
    theta = R[r, :d]
    cos, sin = np.cos(theta), np.sin(theta)

    pr, pi = _rotate_rotated(E, h, cos, sin)
    ur_p, ui_p = pr - E[t, :d], pi - E[t, d:]
    qr, qi = _rotate_rotated(E, nh, cos, sin)
    ur_n, ui_n = qr - E[nt, :d], qi - E[nt, d:]
    d_pos = np.abs(ur_p).sum(axis=1) + np.abs(ui_p).sum(axis=1)
    d_neg = np.abs(ur_n).sum(axis=1) + np.abs(ui_n).sum(axis=1)
    viol = margin + d_pos - d_neg
    active = viol > 0.0
    loss_sum = float(viol[active].sum())
    if not active.any():
        z = np.zeros(0, np.int64)
        zr = np.zeros((0, d2), np.float64)
        return loss_sum, len(h), z, zr, z, zr

    ca, sa = cos[active], sin[active]
    gr_p, gi_p = np.sign(ur_p[active]), np.sign(ui_p[active])
    gr_n, gi_n = np.sign(ur_n[active]), np.sign(ui_n[active])
    # d d / d E[h]: chain through the rotation (its transpose is the
    # inverse rotation); d d / d E[t] = -[g_r | g_i]
    gh_pos = np.concatenate(
        [gr_p * ca + gi_p * sa, -gr_p * sa + gi_p * ca], axis=1
    )
    gt_pos = -np.concatenate([gr_p, gi_p], axis=1)
    gh_neg = np.concatenate(
        [gr_n * ca + gi_n * sa, -gr_n * sa + gi_n * ca], axis=1
    )
    gt_neg = -np.concatenate([gr_n, gi_n], axis=1)

    ids = np.concatenate(
        [h[active], t[active], nh[active], nt[active]]
    )
    rows = np.concatenate([gh_pos, gt_pos, -gh_neg, -gt_neg], axis=0)
    u, inv = np.unique(ids, return_inverse=True)
    ent_rows = np.zeros((len(u), d2), np.float64)
    np.add.at(ent_rows, inv, rows)

    # d rot_r / d theta = -rot_i ; d rot_i / d theta = rot_r
    dth_pos = gr_p * (-pi[active]) + gi_p * pr[active]
    dth_neg = gr_n * (-qi[active]) + gi_n * qr[active]
    dth = np.concatenate(
        [dth_pos - dth_neg, np.zeros_like(dth_pos)], axis=1
    )
    ur2, invr = np.unique(r[active], return_inverse=True)
    rel_rows = np.zeros((len(ur2), d2), np.float64)
    np.add.at(rel_rows, invr, dth)
    return loss_sum, len(h), u, ent_rows, ur2, rel_rows


_KGE_MODELS["rotate"] = (_grad_rotate, False)
