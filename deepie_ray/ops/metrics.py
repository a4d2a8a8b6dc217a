"""Evaluation + lineage metrics (reference A6 / §4 counters).

``micro_prf_distributed`` reproduces the reference ``score()``
semantics (``rnnRE.py:564-581``) as a streaming aggregate: label 0 /
"NONE" counts as no-prediction; numPred = #rows predicted non-NONE,
numKey = #rows with non-NONE gold, correct = matches among predicted.
Per-batch partial counts -> one global sum — no materialization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum


def micro_prf_distributed(
    ds: rd.Dataset, pred_col: str = "pred_label", gold_col: str = "gold_label",
    none_label: str = "NONE",
) -> dict[str, float]:
    def partial(t: pa.Table) -> pa.Table:
        pred = t[pred_col]
        gold = t[gold_col]
        p = pc.not_equal(pred, none_label)
        k = pc.not_equal(gold, none_label)
        c = pc.and_(p, pc.equal(pred, gold))
        return pa.table(
            {
                "num_pred": [pc.sum(pc.cast(p, pa.int64())).as_py() or 0],
                "num_key": [pc.sum(pc.cast(k, pa.int64())).as_py() or 0],
                "correct": [pc.sum(pc.cast(c, pa.int64())).as_py() or 0],
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("num_pred", alias_name="num_pred"),
        Sum("num_key", alias_name="num_key"),
        Sum("correct", alias_name="correct"),
    )
    num_pred = agg["num_pred"] or 0
    num_key = agg["num_key"] or 0
    correct = agg["correct"] or 0
    prec = correct / num_pred if num_pred else 0.0
    rec = correct / num_key if num_key else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {
        "precision": prec,
        "recall": rec,
        "f1": f1,
        "num_pred": num_pred,
        "num_key": num_key,
        "correct": correct,
    }


import ray


@ray.remote(num_cpus=0)
class CounterActor:
    """Cluster-wide counter sink (north rule: per-partition counters to
    a checkpoint store).  Stages flush per-batch deltas fire-and-forget;
    the pipeline reads totals after each stage's stream is consumed."""

    def __init__(self):
        self.stages: dict[str, dict[str, int]] = {}

    def add(self, stage: str, rows_in: int, rows_out: int, batches: int = 1) -> None:
        s = self.stages.setdefault(
            stage, {"rows_in": 0, "rows_out": 0, "batches": 0}
        )
        s["rows_in"] += rows_in
        s["rows_out"] += rows_out
        s["batches"] += batches

    def get(self) -> dict[str, dict[str, int]]:
        return {k: dict(v) for k, v in self.stages.items()}


def read_counters(counter) -> dict[str, dict[str, int]]:
    """Settled read of a ``CounterActor``: the caller has drained the
    stream, but a last fire-and-forget delta may still be in the actor's
    mailbox — poll until two consecutive reads agree."""
    import time

    import ray

    counts = ray.get(counter.get.remote())
    for _ in range(20):
        time.sleep(0.05)
        again = ray.get(counter.get.remote())
        if again == counts:
            break
        counts = again
    return counts


class CountingStage:
    """map_batches callable wrapping another callable class with REAL
    per-batch row counters, flushed to a ``CounterActor`` (one tiny
    fire-and-forget RPC per batch — negligible against batch compute).
    Used by the flagship pipeline when checkpointing, so lineage rows
    carry truthful rows_in / counters instead of placeholders.

    Semantics: AT-LEAST-ONCE.  If a task is retried after a worker
    failure (or a non-pinned block is recomputed), its batches count
    again — the counters are a lineage diagnostic, not an exactness
    contract; the checkpoint's parquet row counts are the ground truth
    (and a counters-vs-rows_out mismatch is itself the signal that
    retries happened)."""

    def __init__(self, inner_cls, stage: str, counter, inner_kwargs: dict | None = None):
        self.inner = inner_cls(**(inner_kwargs or {}))
        self.stage = stage
        self.counter = counter

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.inner(batch)
        self.counter.add.remote(self.stage, len(batch), len(out), 1)
        return out
