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


class CountingStage:
    """Wrap a batch fn with per-batch row counters that are emitted as
    lineage rows (north rule: every partition emits counters).  The
    counts ride along in Ray task results via a side accumulator
    column-free design: the wrapped fn appends nothing to the data;
    counters are written to the checkpoint store by the caller using
    ``pop_counts`` inside the same task (actor pools only)."""

    def __init__(self, fn, stage: str):
        self.fn = fn
        self.stage = stage
        self.rows_in = 0
        self.rows_out = 0
        self.batches = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.fn(batch)
        self.rows_in += len(batch)
        self.rows_out += len(out)
        self.batches += 1
        return out

    def counts(self) -> dict[str, int]:
        return {
            "stage": self.stage,
            "rows_in": self.rows_in,
            "rows_out": self.rows_out,
            "batches": self.batches,
        }
