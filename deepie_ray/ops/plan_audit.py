"""Logical-plan shuffle auditor: the scale-review checklist as code.

Every all-to-all exchange (groupby/sort/random_shuffle/
repartition(shuffle=True)/join) moves every block of its input across
the cluster — at 100 TB each one is the dominant cost, so the repo's
design rule is an explicit SHUFFLE BUDGET per pipeline (combiner-first
aggregation, broadcast small sides, one partitioning key reused).
This module makes the budget testable: ``audit(ds)`` walks the
dataset's logical plan BEFORE execution and counts exchanges, and
``assert_shuffle_budget`` turns a pipeline's declared budget into a
pytest invariant — a regression that sneaks a second shuffle into q1
fails the suite rather than shipping a 2x exchange.

Introspection is read-only over Ray Data's logical operator DAG
(``Dataset._logical_plan``): Sort / Aggregate / RandomShuffle /
RandomizeBlocks and shuffle-repartitions count as all-to-all; Join
counts separately (hash joins exchange BOTH sides); Repartition with
``shuffle=False`` is a block-count change (metadata move), not an
exchange, and is reported but not counted.

Known blind spot (documented, inherent): ``materialize()`` erases the
upstream plan — an audited dataset reports the ops SINCE the last
materialization.  Budget tests therefore audit the un-materialized
pipeline construction path.
"""

from __future__ import annotations

from typing import Any

import ray.data as rd

_ALL_TO_ALL = ("Sort", "Aggregate", "RandomShuffle", "RandomizeBlocks")


def _walk(op, out: list) -> None:
    out.append(op)
    for dep in op.input_dependencies:
        _walk(dep, out)


def audit(ds: rd.Dataset) -> dict[str, Any]:
    """-> {'shuffles', 'joins', 'reads', 'maps', 'repartitions_noshuffle',
    'ops'}: exchange census of the dataset's (lazy) logical plan."""
    ops: list = []
    _walk(ds._logical_plan.dag, ops)
    names = [type(o).__name__ for o in ops]
    shuffles = 0
    repart_noshuffle = 0
    joins = 0
    reads = 0
    maps = 0
    for o, n in zip(ops, names):
        if n in _ALL_TO_ALL:
            shuffles += 1
        elif n == "Repartition":
            if getattr(o, "_shuffle", False):
                shuffles += 1
            else:
                repart_noshuffle += 1
        elif n == "Join":
            joins += 1
        elif n == "Read":
            reads += 1
        elif n in ("MapBatches", "MapRows", "Filter", "FlatMap", "Project"):
            maps += 1
    return {
        "shuffles": shuffles,
        "joins": joins,
        "reads": reads,
        "maps": maps,
        "repartitions_noshuffle": repart_noshuffle,
        "ops": names,
    }


def assert_shuffle_budget(
    ds: rd.Dataset, max_shuffles: int, max_joins: int | None = None
) -> dict[str, Any]:
    """Raises AssertionError if the plan exceeds its declared exchange
    budget; returns the audit for reporting."""
    a = audit(ds)
    assert a["shuffles"] <= max_shuffles, (
        f"shuffle budget exceeded: plan has {a['shuffles']} all-to-all "
        f"exchanges (budget {max_shuffles}); ops={a['ops']}"
    )
    if max_joins is not None:
        assert a["joins"] <= max_joins, (
            f"join budget exceeded: plan has {a['joins']} joins "
            f"(budget {max_joins}); ops={a['ops']}"
        )
    return a
