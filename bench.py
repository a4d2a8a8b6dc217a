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

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # headline: flagship KG extraction (triples/sec is the BASELINE metric)
    docs = pipeline.read_documents(sf_dir)
    triples = timed(
        "kg_extract",
        lambda: pipeline.emitted_triples(
            docs,
            score_concurrency=(1, max(2, min(8, num_cpus // 2))),
        ).materialize(),
    )
    n_triples = triples.count()
    triples_per_sec = round(n_triples / timings["kg_extract"], 1)

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


def _hw_work(n):
    import zlib

    s = 0
    for i in range(n):
        s += zlib.crc32(("w%d f=%d" % (i, i)).encode())
    return s


def _hw_ceiling(lo: int, hi: int) -> float:
    """Hardware control: the SAME fixed per-process Python workload on
    lo vs hi plain multiprocessing workers.  On this box per-core speed
    drops as cores engage (turbo / memory bandwidth), so even a perfect
    distributed system cannot exceed this ratio; report it so the
    distributed efficiency can be read against the machine's ceiling."""
    import multiprocessing as mp

    def run(nproc, per=1_500_000):
        with mp.Pool(nproc) as p:
            t0 = time.monotonic()
            p.map(_hw_work, [per] * nproc)
            return time.monotonic() - t0

    t_lo = min(run(lo), run(lo))
    t_hi = min(run(hi), run(hi))
    return t_lo / t_hi  # 1.0 = no frequency/bandwidth penalty


def _run_scaling() -> None:
    """Same job at two parallelism levels in fresh processes (sandbox
    stand-in for N- vs 4N-node clusters; BASELINE.md).  Best-of-2 per
    level (machine-noise guard) + hardware-ceiling control."""
    lo, hi = 8, 32
    results = {}
    for n in (lo, hi):
        best = None
        for _ in range(2):
            env = dict(
                os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_BENCH_MODE="scaling_work"
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
        results[n] = best
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    hw = _hw_ceiling(lo, hi)  # perfect-scaling wall-ratio ceiling on this box
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (N vs 4N cpus, flagship extraction)",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": t_lo,
                "sec_hi": t_hi,
                "thr_lo_triples_per_sec": results[lo]["triples_per_sec"],
                "thr_hi_triples_per_sec": results[hi]["triples_per_sec"],
                "n_triples": results[hi]["n_triples"],
                "scaling_efficiency": round(eff, 3),
                "hw_ceiling_efficiency": round(hw, 3),
                "efficiency_vs_hw_ceiling": round(eff / hw, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _run_scaling()
    elif os.environ.get("GRAFT_BENCH_MODE") == "scaling_work":
        _run_scaling_work()
    else:
        _run_bench()
