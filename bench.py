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
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from deepie_ray import pipeline
    from deepie_ray import queries as Q

    # warm the OS page cache (untimed) so we measure compute+shuffle
    pipeline.read_documents(sf_dir).count()
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
            parse_concurrency=(1, max(2, num_cpus - 2)),
            score_concurrency=(1, max(2, num_cpus // 2)),
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


def _run_scaling() -> None:
    lo, hi = 8, 32
    results = {}
    for n in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[n] = json.loads(out.strip().splitlines()[-1])
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (N vs 4N cpus)",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": t_lo,
                "sec_hi": t_hi,
                "thr_lo_triples_per_sec": results[lo]["triples_per_sec"],
                "thr_hi_triples_per_sec": results[hi]["triples_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "queries_lo": results[lo]["queries"],
                "queries_hi": results[hi]["queries"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _run_scaling()
    else:
        _run_bench()
