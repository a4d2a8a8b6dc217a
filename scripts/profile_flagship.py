"""Per-stage profile of the flagship KG pipeline via Dataset.stats().

Usage:
    PYTHONPATH=/root/repo python scripts/profile_flagship.py [sf_dir]

Prints the Ray Data stage breakdown (wall time, blocks, rows/s) for the
triples dataset — the evidence loop behind per-stage tuning decisions
(pool sizing, batch sizes, fusion choices in deepie_ray/tuning.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from deepie_ray import pipeline

    t0 = time.perf_counter()
    out = pipeline.run_kg(sf_dir)
    triples = out["triples"].materialize()
    wall = time.perf_counter() - t0
    n = triples.count()
    print(f"# flagship {sf_dir}: {n} triples in {wall:.2f}s "
          f"({n / wall:.0f} triples/s)")
    print(triples.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
