"""Per-query wall-time sweep over the full registry — the ranking
loop behind per-round performance triage (run at sf0.1; the slowest
entries are the next optimization targets).  No oracle comparison —
use scripts/check_correctness.py for that.

    PYTHONPATH=/root/repo python scripts/time_queries.py [sf_dir] [names...]

Prints one line per query (seconds, row count) and a sorted summary
of the slowest 20.  Row-count note: pandas DataFrames report len()
(DataFrame.count() is per-column).  First found a real bug on its
first full run: copurchase_link_scores crashed on empty aggregate
partitions that only appear at sf0.1 (fixed in ops/graph.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    times: list[tuple[float, str, int | str]] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            out = fn(sf_dir)
            if isinstance(out, rd.Dataset):
                n: int | str = out.count()
            elif isinstance(out, (pd.DataFrame, pa.Table)):
                n = len(out)
            else:
                n = len(out)
            dt = time.perf_counter() - t0
            times.append((dt, name, n))
            print(f"{dt:8.2f}s {n!s:>10} {name}", flush=True)
        except Exception as e:  # keep sweeping; report at the end
            dt = time.perf_counter() - t0
            times.append((dt, name, f"ERR {type(e).__name__}"))
            print(f"{dt:8.2f}s ERR {name}: {type(e).__name__}: {e}", flush=True)

    errs = [t for t in times if isinstance(t[2], str) and str(t[2]).startswith("ERR")]
    print(f"\n# {len(times)} queries, {len(errs)} errors; slowest 20:")
    for dt, name, n in sorted(times, reverse=True)[:20]:
        print(f"{dt:8.2f}s {n!s:>10} {name}")
    ray.shutdown()
    sys.exit(1 if errs else 0)


if __name__ == "__main__":
    main()
