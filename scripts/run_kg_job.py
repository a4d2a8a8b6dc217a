"""Cluster-job entrypoint for the flagship KG pipeline (north rule:
"run via ray job submit on a fixed-size multi-node Ray cluster").

Local / single-node:

    python scripts/run_kg_job.py --input /root/testdata/sf0.01 \
        --output /tmp/kg_out

Against a running cluster (the multi-node path; the job inherits the
cluster's nodes — no resources are requested here):

    ray start --head  # on the head node (workers: ray start --address=...)
    ray job submit --working-dir /root/repo -- \
        python scripts/run_kg_job.py --input <corpus dir> --output <out dir>

The job is RESUMABLE: output stages are atomic parquet checkpoints with
manifests + per-partition lineage (deepie_ray/checkpoint.py), so a
resubmission after a mid-run failure skips every completed stage.  This
script owns its Ray session only when none exists (``ray job submit``
and the driver harness both pre-initialise)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="corpus dir (documents.parquet)")
    ap.add_argument("--output", required=True, help="checkpoint/output dir")
    ap.add_argument(
        "--model",
        default="multinn",
        help="extraction scorer from deepie_ray.ops.score.MODELS",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; the
        # local fallback makes the same script runnable standalone
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from deepie_ray import pipeline
    from deepie_ray.tuning import apply_recommended_context

    apply_recommended_context()

    t0 = time.monotonic()
    paths = pipeline.materialize_graph(args.input, args.output, model_name=args.model)
    dt = time.monotonic() - t0

    import pyarrow.parquet as pq

    counts = {
        stage: pq.read_table(path).num_rows for stage, path in sorted(paths.items())
    }
    print(
        json.dumps(
            {
                "status": "ok",
                "input": args.input,
                "output": args.output,
                "model": args.model,
                "wall_sec": round(dt, 2),
                "rows": counts,
            }
        )
    )


if __name__ == "__main__":
    main()
